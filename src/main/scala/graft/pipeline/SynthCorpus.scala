package graft.pipeline

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.link.AliasDict
import graft.model.PageRow

/** Deterministic synthetic web-page corpus (FIXTURES.md §4).
  *
  * Pure function of (seed, index): biography-style sentences over entities
  * drawn from the bundled alias dictionary, wrapped in mw-parser-output
  * HTML with extractor-exercising noise (infobox, references list, edit
  * spans, removable section headings). The per-row invariant
  * `HtmlText.extract(html) == text` holds byte-identically by construction.
  *
  * `skewFraction` routes that share of documents to one head entity
  * ("Agatha Christie" — the dictionary's most aliased author) to exercise
  * skew handling, mirroring the head-entity skew observed in the golden
  * data (e.g. wiki/Americans, SURVEY.md §2.3).
  */
object SynthCorpus {

  private val places = Vector("London", "Paris", "Vienna", "Prague", "Dublin",
    "Boston", "Chicago", "Madrid", "Lisbon", "Moscow", "Oxford", "Cambridge")
  private val prizes = Vector("Nobel Prize in Literature", "Pulitzer Prize",
    "Booker Prize", "National Book Award", "Hugo Award")
  private val works = Vector("a celebrated novel", "an acclaimed memoir",
    "a collection of poems", "a famous play", "an influential essay")
  private val subjectsOfStudy = Vector("literature", "philosophy", "history",
    "classics", "law")

  /** Names with multi-word mentions + URIs in the default alias dict. */
  lazy val names: Vector[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    AliasDict.default.entries.valuesIterator.foreach { e =>
      if (e.uri.startsWith("http") && e.mention.split(" ").length == 2 &&
        e.mention.forall(c => c.isLetter || c == ' ') &&
        e.mention.split(" ").forall(w => w.nonEmpty && w.head.isUpper))
        seen += e.mention
    }
    seen.toVector.sorted
  }

  private val headName = "Agatha Christie"

  /** Deterministic 64-bit mix (splitmix64) — no Random, reproducible. */
  private def mix(seed: Long, i: Long): Long = {
    var z = seed + i * 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def pick[T](xs: Vector[T], h: Long): T =
    xs(((h % xs.length + xs.length) % xs.length).toInt)

  def text(seed: Long, i: Long, skewFraction: Double): String = {
    val h = mix(seed, i)
    val name =
      if (skewFraction > 0 && (((h >>> 8) % 1000).toDouble / 1000.0) < skewFraction) headName
      else pick(names, h)
    // keep years inside the reference's Time-completion regex \b(19|20)\d{2}\b
    val birth = 1900 + (mix(seed, i * 7 + 1) % 80).abs.toInt
    val p1 = pick(places, mix(seed, i * 7 + 2))
    val p2 = pick(places, mix(seed, i * 7 + 3))
    val prize = pick(prizes, mix(seed, i * 7 + 4))
    val work = pick(works, mix(seed, i * 7 + 5))
    val subj = pick(subjectsOfStudy, mix(seed, i * 7 + 6))
    val death = birth + 41 + (mix(seed, i * 7 + 7) % 40).abs.toInt
    val sb = new java.lang.StringBuilder(256)
    sb.append(name).append(" was born in ").append(p1).append(" in ").append(birth)
      .append(". ").append(name).append(" studied ").append(subj)
      .append(" at a university in ").append(p2).append(". In ").append(birth + 25)
      .append(' ').append(name).append(" wrote ").append(work).append(". ")
      .append(name).append(" received the ").append(prize).append(" in ")
      .append(birth + 40).append(". ").append(name).append(" died in ")
      .append(p2).append(" in ").append(death).append('.')
    sb.toString
  }

  /** Wrap the text in HTML whose extraction is byte-identical to `text`. */
  def html(text: String): String = {
    val sents = text.split("(?<=\\.) ").toVector
    val (a, b) = sents.splitAt(math.max(1, sents.length / 2))
    "<html><head><title>bio</title><style>p{}</style></head><body>" +
      "<div class=\"infobox vcard\"><table><tr><td>noise: not extracted</td></tr></table></div>" +
      "<div class=\"mw-parser-output\">" +
      "<h2>Early life</h2>" +
      s"<p>${a.mkString(" ")}[1]</p>" +
      "<span class=\"mw-editsection\">[ edit ]</span>" +
      s"<p>${b.mkString(" ")}[2][citation needed]</p>" +
      "<ul class=\"references\"><li>Reference noise</li></ul>" +
      "<h3>External links</h3>" +
      "</div>" +
      "<div class=\"navbox\">nav noise</div>" +
      "</body></html>"
  }

  private def url(i: Long): String = {
    // manual zero-pad: String.format is too slow for the row hot path
    val s = java.lang.Long.toString(i)
    val sb = new java.lang.StringBuilder(40)
    sb.append("https://example.org/wiki/doc_")
    var p = 8 - s.length
    while (p > 0) { sb.append('0'); p -= 1 }
    sb.append(s).toString
  }

  /** `blankText=true` leaves the text column empty so consumers exercise
    * the html→text extraction path (benchmarks), without a second
    * Dataset.map/encode pass.
    */
  def row(seed: Long, i: Long, skewFraction: Double, blankText: Boolean = false): PageRow = {
    val t = text(seed, i, skewFraction)
    PageRow(
      url = url(i),
      warc_ts = new Timestamp(1758931200000L + i * 1000L), // fixed epoch + i sec
      html = html(t).getBytes(StandardCharsets.UTF_8),
      text = if (blankText) "" else t,
      lang = "en")
  }

  /** Distributed generator: `spark.range` → map, no driver-side data. */
  def pages(
      spark: SparkSession,
      n: Long,
      seed: Long = 42L,
      skewFraction: Double = 0.0,
      partitions: Int = 0,
      blankText: Boolean = false): Dataset[PageRow] = {
    import spark.implicits._
    val base =
      if (partitions > 0) spark.range(0, n, 1, partitions) else spark.range(n)
    base.map(i => row(seed, i, skewFraction, blankText))
  }
}
