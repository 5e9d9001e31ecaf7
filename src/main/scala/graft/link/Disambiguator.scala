package graft.link

import scala.collection.mutable
import scala.io.Source

import graft.util.PyStr

/** Context-cosine entity disambiguation (north_star: "salted hash-join
  * candidate generation against a broadcast alias dictionary with
  * TF-IDF/context-cosine disambiguation").
  *
  * Ambiguous surfaces ("Chinese" → China vs Chinese_language, "Nobel
  * Prize" → four distinct prizes) are resolved per document: each
  * candidate URI carries a TF-IDF-weighted context profile mined from the
  * golden corpus; the candidate whose profile overlaps the document's
  * token set best wins, with the corpus-frequency prior as tiebreak.
  * Deterministic (profile order, lexicographic URI tiebreak).
  */
final case class Candidate(entity: String, uri: String, confidence: Double, count: Int)

final class Disambiguator private (
    val candidates: Map[String, Vector[Candidate]],
    val profiles: Map[String, Array[String]])
    extends Serializable {

  /** Pick the best candidate for a surface given the document's token set. */
  def resolve(surfaceLower: String, docTokens: Set[String]): Option[Candidate] = {
    candidates.get(surfaceLower).flatMap {
      case Vector() => None
      case Vector(only) => Some(only)
      case cs =>
        // score = context overlap (normalized) with frequency-log prior
        val scored = cs.map { c =>
          val prof = profiles.getOrElse(c.uri, Array.empty)
          val overlap =
            if (prof.isEmpty) 0.0
            else prof.count(docTokens.contains).toDouble / prof.length
          val prior = math.log1p(c.count) / 10.0
          (overlap + prior, c)
        }
        Some(scored.maxBy { case (s, c) => (s, c.uri) }._2)
    }
  }

  def isAmbiguous(surfaceLower: String): Boolean =
    candidates.get(surfaceLower).exists(_.length > 1)
}

object Disambiguator {

  lazy val default: Disambiguator =
    fromResources("/graft/alias_candidates.tsv", "/graft/uri_profiles.tsv")

  /** Build from in-memory maps — used by leave-one-out evaluation (mine
    * candidates/profiles from all OTHER documents, resolve the held-out
    * one) and by callers that mine their own corpus statistics.
    */
  def fromMaps(
      candidates: Map[String, Vector[Candidate]],
      profiles: Map[String, Array[String]]): Disambiguator =
    new Disambiguator(candidates, profiles)

  private val tokenPattern = java.util.regex.Pattern.compile("[a-z][a-z'-]+")
  private val stop = Set("the", "a", "an", "of", "in", "on", "at", "to", "from",
    "by", "for", "with", "and", "or", "as", "was", "were", "is", "are", "be",
    "been", "being", "he", "she", "it", "they", "his", "her", "its", "their",
    "this", "that", "these", "those", "i", "we", "you", "not", "no", "but",
    "have", "has", "had", "do", "does", "did", "will", "would", "can", "could",
    "may", "might", "also", "which", "who", "whom", "whose", "when", "where",
    "while", "after", "before", "during", "all", "any", "some", "more", "most",
    "other", "into", "over", "under", "between", "about", "against")

  /** Same tokenization the profiles were mined with. */
  def docTokens(text: String): Set[String] = {
    val m = tokenPattern.matcher(PyStr.lower(text))
    val out = mutable.HashSet.empty[String]
    while (m.find()) {
      val t = m.group()
      if (t.length > 2 && !stop(t)) out += t
    }
    out.toSet
  }

  def fromResources(candPath: String, profPath: String): Disambiguator = {
    def lines(p: String): Vector[String] = {
      val in = getClass.getResourceAsStream(p)
      require(in != null, s"missing resource $p")
      val src = Source.fromInputStream(in)(scala.io.Codec.UTF8)
      try src.getLines().toVector
      finally src.close()
    }
    val cands = mutable.LinkedHashMap.empty[String, Vector[Candidate]]
    lines(candPath).foreach { l =>
      val f = l.split('\t')
      if (f.length >= 5) {
        val c = Candidate(f(1), f(2), f(3).toDouble, f(4).toInt)
        cands.update(f(0), cands.getOrElse(f(0), Vector.empty) :+ c)
      }
    }
    val profs = lines(profPath).flatMap { l =>
      val f = l.split('\t')
      if (f.length >= 2) Some(f(0) -> f(1).split(',').toArray) else None
    }.toMap
    new Disambiguator(cands.toMap, profs)
  }
}
