package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.extract.Chunker
import graft.link.{AliasDict, AliasEntry, EntityLink}
import graft.model.{EntityMention, Frame, FrameElement, Sentence}
import graft.rdf.{FrameMappings, TripleEmitter}
import graft.util.PyStr

/** Property tests per SURVEY.md §5.2.3. */
class PropertySpec extends AnyFunSuite {

  /** scalatestplus bridge is not on the offline classpath: sample the
    * generator at fixed seeds instead — same coverage, fully deterministic.
    */
  private def forAll[T](gen: Gen[T], n: Int = 100)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .foreach(v => body(v))
    }

  private val word = Gen.oneOf("alpha", "Beta", "gamma", "Delta Prime",
    "the", "in", "1956", "2001-02-03", "Paris", "von Neumann")
  private val sentenceGen: Gen[String] =
    Gen.nonEmptyListOf(word).map(_.mkString(" ") + ".")
  private val textGen: Gen[String] =
    Gen.nonEmptyListOf(sentenceGen).map(_.mkString(" "))

  test("Normalize.clean and UrlNorm.canonical are total and idempotent") {
    // arbitrary unicode strings incl. controls, combining marks, and
    // url-ish shapes: both cleaners must never throw and must be
    // fixpoints after one application
    val junk = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('\u0007', '\u0301', '\u0308', '\r',
        '\n', '\t', ' ', ':', '/', '?', '&', '#', '=', '.', '\u00e9')))
      .map(_.mkString)
    forAll(junk, n = 300) { s =>
      val c = graft.text.Normalize.clean(s)
      assert(graft.text.Normalize.clean(c) == c,
        s"clean not idempotent on ${s.map(_.toInt)}")
      val u = graft.canon.UrlNorm.canonical(s)
      assert(graft.canon.UrlNorm.canonical(u) == u,
        s"canonical not idempotent on $s")
    }
    // the exact corner the strip-FIRST order exists for: a control byte
    // between base char and combining mark must not block composition
    assert(graft.text.Normalize.clean("e\u0007\u0301") == "\u00e9")
    val urlish = for {
      scheme <- Gen.oneOf("http", "HTTPS", "ftp")
      host <- Gen.oneOf("A.B.com", "x.org", "H-1.net")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/", "/P/q")
      q <- Gen.oneOf("", "?b=2&a=1", "?utm_x=1", "?utm_x=1&z=9")
      f <- Gen.oneOf("", "#frag")
    } yield s"$scheme://$host$port$path$q$f"
    forAll(urlish, n = 200) { s =>
      val u = graft.canon.UrlNorm.canonical(s)
      assert(graft.canon.UrlNorm.canonical(u) == u, s"not idempotent: $s -> $u")
      assert(!u.contains("#") && !u.toLowerCase.contains("utm_"), s"$s -> $u")
    }
  }

  test("truncation: bounded length, prefix-or-ellipsis, reference branch rule") {
    import graft.text.Truncate.toSentenceBoundary
    val punctText = Gen.nonEmptyListOf(
      Gen.oneOf("word", "x", "end.", "why?", "now!", "a b c", "1956"))
      .map(_.mkString(" "))
    forAll(Gen.zip(punctText, Gen.choose(10, 120)), n = 300) { case (s, m) =>
      val out = toSentenceBoundary(s, m)
      if (s.length <= m) assert(out == s)
      else {
        assert(out.length <= m, s"len ${out.length} > $m for '$s'")
        assert(s.startsWith(out.stripSuffix("...")),
          s"output not a prefix: '$out' of '$s'")
        if (out.endsWith("...")) assert(out.length == m)
        else assert(".!?".contains(out.last) && out.length > m * 0.8)
      }
    }
  }

  test("minhash: estimate within [0,1], symmetric, exact on identical texts") {
    import graft.dedup.MinHashLsh
    forAll(Gen.zip(textGen, textGen), n = 100) { case (a, b) =>
      val (sa, sb) = (MinHashLsh.signature(a), MinHashLsh.signature(b))
      val est = MinHashLsh.estimateJaccard(sa, sb)
      assert(est >= 0.0 && est <= 1.0)
      assert(est == MinHashLsh.estimateJaccard(sb, sa))
      assert(MinHashLsh.estimateJaccard(sa, MinHashLsh.signature(a)) == 1.0)
      // a deterministic function of the text, not the doc
      assert(sa.toSeq == MinHashLsh.signature(a).toSeq)
    }
  }

  test("ttl re-parse: subject is the line's first token, object joins the rest") {
    import graft.io.Exports
    import graft.model.Triple
    forAll(Gen.zip(word, word, Gen.nonEmptyListOf(word)), n = 200) {
      case (subj, pred, objWords) =>
        val obj = objWords.mkString(" ")
        val line = Triple.ttlLine(subj, "Frame_x", pred, obj)
        Exports.parseCustomTtlLine(line).foreach { case (s, p, o) =>
          def sq(x: String) = x.replaceAll("^[\"']+|[\"']+$", "")
          val parts = PyStr.split(PyStr.strip(line).replaceAll("[;.]$", ""))
          assert(s == sq(parts.head))
          assert(p == sq(parts(1)))
          assert(o == sq(parts.drop(2).mkString(" ")))
        }
    }
  }

  test("chunk reassembly approximates the normalized input") {
    forAll(textGen) { text =>
      val chunks = Chunker.split(text, maxChars = 80)
      // rejoining chunks with ". " reproduces the piece sequence
      val rejoined = chunks.mkString(". ")
      val pieces = text.split("[.!?]+", -1).map(PyStr.strip).filter(_.nonEmpty)
      val rePieces = rejoined.split("[.!?]+", -1).map(PyStr.strip).filter(_.nonEmpty)
      assert(pieces.toVector == rePieces.toVector)
    }
  }

  test("chunk offsets are the exact running sum of len+2") {
    forAll(textGen) { text =>
      val off = Chunker.withOffsets(text, 80)
      var expected = 0
      off.foreach { case (c, o) =>
        assert(o == expected)
        expected += c.length + 2
      }
    }
  }

  test("entity links respect the end=length quirk and are dedup-idempotent") {
    val dict = AliasDict.fromEntries(Seq(
      AliasEntry("Delta Prime", "Delta_Prime", "http://x/Delta_Prime", 0.9),
      AliasEntry("Paris", "Paris", "http://x/Paris", 0.8)))
    forAll(textGen) { text =>
      val links = EntityLink.link("d", text, dict)
      links.foreach { e =>
        assert(e.end - e.start >= 0 || e.end == e.mention.length ||
          e.end >= e.mention.length) // chunked: end = offset + length
      }
      // single-chunk texts: end is exactly the mention length
      if (text.length <= 500) links.foreach(e => assert(e.end - e.start + e.start == e.start + e.mention.length || e.end == e.mention.length))
      assert(EntityLink.link("d", text, dict) == links) // deterministic
    }
  }

  test("emitted triples: no self-reference, predicates in mapping closure") {
    val predClosure: Set[String] =
      FrameMappings.frameSpecific.values.flatMap(_.values).toSet ++
        FrameMappings.generic.values.toSet + "has_theme"
    val frameGen = for {
      name <- Gen.oneOf("Being_born", "Death", "Text_creation", "Madeup_frame")
      els <- Gen.nonEmptyListOf(for {
        role <- Gen.oneOf("Child", "Time", "Place", "Author", "Weird_role")
        t <- word
      } yield FrameElement(role, t))
    } yield Frame(name, els.toVector)
    val docGen = for {
      sents <- Gen.nonEmptyListOf(for {
        t <- sentenceGen
        fs <- Gen.listOf(frameGen)
      } yield (t, fs.toVector))
    } yield sents.toVector.zipWithIndex.map { case ((t, fs), i) => Sentence(i, t, fs) }

    val ents = Vector(
      EntityMention("d", "Delta Prime", "Delta_Prime", "http://x/Delta_Prime", 0, 11, 0.9),
      EntityMention("d", "Paris", "Paris", "http://x/Paris", 0, 5, 0.7))

    forAll(docGen) { sents =>
      val triples = TripleEmitter.convert("d", sents, ents)
      triples.foreach { t =>
        assert(t.subj != t.obj, s"self-referential: $t")
        assert(predClosure(t.pred), s"predicate ${t.pred} outside closure")
        assert(t.frame.nonEmpty && t.obj.nonEmpty && t.subj.nonEmpty)
      }
      // dedup: converting twice yields identical output (determinism) and
      // the output itself is duplicate-free
      assert(TripleEmitter.convert("d", sents, ents) == triples)
      val keys = triples.map(t => (t.subj, t.predUri, t.obj))
      assert(keys.distinct == keys)
    }
  }
}
