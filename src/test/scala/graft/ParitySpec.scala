package graft

import java.nio.charset.StandardCharsets

import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

import graft.io.StageJson
import graft.rdf.TripleEmitter

/** Golden-corpus parity for the frames→triples core (SURVEY.md §5.2.1).
  *
  * Replays the reference's own frames.json + entities.json through
  * [[TripleEmitter]] and compares TTL-line sets:
  *  - vs golden rdf.ttl (the reference's actual outputs, produced with its
  *    LLM coref): corpus P ≥ 0.95 ∧ R ≥ 0.95 — the BASELINE.json gate;
  *  - vs expected.ttl (the reference's deterministic path with the same
  *    protagonist prior, replayed offline): exact set equality per author —
  *    any diff is a port bug, not model noise.
  */
class ParitySpec extends AnyFunSuite {

  private def resource(path: String) = {
    val in = getClass.getResourceAsStream(path)
    assert(in != null, s"missing test resource $path")
    in
  }

  private def resourceLines(path: String): Vector[String] = {
    val src = Source.fromInputStream(resource(path))(scala.io.Codec.UTF8)
    try src.getLines().toVector
    finally src.close()
  }

  private def ttlSet(lines: Vector[String]): Set[String] =
    lines.filter(l => l.nonEmpty && !l.startsWith("#")).toSet

  /** (resourceDir, docId) pairs — dirs are ASCII-escaped, ids keep Unicode. */
  private lazy val authors: Vector[(String, String)] =
    resourceLines("/golden/index.txt").filter(_.nonEmpty).map { l =>
      val parts = l.split('\t')
      (parts(0), parts(parts.length - 1))
    }

  test("golden corpus is present") {
    assert(authors.size >= 90)
  }

  test("exact parity vs deterministic replay (expected.ttl) per author") {
    var bad = List.empty[String]
    authors.foreach { case (dir, a) =>
      val frames = StageJson.parseFrames(a, resource(s"/golden/$dir/frames.json"))
      val entities = StageJson.parseEntities(a, resource(s"/golden/$dir/entities.json"))
      val ours = TripleEmitter.convert(a, frames.sentences, entities)
        .map(_.ttlLine).toSet
      val expected = ttlSet(resourceLines(s"/golden/$dir/expected.ttl"))
      if (ours != expected) {
        val missing = (expected -- ours).take(3)
        val extra = (ours -- expected).take(3)
        bad ::= s"$a: ${expected.size} expected vs ${ours.size} ours; " +
          s"missing=${missing.mkString(" | ")} extra=${extra.mkString(" | ")}"
      }
    }
    assert(bad.isEmpty, s"${bad.size} authors diverge:\n${bad.take(10).mkString("\n")}")
  }

  test("corpus P/R >= 0.95 vs reference golden rdf.ttl") {
    var tp = 0L; var fp = 0L; var fn = 0L
    authors.foreach { case (dir, a) =>
      val frames = StageJson.parseFrames(a, resource(s"/golden/$dir/frames.json"))
      val entities = StageJson.parseEntities(a, resource(s"/golden/$dir/entities.json"))
      val ours = TripleEmitter.convert(a, frames.sentences, entities)
        .map(_.ttlLine).toSet
      val golden = ttlSet(resourceLines(s"/golden/$dir/rdf.ttl"))
      tp += (ours & golden).size
      fp += (ours -- golden).size
      fn += (golden -- ours).size
    }
    val p = tp.toDouble / (tp + fp)
    val r = tp.toDouble / (tp + fn)
    info(f"corpus precision=$p%.4f recall=$r%.4f (tp=$tp fp=$fp fn=$fn)")
    assert(p >= 0.95, f"precision $p%.4f < 0.95")
    assert(r >= 0.95, f"recall $r%.4f < 0.95")
  }
}
