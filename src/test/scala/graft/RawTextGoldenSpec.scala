package graft

import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.Segmenter
import graft.io.StageJson
import graft.link.{AliasDict, EntityLink}
import graft.util.PyStr

/** Raw-text-path quality vs the reference's golden corpus: how well our
  * deterministic segmenter and alias-dict entity linker reproduce the
  * reference's punkt sentences and REL mentions on the real author texts.
  * These stages are NOT parity-gated (golden parity replays the
  * reference's own frames/entities); these thresholds guard against
  * regressions in the raw-text path.
  */
class RawTextGoldenSpec extends AnyFunSuite {

  private def resource(path: String) = {
    val in = getClass.getResourceAsStream(path)
    assert(in != null, s"missing $path")
    in
  }
  private def readAll(path: String): String = {
    val src = Source.fromInputStream(resource(path))(scala.io.Codec.UTF8)
    try src.mkString
    finally src.close()
  }
  private def lines(path: String): Vector[String] = {
    val src = Source.fromInputStream(resource(path))(scala.io.Codec.UTF8)
    try src.getLines().toVector
    finally src.close()
  }

  private lazy val authors: Vector[(String, String)] =
    lines("/golden/index.txt").filter(_.nonEmpty).map { l =>
      val p = l.split('\t'); (p(0), p(p.length - 1))
    }
  private lazy val inputIndex: Map[String, String] =
    lines("/inputs/index.txt").filter(_.nonEmpty).map { l =>
      val p = l.split('\t'); (p(p.length - 1), p(0))
    }.toMap

  test("segmenter agrees with the reference's punkt splits on golden texts") {
    var matched = 0L
    var goldenTotal = 0L
    authors.foreach { case (dir, a) =>
      inputIndex.get(a).foreach { inputDir =>
        val text = readAll(s"/inputs/$inputDir.txt")
        val golden = StageJson.parseFrames(a, resource(s"/golden/$dir/frames.json"))
          .sentences.map(_.text).toSet
        val ours = Segmenter.sentences(text).toSet
        matched += (ours & golden).size
        goldenTotal += golden.size
      }
    }
    val agreement = matched.toDouble / goldenTotal
    info(f"sentence agreement = $agreement%.3f ($matched / $goldenTotal)")
    assert(agreement >= 0.70, f"agreement $agreement%.3f below floor")
  }

  // NOTE: this is IN-CORPUS RESUBSTITUTION accuracy — alias_candidates.tsv
  // and uri_profiles.tsv were mined from the same golden corpus measured
  // here, so the absolute numbers are optimistic relative to unseen
  // documents. The test's claim is the RELATIVE lift of context-cosine
  // over last-write-wins under identical conditions, not generalization.
  test("context disambiguation beats last-write-wins on golden URI choice") {
    import graft.link.Disambiguator
    var baseHit = 0L; var disHit = 0L; var total = 0L
    authors.foreach { case (dir, a) =>
      inputIndex.get(a).foreach { inputDir =>
        val text = readAll(s"/inputs/$inputDir.txt")
        val golden = StageJson.parseEntities(a, resource(s"/golden/$dir/entities.json"))
        val base = EntityLink.link(a, text, AliasDict.default)
          .groupBy(e => PyStr.lower(e.mention)).view.mapValues(_.head.uri)
        val dis = EntityLink.link(a, text, AliasDict.default,
          disambiguator = Disambiguator.default)
          .groupBy(e => PyStr.lower(e.mention)).view.mapValues(_.head.uri)
        golden.foreach { g =>
          val m = PyStr.lower(PyStr.strip(g.mention))
          if (base.contains(m) || dis.contains(m)) {
            total += 1
            if (base.get(m).contains(g.uri)) baseHit += 1
            if (dis.get(m).contains(g.uri)) disHit += 1
          }
        }
      }
    }
    val baseAcc = baseHit.toDouble / total
    val disAcc = disHit.toDouble / total
    info(f"uri accuracy: last-write-wins=$baseAcc%.3f context-cosine=$disAcc%.3f ($total occurrences)")
    assert(disAcc > baseAcc, "disambiguation should improve URI choice")
    assert(disAcc >= 0.9, f"disambiguated accuracy $disAcc%.3f too low")
  }

  test("entity linker recovers most golden mention surfaces from raw text") {
    var hit = 0L
    var total = 0L
    authors.foreach { case (dir, a) =>
      inputIndex.get(a).foreach { inputDir =>
        val text = readAll(s"/inputs/$inputDir.txt")
        val golden = StageJson.parseEntities(a, resource(s"/golden/$dir/entities.json"))
          .map(e => PyStr.lower(e.mention)).toSet
        val ours = EntityLink.link(a, text, AliasDict.default)
          .map(e => PyStr.lower(e.mention)).toSet
        hit += (golden & ours).size
        total += golden.size
      }
    }
    val recall = hit.toDouble / total
    info(f"mention recall = $recall%.3f ($hit / $total)")
    assert(recall >= 0.80, f"mention recall $recall%.3f below floor")
  }
}
