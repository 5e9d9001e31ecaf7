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
  // over last-write-wins under identical conditions; the leave-one-out
  // test below gives the honest generalization number (0.674 vs 0.656
  // prior on genuinely ambiguous out-of-sample surfaces).
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

  /** The honest generalization number the resubstitution test above can't
    * give: candidates + context profiles are mined from all OTHER
    * documents (global aggregates minus the held-out doc's contribution),
    * then the held-out doc's ambiguous golden mentions are resolved with
    * its own token set. Baseline = corpus-frequency prior (most common
    * URI for the surface, no context).
    */
  test("leave-one-out: context disambiguation generalizes to unseen documents") {
    import graft.link.{Candidate, Disambiguator}
    // per-doc raw material
    final case class DocData(
        id: String,
        mentions: Vector[(String, String)], // (surfaceLower, goldenUri)
        tokens: Set[String])
    val docs = authors.flatMap { case (dir, a) =>
      inputIndex.get(a).map { inputDir =>
        val text = readAll(s"/inputs/$inputDir.txt")
        val ments = StageJson.parseEntities(a, resource(s"/golden/$dir/entities.json"))
          .map(e => (PyStr.lower(PyStr.strip(e.mention)), e.uri))
          .filter(_._2.startsWith("http"))
        DocData(a, ments, Disambiguator.docTokens(text))
      }
    }
    // global aggregates, subtractable per doc
    val candCount = scala.collection.mutable.Map.empty[(String, String), Int]
    val uriDocTokens = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Map[String, Int]]
    docs.foreach { d =>
      d.mentions.foreach { case (s, u) =>
        candCount((s, u)) = candCount.getOrElse((s, u), 0) + 1
      }
      d.mentions.map(_._2).distinct.foreach { u =>
        val tc = uriDocTokens.getOrElseUpdate(u, scala.collection.mutable.Map.empty)
        d.tokens.foreach(t => tc(t) = tc.getOrElse(t, 0) + 1)
      }
    }
    var ambTotal = 0L
    var ctxHit = 0L
    var priorHit = 0L
    docs.foreach { d =>
      // leave d out of the aggregates
      val dCounts = d.mentions.groupBy(identity).view.mapValues(_.size).toMap
      val looCand = scala.collection.mutable.Map.empty[String, Vector[Candidate]]
      candCount.foreach { case ((s, u), n) =>
        val loo = n - dCounts.getOrElse((s, u), 0)
        if (loo > 0)
          looCand(s) = looCand.getOrElse(s, Vector.empty) :+
            Candidate(u, u, 0.9, loo)
      }
      val dUris = d.mentions.map(_._2).toSet
      val looProf = uriDocTokens.map { case (u, tc) =>
        val minus = if (dUris(u)) d.tokens else Set.empty[String]
        u -> tc.iterator
          .map { case (t, n) => (t, n - (if (minus(t)) 1 else 0)) }
          .filter(_._2 > 0).toVector
          .sortBy { case (t, n) => (-n, t) }.take(30).map(_._1).toArray
      }.toMap
      val loo = Disambiguator.fromMaps(
        looCand.view.mapValues(_.sortBy(c => c.uri)).toMap, looProf)
      d.mentions.distinct.foreach { case (s, golden) =>
        val cands = looCand.getOrElse(s, Vector.empty)
        if (cands.map(_.uri).distinct.size > 1) { // genuinely ambiguous OOS
          ambTotal += 1
          val prior = cands.maxBy(c => (c.count, c.uri)).uri
          if (prior == golden) priorHit += 1
          if (loo.resolve(s, d.tokens).map(_.uri).contains(golden)) ctxHit += 1
        }
      }
    }
    val priorAcc = priorHit.toDouble / ambTotal
    val ctxAcc = ctxHit.toDouble / ambTotal
    info(f"LOO ambiguous-surface accuracy: prior=$priorAcc%.3f context=$ctxAcc%.3f ($ambTotal cases)")
    assert(ambTotal > 50, s"too few ambiguous cases to evaluate: $ambTotal")
    assert(ctxAcc >= priorAcc, "out-of-sample context resolution should not lose to the prior")
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
