package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Pipeline
import graft.tools.IngestTexts

/** End-to-end on the reference's REAL reduced corpus through the raw-text
  * path: ingest the author .txt files exactly as the reference's batch
  * pipeline consumes them, run the full DAG, and sanity-check the KG.
  * (Triple-level parity is gated separately in ParitySpec by replaying
  * golden frames/entities; this verifies the whole raw path end-to-end on
  * real data.) Canceled when the reference checkout is absent.
  */
class RealCorpusE2eSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val corpus = "/root/reference/inputs/authors_reduced_more"

  test("reference .txt corpus → ingest → pipeline → knowledge graph") {
    assume(Files.exists(Paths.get(corpus)), "reference corpus not present")
    import spark.implicits._
    val pages = IngestTexts.ingest(spark, corpus)
    val nPages = pages.count()
    assert(nPages >= 100, s"expected ~100 docs, got $nPages")

    val triples = Pipeline.triples(pages).collect()
    val byDoc = triples.groupBy(_.docId)
    info(s"docs=$nPages docsWithTriples=${byDoc.size} triples=${triples.length}")
    assert(byDoc.size >= nPages * 0.9, "too many docs produced no triples")
    assert(triples.length > 1000)
    // subjects should be predominantly linked wikipedia URIs
    val uriShare = triples.count(_.subjIsUri).toDouble / triples.length
    info(f"uri-subject share = $uriShare%.3f")
    assert(uriShare > 0.5)
    // the protagonist prior must hold on real biography pages
    val ag = triples.filter(_.docId == "ref://Agatha_Christie")
    assert(ag.exists(_.subj == "http://en.wikipedia.org/wiki/Agatha_Christie"),
      s"Agatha doc subjects: ${ag.map(_.subj).distinct.take(5).mkString(", ")}")
  }
}
