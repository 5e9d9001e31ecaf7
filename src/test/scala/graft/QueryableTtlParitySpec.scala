package graft

import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Exports

/** Golden parity for the queryable-TTL export path (S7): re-parse the
  * reference's custom TTL with the P6 parser and format with our
  * queryable-line writer — the result must equal the reference's own
  * `*_queryable.ttl` exactly (both sides inherit the same re-parse
  * behaviors, e.g. multi-word literal subjects collapsing to their first
  * token).
  */
class QueryableTtlParitySpec extends AnyFunSuite {

  private def resource(path: String) = {
    val in = getClass.getResourceAsStream(path)
    assume(in != null, s"missing $path")
    in
  }
  private def lines(path: String): Vector[String] = {
    val src = Source.fromInputStream(resource(path))(scala.io.Codec.UTF8)
    try src.getLines().toVector
    finally src.close()
  }

  test("re-parsed custom TTL formats to the reference's queryable TTL") {
    assume(java.nio.file.Files.exists(
      java.nio.file.Paths.get("/root/reference/evaluation_outputs")))
    val authors = lines("/golden/index.txt").filter(_.nonEmpty)
      .map(_.split('\t')).map(p => (p(0), p(p.length - 1)))
    var checked = 0
    authors.foreach { case (_, a) =>
      val qPath = java.nio.file.Paths.get(
        s"/root/reference/evaluation_outputs/$a/rdf/${a}_queryable.ttl")
      val rPath = java.nio.file.Paths.get(
        s"/root/reference/evaluation_outputs/$a/rdf/${a}_rdf.ttl")
      if (java.nio.file.Files.exists(qPath) && java.nio.file.Files.exists(rPath)) {
        import scala.jdk.CollectionConverters._
        val golden = java.nio.file.Files.readAllLines(qPath).asScala
          .filter(l => l.nonEmpty && !l.startsWith("#") && !l.startsWith("@"))
          .toSet
        val ours = java.nio.file.Files.readAllLines(rPath).asScala
          .flatMap(Exports.parseCustomTtlLine)
          .map { case (s, p, o) => Exports.queryableLineFromParsed(s, p, o) }
          .toSet
        // tolerance 2: the reference's own queryable.ttl and rdf.ttl were
        // written by different nondeterministic runs for a handful of lines
        val diff = (golden -- ours).size + (ours -- golden).size
        assert(diff <= 2,
          s"$a: ${(golden -- ours).take(2)} missing; ${(ours -- golden).take(2)} extra")
        checked += 1
      }
    }
    info(s"checked $checked authors")
    assert(checked >= 90)
  }

  test("SPARQL template export matches the reference byte-for-byte") {
    assume(java.nio.file.Files.exists(
      java.nio.file.Paths.get("/root/reference/evaluation_outputs")))
    val authors = lines("/golden/index.txt").filter(_.nonEmpty)
      .map(_.split('\t')).map(p => p(p.length - 1))
    var checked = 0
    authors.foreach { a =>
      val p = java.nio.file.Paths.get(
        s"/root/reference/evaluation_outputs/$a/rdf/${a}_queries.sparql")
      if (java.nio.file.Files.exists(p)) {
        val golden = new String(
          java.nio.file.Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8)
        assert(Exports.sparqlTemplateText(a) == golden, s"$a template drift")
        checked += 1
      }
    }
    info(s"checked $checked authors")
    assert(checked >= 90)
  }

  /** Minimal RFC-4180 CSV line splitter for the golden fixtures. */
  private def csvFields(line: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val sb = new StringBuilder
    var i = 0
    var inQ = false
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"' && i + 1 < line.length && line.charAt(i + 1) == '"') { sb += '"'; i += 1 }
        else if (c == '"') inQ = false
        else sb += c
      } else {
        if (c == '"') inQ = true
        else if (c == ',') { out += sb.result(); sb.clear() }
        else sb += c
      }
      i += 1
    }
    out += sb.result()
    out.result()
  }

  test("re-parsed custom TTL matches the golden triples.csv and edges.csv") {
    assume(java.nio.file.Files.exists(
      java.nio.file.Paths.get("/root/reference/evaluation_outputs")))
    import scala.jdk.CollectionConverters._
    val authors = lines("/golden/index.txt").filter(_.nonEmpty)
      .map(_.split('\t')).map(p => p(p.length - 1))
    var checked = 0
    authors.foreach { a =>
      val rdf = java.nio.file.Paths.get(
        s"/root/reference/evaluation_outputs/$a/rdf/${a}_rdf.ttl")
      val csv = java.nio.file.Paths.get(
        s"/root/reference/evaluation_outputs/$a/rdf/${a}_triples.csv")
      val edges = java.nio.file.Paths.get(
        s"/root/reference/evaluation_outputs/$a/graph/${a}_graph_edges.csv")
      if (java.nio.file.Files.exists(rdf) && java.nio.file.Files.exists(csv) &&
        java.nio.file.Files.exists(edges)) {
        val parsed = java.nio.file.Files.readAllLines(rdf).asScala
          .flatMap(Exports.parseCustomTtlLine).toVector

        val goldenCsv = java.nio.file.Files.readAllLines(csv).asScala.toVector
          .drop(1).map(csvFields).map(f => (f(0), f(1), f(2))).toSet
        val oursCsv = parsed.map { case (s, p, o) => (s, p, o) }.toSet
        val dCsv = (goldenCsv -- oursCsv).size + (oursCsv -- goldenCsv).size
        assert(dCsv <= 2, s"$a triples.csv: ${(goldenCsv -- oursCsv).take(2)}")

        def cleanNode(n0: String): String = {
          val n = n0.replaceAll("^[\"']+|[\"']+$", "")
          if (n.startsWith("http://") || n.startsWith("https://")) n
          else n.replaceAll("[<>{}\\[\\]()]", "")
        }
        val goldenEdges = java.nio.file.Files.readAllLines(edges).asScala.toVector
          .drop(1).map(csvFields).map(f => (f(0), f(1), f(2), f(3))).toSet
        val oursEdges = parsed.map { case (s, p, o) =>
          val base = if (p.contains(":")) p.substring(p.lastIndexOf(':') + 1) else p
          val label = base.replace("_", " ").replace("#", "")
          val lbl = if (label.length > 20) label.take(17) + "..." else label
          val frame = if (p.contains(":")) p.split(":")(0) else p
          (cleanNode(s), cleanNode(o), lbl, frame)
        }.toSet
        val dE = (goldenEdges -- oursEdges).size + (oursEdges -- goldenEdges).size
        assert(dE <= 2, s"$a edges.csv: ${(goldenEdges -- oursEdges).take(2)} vs ${(oursEdges -- goldenEdges).take(2)}")
        checked += 1
      }
    }
    info(s"checked $checked authors")
    assert(checked >= 90)
  }
}
