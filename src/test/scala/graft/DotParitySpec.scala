package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Exports

/** Golden parity for the DOT graph export (S7, batch_pipeline.py:805-926):
  * rebuild each author's DOT text from the reference's own enriched
  * `*_triples.csv` (written from the SAME triple list, in the same order,
  * as the golden `*_graph.dot`) and compare.
  *
  * Comparison is exact for the header, the `// Relationships` edge list,
  * and the frame legend (all deterministic in triple order). Node lines
  * are compared as ORDER-INSENSITIVE sets per run: the reference iterates
  * a Python `set` whose order is hash-randomized per process, so the
  * golden files carry an arbitrary node order no implementation can
  * reproduce; ours is sorted (documented determinism-over-order
  * deviation, like ragJson).
  */
class DotParitySpec extends AnyFunSuite {

  private def lines(path: String): Vector[String] = {
    val in = getClass.getResourceAsStream(path)
    assume(in != null, s"missing $path")
    val src = scala.io.Source.fromInputStream(in)(scala.io.Codec.UTF8)
    try src.getLines().toVector
    finally src.close()
  }

  /** RFC-4180 CSV reader handling quoted fields with embedded newlines. */
  private def csvRecords(text: String): Vector[Vector[String]] = {
    val out = Vector.newBuilder[Vector[String]]
    val rec = Vector.newBuilder[String]
    val sb = new StringBuilder
    var i = 0
    var inQ = false
    var sawAny = false
    def endField(): Unit = { rec += sb.result(); sb.clear() }
    def endRec(): Unit = {
      endField()
      val r = rec.result(); rec.clear()
      if (r.exists(_.nonEmpty)) out += r
      sawAny = false
    }
    while (i < text.length) {
      val c = text.charAt(i)
      if (inQ) {
        if (c == '"' && i + 1 < text.length && text.charAt(i + 1) == '"') {
          sb += '"'; i += 1
        } else if (c == '"') inQ = false
        else sb += c
      } else c match {
        case '"' => inQ = true; sawAny = true
        case ',' => endField(); sawAny = true
        case '\r' => // swallow
        case '\n' => if (sawAny || sb.nonEmpty) endRec()
        case other => sb += other; sawAny = true
      }
      i += 1
    }
    if (sawAny || sb.nonEmpty) endRec()
    out.result()
  }

  test("DOT export matches golden graphs (node order modulo Python set order)") {
    assume(java.nio.file.Files.exists(
      java.nio.file.Paths.get("/root/reference/evaluation_outputs")))
    val authors = lines("/golden/index.txt").filter(_.nonEmpty)
      .map(_.split('\t')).map(p => p(p.length - 1))
    var checked = 0
    authors.foreach { a =>
      val csvP = java.nio.file.Paths.get(
        s"/root/reference/evaluation_outputs/$a/rdf/${a}_triples.csv")
      val dotP = java.nio.file.Paths.get(
        s"/root/reference/evaluation_outputs/$a/graph/${a}_graph.dot")
      if (java.nio.file.Files.exists(csvP) && java.nio.file.Files.exists(dotP)) {
        val csv = new String(java.nio.file.Files.readAllBytes(csvP),
          java.nio.charset.StandardCharsets.UTF_8)
        val triples = csvRecords(csv).drop(1).map { f =>
          Exports.DotTriple(f(0), f(1), f(2), f(3).toDouble,
            f(5).equalsIgnoreCase("true"))
        }
        val golden = new String(java.nio.file.Files.readAllBytes(dotP),
          java.nio.charset.StandardCharsets.UTF_8).linesIterator.toVector
        val ours = Exports.dotGraphText(a, triples).linesIterator.toVector

        assert(ours.length == golden.length,
          s"$a: line count ${ours.length} vs golden ${golden.length}")
        val gRel = golden.indexOf("    // Relationships")
        val oRel = ours.indexOf("    // Relationships")
        assert(gRel > 0 && oRel == gRel, s"$a: relationships marker at $oRel vs $gRel")
        // header: fixed 1 + dotHeaderTail.size lines, exact
        val h = 1 + Exports.dotHeaderTail.size
        assert(ours.take(h) == golden.take(h), s"$a: header drift")
        // node section: same lines modulo Python-set order
        assert(ours.slice(h, oRel).sorted == golden.slice(h, gRel).sorted,
          s"$a: node section drift: ${ours.slice(h, oRel).toSet -- golden.slice(h, gRel).toSet}")
        // edges + legend: exact, in triple order
        assert(ours.drop(oRel) == golden.drop(gRel),
          s"$a: edge/legend drift: ${ours.drop(oRel).zip(golden.drop(gRel)).find(p => p._1 != p._2)}")
        checked += 1
      }
    }
    info(s"checked $checked authors")
    assert(checked >= 90)
  }
}
