package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.{Chunker, Segmenter}
import graft.link.{AliasDict, EntityLink}
import graft.rdf.TripleEmitter
import graft.frames.FrameDetect

/** Robustness on the reference's full-length author pages (up to ~125 KB —
  * 60× the reduced corpus): the many-chunk path, long-document
  * segmentation, and end-to-end conversion must stay correct and fast.
  * Canceled (not failed) when the reference checkout is absent.
  */
class FullLengthDocSpec extends AnyFunSuite {

  private val dir = Paths.get("/root/reference/inputs/authors")

  test("full-length docs flow through chunking, linking, and conversion") {
    assume(Files.exists(dir), "reference full-length corpus not present")
    val files = Files.list(dir).iterator()
    val biggest = {
      var best: (java.nio.file.Path, Long) = (null, -1L)
      while (files.hasNext) {
        val p = files.next()
        val sz = Files.size(p)
        if (sz > best._2) best = (p, sz)
      }
      best._1
    }
    val text = new String(Files.readAllBytes(biggest), StandardCharsets.UTF_8)
    assert(text.length > 50000, s"expected a big doc, got ${text.length} chars")

    val t0 = System.nanoTime()
    val chunks = Chunker.withOffsets(text)
    assert(chunks.length > 50)
    // offsets strictly increasing, each chunk within its offset window
    chunks.sliding(2).foreach {
      case Vector((c, o1), (_, o2)) => assert(o2 == o1 + c.length + 2)
      case _ =>
    }
    val sentences = Segmenter.sentences(text)
    assert(sentences.length > 100)
    val entities = EntityLink.link("Big_Doc", text, AliasDict.default)
    assert(entities.nonEmpty)
    entities.foreach(e => assert(e.start >= 0 && e.end > 0))
    val frames = FrameDetect.detectDoc(sentences)
    val triples = TripleEmitter.convert("Big_Doc", frames, entities)
    val ms = (System.nanoTime() - t0) / 1e6
    info(f"doc=${biggest.getFileName} chars=${text.length} chunks=${chunks.length} " +
      f"sentences=${sentences.length} entities=${entities.length} " +
      f"triples=${triples.length} in $ms%.0f ms")
    assert(triples.nonEmpty)
    assert(ms < 30000, f"full-length doc took $ms%.0f ms — pathological slowdown")
  }
}
