package graft.extract

import graft.util.PyStr

/** Sentence-packing text chunker — port of the reference's
  * `split_text_into_chunks` (modules/rel_linker/rel_runner_fixed.py:12-40):
  * split on runs of [.!?], strip pieces, greedily pack into ≤ maxChars
  * chunks rejoined with ". ". Chunk offsets downstream accumulate
  * `len(chunk) + 2` (rel_runner_fixed.py:147) — the W1 running-sum window.
  */
object Chunker {

  def split(text: String, maxChars: Int = 500): Vector[String] = {
    val pieces = text.split("[.!?]+", -1).toVector.map(PyStr.strip).filter(_.nonEmpty)
    val chunks = Vector.newBuilder[String]
    var current = ""
    pieces.foreach { sentence =>
      if (current.length + sentence.length + 1 > maxChars && current.nonEmpty) {
        chunks += PyStr.strip(current)
        current = sentence
      } else {
        current = if (current.nonEmpty) current + ". " + sentence else sentence
      }
    }
    if (current.nonEmpty) chunks += PyStr.strip(current)
    chunks.result()
  }

  /** (chunk, startOffsetInRejoinedText) pairs — offset accumulation mirrors
    * rel_runner_fixed.py:123-147 (`offset += len(chunk) + 2`).
    */
  def withOffsets(text: String, maxChars: Int = 500): Vector[(String, Int)] = {
    var offset = 0
    split(text, maxChars).map { c =>
      val r = (c, offset)
      offset += c.length + 2
      r
    }
  }
}
