package graft.dedup

import graft.util.PyStr

/** 64-bit SimHash over word unigrams: near-duplicate docs have small
  * Hamming distance between fingerprints. Deterministic (splitmix64 token
  * hashes), no external state.
  */
object SimHash {

  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def simhash64(text: String): Long = {
    val votes = new Array[Int](64)
    PyStr.split(PyStr.lower(text)).foreach { tok =>
      val h = mix64(tok.hashCode.toLong)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
