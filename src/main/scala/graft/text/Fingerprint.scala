package graft.text

import graft.util.PyStr

/** Document fingerprinting: 64-bit polynomial rolling hash over the
  * whitespace-normalized, lowercased text — equal fingerprints ⇔ equal
  * normalized content (modulo astronomically unlikely collisions). Cheap
  * single pass; used for content-addressed dedup and lineage.
  */
object Fingerprint {

  def rolling64(text: String): Long = {
    val norm = PyStr.split(PyStr.lower(text)).mkString(" ")
    var h = 1469598103934665603L // FNV offset basis
    var i = 0
    while (i < norm.length) {
      h = (h ^ norm.charAt(i).toLong) * 1099511628211L // FNV prime
      i += 1
    }
    h
  }

  /** Winnowing-style k-gram min-hash: min rolling hash over all k-char
    * windows — robust to local edits, usable as a near-dup prefilter.
    */
  def kgramMin64(text: String, k: Int = 8): Long = {
    val norm = PyStr.split(PyStr.lower(text)).mkString(" ")
    if (norm.length <= k) return rolling64(norm)
    var min = Long.MaxValue
    var i = 0
    while (i + k <= norm.length) {
      var h = 1469598103934665603L
      var j = i
      while (j < i + k) {
        h = (h ^ norm.charAt(j).toLong) * 1099511628211L
        j += 1
      }
      if (h < min) min = h
      i += 1
    }
    min
  }
}
