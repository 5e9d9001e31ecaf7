package graft.util

/** Lexicographic comparison in UTF-8 BYTE order — the order Spark's
  * UTF8String (and DuckDB's binary string sort) uses. Java's
  * `String.compareTo` compares UTF-16 code units, which diverges for
  * supplementary characters: a surrogate pair (U+10000+) compares LOW
  * against BMP chars in [U+E000, U+FFFF], while by UTF-8 bytes (= by
  * code point) it compares HIGH. Comparing by code point is exactly
  * UTF-8 byte order, without materializing byte arrays.
  */
object Utf8Order {

  /** a < b in UTF-8 byte order. */
  def lt(a: String, b: String): Boolean = compare(a, b) < 0

  def compare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }
}
