package graft.util

/** Lexicographic comparison in UTF-8 BYTE order — the order Spark's
  * UTF8String (and DuckDB's binary string sort) uses. Java's
  * `String.compareTo` compares UTF-16 code units, which diverges for
  * supplementary characters: a surrogate pair (U+10000+) compares LOW
  * against BMP chars in [U+E000, U+FFFF], while by UTF-8 bytes (= by
  * code point) it compares HIGH. Comparing by code point is exactly
  * UTF-8 byte order, without materializing byte arrays.
  *
  * UNPAIRED surrogates follow Spark's encoder, not the Unicode
  * replacement convention: `UTF8String.fromString` (the modified-UTF-8
  * CharsetEncoder path) substitutes '?' (0x3F) for a lone surrogate, so
  * a string containing one must compare exactly as if that unit were
  * '?' — otherwise this comparator and Spark's min(string) could pick
  * different representatives, the divergence it exists to remove.
  */
object Utf8Order {

  /** a < b in UTF-8 byte order. */
  def lt(a: String, b: String): Boolean = compare(a, b) < 0

  /** Code point at i, with lone surrogates mapped to '?' (0x3F) as
    * Spark's UTF8String encoding does. Returns (value, chars consumed).
    */
  @inline private def cp(s: String, i: Int): Int = {
    val c = s.charAt(i)
    if (Character.isHighSurrogate(c) && i + 1 < s.length &&
      Character.isLowSurrogate(s.charAt(i + 1)))
      Character.toCodePoint(c, s.charAt(i + 1))
    else if (Character.isSurrogate(c)) '?'.toInt
    else c.toInt
  }

  def compare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = cp(a, i)
      val cb = cp(b, j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }
}
