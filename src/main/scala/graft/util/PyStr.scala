package graft.util

import java.util.Locale

/** String helpers matching Python 3 `str` semantics where the reference's
  * control flow depends on them (split/strip/lower). Python's notion of
  * whitespace (str.isspace) covers Unicode space separators (incl. NBSP)
  * that Java's `Character.isWhitespace` excludes, so we define it explicitly.
  */
object PyStr {

  @inline def isPySpace(c: Char): Boolean =
    Character.isWhitespace(c) ||
      Character.getType(c) == Character.SPACE_SEPARATOR ||
      c == '\u0085'

  /** Python `str.strip()` — strips Unicode whitespace from both ends. */
  def strip(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && isPySpace(s.charAt(i))) i += 1
    while (j > i && isPySpace(s.charAt(j - 1))) j -= 1
    if (i == 0 && j == s.length) s else s.substring(i, j)
  }

  /** Python `str.split()` (no argument) — split on runs of whitespace,
    * dropping empty tokens.
    */
  def split(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isPySpace(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isPySpace(s.charAt(i))) i += 1
        out += s.substring(start, i)
      }
    }
    out.result()
  }

  /** Python `str.lower()`. Locale-independent. */
  @inline def lower(s: String): String = s.toLowerCase(Locale.ROOT)
}
