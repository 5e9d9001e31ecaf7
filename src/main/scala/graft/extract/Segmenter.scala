package graft.extract

import graft.util.PyStr

/** Deterministic sentence segmentation, approximating NLTK punkt as used by
  * the reference (modules/framesrl/framesrl_runner.py:19 `sent_tokenize`).
  *
  * Rule-based: a sentence ends at a run of [.!?] (plus trailing closing
  * quotes/brackets) followed by whitespace and an uppercase/digit/quote
  * opener — unless the token before the period is a known abbreviation, a
  * single initial ("F."), or an internal-dotted acronym ("U.S."). Parity on
  * triples is not gated on segmentation (golden frames replay their own
  * sentence splits); this exists for the end-to-end raw-text path.
  */
object Segmenter {

  private val abbreviations = Set(
    "mr", "mrs", "ms", "dr", "prof", "sr", "jr", "st", "rev", "gen", "hon",
    "capt", "col", "sgt", "lt", "vs", "etc", "eg", "ie", "cf", "al", "inc",
    "ltd", "co", "corp", "no", "vol", "pp", "ed", "eds", "trans", "ca",
    "approx", "c" /* circa */ )

  private def isCloser(c: Char): Boolean =
    c == '"' || c == '\'' || c == ')' || c == ']' || c == '”' || c == '’'

  private def isOpener(c: Char): Boolean =
    Character.isUpperCase(c) || Character.isDigit(c) || c == '"' || c == '“' ||
      c == '‘' || c == '(' || c == '['

  /** Token (letters/dots) immediately preceding position `i` (exclusive). */
  private def tokenBefore(text: String, i: Int): String = {
    var j = i
    while (j > 0 && !PyStr.isPySpace(text.charAt(j - 1))) j -= 1
    text.substring(j, i)
  }

  def sentences(text: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val n = text.length
    var start = 0
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (c == '.' || c == '!' || c == '?') {
        // extend over the punctuation run and any closing quotes/brackets
        var j = i
        while (j + 1 < n && (text.charAt(j + 1) == '.' || text.charAt(j + 1) == '!' ||
          text.charAt(j + 1) == '?')) j += 1
        var k = j
        while (k + 1 < n && isCloser(text.charAt(k + 1))) k += 1
        val boundaryOk = {
          if (c != '.') true
          else {
            val tok = tokenBefore(text, i)
            val word = tok.reverse.dropWhile(!Character.isLetterOrDigit(_)).reverse
            val bare = PyStr.lower(word)
            val isAbbrev = abbreviations.contains(bare)
            val isInitial = word.length == 1 && Character.isUpperCase(word.headOption.getOrElse(' '))
            val isDottedAcronym = word.contains(".")
            !(isAbbrev || isInitial || isDottedAcronym)
          }
        }
        if (boundaryOk) {
          // require whitespace then an opener (or end of text)
          var m = k + 1
          while (m < n && PyStr.isPySpace(text.charAt(m))) m += 1
          val spaced = m > k + 1
          if (m >= n || (spaced && isOpener(text.charAt(m)))) {
            val sent = PyStr.strip(text.substring(start, k + 1))
            if (sent.nonEmpty) out += sent
            start = m
            i = m
          } else i = k + 1
        } else i = j + 1
      } else i += 1
    }
    if (start < n) {
      val tail = PyStr.strip(text.substring(start))
      if (tail.nonEmpty) out += tail
    }
    out.result()
  }
}
