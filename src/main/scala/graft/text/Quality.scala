package graft.text

import graft.util.PyStr

/** Composite document-quality scoring for training-data curation:
  * length, punctuation/digit ratios, stopword ratio, mean token length,
  * and a [0,1] composite. Deterministic, allocation-light single pass
  * plus one tokenization.
  */
object Quality {

  final case class Score(
      n_chars: Int,
      n_tokens: Int,
      mean_token_len: Double,
      stopword_ratio: Double,
      punct_ratio: Double,
      digit_ratio: Double,
      composite: Double)

  private val stopwords = Set("the", "a", "an", "of", "in", "on", "at", "to",
    "and", "or", "is", "are", "was", "were", "be", "for", "with", "as", "by",
    "it", "that", "this", "from", "but", "not", "he", "she", "they", "his",
    "her", "its")

  private def r3(x: Double): Double = math.floor(x * 1000 + 0.5) / 1000

  def score(text: String): Score = {
    val n = text.length
    var punct = 0
    var digit = 0
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (Character.isDigit(c)) digit += 1
      else if (!Character.isLetterOrDigit(c) && !PyStr.isPySpace(c)) punct += 1
      i += 1
    }
    val tokens = PyStr.split(text)
    val nTok = tokens.length
    val meanLen = if (nTok == 0) 0.0 else tokens.map(_.length).sum.toDouble / nTok
    val stopRatio =
      if (nTok == 0) 0.0 else tokens.count(t => stopwords(PyStr.lower(t))).toDouble / nTok
    val punctRatio = if (n == 0) 0.0 else punct.toDouble / n
    val digitRatio = if (n == 0) 0.0 else digit.toDouble / n
    // composite: natural-language-like docs score high — moderate stopword
    // share, low punctuation/digit noise, plausible token lengths
    val lenScore = math.min(1.0, nTok / 50.0)
    val stopScore = 1.0 - math.min(1.0, math.abs(stopRatio - 0.4) / 0.4)
    val noiseScore = math.max(0.0, 1.0 - 4 * punctRatio - 4 * digitRatio)
    val tokLenScore = 1.0 - math.min(1.0, math.abs(meanLen - 5.0) / 5.0)
    val composite = r3(0.25 * (lenScore + stopScore + noiseScore + tokLenScore))
    Score(n, nTok, r3(meanLen), r3(stopRatio), r3(punctRatio), r3(digitRatio), composite)
  }

  /** BPE-ish subword-piece count: letter runs, digit runs, and punctuation
    * runs each count as a piece — RE2/Java-portable approximation of
    * byte-pair tokenizer pre-splitting.
    */
  def bpeIshTokenCount(text: String): Int = {
    var count = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (Character.isLetter(c)) {
        while (i < n && Character.isLetter(text.charAt(i))) i += 1
        count += 1
      } else if (Character.isDigit(c)) {
        while (i < n && Character.isDigit(text.charAt(i))) i += 1
        count += 1
      } else if (!PyStr.isPySpace(c)) {
        while (i < n && !Character.isLetterOrDigit(text.charAt(i)) &&
          !PyStr.isPySpace(text.charAt(i))) i += 1
        count += 1
      } else i += 1
    }
    count
  }
}
