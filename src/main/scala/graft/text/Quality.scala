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

  /** Column-expression formulation of [[score]] — pure
    * `org.apache.spark.sql.functions` built-ins, so the whole scorer stays
    * inside whole-stage codegen (no object deserialization per row, unlike
    * the `Dataset.map` form; the scalar [[score]] remains the reference
    * implementation and the two are equality-tested corpus-wide).
    * Unicode note: classifies via `\p{L}`/`\p{Nd}`/java `\s`, matching the
    * scalar version on ASCII and BMP text; exotic whitespace (python's
    * `\x1c`–`\x1f`) differs — irrelevant for web-text corpora.
    */
  def scoreColumns(text: org.apache.spark.sql.Column)
      : Seq[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Column
    def r3(c: Column): Column = floor(c * 1000 + 0.5) / 1000
    val n = length(text).cast("double")
    val toks = when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))
    val nTok = size(toks)
    val nTokD = nTok.cast("double")
    val nDigit = (length(text) - length(regexp_replace(text, "[\\p{Nd}]", ""))).cast("double")
    val nPunct = length(regexp_replace(text, "[\\p{L}\\p{Nd}\\s]", "")).cast("double")
    val sumLen = aggregate(transform(toks, t => length(t)), lit(0),
      (acc, v) => acc + v).cast("double")
    val meanLen = when(nTok === 0, 0.0).otherwise(sumLen / nTokD)
    val stopArr = array(stopwords.toSeq.sorted.map(lit): _*)
    val nStop = size(filter(toks, t => array_contains(stopArr, lower(t)))).cast("double")
    val stopR = when(nTok === 0, 0.0).otherwise(nStop / nTokD)
    val punctR = when(n === 0, 0.0).otherwise(nPunct / n)
    val digitR = when(n === 0, 0.0).otherwise(nDigit / n)
    val lenScore = least(lit(1.0), nTokD / 50.0)
    val stopScore = lit(1.0) - least(lit(1.0), abs(stopR - 0.4) / 0.4)
    val noiseScore = greatest(lit(0.0), lit(1.0) - lit(4) * punctR - lit(4) * digitR)
    val tokLenScore = lit(1.0) - least(lit(1.0), abs(meanLen - 5.0) / 5.0)
    Seq(
      nTok.as("n_tokens"),
      r3(meanLen).as("mean_token_len"),
      r3(stopR).as("stopword_ratio"),
      r3(punctR).as("punct_ratio"),
      r3(digitR).as("digit_ratio"),
      r3(lit(0.25) * (lenScore + stopScore + noiseScore + tokLenScore)).as("composite"))
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
