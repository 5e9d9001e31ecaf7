package graft.text

import graft.util.PyStr

/** Gopher/Dolma-style repetition quality signals: highly repetitive
  * documents (boilerplate, keyword stuffing, scraped listings) are the
  * classic pre-training noise these rules remove. Deterministic,
  * map-only, and fully SQL-mirrorable (q75 value-level oracle):
  *
  *  - top_word_frac: occurrences of the most frequent word / total words
  *  - top_bigram_frac: same over word 2-grams
  *  - dup_line_frac: 1 − distinct lines / total lines
  *  - dup_10gram_frac: 1 − distinct word-10-grams / total word-10-grams
  *    (the occurrence-count variant of Gopher's duplicated-n-gram
  *    signal; Gopher's original measures the fraction of CHARACTERS
  *    covered by duplicated n-grams — an overlapping-span union that
  *    is not cleanly SQL-mirrorable, so the count form is used and the
  *    difference is contractual)
  *
  * Tokenization matches the rest of the text stack (Python-style
  * whitespace split of the lowercased text; the SQL mirror's RE2
  * `\S+` agrees on ASCII whitespace — the corpus contract shared by
  * every text oracle here — and would diverge on exotic Unicode
  * separators like NBSP, which the documents fixtures do not
  * contain). Fractions are rounded half-up at 4 decimals with the
  * explicit floor(x·1e4+0.5)/1e4 form so the SQL mirror is
  * bit-identical on in-contract input.
  */
object Repetition {

  final case class Signals(
      n_words: Int,
      top_word_frac: Double,
      top_bigram_frac: Double,
      dup_line_frac: Double,
      dup_10gram_frac: Double)

  private def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  private def topFrac(items: Iterator[String]): Double = {
    val counts = scala.collection.mutable.Map.empty[String, Int]
    var total = 0
    items.foreach { it => counts.update(it, counts.getOrElse(it, 0) + 1); total += 1 }
    if (total == 0) 0.0 else counts.valuesIterator.max.toDouble / total
  }

  def signals(text: String): Signals =
    signalsTokens(text, PyStr.split(PyStr.lower(text)))

  /** [[signals]] over pre-lowered, pre-split tokens (the shared-pass
    * cascade entry — see [[graft.pipeline.DocSignals]]); `text` is still
    * needed raw for the line signal. Must receive
    * `PyStr.split(PyStr.lower(text))`.
    */
  def signalsTokens(text: String, ws: Vector[String]): Signals = {
    val bigrams =
      if (ws.length < 2) Iterator.empty
      else ws.sliding(2).map(p => p(0) + " " + p(1))
    // split("\n", -1) always yields >= 1 element, so the division is safe
    val lines = text.split("\n", -1)
    val dupLine = 1.0 - lines.distinct.length.toDouble / lines.length
    val dupTen =
      if (ws.length < 10) 0.0
      else {
        // single pass, one string per gram, no intermediate collections
        // (sliding+mkString+distinct measured 3.7x at the sf1 spot-run
        // — the allocation-heaviest repetition signal)
        val total = ws.length - 9
        val seen = new java.util.HashSet[String](total * 2)
        val sb = new java.lang.StringBuilder
        var distinct = 0
        var i = 0
        while (i < total) {
          sb.setLength(0)
          var j = i
          while (j < i + 10) {
            sb.append(ws(j))
            if (j < i + 9) sb.append(' ')
            j += 1
          }
          if (seen.add(sb.toString)) distinct += 1
          i += 1
        }
        1.0 - distinct.toDouble / total
      }
    Signals(ws.length, r4(topFrac(ws.iterator)), r4(topFrac(bigrams)),
      r4(dupLine), r4(dupTen))
  }
}
