package graft.text

import graft.util.PyStr

/** Lightweight deterministic language identification: stopword-hit ratio
  * over small built-in function-word profiles. Returns (lang, score); ties
  * and empty input default to ("en", 0.0)-style behavior with "und" for no
  * evidence.
  */
object LangId {

  private val profiles: Vector[(String, Set[String])] = Vector(
    "en" -> Set("the", "of", "and", "to", "in", "a", "is", "that", "was",
      "for", "it", "with", "as", "his", "her", "on", "at", "by", "an", "be",
      "this", "which", "or", "from", "but", "not", "are", "were", "he", "she"),
    "de" -> Set("der", "die", "das", "und", "in", "den", "von", "zu", "mit",
      "sich", "des", "auf", "für", "ist", "im", "dem", "nicht", "ein", "eine",
      "als", "auch", "es", "an", "werden", "aus", "er", "hat", "dass", "sie"),
    "fr" -> Set("le", "la", "les", "de", "des", "et", "en", "un", "une", "du",
      "dans", "est", "pour", "qui", "que", "sur", "se", "pas", "plus", "par",
      "avec", "son", "au", "il", "elle", "ne", "ce", "mais", "ou", "sont"),
    "es" -> Set("el", "la", "los", "las", "de", "y", "en", "un", "una", "del",
      "que", "es", "por", "con", "para", "su", "se", "no", "como", "más",
      "pero", "sus", "le", "fue", "al", "lo", "son", "entre", "está", "también"))

  /** (language, stopword-hit ratio). Deterministic first-max tie-break in
    * profile order (en, de, fr, es).
    */
  def detect(text: String): (String, Double) =
    detectTokens(PyStr.split(PyStr.lower(text)))

  /** [[detect]] over pre-lowered, pre-split tokens — the entry point for
    * single-pass cascades that tokenize once and share
    * ([[graft.pipeline.DocSignals]]). Must receive
    * `PyStr.split(PyStr.lower(text))`.
    */
  def detectTokens(toks: Vector[String]): (String, Double) = {
    if (toks.isEmpty) return ("und", 0.0)
    var bestLang = "und"
    var bestScore = 0.0
    profiles.foreach { case (lang, stops) =>
      val hits = toks.count(stops.contains)
      val score = hits.toDouble / toks.length
      if (score > bestScore) {
        bestScore = score
        bestLang = lang
      }
    }
    // floor(x*k+0.5): half-up, mirrorable exactly in engine-portable SQL
    (bestLang, math.floor(bestScore * 1e6 + 0.5) / 1e6)
  }
}
