package graft.pipeline

/** The ONE per-document signal computation every curation cascade
  * shares — batch (`Curate.curateFull`, `Curate.curateDecontaminated`)
  * and streaming (`StreamingCurate.verdicts`) alike. The q84 oracle's
  * premise is that stream and batch compute the SAME cascade; keeping
  * the scoring in one place makes that true by construction instead of
  * by parallel edits to three copied mapPartitions bodies.
  */
object DocSignals {

  final case class Score(
      h: String,
      lang_pred: String,
      composite: Double,
      top_bigram_frac: Double,
      dup_line_frac: Double,
      n_hits: Int)

  /** All signals in one text pass: language, quality composite,
    * repetition fractions, contamination hit count (0 when `benchGrams`
    * is empty — the gram pass is skipped entirely), and the content
    * MD5 (Base64) the keeper selection groups on. `md` is the caller's
    * per-partition digest instance (reset here).
    */
  def score(
      md: java.security.MessageDigest,
      text: String,
      benchGrams: Array[Long],
      n: Int): Score = {
    // lowered tokenization computed ONCE and shared by the three signals
    // defined over it (language, repetition, contamination) — they used
    // to re-lower + re-split the text independently, tripling the
    // tokenization cost of the cascade's map pass. Quality keeps its own
    // RAW-text split: lowering can change char counts (e.g. İ → i̇), so
    // sharing there would change mean_token_len on exotic input.
    val ltoks = graft.util.PyStr.split(graft.util.PyStr.lower(text))
    val (lp, _) = graft.text.LangId.detectTokens(ltoks)
    val q = graft.text.Quality.score(text)
    val rep = graft.text.Repetition.signalsTokens(text, ltoks)
    val hits = graft.dedup.Decontaminate.countHitsTokens(ltoks, benchGrams, n)
    md.reset()
    val h = java.util.Base64.getEncoder.encodeToString(
      md.digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    Score(h, lp, q.composite, rep.top_bigram_frac, rep.dup_line_frac, hits)
  }
}
