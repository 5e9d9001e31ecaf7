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
    val (lp, _) = graft.text.LangId.detect(text)
    val q = graft.text.Quality.score(text)
    val rep = graft.text.Repetition.signals(text)
    val hits = graft.dedup.Decontaminate.countHits(text, benchGrams, n)
    md.reset()
    val h = java.util.Base64.getEncoder.encodeToString(
      md.digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    Score(h, lp, q.composite, rep.top_bigram_frac, rep.dup_line_frac, hits)
  }
}
