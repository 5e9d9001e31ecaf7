package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation over a documents table — the
  * composition a 100 TB pre-training pipeline actually runs, built from
  * the library's individually-oracled pieces:
  *
  *   1. language ID (stopword profiles, map-only),
  *   2. quality floor (composite score, same single pass),
  *   3. duplicate keeper selection among the SURVIVORS — exact (md5
  *      groups, SQL-mirrorable) or near-dup (MinHash-LSH clusters, the
  *      scale path).
  *
  * One verdict row per input document: nothing is silently dropped — a
  * filtered doc carries `kept=false` plus the stage that rejected it, so
  * corpus-curation accounting (how much did each filter remove?) is a
  * groupBy away. Steps 1–2 share one mapPartitions pass (no extra scan);
  * step 3 shuffles only the survivors' hashes/ids.
  */
object Curate {

  /** Exact-dedup variant: deterministic and fully SQL-expressible (the
    * q69 DuckDB oracle composes the q27/q50/q21 mirrors).
    *
    * Deliberately NOT delegated to [[curateFull]] with +∞ repetition
    * thresholds: that would compute the repetition signals (a second
    * tokenization pass per document) only to discard them — real CPU
    * at corpus scale for a variant whose contract doesn't use them.
    * The shared shape (single scoring pass → hash-window keeper →
    * verdict cascade) is the documented pattern; changes to keeper or
    * verdict semantics must be applied to both variants.
    */
  def curateExact(
      docs: Dataset[(Long, String)],
      lang: String = "en",
      minComposite: Double = 0.3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // steps 1+2 in ONE pass over the text; one digest per partition, not
    // a synchronized JCA provider lookup per row
    val scored = docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { case (id, text) =>
        val (lp, _) = graft.text.LangId.detect(text)
        val q = graft.text.Quality.score(text)
        md.reset()
        val h = java.util.Base64.getEncoder.encodeToString(
          md.digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        (id, lp, q.composite, h)
      }
    }.toDF("doc_id", "lang_pred", "composite", "h")
    // keeper as a window over the hash, NOT a groupBy+self-join: the
    // self-join shape evaluates the scan + scoring pass twice (two full
    // corpus reads at 100 TB); the window is one scan + one shuffle on h
    // (PlanQualitySpec asserts the single-scan plan)
    val passes = col("lang_pred") === lang && col("composite") >= minComposite
    val w = org.apache.spark.sql.expressions.Window.partitionBy("h")
    scored
      .withColumn("keeper", min(when(passes, col("doc_id"))).over(w))
      .select(
        col("doc_id"), col("lang_pred"),
        round(col("composite"), 3).as("composite"),
        when(col("lang_pred") =!= lang, "lang")
          .when(col("composite") < minComposite, "quality")
          .when(col("doc_id") =!= col("keeper"), "duplicate")
          .otherwise("kept").as("verdict"),
        (passes && col("doc_id") === col("keeper")).as("kept"))
  }

  /** Full cascade: language → quality floor → repetition filters
    * (Gopher-style top-bigram / duplicate-line fractions) → exact-dedup
    * keeper among survivors. ALL per-doc signals come from ONE
    * mapPartitions pass over the text (the curateExact single-scan
    * shape); only the keeper window shuffles, on the content hash.
    * Verdict order is contractual: lang, quality, repetition,
    * duplicate, kept — the first failing stage names the verdict.
    */
  def curateFull(
      docs: Dataset[(Long, String)],
      lang: String = "en",
      minComposite: Double = 0.3,
      maxTopBigramFrac: Double = 0.08,
      maxDupLineFrac: Double = 0.3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val scored = docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { case (id, text) =>
        val sg = DocSignals.score(md, text, Array.emptyLongArray, 13)
        (id, sg.lang_pred, sg.composite, sg.top_bigram_frac,
          sg.dup_line_frac, sg.h)
      }
    }.toDF("doc_id", "lang_pred", "composite", "top_bigram_frac",
      "dup_line_frac", "h")
    val passes = col("lang_pred") === lang &&
      col("composite") >= minComposite &&
      col("top_bigram_frac") <= maxTopBigramFrac &&
      col("dup_line_frac") <= maxDupLineFrac
    val w = org.apache.spark.sql.expressions.Window.partitionBy("h")
    scored
      .withColumn("keeper", min(when(passes, col("doc_id"))).over(w))
      .select(
        col("doc_id"), col("lang_pred"),
        round(col("composite"), 3).as("composite"),
        col("top_bigram_frac"), col("dup_line_frac"),
        when(col("lang_pred") =!= lang, "lang")
          .when(col("composite") < minComposite, "quality")
          .when(col("top_bigram_frac") > maxTopBigramFrac ||
            col("dup_line_frac") > maxDupLineFrac, "repetition")
          .when(col("doc_id") =!= col("keeper"), "duplicate")
          .otherwise("kept").as("verdict"),
        (passes && col("doc_id") === col("keeper")).as("kept"))
  }

  /** Full cascade + benchmark decontamination: language → quality →
    * repetition → CONTAMINATION (13-gram overlap vs a held-out eval
    * set, the C4/GPT-3 protocol — [[graft.dedup.Decontaminate]]) →
    * exact-dedup keeper among clean survivors. The benchmark arrives as
    * a pre-built broadcastable sorted gram-hash array
    * ([[graft.dedup.Decontaminate.benchmarkGramArray]]), so the
    * contamination signal joins the SAME single mapPartitions text pass
    * as every other signal — the cascade stays one corpus scan plus the
    * keeper shuffle. Verdict order is contractual: lang, quality,
    * repetition, contaminated, duplicate, kept.
    */
  def curateDecontaminated(
      docs: Dataset[(Long, String)],
      benchGrams: Array[Long],
      lang: String = "en",
      minComposite: Double = 0.3,
      maxTopBigramFrac: Double = 0.08,
      maxDupLineFrac: Double = 0.3,
      n: Int = 13): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(benchGrams)
    val scored = docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val grams = bc.value
      it.map { case (id, text) =>
        val sg = DocSignals.score(md, text, grams, n)
        (id, sg.lang_pred, sg.composite, sg.top_bigram_frac,
          sg.dup_line_frac, sg.n_hits, sg.h)
      }
    }.toDF("doc_id", "lang_pred", "composite", "top_bigram_frac",
      "dup_line_frac", "n_hits", "h")
    val passes = col("lang_pred") === lang &&
      col("composite") >= minComposite &&
      col("top_bigram_frac") <= maxTopBigramFrac &&
      col("dup_line_frac") <= maxDupLineFrac &&
      col("n_hits") === 0
    val w = org.apache.spark.sql.expressions.Window.partitionBy("h")
    scored
      .withColumn("keeper", min(when(passes, col("doc_id"))).over(w))
      .select(
        col("doc_id"), col("lang_pred"),
        round(col("composite"), 3).as("composite"),
        col("top_bigram_frac"), col("dup_line_frac"), col("n_hits"),
        when(col("lang_pred") =!= lang, "lang")
          .when(col("composite") < minComposite, "quality")
          .when(col("top_bigram_frac") > maxTopBigramFrac ||
            col("dup_line_frac") > maxDupLineFrac, "repetition")
          .when(col("n_hits") > 0, "contaminated")
          .when(col("doc_id") =!= col("keeper"), "duplicate")
          .otherwise("kept").as("verdict"),
        (passes && col("doc_id") === col("keeper")).as("kept"))
  }

  /** Near-dup variant: keeper = the MinHash-LSH cluster representative
    * among survivors (approximate by contract — rows-only in the driver
    * gate; the cluster machinery carries its own spec gates).
    */
  def curateNearDup(
      docs: Dataset[(Long, String)],
      lang: String = "en",
      minComposite: Double = 0.3,
      threshold: Double = 0.8,
      scope: graft.util.CacheScope = new graft.util.CacheScope): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // `scored` is consumed twice (survivors → LSH, and the verdict join)
    // — DELIBERATELY two map-only text passes rather than persisting the
    // corpus: at target scale caching every document's text is the wrong
    // trade, and the scoring pass is cheap next to the LSH stages
    val scored = docs.map { case (id, text) =>
      val (lp, _) = graft.text.LangId.detect(text)
      (id, text, lp, graft.text.Quality.score(text).composite)
    }.toDF("doc_id", "text", "lang_pred", "composite")
    val survivors = scored
      .filter(col("lang_pred") === lang && col("composite") >= minComposite)
      .select("doc_id", "text").as[(Long, String)]
    val clusters = graft.dedup.MinHashLsh
      .nearDuplicateClusters(survivors, threshold, scope = scope)
      .toDF("doc_id", "cluster")
    scored.drop("text")
      .join(clusters, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("lang_pred"),
        round(col("composite"), 3).as("composite"),
        when(col("lang_pred") =!= lang, "lang")
          .when(col("composite") < minComposite, "quality")
          .when(col("doc_id") =!= col("cluster"), "duplicate")
          .otherwise("kept").as("verdict"),
        (col("lang_pred") === lang && col("composite") >= minComposite &&
          col("doc_id") === col("cluster")).as("kept"))
  }
}
