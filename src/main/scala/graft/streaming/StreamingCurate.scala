package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Streaming curation: the full batch cascade
  * (`Curate.curateFull` — language → quality → repetition → exact-dedup
  * keeper) as a continuous topology. All quality SIGNALS are map-only
  * and ride the stream unchanged; the only stateful piece is keeper
  * selection, keyed by content MD5 with `flatMapGroupsWithState`:
  * state per key is just the keeper's doc_id (first PASSING doc in
  * (event-time, doc_id) order — identical to the batch window's
  * min-passing-doc_id on corpora whose event time is monotone in
  * doc_id, which makes the operator BATCH-EQUIVALENT on a replayed
  * corpus; StreamingCurateSpec asserts row equality).
  *
  * Output schema == `curateFull`'s: (doc_id, lang_pred, composite,
  * top_bigram_frac, dup_line_frac, verdict, kept) with the same
  * contractual verdict order: lang, quality, repetition,
  * (contaminated, when a benchmark gram set is supplied), duplicate,
  * kept.
  *
  * State bound: one (hash → keeper id) entry per distinct PASSING
  * content hash inside the watermark; event-time timeout evicts idle
  * keys. The documented miss window is the same as StreamingDedup's:
  * a clone arriving later than the watermark after its keeper's last
  * sighting is re-kept, not flagged — the state-bound trade-off.
  */
object StreamingCurate {

  final case class Scored(
      h: String,
      ts: java.sql.Timestamp,
      doc_id: Long,
      lang_pred: String,
      composite: Double,
      top_bigram_frac: Double,
      dup_line_frac: Double,
      clean: Boolean,
      passes: Boolean)

  final case class Verdict(
      doc_id: Long,
      lang_pred: String,
      composite: Double,
      top_bigram_frac: Double,
      dup_line_frac: Double,
      verdict: String,
      kept: Boolean)

  /** The streaming cascade over a DocIn stream. Pass `benchGrams` (a
    * sorted 13-gram hash array from
    * [[graft.dedup.Decontaminate.benchmarkGramArray]]) to add the
    * decontamination stage — the signal rides the SAME map pass via
    * broadcast, exactly like the batch
    * [[graft.pipeline.Curate.curateDecontaminated]]; verdict order then
    * matches that cascade (… repetition, contaminated, duplicate, kept).
    */
  def verdicts(
      docs: Dataset[StreamingDedup.DocIn],
      lang: String = "en",
      minComposite: Double = 0.3,
      maxTopBigramFrac: Double = 0.08,
      maxDupLineFrac: Double = 0.3,
      watermark: String = "1 hour",
      benchGrams: Array[Long] = Array.emptyLongArray,
      n: Int = 13): Dataset[Verdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(benchGrams)
    val scored = docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val grams = bc.value
      it.map { d =>
        // the SAME shared scoring as the batch cascades — the q84
        // stream≡batch oracle holds by construction
        val sg = graft.pipeline.DocSignals.score(md, d.text, grams, n)
        val clean = sg.n_hits == 0
        Scored(sg.h, d.ts, d.doc_id, sg.lang_pred, sg.composite,
          sg.top_bigram_frac, sg.dup_line_frac, clean,
          sg.lang_pred == lang && sg.composite >= minComposite &&
            sg.top_bigram_frac <= maxTopBigramFrac &&
            sg.dup_line_frac <= maxDupLineFrac && clean)
      }
    }
    scored
      .withWatermark("ts", watermark)
      .groupByKey(_.h)
      .flatMapGroupsWithState[Long, Verdict](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[Scored], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // deterministic order within the micro-batch: a batch's rows
            // see the keeper exactly as the batch window would
            val sorted = rows.toVector.sortBy(r => (r.ts.getTime, r.doc_id))
            var keeper = state.getOption.getOrElse(-1L)
            var maxTs = Long.MinValue
            val out = sorted.map { r =>
              val verdict =
                if (r.lang_pred != lang) "lang"
                else if (r.composite < minComposite) "quality"
                else if (r.top_bigram_frac > maxTopBigramFrac ||
                  r.dup_line_frac > maxDupLineFrac) "repetition"
                else if (!r.clean) "contaminated"
                else if (keeper >= 0L && keeper != r.doc_id) "duplicate"
                else { keeper = r.doc_id; "kept" }
              if (r.ts.getTime > maxTs) maxTs = r.ts.getTime
              // composite arrives pre-rounded to 3 decimals from
              // Quality.score (r3), matching curateFull's output exactly
              Verdict(r.doc_id, r.lang_pred, r.composite,
                r.top_bigram_frac, r.dup_line_frac,
                verdict, verdict == "kept")
            }
            if (keeper >= 0L) state.update(keeper)
            if (maxTs != Long.MinValue) state.setTimeoutTimestamp(maxTs, watermark)
            out.iterator
          }
      }
  }

  /** PRODUCTION topology: drain `dir` through the cascade, write
    * per-batch verdicts to a parquet table (idempotent per-batch
    * partition overwrite — the StreamingDedup.run sink contract).
    */
  def run(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      name: String,
      outDir: String,
      lang: String = "en",
      minComposite: Double = 0.3,
      checkpoint: Option[String] = None,
      watermark: String = "1 hour",
      benchGrams: Array[Long] = Array.emptyLongArray): Unit = {
    import spark.implicits._
    spark.streams.active.filter(_.name == name).foreach(_.stop())
    val docs = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[StreamingDedup.DocIn].schema)
      .parquet(dir).as[StreamingDedup.DocIn]
    val writer = verdicts(docs, lang, minComposite, watermark = watermark,
        benchGrams = benchGrams)
      .writeStream
      .queryName(name)
      .foreachBatch { (batch: Dataset[Verdict], batchId: Long) =>
        batch.toDF().write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        ()
      }
      .trigger(Trigger.AvailableNow())
    checkpoint.foreach(c => writer.option("checkpointLocation", c))
    // timeout branch emits nothing -> the no-data finalization batch is a
    // pure state-store pass; skip it for this drain (see StreamRun)
    StreamRun.withoutNoDataBatches(spark) {
      val q = writer.start()
      q.awaitTermination()
    }
  }
}
