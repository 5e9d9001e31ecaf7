package graft.metrics

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.Triple

/** The reference's evaluation-side aggregations (A1–A7, SURVEY.md §2.4) as
  * single-pass DataFrame aggregates.
  */
object Aggregates {

  /** A1: frames per doc — here triples per doc per frame. */
  def framesPerDoc(triples: Dataset[Triple]): DataFrame =
    triples.toDF().groupBy("docId")
      .agg(countDistinct("frame").as("n_frames"), count(lit(1)).as("n_triples"))

  /** A5: evaluation summary (triple_evaluator_fast.py:252-275) over an
    * enriched frame: (docId, confidence, extractable).
    */
  def evalSummary(enriched: DataFrame): DataFrame =
    enriched.agg(
      count(lit(1)).as("total_triples"),
      sum(when(col("extractable"), 1).otherwise(0)).as("extractable_triples"),
      round(avg(when(col("extractable"), 1.0).otherwise(0.0)), 4).as("accuracy"),
      round(avg("confidence"), 4).as("avg_confidence"),
      sum(when(col("confidence") >= 0.5, 1).otherwise(0)).as("high_confidence_50"),
      sum(when(col("confidence") >= 0.8, 1).otherwise(0)).as("high_confidence_80"))

  /** A6: per-document metrics (accuracy_calculator.py:28-74) — note the
    * reference uses *sample* stdev (statistics.stdev) → stddev_samp.
    */
  def perDocMetrics(enriched: DataFrame): DataFrame = {
    // stddev over a single point is undefined (the reference's
    // statistics.stdev raises); Spark yields NaN there — report null
    val sd = stddev_samp(when(col("extractable"), col("confidence")))
    enriched.groupBy("docId").agg(
      count(lit(1)).as("total_triples"),
      round(avg(when(col("extractable"), 1.0).otherwise(0.0)), 4).as("extraction_rate"),
      round(avg(when(col("extractable"), col("confidence"))), 4).as("mean_confidence"),
      when(isnan(sd), lit(null)).otherwise(round(sd, 4)).as("sd_confidence"),
      sum(when(col("confidence") >= 0.8, 1).otherwise(0)).as("bucket_high"),
      sum(when(col("confidence") >= 0.5 && col("confidence") < 0.8, 1).otherwise(0)).as("bucket_mid"),
      sum(when(col("confidence") < 0.5, 1).otherwise(0)).as("bucket_low"))
  }

  /** A7: corpus rollup (accuracy_calculator.py:76-115). */
  def corpusRollup(perDoc: DataFrame): DataFrame =
    perDoc.agg(
      count(lit(1)).as("n_docs"),
      sum("total_triples").as("total_triples"),
      round(avg("extraction_rate"), 4).as("mean_extraction_rate"),
      round(stddev_samp("extraction_rate"), 4).as("sd_extraction_rate"),
      // docId as secondary orderer: deterministic under rate ties (a bare
      // max_by picks an arbitrary doc among tied rates)
      max_by(col("docId"), struct(col("extraction_rate"), col("docId"))).as("best_doc"),
      min_by(col("docId"), struct(col("extraction_rate"), col("docId"))).as("worst_doc"))
}
