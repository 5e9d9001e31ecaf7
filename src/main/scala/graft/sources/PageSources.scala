package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.PageRow

/** Source adapters for the canonical pages table
  * `(url, warc_ts, html, text, lang)` — S1's "another source format"
  * family. Parquet is the primary format (TESTDATA/Iceberg-shaped);
  * JSON-lines is the interchange format crawl tooling commonly emits
  * (html carried base64 so the binary column survives the text codec);
  * a directory of raw `*.txt` files is the reference's own input
  * (tools/IngestTexts.ingest).
  *
  * All adapters return the same `Dataset[PageRow]`, so every downstream
  * stage (Pipeline, TripleStore, StreamingPipeline) is source-agnostic.
  */
object PageSources {

  def parquet(spark: SparkSession, path: String): Dataset[PageRow] = {
    import spark.implicits._
    spark.read.parquet(path).as[PageRow]
  }

  /** JSON-lines with schema
    * {url, warc_ts (ISO-8601 or epoch-millis long), html_b64, text, lang}.
    */
  def jsonl(spark: SparkSession, path: String): Dataset[PageRow] = {
    import spark.implicits._
    spark.read
      .schema("url STRING, warc_ts TIMESTAMP, html_b64 STRING, text STRING, lang STRING")
      .json(path)
      .select(
        col("url"),
        col("warc_ts"),
        unbase64(coalesce(col("html_b64"), lit(""))).as("html"),
        coalesce(col("text"), lit("")).as("text"),
        coalesce(col("lang"), lit("")).as("lang"))
      .as[PageRow]
  }

  /** Write the symmetric JSON-lines form (round-trips through [[jsonl]]). */
  def writeJsonl(pages: Dataset[PageRow], path: String): Unit =
    pages
      .select(
        col("url"),
        col("warc_ts"),
        base64(col("html")).as("html_b64"),
        col("text"),
        col("lang"))
      .write.mode("overwrite").json(path)

  /** The reference's own input: a directory of raw `*.txt` documents. */
  def textDir(spark: SparkSession, dir: String, limit: Int = 0): Dataset[PageRow] =
    graft.tools.IngestTexts.ingest(spark, dir, limit)
}
