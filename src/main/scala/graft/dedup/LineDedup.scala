package graft.dedup

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Cross-document LINE-level boilerplate removal — the Dolma/CCNet
  * paragraph-dedup shape, complementing `Repetition.dup_line_frac`
  * (which is within-doc): a trimmed, non-empty line occurring in at
  * least `minDocs` DISTINCT documents (nav bars, cookie banners,
  * footers mirrored across a site) is boilerplate and is dropped from
  * every document; whitespace-only lines are structure, not content,
  * and always survive. Cleaned text preserves the surviving lines in
  * original order, joined with \n.
  *
  * Scale shape: explode (trim-key, doc) → per-doc distinct → count per
  * key → the hot-key set joins back as a LEFT ANTI on the line stream.
  * Shuffles carry line keys, never documents; the trim key is Java
  * `String.trim` (codepoints ≤ U+0020), mirrored in SQL by the
  * equivalent RE2 class so the q88 oracle is value-level.
  */
object LineDedup {

  /** (doc_id, n_lines, n_dropped, clean) — one row per input doc. */
  def dropBoilerplate(
      docs: Dataset[(Long, String)],
      minDocs: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lines = docs.flatMap { case (id, text) =>
      text.split("\n", -1).iterator.zipWithIndex.map { case (l, i) =>
        (id, i, l, l.trim)
      }.toSeq
    }.toDF("doc_id", "idx", "line", "key")
    val hot = lines.filter(col("key") =!= "")
      .select("doc_id", "key").distinct()
      .groupBy("key").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("key")
    val kept = lines.join(hot, Seq("key"), "left_anti")
    val keptAgg = kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_kept"),
      array_join(
        transform(
          array_sort(collect_list(struct(col("idx"), col("line")))),
          r => r.getField("line")),
        "\n").as("clean"))
    lines.groupBy("doc_id").agg(count(lit(1)).as("n_lines"))
      .join(keptAgg, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
        coalesce(col("clean"), lit("")).as("clean"))
  }
}
