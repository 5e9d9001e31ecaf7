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

  /** (doc_id, n_lines, n_dropped, clean) — one row per input doc.
    *
    * Plan shape: the exploded line stream is cached into `scope` (it
    * feeds both the hot-key aggregation and the final per-doc rollup —
    * without the cache each consumer re-runs the text split pass), the
    * hot-key set joins back as a LEFT join with a marker column, and ONE
    * doc_id aggregation derives n_lines / n_dropped / clean together
    * (`collect_list` skips the nulls the marker condition plants for
    * dropped lines) — the former left-anti + two separate aggregations +
    * re-join needed two more shuffles and a third scan.
    */
  def dropBoilerplate(
      docs: Dataset[(Long, String)],
      minDocs: Int = 2,
      scope: graft.util.CacheScope = new graft.util.CacheScope): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lines = scope.own(docs.flatMap { case (id, text) =>
      text.split("\n", -1).iterator.zipWithIndex.map { case (l, i) =>
        (id, i, l, l.trim)
      }
    }.toDF("doc_id", "idx", "line", "key"))
    val hot = lines.filter(col("key") =!= "")
      .select("doc_id", "key").distinct()
      .groupBy("key").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("key"), lit(true).as("is_hot"))
    lines.join(hot, Seq("key"), "left")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_lines"),
        count(when(col("is_hot"), lit(1))).as("n_dropped"),
        coalesce(
          array_join(
            transform(
              array_sort(collect_list(
                when(col("is_hot").isNull, struct(col("idx"), col("line"))))),
              r => r.getField("line")),
            "\n"),
          lit("")).as("clean"))
      .select("doc_id", "n_lines", "n_dropped", "clean")
  }
}
