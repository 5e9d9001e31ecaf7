package graft.canon

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew handling for head entities (SURVEY.md §2.3/§4.2).
  *
  * AQE's skew-join split covers joins; for heavily skewed *aggregations*
  * (e.g. per-entity statistics where wiki/Americans holds a large share of
  * rows) the classic two-phase salted aggregate bounds any single task:
  * phase 1 aggregates on (key, salt), phase 2 merges the ≤`salts` partials
  * per key. Results are identical to the direct aggregation.
  */
object Skew {

  /** Salted count-by-key: == df.groupBy(key).count() but skew-proof. */
  def saltedCount(df: DataFrame, key: String, salts: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum("_partial").as("n"))

  /** Salted sum of a numeric column by key. */
  def saltedSum(df: DataFrame, key: String, value: String, salts: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(value)).as("_partial"))
      .groupBy(col(key))
      .agg(sum("_partial").as("total"))
}
