package graft.text

/** F3: sentence-boundary truncation — port of
  * data_collection/reduce_author_contents.py:12-32. Cuts at the last
  * `.`/`!`/`?` inside the limit when that boundary lies past 80% of it,
  * else hard-cuts to (max−3) chars plus an ASCII ellipsis.
  */
object Truncate {

  def toSentenceBoundary(text: String, maxChars: Int = 2000): String = {
    if (text.length <= maxChars) return text
    val truncated = text.substring(0, maxChars)
    val lastSentenceEnd = math.max(
      truncated.lastIndexOf('.'),
      math.max(truncated.lastIndexOf('!'), truncated.lastIndexOf('?')))
    if (lastSentenceEnd > maxChars * 0.8) text.substring(0, lastSentenceEnd + 1)
    else text.substring(0, maxChars - 3) + "..."
  }

  /** A11: corpus reduction summary (reduce_author_contents.py:98-110) —
    * same fields as the reference's `reduction_summary.json` header.
    * One pass over the corpus. Rounding is half-up (Python's banker's
    * rounding differs only when the double lands exactly on a .x5
    * boundary, which the ratio arithmetic here essentially never
    * produces — and half-up is mirrorable across engines).
    */
  def reductionSummary(
      docs: org.apache.spark.sql.Dataset[(Long, String)],
      maxChars: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = docs.sparkSession
    import spark.implicits._
    docs.map { case (_, text) =>
      (text.length, toSentenceBoundary(text, maxChars).length,
        if (text.length > maxChars) 1 else 0)
    }
      .toDF("orig", "fin", "trunc")
      .agg(
        count(lit(1)).as("total_files"),
        sum("orig").as("total_original_chars"),
        sum("fin").as("total_final_chars"),
        round((lit(1.0) - sum("fin") / sum("orig")) * 100, 1)
          .as("total_reduction_percent"),
        sum("trunc").as("files_truncated"),
        (count(lit(1)) - sum("trunc")).as("files_kept_original"))
  }
}
