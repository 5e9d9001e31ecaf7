package graft.io

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.Triple

/** The reference's export sinks (S6–S8, batch_pipeline.py:393-803)
  * re-expressed as DataFrame transforms; callers pick the writer
  * (`.write.text/csv/json`). All are narrow (no shuffle) except the
  * aggregating ones, which shuffle exactly once on their group key.
  */
object Exports {

  import org.apache.spark.sql.SparkSession

  private def df(triples: Dataset[Triple]): DataFrame = triples.toDF()

  /** Custom line-per-triple TTL (rdfify_improved.py:944-981). The
    * rdf:type / participates_in / frame→frame filters (P5) are already
    * applied structurally — the emitter never materializes those triples.
    */
  def customTtl(triples: Dataset[Triple]): DataFrame = {
    val spark = triples.sparkSession
    import spark.implicits._
    triples.map(_.ttlLine).toDF("line")
  }

  /** SPARQL-ish queryable TTL (batch_pipeline.py:687-712). The reference
    * formats from triples RE-PARSED out of the custom TTL, so subjects are
    * always bracketed and objects always quoted — URIs included (verified
    * against golden `*_queryable.ttl`; see QueryableTtlParitySpec).
    */
  def queryableTtl(triples: Dataset[Triple]): DataFrame =
    df(triples).select(
      concat(
        lit("<"), col("subj"), lit("> <"),
        concat(col("frame"), lit(":"), col("pred")), lit("> \""),
        col("obj"), lit("\" .")).as("line"))

  /** P6: re-parse a custom-TTL line into (subject, predicate, object) —
    * port of `_parse_custom_rdf_triples` (batch_pipeline.py:462-507),
    * including its behavior on multi-word literal subjects (the first
    * whitespace token becomes the subject). Returns None for comments,
    * blanks, and sub-3-token lines.
    */
  def parseCustomTtlLine(line0: String): Option[(String, String, String)] = {
    val line = graft.util.PyStr.strip(line0)
    if (line.isEmpty || line.startsWith("@") || line.startsWith("#")) return None
    val noTail = line.replaceAll("[;.]$", "")
    val parts = graft.util.PyStr.split(noTail)
    if (parts.length < 3) return None
    def stripQuotes(s: String) = s.replaceAll("^[\"']+|[\"']+$", "")
    Some((
      stripQuotes(parts(0)),
      stripQuotes(parts(1)),
      stripQuotes(parts.drop(2).mkString(" "))))
  }

  /** Queryable-TTL line from a re-parsed triple (batch_pipeline.py:700-712). */
  def queryableLineFromParsed(s: String, p: String, o: String): String = {
    val subj = if (s.startsWith("<")) s else s"<$s>"
    val pred = if (p.startsWith("<")) p else s"<$p>"
    val obj = if (o.startsWith("<") || o.startsWith("\"")) o else "\"" + o + "\""
    s"$subj $pred $obj ."
  }

  /** Enriched triples CSV shape (batch_pipeline.py:462-507,668-685):
    * defaults confidence 0.9, source_sentence "Unknown", extractable true.
    */
  def triplesCsv(triples: Dataset[Triple]): DataFrame =
    df(triples).select(
      col("subj").as("subject"),
      concat(col("frame"), lit(":"), col("pred")).as("predicate"),
      col("obj").as("object"),
      lit(0.9).as("confidence"),
      lit("Unknown").as("source_sentence"),
      lit(true).as("extractable"))

  /** Graph edges CSV (batch_pipeline.py:621-643): Source, Target, Label
    * (base predicate, underscores → spaces, '#' dropped, truncated to 20
    * chars with "..." — batch_pipeline.py:1034-1042), Frame (prefix before
    * ':'). Verified golden-exact in QueryableTtlParitySpec.
    */
  def edgesCsv(triples: Dataset[Triple]): DataFrame = {
    val label0 = regexp_replace(regexp_replace(col("pred"), "_", " "), "#", "")
    val label = when(length(label0) > 20,
      concat(substring(label0, 1, 17), lit("..."))).otherwise(label0)
    df(triples).select(
      cleanNodeName(col("subj")).as("Source"),
      cleanNodeName(col("obj")).as("Target"),
      label.as("Label"),
      col("frame").as("Frame"))
  }

  /** batch_pipeline.py:997-1006 — quotes stripped; non-URIs lose brackets. */
  def cleanNodeName(c: org.apache.spark.sql.Column) = {
    val stripped = regexp_replace(c, "^[\"']+|[\"']+$", "")
    when(stripped.startsWith("http://") || stripped.startsWith("https://"), stripped)
      .otherwise(regexp_replace(stripped, "[<>{}\\[\\]()]", ""))
  }

  /** Predicate histogram (A3, batch_pipeline.py:602-619). */
  def predicateHistogram(triples: Dataset[Triple]): DataFrame =
    df(triples)
      .groupBy(concat(col("frame"), lit(":"), col("pred")).as("predicate"))
      .agg(count(lit(1)).as("n"))

  /** Entity index (A4, batch_pipeline.py:581-600): distinct union of
    * subjects and objects. At 10^12-doc scale prefer
    * `approx_count_distinct` for the cardinality; the index itself stays
    * exact (it is the dimension table of the KG).
    */
  def entityIndex(triples: Dataset[Triple]): DataFrame = {
    val t = df(triples)
    t.select(col("subj").as("entity"))
      .union(t.select(col("obj").as("entity")))
      .distinct()
  }

  /** Node degree + top-k (A8/W3, visualization/simple_graph_generator.py:55-60). */
  def nodeDegree(triples: Dataset[Triple]): DataFrame = {
    val t = df(triples)
    t.select(col("subj").as("node"))
      .union(t.select(col("obj").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
  }

  def topKByDegree(triples: Dataset[Triple], k: Int = 30): DataFrame =
    nodeDegree(triples).orderBy(col("degree").desc, col("node")).limit(k)

  /** RAG-JSON shape (batch_pipeline.py:520-550): one JSON doc per document
    * with its triples nested — `collect_list` of structs, rendered by
    * `to_json` at write time.
    */
  def ragJson(triples: Dataset[Triple]): DataFrame =
    df(triples)
      .groupBy(col("docId"))
      .agg(
        count(lit(1)).as("total_triples"),
        collect_list(struct(
          col("subj").as("subject"),
          concat(col("frame"), lit(":"), col("pred")).as("predicate"),
          col("obj").as("object"))).as("triples"))
      .select(col("docId"), to_json(struct(col("total_triples"), col("triples"))).as("json"))
}
