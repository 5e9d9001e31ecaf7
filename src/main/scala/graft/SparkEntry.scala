package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.pipeline.{Pipeline, SynthCorpus}

/** Driver contract: one entry per implemented operator family (SURVEY.md §2),
  * each with a DuckDB-equivalent oracle where the semantics are ANSI-SQL
  * expressible; KG-pipeline operators run on the deterministic synthetic
  * corpus and are checked rows-only (their real correctness gate is the
  * golden parity suite, ParitySpec).
  *
  * Conventions for oracle parity: aggregates are rounded on BOTH sides,
  * floating aggregations avoid order-dependence, every computed column is
  * aliased identically in Spark and SQL.
  */
object SparkEntry {

  private def t(dir: String, name: String) = s"$dir/$name.parquet"

  /** Flagship: KG construction on the synthetic corpus. */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Pipeline.triples(SynthCorpus.pages(spark, 100)).toDF()
  }

  // ----------------------------------------------------------------
  // helpers shared by a few queries
  // ----------------------------------------------------------------

  private def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------- aggregations (SURVEY §2.4) ----------
    "q01_agg" -> ((s, d) => {
      s.read.parquet(t(d, "lineitem"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("n"))
    }),
    "q09_stats" -> ((s, d) => {
      s.read.parquet(t(d, "orders"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          round(avg("o_totalprice"), 2).as("avg_price"),
          round(stddev_samp("o_totalprice"), 2).as("sd_price"))
    }),
    "q10_histogram" -> ((s, d) => {
      s.read.parquet(t(d, "events")).groupBy("event_type")
        .agg(count(lit(1)).as("n"))
    }),
    "q12_conditional" -> ((s, d) => {
      s.read.parquet(t(d, "events"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("value") >= 0.5, 1).otherwise(0)).as("n_high"),
          round(avg("value"), 3).as("avg_value"))
    }),

    // ---------- filters / projections (§2.2) ----------
    "q02_filter" -> ((s, d) => {
      s.read.parquet(t(d, "lineitem"))
        .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
          col("l_quantity") > 30)
        .select(
          col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net"))
    }),

    // ---------- joins (§2.3) ----------
    "q03_join_broadcast" -> ((s, d) => {
      val orders = s.read.parquet(t(d, "orders"))
      val cust = s.read.parquet(t(d, "customer"))
      orders.join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 1).as("rev"))
    }),
    "q04_join3" -> ((s, d) => {
      val li = s.read.parquet(t(d, "lineitem"))
      val o = s.read.parquet(t(d, "orders"))
      val c = s.read.parquet(t(d, "customer"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))
    }),
    "q11_anti_join" -> ((s, d) => {
      val cust = s.read.parquet(t(d, "customer"))
      val orders = s.read.parquet(t(d, "orders"))
      val big = orders.filter(col("o_totalprice") > 150000)
      cust.join(big, cust("c_custkey") === big("o_custkey"), "left_anti")
        .select("c_custkey")
    }),

    // ---------- windows (§2.5) ----------
    "q05_window_running" -> ((s, d) => {
      val w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      s.read.parquet(t(d, "lineitem"))
        .filter(col("l_orderkey") < 100)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          sum("l_quantity").over(w).as("run_qty"))
    }),
    "q06_window_rank" -> ((s, d) => {
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate").desc, col("l_orderkey"), col("l_linenumber"))
      s.read.parquet(t(d, "lineitem"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("l_suppkey", "l_orderkey", "l_linenumber")
    }),

    // ---------- sorts / top-k (§2.6) ----------
    "q07_topk" -> ((s, d) => {
      s.read.parquet(t(d, "lineitem"))
        .groupBy("l_partkey").agg(sum("l_quantity").as("qty"))
        .orderBy(col("qty").desc, col("l_partkey"))
        .limit(30)
    }),

    // ---------- set ops (§2.7) ----------
    "q08_setops" -> ((s, d) => {
      val o = s.read.parquet(t(d, "orders")).select(col("o_custkey").as("k"))
      val c = s.read.parquet(t(d, "customer")).select(col("c_custkey").as("k"))
      o.union(c).distinct()
    }),

    "q47_except" -> ((s, d) => {
      val o = s.read.parquet(t(d, "orders"))
      val all = o.select(col("o_custkey").as("k")).distinct()
      val big = o.filter(col("o_totalprice") > 200000)
        .select(col("o_custkey").as("k")).distinct()
      all.except(big)
    }),
    "q48_rollup" -> ((s, d) => {
      s.read.parquet(t(d, "orders"))
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"))
    }),

    // ---------- scalar functions (§2.8) ----------
    "q13_strings" -> ((s, d) => {
      s.read.parquet(t(d, "documents"))
        .select(
          col("doc_id"),
          length(col("text")).as("text_len"),
          upper(substring(col("text"), 1, 10)).as("head10"),
          regexp_replace(col("source"), "src", "source_").as("src_norm"))
    }),
    "q14_dates" -> ((s, d) => {
      s.read.parquet(t(d, "orders"))
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 1).as("rev"))
    }),
    "q15_categorize" -> ((s, d) => {
      s.read.parquet(t(d, "documents"))
        .select(
          col("doc_id"),
          when(col("text").contains("join"), "join_related")
            .when(col("text").contains("agg"), "agg_related")
            .when(col("text").contains("scan"), "scan_related")
            .otherwise("other").as("category"))
    }),
    "q16_doc_len" -> ((s, d) => {
      s.read.parquet(t(d, "documents"))
        .select(col("doc_id"), length(col("text")).as("text_len"), col("n_chars"))
    }),

    // ---------- KG pipeline operators (rows-only; gated by ParitySpec) ----------
    "q17_kg_triples" -> ((s, _) => {
      import s.implicits._
      Pipeline.triples(SynthCorpus.pages(s, 200)).toDF()
        .select("docId", "subj", "frame", "pred", "obj", "subjIsUri", "objIsUri")
    }),
    "q18_kg_entities" -> ((s, _) => {
      import s.implicits._
      SynthCorpus.pages(s, 200).flatMap { p =>
        graft.link.EntityLink.link(p.url, p.text, graft.link.AliasDict.default)
      }.toDF()
    }),
    "q19_kg_frames" -> ((s, _) => {
      import s.implicits._
      SynthCorpus.pages(s, 200).flatMap { p =>
        val sents = graft.extract.Segmenter.sentences(p.text)
        graft.frames.FrameDetect.detectDoc(sents).flatMap(sen =>
          sen.frames.map(f => (p.url, sen.index, f.name, f.elements.size)))
      }.toDF("url", "sent_idx", "frame", "n_elements")
    }),
    "q20_kg_ttl" -> ((s, _) => {
      import s.implicits._
      Pipeline.triples(SynthCorpus.pages(s, 200)).map(_.ttlLine).toDF("ttl_line")
    }),

    // ---------- dedup suite ----------
    "q21_dedup_exact" -> ((s, d) => {
      s.read.parquet(t(d, "documents"))
        .groupBy(md5(col("text")).as("h"))
        .agg(count(lit(1)).as("n"), min("doc_id").as("keeper"))
    }),
    "q22_dedup_norm" -> ((s, d) => {
      s.read.parquet(t(d, "documents"))
        .groupBy(md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("h"))
        .agg(count(lit(1)).as("n"), min("doc_id").as("keeper"))
    }),
    "q23_minhash_lsh" -> ((s, d) => {
      import s.implicits._
      graft.dedup.MinHashLsh.bands(s.read.parquet(t(d, "documents"))
        .select("doc_id", "text").as[(Long, String)]).toDF()
    }),
    "q24_simhash" -> ((s, d) => {
      // native Expression with doGenCode — stays in whole-stage codegen,
      // unlike the Dataset.map/UDF formulation
      graft.expr.SimHash64Expr.register(s)
      s.read.parquet(t(d, "documents"))
        .selectExpr("doc_id", "simhash64(text) AS simhash")
    }),

    // ---------- text analysis ----------
    "q49_near_dup_pairs" -> ((s, d) => {
      import s.implicits._
      val docs = s.read.parquet(t(d, "documents"))
        .select("doc_id", "text").as[(Long, String)]
      graft.dedup.MinHashLsh.nearDuplicatePairs(docs, threshold = 0.5)
        .toDF("a", "b", "jaccard")
        .withColumn("jaccard", round(col("jaccard"), 4))
    }),

    "q50_quality_score" -> ((s, d) => {
      import s.implicits._
      s.read.parquet(t(d, "documents")).select("doc_id", "text").as[(Long, String)]
        .map { case (id, text) =>
          val q = graft.text.Quality.score(text)
          (id, q.n_tokens, q.mean_token_len, q.stopword_ratio, q.punct_ratio,
            q.digit_ratio, q.composite)
        }
        .toDF("doc_id", "n_tokens", "mean_token_len", "stopword_ratio",
          "punct_ratio", "digit_ratio", "composite")
    }),
    "q51_bpe_tokens" -> ((s, d) => {
      import s.implicits._
      s.read.parquet(t(d, "documents")).select("doc_id", "text").as[(Long, String)]
        .map { case (id, text) => (id, graft.text.Quality.bpeIshTokenCount(text)) }
        .toDF("doc_id", "n_pieces")
    }),

    "q25_token_count" -> ((s, d) => {
      s.read.parquet(t(d, "documents"))
        .select(
          col("doc_id"),
          size(split(trim(col("text")), "\\s+")).as("n_tokens"))
    }),
    "q26_quality" -> ((s, d) => {
      val tokens = size(split(trim(col("text")), "\\s+"))
      s.read.parquet(t(d, "documents"))
        .select(
          col("doc_id"),
          tokens.as("n_tokens"),
          round(
            (length(col("text")) - tokens + 1).cast("double") / tokens, 3)
            .as("avg_token_len"))
    }),
    "q27_langid" -> ((s, d) => {
      import s.implicits._
      s.read.parquet(t(d, "documents")).select("doc_id", "text").as[(Long, String)]
        .map { case (id, text) =>
          val (lang, score) = graft.text.LangId.detect(text)
          (id, lang, score)
        }.toDF("doc_id", "lang_pred", "score")
    }),
    "q28_fingerprint" -> ((s, d) => {
      import s.implicits._
      s.read.parquet(t(d, "documents")).select("doc_id", "text").as[(Long, String)]
        .map { case (id, text) => (id, graft.text.Fingerprint.rolling64(text)) }
        .toDF("doc_id", "fingerprint")
    }),

    // ---------- embeddings / similarity ----------
    "q29_embed_norm" -> ((s, d) => {
      s.read.parquet(t(d, "embeddings"))
        .select(
          col("vec_id"),
          round(sqrt(dotD(col("embedding"), col("embedding"))), 4).as("l2"))
    }),
    "q30_cosine_knn" -> ((s, d) => {
      val e = s.read.parquet(t(d, "embeddings"))
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val sims = q.crossJoin(broadcast(e.select(col("vec_id").as("nid"), col("embedding").as("nv"))))
        .filter(col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"), round(dotD(col("qv"), col("nv")), 5).as("sim"))
      val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
      sims.withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
        .select("qid", "nid", "sim", "rk")
    }),

    // ---------- graph: connected components + degree ----------
    "q32_connected_components" -> ((s, d) => {
      val edges = s.read.parquet(t(d, "lineitem"))
        .filter(col("l_orderkey") < 300)
        .select(
          concat(lit("o"), col("l_orderkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
        .distinct()
      graft.canon.Canonicalize.connectedComponents(edges)
    }),
    "q33_degree_topk" -> ((s, d) => {
      val edges = s.read.parquet(t(d, "lineitem"))
        .filter(col("l_orderkey") < 300)
        .select(
          concat(lit("o"), col("l_orderkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
        .distinct()
      edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node")))
        .groupBy("node").agg(count(lit(1)).as("degree"))
        .orderBy(col("degree").desc, col("node"))
        .limit(30)
    }),

    // ---------- typed literals (F6) ----------
    "q34_typed_literals" -> ((s, d) => {
      s.read.parquet(t(d, "documents"))
        .select(
          col("doc_id"),
          col("n_chars").cast("string").as("v"),
          graft.rdf.Literals.xsdTypeOf(col("n_chars").cast("string")).as("xsd_type"))
    }),

    // ---------- per-group stats (A6 analogue) ----------
    "q35_source_metrics" -> ((s, d) => {
      s.read.parquet(t(d, "documents"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n"),
          round(avg("n_chars"), 3).as("avg_chars"),
          round(stddev_samp("n_chars"), 3).as("sd_chars"),
          sum(when(col("n_chars") >= 400, 1).otherwise(0)).as("bucket_high"),
          sum(when(col("n_chars") >= 200 && col("n_chars") < 400, 1).otherwise(0)).as("bucket_mid"),
          sum(when(col("n_chars") < 200, 1).otherwise(0)).as("bucket_low"))
    }),

    // ---------- skew: salted two-phase aggregation ----------
    "q36_salted_count" -> ((s, d) => {
      graft.canon.Skew.saltedCount(
        s.read.parquet(t(d, "lineitem")), "l_partkey", salts = 16)
    }),

    // ---------- exports + canonicalization over the KG (rows-only) ----------
    "q37_edges_export" -> ((s, _) => {
      import s.implicits._
      graft.io.Exports.edgesCsv(Pipeline.triples(SynthCorpus.pages(s, 200)))
    }),
    "q38_predicate_histogram" -> ((s, _) => {
      import s.implicits._
      graft.io.Exports.predicateHistogram(Pipeline.triples(SynthCorpus.pages(s, 200)))
    }),
    "q39_canonicalized" -> ((s, _) => {
      import s.implicits._
      val pages = SynthCorpus.pages(s, 200)
      val triples = Pipeline.triples(pages)
      val mentionUri = pages.flatMap { p =>
        graft.link.EntityLink.link(p.url, p.text, graft.link.AliasDict.default)
      }.toDF().select("mention", "uri")
      graft.canon.Canonicalize.canonicalize(triples, mentionUri).toDF()
    }),
    "q40_rag_json" -> ((s, _) => {
      import s.implicits._
      graft.io.Exports.ragJson(Pipeline.triples(SynthCorpus.pages(s, 200)))
    }),

    // ---------- multimodal binary columns (decode stubbed) ----------
    "q41_multimodal" -> ((s, d) => {
      import s.implicits._
      val media = s.read.parquet(t(d, "documents"))
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
      graft.multimodal.BinaryFeatures.extract(media).toDF()
    }),

    // ---------- evaluation aggregates (A5–A7) over enriched triples ----------
    "q43_eval_metrics" -> ((s, _) => {
      import org.apache.spark.sql.functions.{col, pmod, xxhash64, lit, round => rnd}
      import s.implicits._
      // deterministic pseudo-confidence per triple (no LLM judge available)
      val enriched = Pipeline.triples(SynthCorpus.pages(s, 200)).toDF()
        .withColumn("confidence",
          rnd(pmod(xxhash64(col("subj"), col("pred"), col("obj")), lit(1000)) / 1000.0, 3))
        .withColumn("extractable", col("confidence") >= 0.3)
      graft.metrics.Aggregates.perDocMetrics(enriched)
    }),
    "q44_eval_rollup" -> ((s, _) => {
      import org.apache.spark.sql.functions.{col, pmod, xxhash64, lit, round => rnd}
      import s.implicits._
      val enriched = Pipeline.triples(SynthCorpus.pages(s, 200)).toDF()
        .withColumn("confidence",
          rnd(pmod(xxhash64(col("subj"), col("pred"), col("obj")), lit(1000)) / 1000.0, 3))
        .withColumn("extractable", col("confidence") >= 0.3)
      graft.metrics.Aggregates.corpusRollup(
        graft.metrics.Aggregates.perDocMetrics(enriched))
    }),

    "q42_ann_lsh" -> ((s, d) => {
      import s.implicits._
      val vecs = s.read.parquet(t(d, "embeddings"))
        .select("vec_id", "embedding").as[(Long, Array[Float])]
      graft.similarity.Ann.lshTopK(vecs, k = 5, tables = 8, bits = 8)
    }),
    "q52_ann_ivf" -> ((s, d) => {
      import s.implicits._
      val vecs = s.read.parquet(t(d, "embeddings"))
        .select("vec_id", "embedding").as[(Long, Array[Float])]
      graft.similarity.Ann.ivfTopK(vecs, k = 5, nlist = 64, nprobe = 8)
    }),

    // A4 at scale: approximate distinct alongside exact (rows-only — HLL
    // estimates are engine-specific so no cross-engine oracle exists)
    "q46_approx_distinct" -> ((s, d) => {
      s.read.parquet(t(d, "lineitem"))
        .agg(
          countDistinct("l_partkey").as("exact_parts"),
          approx_count_distinct("l_partkey", 0.01).as("approx_parts"))
    }),

    // streaming KG construction end-to-end (rows-only): pages parquet →
    // readStream → per-doc transform → watermark dedup → memory sink
    "q45_stream_triples" -> ((s, _) => {
      import s.implicits._
      val dir = new java.io.File(
        System.getProperty("java.io.tmpdir"), "graft_q45_pages")
      SynthCorpus.pages(s, 50, seed = 9L)
        .write.mode("overwrite").parquet(dir.toString)
      graft.streaming.StreamingPipeline.runOnce(s, dir.toString, "q45_out")
    }),

    // ---------- streaming (§2.10) ----------
    "q31_stream_window" -> ((s, d) => {
      val schema = s.read.parquet(t(d, "events")).schema
      val name = "q31_stream_out"
      s.streams.active.filter(_.name == name).foreach(_.stop())
      // file-stream source wants a directory: stream the sf dir, globbed
      val stream = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
        .groupBy(
          window(col("ts"), "1 hour").getField("start").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 3).as("sum_value"))
      val query = stream.writeStream.outputMode("complete")
        .format("memory").queryName(name).start()
      query.processAllAvailable()
      query.stop()
      s.table(name)
    }))

  def oracleSql: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_price,
        | round(avg(l_discount), 4) AS avg_disc, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q09_stats" ->
      """SELECT o_orderpriority, count(*) AS n,
        | round(avg(o_totalprice), 2) AS avg_price,
        | round(stddev_samp(o_totalprice), 2) AS sd_price
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q10_histogram" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
    "q12_conditional" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CASE WHEN value >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        | round(avg(value), 3) AS avg_value
        |FROM events GROUP BY event_type""".stripMargin,
    "q02_filter" ->
      """SELECT l_orderkey, l_partkey, l_linenumber,
        | l_extendedprice * (1 - l_discount) AS net
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity > 30""".stripMargin,
    "q03_join_broadcast" ->
      """SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice), 1) AS rev
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q04_join3" ->
      """SELECT c_mktsegment, count(*) AS n, sum(l_quantity) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q11_anti_join" ->
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 150000)""".stripMargin,
    "q05_window_running" ->
      """SELECT l_orderkey, l_linenumber,
        | sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_qty
        |FROM lineitem WHERE l_orderkey < 100""".stripMargin,
    "q06_window_rank" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber FROM (
        | SELECT l_suppkey, l_orderkey, l_linenumber,
        |  row_number() OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate DESC, l_orderkey, l_linenumber) AS rn
        | FROM lineitem) WHERE rn = 1""".stripMargin,
    "q07_topk" ->
      """SELECT l_partkey, sum(l_quantity) AS qty FROM lineitem
        |GROUP BY l_partkey ORDER BY qty DESC, l_partkey LIMIT 30""".stripMargin,
    "q08_setops" ->
      "SELECT o_custkey AS k FROM orders UNION SELECT c_custkey AS k FROM customer",
    "q47_except" ->
      """SELECT DISTINCT o_custkey AS k FROM orders
        |EXCEPT
        |SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 200000""".stripMargin,
    "q48_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority, count(*) AS n
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "q13_strings" ->
      """SELECT doc_id, length(text) AS text_len,
        | upper(substr(text, 1, 10)) AS head10,
        | regexp_replace(source, 'src', 'source_') AS src_norm
        |FROM documents""".stripMargin,
    "q14_dates" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        | count(*) AS n, round(sum(o_totalprice), 1) AS rev
        |FROM orders GROUP BY 1""".stripMargin,
    "q15_categorize" ->
      """SELECT doc_id,
        | CASE WHEN text LIKE '%join%' THEN 'join_related'
        |      WHEN text LIKE '%agg%' THEN 'agg_related'
        |      WHEN text LIKE '%scan%' THEN 'scan_related'
        |      ELSE 'other' END AS category
        |FROM documents""".stripMargin,
    "q16_doc_len" ->
      "SELECT doc_id, length(text) AS text_len, n_chars FROM documents",
    "q21_dedup_exact" ->
      """SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS keeper
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "q22_dedup_norm" ->
      """SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS h,
        | count(*) AS n, min(doc_id) AS keeper
        |FROM documents GROUP BY 1""".stripMargin,
    "q51_bpe_tokens" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS INT)
        |   AS n_pieces
        |FROM documents""".stripMargin,
    "q25_token_count" ->
      """SELECT doc_id,
        | len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
        |FROM documents""".stripMargin,
    "q26_quality" ->
      """SELECT doc_id,
        | len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        | round(CAST(length(text) - len(regexp_split_to_array(trim(text), '\s+')) + 1 AS DOUBLE)
        |   / len(regexp_split_to_array(trim(text), '\s+')), 3) AS avg_token_len
        |FROM documents""".stripMargin,
    "q29_embed_norm" ->
      """SELECT vec_id,
        | round(sqrt(list_sum(list_transform(embedding,
        |   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2
        |FROM embeddings""".stripMargin,
    "q30_cosine_knn" ->
      """SELECT qid, nid, sim, rk FROM (
        | SELECT a.vec_id AS qid, b.vec_id AS nid,
        |  round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), 5) AS sim,
        |  row_number() OVER (PARTITION BY a.vec_id
        |    ORDER BY round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), 5) DESC,
        |      b.vec_id) AS rk
        | FROM embeddings a, embeddings b
        | WHERE a.vec_id < 20 AND a.vec_id <> b.vec_id)
        |WHERE rk <= 5""".stripMargin,
    "q31_stream_window" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        | round(sum(value), 3) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q32_connected_components" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT 'o' || CAST(l_orderkey AS VARCHAR) AS src,
        |         's' || CAST(l_suppkey AS VARCHAR) AS dst
        |  FROM lineitem WHERE l_orderkey < 300),
        |bidir AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
        |reach(node, m) AS (
        |  SELECT src, src FROM bidir
        |  UNION
        |  SELECT b.dst, r.m FROM reach r JOIN bidir b ON b.src = r.node)
        |SELECT node, min(m) AS component FROM reach GROUP BY node""".stripMargin,
    "q33_degree_topk" ->
      """WITH e AS (
        |  SELECT DISTINCT 'o' || CAST(l_orderkey AS VARCHAR) AS src,
        |         's' || CAST(l_suppkey AS VARCHAR) AS dst
        |  FROM lineitem WHERE l_orderkey < 300)
        |SELECT node, count(*) AS degree FROM (
        |  SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
        |GROUP BY node ORDER BY degree DESC, node LIMIT 30""".stripMargin,
    "q34_typed_literals" ->
      """SELECT doc_id, CAST(n_chars AS VARCHAR) AS v,
        | CASE WHEN regexp_full_match(CAST(n_chars AS VARCHAR), '\d{4}') THEN 'gYear'
        |      WHEN regexp_full_match(CAST(n_chars AS VARCHAR), '\d{4}-\d{2}-\d{2}') THEN 'date'
        |      WHEN regexp_full_match(CAST(n_chars AS VARCHAR), '\d+') THEN 'integer'
        |      WHEN regexp_full_match(CAST(n_chars AS VARCHAR), '\d+\.\d+') THEN 'decimal'
        |      WHEN lower(CAST(n_chars AS VARCHAR)) IN ('true','false') THEN 'boolean'
        |      ELSE 'string' END AS xsd_type
        |FROM documents""".stripMargin,
    "q35_source_metrics" ->
      """SELECT source, count(*) AS n,
        | round(avg(n_chars), 3) AS avg_chars,
        | round(stddev_samp(n_chars), 3) AS sd_chars,
        | CAST(sum(CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END) AS BIGINT) AS bucket_high,
        | CAST(sum(CASE WHEN n_chars >= 200 AND n_chars < 400 THEN 1 ELSE 0 END) AS BIGINT) AS bucket_mid,
        | CAST(sum(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) AS BIGINT) AS bucket_low
        |FROM documents GROUP BY source""".stripMargin,
    "q36_salted_count" ->
      "SELECT l_partkey, count(*) AS n FROM lineitem GROUP BY l_partkey",
    // ASCII corpus ⇒ bytes == codepoints, so the blob mean is expressible
    "q41_multimodal" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS byte_len,
        | CAST(octet_length(encode(text)) % 640 AS INT) AS width,
        | CAST(octet_length(encode(text)) % 480 AS INT) AS height,
        | CAST(octet_length(encode(text)) % 7 AS INT) AS n_frames,
        | floor(CAST(list_sum(list_transform(split(text, ''), c -> unicode(c))) AS DOUBLE)
        |   / octet_length(encode(text)) * 1000 + 0.5) / 1000 AS mean_byte
        |FROM documents""".stripMargin)
}
