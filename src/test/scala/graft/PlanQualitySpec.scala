package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: the properties that make these queries
  * scale (pushdown, pruning, broadcast, shuffle-freedom) are asserted on
  * the explain output, so a refactor that silently loses them fails here
  * rather than at 100 TB.
  */
class PlanQualitySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("filter query pushes predicates and prunes columns at the scan") {
    val p = plan("q02_filter")
    assert(p.contains("PushedFilters:") && p.contains("LessThan(l_shipdate"),
      s"missing pushdown:\n$p")
    assert(!p.contains("l_comment"), "scan reads unprojected columns")
  }

  test("dimension join broadcasts the small side") {
    val p = plan("q03_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"))
  }

  test("aggregation does map-side partial aggregation") {
    val p = plan("q01_agg")
    // partial + final HashAggregate pair around a single exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
  }

  test("KG pipeline plan is shuffle-free") {
    val p = plan("q17_kg_triples")
    assert(!p.contains("Exchange"), s"pipeline should not shuffle:\n$p")
    assert(p.contains("MapPartitions"))
  }

  test("custom simhash64 expression stays inside whole-stage codegen") {
    val p = plan("q24_simhash")
    assert(p.contains("Project [codegen id"), s"projection left codegen:\n$p")
    assert(p.contains("simhash64"), s"expression not present:\n$p")
    assert(!p.contains("MapElements"), "fell back to Dataset.map")
  }

  test("custom-expression generated code actually COMPILES (no silent janino fallback)") {
    // a WholeStageCodegen span in the plan is necessary but not
    // sufficient: janino compile errors fall back to interpreted mode at
    // runtime with only a warning (round 1 shipped exactly that bug —
    // the object's static forwarder was shadowed). Disable the fallback
    // and force execution: a codegen failure now throws.
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      Seq("q24_simhash", "q51_bpe_tokens", "q28_fingerprint").foreach { q =>
        val n = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()
        assert(n > 0)
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("re-parse-derived exports stay narrow (zero exchanges) and prune columns") {
    val p = plan("q37_edges_export")
    assert(!p.contains("Exchange"), s"export path picked up a shuffle:\n$p")
    // the sink uses 5 of the triple table's 8 columns — the scan must not
    // read the other three
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("subjIsUri") && !readSchema.contains("role"),
      s"scan reads pruned columns:\n$readSchema")
  }

  test("J3 eval join cogroups with exactly one exchange per side") {
    val p = plan("q55_eval_join")
    assert(p.contains("CoGroup"), s"not a cogroup:\n$p")
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 2, s"expected 2 exchanges (one per side), got $exchanges:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "eval join degenerated to a product")
  }

  test("triple store prunes partitions on the bucket column") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bucket_prune").toString
    val pages = graft.pipeline.SynthCorpus.pages(spark, 16, seed = 3L)
    graft.io.TripleStore.write(graft.pipeline.Pipeline.triples(pages), dir, buckets = 8)
    val df = graft.io.TripleStore.read(spark, dir)
      .filter(org.apache.spark.sql.functions.col("bucket") === 3)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("PartitionFilters: [isnotnull(bucket"),
      s"bucket filter not pushed to partition pruning:\n$p")
  }

  test("rank window shuffles once on the partition key with group-limit pushdown") {
    val p = plan("q06_window_rank")
    assert(p.contains("hashpartitioning(l_suppkey"),
      s"expected hash exchange on l_suppkey:\n$p")
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size == 1, s"expected one exchange:\n$p")
    // Spark 4 pushes rank<=1 below the shuffle as WindowGroupLimit
    assert(p.contains("WindowGroupLimit"), s"missing group-limit pushdown:\n$p")
  }
}
