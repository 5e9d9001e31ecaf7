package graft

import org.apache.spark.sql.SparkSession

import graft.pipeline.{Pipeline, SynthCorpus}

/** Driver-run benchmark: one JSON line with per-query seconds plus the KG
  * pipeline's throughput on the synthetic corpus.
  */
object Bench {

  def run(spark: SparkSession, sfDir: String): (Map[String, Double], Long, Double) = {
    // warmup: absorb codegen/classloading so per-query numbers are
    // steady-state; include a micro CC so the iterative-join machinery
    // (checkpoint blocks, shuffle paths) is warm before q32 is timed
    try {
      SparkEntry.queries("q01_agg")(spark, sfDir).count()
      import spark.implicits._
      graft.canon.Canonicalize.connectedComponents(
        Seq(("a", "b"), ("b", "c")).toDF("src", "dst")).count()
    } catch { case _: Throwable => }
    val timings = SparkEntry.queries.toVector.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap

    // KG pipeline throughput: docs -> triples, shuffle-free mapPartitions
    val nDocs = 20000L
    val cores = spark.sparkContext.defaultParallelism
    val pages = SynthCorpus.pages(spark, nDocs, seed = 42L, skewFraction = 0.05,
      partitions = cores * 4)
    val t0 = System.nanoTime()
    val nTriples = Pipeline.triples(pages).count()
    val kgSecs = (System.nanoTime() - t0) / 1e9
    (timings, nTriples, kgSecs)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (timings, nTriples, kgSecs) = run(spark, sfDir)
    val qs = (timings + ("kg_build_20k_docs" -> kgSecs)).toVector.sortBy(_._1)
      .map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }.mkString("{", ",", "}")
    val total = timings.values.sum + kgSecs
    val tps = nTriples / math.max(kgSecs, 1e-9)
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,""" +
        f""""kg_triples":$nTriples,"kg_triples_per_sec":$tps%.1f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
