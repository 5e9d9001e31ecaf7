package graft

import org.apache.spark.sql.SparkSession

import graft.pipeline.{Pipeline, SynthCorpus}

/** Driver-run benchmark: one JSON line with per-query seconds plus the KG
  * pipeline's throughput on the synthetic corpus.
  *
  * Timing discipline (the sandbox host has minute-scale noisy-neighbor
  * swings and cold-JIT effects that round 1 misread as plan regressions):
  * all queries run interleaved for `Reps` rounds and each query reports
  * its BEST round — steady-state, time-correlated noise cannot bias one
  * query. A query that throws reports -1 and its error lands in an
  * `errors` map instead of masquerading as a fast timing.
  */
object Bench {

  val Reps = 3

  def run(spark: SparkSession, sfDir: String)
      : (Map[String, Double], Map[String, String], Long, Double) = {
    // fixture-writing queries (q23/q49/q65) skip their oracle
    // materialization under bench (see SparkEntry): timing measures the
    // operator, not parquet writes. Cleared in the finally below so a
    // Verify run after Bench in one JVM still materializes fixtures.
    System.setProperty("graft.bench", "1")
    try runTimed(spark, sfDir)
    finally System.clearProperty("graft.bench")
  }

  private def runTimed(spark: SparkSession, sfDir: String)
      : (Map[String, Double], Map[String, String], Long, Double) = {
    // warmup: absorb codegen/classloading so per-query numbers are
    // steady-state; include a micro CC so the iterative-join machinery
    // (checkpoint blocks, shuffle paths) is warm before q32 is timed
    try {
      SparkEntry.queries("q01_agg")(spark, sfDir).count()
      import spark.implicits._
      graft.canon.Canonicalize.connectedComponents(
        Seq(("a", "b"), ("b", "c")).toDF("src", "dst")).count()
    } catch { case _: Throwable => }

    // SPARK_GRAFT_SKIP: comma-separated query names to exclude — used by
    // the sf1 scale-up runs to drop documented |n|^2 exact baselines
    // (q60) whose scale path (q61) is benched instead
    val skip = sys.env.get("SPARK_GRAFT_SKIP")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty)
    val names = SparkEntry.queries.keys.toVector.sorted.filterNot(skip)
    val best = scala.collection.mutable.Map.empty[String, Double]
    val errors = scala.collection.mutable.Map.empty[String, String]
    (1 to Reps).foreach { _ =>
      names.foreach { name =>
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(name)(spark, sfDir).count()
          val secs = (System.nanoTime() - t0) / 1e9
          if (secs < best.getOrElse(name, Double.MaxValue)) best(name) = secs
        } catch {
          case e: Throwable =>
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.take(1).mkString.take(200)
            if (!best.contains(name)) best(name) = -1.0
        }
        // the harness owns post-consumption cache lifetime (operators
        // with lazy results — q49/q65/q76 — cache intermediates into a
        // default scope they cannot close themselves); untimed, and no
        // cross-query cached state exists by design
        spark.catalog.clearCache()
      }
    }

    // KG pipeline throughput: docs -> triples, shuffle-free mapPartitions
    val nDocs = 20000L
    val cores = spark.sparkContext.defaultParallelism
    val pages = SynthCorpus.pages(spark, nDocs, seed = 42L, skewFraction = 0.05,
      partitions = cores * 4)
    val kgSecs = (1 to Reps).map { _ =>
      val t0 = System.nanoTime()
      Pipeline.triples(pages).count()
      (System.nanoTime() - t0) / 1e9
    }.min
    val nTriples = Pipeline.triples(pages).count()
    (best.toMap, errors.toMap, nTriples, kgSecs)
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

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

    val (timings, errors, nTriples, kgSecs) = run(spark, sfDir)
    val qs = (timings + ("kg_build_20k_docs" -> kgSecs)).toVector.sortBy(_._1)
      .map { case (k, v) => jstr(k) + f""":$v%.3f""" }.mkString("{", ",", "}")
    val errJson = errors.toVector.sortBy(_._1)
      .map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = timings.values.filter(_ >= 0).sum + kgSecs
    val tps = nTriples / math.max(kgSecs, 1e-9)
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","reps":$Reps,""" +
        f""""queries":$qs,"errors":$errJson,""" +
        f""""kg_triples":$nTriples,"kg_triples_per_sec":$tps%.1f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
