package graft.tools

import org.apache.spark.sql.SparkSession

import graft.pipeline.{Pipeline, SynthCorpus}

/** Scaling-efficiency evidence for the north rule (N vs 4N executors).
  *
  * No real cluster exists in this sandbox, so per the driver instruction the
  * same job runs at two parallelism levels — local[8] and local[32] — on the
  * same input; we report throughput at both and
  * `efficiency = (thr_32 / thr_8) / 4`. The pipeline is one shuffle-free
  * mapPartitions over `spark.range`-generated input partitions, so the
  * expected scaling limit is CPU saturation, not shuffle or skew.
  *
  * Usage: runMain graft.tools.ScalingBench [nDocs] — prints one JSON line.
  */
object ScalingBench {

  private def measure(cores: Int, nDocs: Long, skew: Double): (Long, Double) = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // text column blanked → the full path runs, including html→text
    // extraction (the real per-row work on a Common-Crawl-style table)
    def pages(n: Long) =
      SynthCorpus.pages(spark, n, seed = 42L, skewFraction = skew,
        partitions = cores * 4).map(p => p.copy(text = ""))
    try {
      // warmup (JIT + classloading), then one measured run
      Pipeline.triples(pages(2000)).count()
      val t0 = System.nanoTime()
      val n = Pipeline.triples(pages(nDocs)).count()
      (n, (System.nanoTime() - t0) / 1e9)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(400000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val skew = 0.05
    // The sandbox host shows minute-scale noisy-neighbor load swings, so
    // interleave the two levels (8,32,8,32,...) and take each level's best —
    // time-correlated noise then cannot bias the ratio.
    val results = (1 to reps).flatMap { _ =>
      Seq(8 -> measure(8, nDocs, skew), 32 -> measure(32, nDocs, skew))
    }
    results.foreach { case (c, (n, s)) =>
      println(f"scaling_run: cores=$c docs=$nDocs secs=$s%.2f docs_per_sec=${nDocs / s}%.1f")
    }
    val (n8, s8) = results.collect { case (8, r) => r }.minBy(_._2)
    val (n32, s32) = results.collect { case (32, r) => r }.minBy(_._2)
    require(n8 == n32, s"nondeterministic triple count: $n8 vs $n32")
    val thr8 = nDocs / s8
    val thr32 = nDocs / s32
    val tps8 = n8 / s8
    val tps32 = n32 / s32
    val eff = (thr32 / thr8) / 4.0
    println(
      f"""{"metric":"scaling_efficiency","value":$eff%.3f,"docs":$nDocs,""" +
        f""""triples":$n8,"secs_8":$s8%.2f,"secs_32":$s32%.2f,""" +
        f""""docs_per_sec_8":$thr8%.1f,"docs_per_sec_32":$thr32%.1f,""" +
        f""""triples_per_sec_8":$tps8%.1f,"triples_per_sec_32":$tps32%.1f}""")
  }
}
