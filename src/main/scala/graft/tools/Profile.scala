package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc micro-profiler: times one named SparkEntry query repeatedly.
  * Usage: runMain graft.tools.Profile <queryName> [reps] [sfDir]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"PROFILE $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
