package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.similarity.{Ann, Quantize}

/** A/B benchmark for the int8 ANN SEARCH path (round-4 verdict item 4):
  * the same LSH/IVF topology over float32 vectors vs the quantized
  * (scale, codes) store with the integer dot kernel. The claim under
  * test is the serve-time memory-bandwidth win: the rerank reads
  * 1 B/component instead of 4 and does one float multiply per PAIR
  * instead of per component — plus the 4× smaller shuffle/cache
  * footprint of the candidate rows themselves.
  *
  * Interleaved best-of-N (the host has minute-scale noisy-neighbor
  * swings — only interleaved ratios are trustworthy, BENCH.md), identical
  * auto-sized parameters on both sides, and a neighbor-overlap report so
  * the speed claim is tied to an equivalence number.
  *
  * Dimensionality matters and the bench is honest about it: at the
  * testdata's 64 dims a whole vector is 256 B — cache-resident, so the
  * int8 path's per-row overheads (an extra scale field, the per-pair
  * rescale) can exceed the kernel saving and the speedup dips BELOW 1.
  * Real embedding stores are 768–4096-dim, where the rerank is
  * genuinely bandwidth-bound; the `synth` mode measures that regime.
  *
  * Usage: runMain graft.tools.I8AnnBench [sfDir] [reps]
  *    or: runMain graft.tools.I8AnnBench synth <n> <dim> [reps]
  * (default /tmp/graft_sf1, 3). Prints one JSON line.
  */
object I8AnnBench {

  /** Deterministic clustered unit vectors (the StreamingAnnSpec shape,
    * scaled): 100 clusters, splitmix-seeded.
    */
  private def synthVecs(
      spark: SparkSession, n: Long, dim: Int) = {
    import spark.implicits._
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    spark.range(n).as[Long].map { i =>
      val c = (i % 100) + 1
      val raw = Array.tabulate(dim) { d =>
        (mix(c * 131 + d).toDouble / Long.MaxValue) +
          0.25 * (mix(i * 7919 + d).toDouble / Long.MaxValue)
      }
      val norm = math.sqrt(raw.map(x => x * x).sum)
      (i, raw.map(x => (x / norm).toFloat))
    }
  }

  def main(args: Array[String]): Unit = {
    val synth = args.headOption.contains("synth")
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val reps =
      if (synth) { if (args.length > 3) args(3).toInt else 3 }
      else if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val vecs = (
      if (synth) synthVecs(spark, args(1).toLong, args(2).toInt)
      else spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select("vec_id", "embedding").as[(Long, Array[Float])]
    ).cache()
    val n = vecs.count()
    val dim = vecs.head()._2.length
    val quant = Quantize.int8(vecs).as[(Long, Double, Array[Byte])].cache()
    quant.count()
    val bits = Ann.autoBits(n)
    val nlist = Ann.autoNlist(n)
    val nprobe = Ann.autoNprobe(nlist)

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // interleaved reps: float and int8 alternate inside each round
    var fL, iL, fI, iI = Double.MaxValue
    (1 to reps).foreach { _ =>
      fL = math.min(fL, time(Ann.lshTopK(vecs, 5, 16, bits).count()))
      iL = math.min(iL, time(Ann.lshTopKI8(quant, 5, 16, bits).count()))
      fI = math.min(fI, time(Ann.ivfTopK(vecs, 5, nlist, nprobe).count()))
      iI = math.min(iI, time(Ann.ivfTopKI8(quant, 5, nlist, nprobe).count()))
    }
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "nid").as[(Long, Long)].collect().toSet
    val oL = {
      val f = pairs(Ann.lshTopK(vecs, 5, 16, bits))
      val i = pairs(Ann.lshTopKI8(quant, 5, 16, bits))
      (f & i).size.toDouble / math.max(1, f.size)
    }
    val oI = {
      val f = pairs(Ann.ivfTopK(vecs, 5, nlist, nprobe))
      val i = pairs(Ann.ivfTopKI8(quant, 5, nlist, nprobe))
      (f & i).size.toDouble / math.max(1, f.size)
    }
    def r(x: Double) = math.floor(x * 1000 + 0.5) / 1000
    println(
      s"""{"bench":"i8ann","n":$n,"dim":$dim,"bits":$bits,"nlist":$nlist,"nprobe":$nprobe,""" +
        s""""lsh_float_s":${r(fL)},"lsh_int8_s":${r(iL)},"lsh_speedup":${r(fL / iL)},""" +
        s""""ivf_float_s":${r(fI)},"ivf_int8_s":${r(iI)},"ivf_speedup":${r(fI / iI)},""" +
        s""""lsh_overlap":${r(oL)},"ivf_overlap":${r(oI)}}""")
    spark.stop()
  }
}
