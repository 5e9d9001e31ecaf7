package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.canon.Canonicalize

/** Data-scale exercise of `connectedComponents`' dictionary-encoded
  * long-id path — the sf-level testdata's sameAs graphs sit below the
  * 1M-edge encode threshold, so until this bench the encoded rounds had
  * only ever run inside a spec (round-3 verdict item 3).
  *
  * The planted graph has the two shapes web-scale sameAs graphs stress:
  * head-entity HUBS (a few URIs participating in a huge share of edges —
  * the AQE-skew shape) and long CHAINS (forcing multiple pointer-jumping
  * rounds, since star graphs converge in one). The SAME graph runs
  * through both paths — encode (threshold 1M < |edges|) and string
  * (threshold ∞) — verifying identical components via an
  * order-independent checksum and reporting wall time plus total shuffle
  * bytes for each, so the 8-byte-id claim is measured, not asserted.
  *
  * Plan verification: the encode path's result must carry exactly the
  * decode join-backs (2 joins against the dict — one per label column)
  * while the string path's is the bare checkpointed labels (0 joins).
  *
  * Node names carry an md5-derived suffix (width = `pad` hex chars,
  * default 32 → ~70-byte URIs): shuffle files are lz4-compressed, so
  * zero-padded or sequential names would compress to almost nothing and
  * hide the string path's true byte cost — the suffix gives names the
  * entropy real crawled URIs have. The encoded rounds shuffle 8-byte
  * longs regardless; the STRING path's per-round bytes scale with
  * (compressed) name width, so the encode win is measured at a
  * realistic width, not asserted from one shape.
  *
  * Usage: runMain graft.tools.CcScaleBench [hubs spokes chains chainLen pad]
  * — prints one JSON line.
  */
object CcScaleBench {

  private final class ShuffleBytes extends SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val m = s.stageInfo.taskMetrics
      if (m != null) bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
    }
  }

  def main(args: Array[String]): Unit = {
    val hubs = args.lift(0).map(_.toInt).getOrElse(20)
    val spokes = args.lift(1).map(_.toInt).getOrElse(50000)
    val chains = args.lift(2).map(_.toInt).getOrElse(200000)
    val chainLen = args.lift(3).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    require(chainLen >= 2 && chainLen <= 100, "chainLen in [2,100] (position packing)")
    val pad = args.lift(4).map(_.toInt).getOrElse(32)
    val pre = "http://en.wikipedia.org/wiki/"
    def name(kind: String, num: org.apache.spark.sql.Column) = {
      val base = concat(lit(s"$pre$kind"), num.cast("string"))
      if (pad <= 0) base
      else concat(base, lit("_"), substring(md5(base.cast("binary")), 1, pad))
    }
    val hubEdges = spark.range(hubs.toLong * spokes).select(
      name("Hub_", col("id") % hubs).as("src"),
      name("S_", col("id")).as("dst"))
    val hop = chainLen - 1
    val chainEdges = spark.range(chains.toLong * hop).select(
      name("C_", (col("id") / hop).cast("long") * 100 + col("id") % hop).as("src"),
      name("C_", (col("id") / hop).cast("long") * 100 + col("id") % hop + 1).as("dst"))
    val edges = hubEdges.unionByName(chainEdges)
    val nEdges = hubs.toLong * spokes + chains.toLong * hop
    val expectedComponents = hubs.toLong + chains

    val listener = new ShuffleBytes
    spark.sparkContext.addSparkListener(listener)
    val ckptRoot = java.nio.file.Files.createTempDirectory("cc_scale").toString

    def run(encodeMin: Long, label: String): (Double, Long, Long, java.math.BigDecimal, Int) = {
      val before = listener.bytes.get()
      val t0 = System.nanoTime()
      // forced paths: the encode run disables the entropy gate (0.0) so
      // the A/B stays a pure path comparison on ANY name shape; the
      // AUTO decision is reported separately below
      val cc = Canonicalize.connectedComponents(edges, maxIter = 30,
        checkpointDir = Some(s"$ckptRoot/$label"), convergeEvery = 2,
        encodeMinEdges = encodeMin, encodeMinBytesPerName = 0.0,
        localMaxEdges = 0L)
      val joinBacks = cc.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.size
      // one pass: component count + order-independent label checksum
      val row = cc.agg(
        countDistinct("component").as("n"),
        sum(xxhash64(concat_ws("|", col("node"), col("component")))
          .cast("decimal(38,0)")).as("sig")).head()
      val secs = (System.nanoTime() - t0) / 1e9
      (secs, listener.bytes.get() - before, row.getLong(0),
        row.getDecimal(1), joinBacks)
    }

    // encode path first (threshold 1M < |edges| engages it), then the
    // string path on the identical graph
    val (sL, shL, nL, sigL, jbL) = run(1000000L, "long")
    val (sS, shS, nS, sigS, jbS) = run(Long.MaxValue, "str")

    require(nL == expectedComponents && nS == expectedComponents,
      s"component count: long=$nL str=$nS expected=$expectedComponents")
    require(sigL == sigS, s"label checksums differ: $sigL vs $sigS")
    require(jbL == 2 && jbS == 0,
      s"plan shape: encode path must decode via 2 dict joins (got $jbL), " +
        s"string path none (got $jbS)")

    // what the round-5 entropy-adaptive default would DECIDE on this
    // graph (the gate CcScaleBench's round-4 finding motivated): padded
    // md5 names sit far above 16 B/name deflated → encode; pad=0
    // sequential names deflate below it → string
    val bpn = Canonicalize.sampledBytesPerName(edges)
    val autoPath = if (bpn >= 16.0) "encode" else "string"

    println(
      f"""{"metric":"cc_scale","edges":$nEdges,"components":$nL,""" +
        f""""hubs":$hubs,"spokes":$spokes,"chains":$chains,"chain_len":$chainLen,""" +
        f""""long_path_secs":$sL%.2f,"long_path_shuffle_mb":${shL / 1e6}%.1f,""" +
        f""""string_path_secs":$sS%.2f,"string_path_shuffle_mb":${shS / 1e6}%.1f,""" +
        f""""shuffle_ratio":${shS.toDouble / math.max(1L, shL)}%.2f,""" +
        f""""encode_join_backs":$jbL,""" +
        f""""sampled_bytes_per_name":$bpn%.1f,"auto_path":"$autoPath"}""")
    spark.stop()
  }
}
