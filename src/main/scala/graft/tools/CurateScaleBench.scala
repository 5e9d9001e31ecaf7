package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Drives `Curate.curateNearDup` — the 100 TB curation path — and the
  * full cascade `curateFull` at data scale next to `curateExact`, with
  * verdict invariants checked between the variants on the clone subset
  * (round-3 verdict item 8: the near-dup variant previously had only
  * spec coverage).
  *
  * Invariants (exact ⊢ near-dup):
  *   - lang/quality verdicts are IDENTICAL per doc (same scorer, same
  *     single-pass floor — the variants differ only in keeper selection);
  *   - every md5-exact duplicate is also non-kept under near-dup (exact
  *     clones always share an LSH cluster, so only the keeper survives);
  *   - near-dup rejects a superset: duplicate count ≥ exact's, kept ≤.
  *
  * Usage: runMain graft.tools.CurateScaleBench [sfDir] — prints one
  * JSON line with per-variant seconds and verdict histograms.
  */
object CurateScaleBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)]
    val nDocs = docs.count()

    // verdict tables are tiny (one row/doc, no text) — cache them so the
    // invariant joins don't re-run the pipelines
    def timed(df: org.apache.spark.sql.DataFrame): (org.apache.spark.sql.DataFrame, Double) = {
      val cached = df.cache()
      val t0 = System.nanoTime()
      cached.count()
      (cached, (System.nanoTime() - t0) / 1e9)
    }
    val (exact, sE) = timed(graft.pipeline.Curate.curateExact(docs))
    val (near, sN) = timed(graft.pipeline.Curate.curateNearDup(docs, threshold = 0.5))
    val (full, sF) = timed(graft.pipeline.Curate.curateFull(docs))

    def hist(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.groupBy("verdict").count().as[(String, Long)].collect().toMap
    val hE = hist(exact)
    val hN = hist(near)
    val hF = hist(full)

    // per-doc invariants via one join on the two small verdict tables
    val joined = exact.select(col("doc_id"), col("verdict").as("ve"), col("kept").as("ke"))
      .join(near.select(col("doc_id"), col("verdict").as("vn"), col("kept").as("kn")), "doc_id")
      .cache()
    val langQualityMismatch = joined.filter(
      (col("ve").isin("lang", "quality") || col("vn").isin("lang", "quality")) &&
        col("ve") =!= col("vn")).count()
    val cloneEscapes = joined.filter(col("ve") === "duplicate" && col("kn")).count()
    require(joined.count() == nDocs, "verdict tables must cover every doc exactly once")
    require(langQualityMismatch == 0,
      s"lang/quality verdicts must be identical across variants ($langQualityMismatch differ)")
    require(cloneEscapes == 0,
      s"$cloneEscapes md5-exact duplicates kept by the near-dup variant")
    require(hN.getOrElse("duplicate", 0L) >= hE.getOrElse("duplicate", 0L) &&
      hN.getOrElse("kept", 0L) <= hE.getOrElse("kept", 0L),
      s"near-dup must reject a superset: exact=$hE near=$hN")

    // curateFull invariants vs curateExact: lang/quality stages are
    // shared, the repetition stage only REMOVES — a hash group is kept
    // under full only if some member passes the stricter filter set, so
    // kept_full <= kept_exact; lang counts are identical
    val fullJoined = exact.select(col("doc_id"), col("verdict").as("ve"))
      .join(full.select(col("doc_id"), col("verdict").as("vf")), "doc_id")
    require(fullJoined.filter(
      (col("ve") === "lang") =!= (col("vf") === "lang")).count() == 0,
      "lang verdicts must be identical between exact and full cascades")
    require(full.count() == nDocs, "curateFull must cover every doc exactly once")
    require(hF.getOrElse("kept", 0L) <= hE.getOrElse("kept", 0L),
      s"full cascade must keep a subset of exact's groups: exact=$hE full=$hF")

    def histJson(h: Map[String, Long]): String =
      h.toVector.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }
        .mkString("{", ",", "}")
    println(
      f"""{"metric":"curate_scale","docs":$nDocs,"sf":"$sfDir",""" +
        f""""exact_secs":$sE%.2f,"near_dup_secs":$sN%.2f,"full_secs":$sF%.2f,""" +
        f""""exact_verdicts":${histJson(hE)},"near_dup_verdicts":${histJson(hN)},""" +
        f""""full_verdicts":${histJson(hF)}}""")
    spark.stop()
  }
}
