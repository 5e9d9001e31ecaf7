package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}

/** Deterministic stratified sampling for corpus MIXING — the data-mix
  * stage of a pre-training pipeline (down-weight web crawl, keep books,
  * trim code, …): each document's keep decision is a pure function of
  * its CONTENT, so the sample is reproducible run-to-run, stable under
  * re-partitioning/resume, and exactly SQL-mirrorable (no RNG state
  * anywhere):
  *
  *   u = (first 8 hex chars of md5(text)) / 2³²   ∈ [0, 1)
  *   kept ⇔ u < rate(stratum)
  *
  * u is exactly representable (a 32-bit integer over a power of two),
  * so the comparison is bit-deterministic on both the Spark and the
  * DuckDB side. Content-hashing also means exact duplicate texts share
  * one fate — a mix pass cannot split a clone class. Map-only; rates
  * ride a tiny broadcast.
  */
object Mix {

  final case class Sampled(
      doc_id: Long, stratum: String, u: Double, kept: Boolean)

  def sampleByStratum(
      docs: Dataset[(Long, String, String)], // (doc_id, stratum, text)
      rates: Map[String, Double],
      defaultRate: Double = 1.0): Dataset[Sampled] = {
    require(
      (rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      "rates must be in [0, 1]")
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast((rates, defaultRate))
    docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { case (id, stratum, text) =>
        md.reset()
        val d = md.digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first 4 bytes, big-endian, as the md5 HEX prefix reads them
        val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val u = v.toDouble / 4294967296.0
        val (r, dflt) = bc.value
        Sampled(id, stratum, u, u < r.getOrElse(stratum, dflt))
      }
    }
  }
}
