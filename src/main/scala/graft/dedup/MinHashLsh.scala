package graft.dedup

import org.apache.spark.sql.Dataset

import graft.util.PyStr

/** MinHash + LSH banding for near-duplicate detection at corpus scale.
  *
  * shingle (word 3-grams) → 64 minhash values (one per seeded hash) →
  * 16 bands × 4 rows; docs sharing any (band, bandHash) bucket are
  * near-dup candidates. Candidate verification (exact Jaccard on the pair)
  * happens only within buckets, so the shuffle is on (band, bandHash) —
  * no quadratic cross join. Deterministic: splitmix64-seeded hashes.
  */
object MinHashLsh {

  val NumHashes = 64
  val Bands = 16
  val RowsPerBand: Int = NumHashes / Bands

  final case class BandRow(doc_id: Long, band: Int, band_hash: Long)

  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def shingles(text: String, k: Int = 3): Iterator[Long] = {
    val toks = PyStr.split(PyStr.lower(text))
    if (toks.length < k) Iterator(mix64(toks.mkString(" ").hashCode.toLong))
    else toks.sliding(k).map(w => mix64(w.mkString(" ").hashCode.toLong))
  }

  def signature(text: String): Array[Long] = {
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    shingles(text).foreach { sh =>
      var i = 0
      while (i < NumHashes) {
        val h = mix64(sh ^ mix64(i.toLong))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  def bandRows(docId: Long, text: String): Seq[BandRow] = {
    val sig = signature(text)
    (0 until Bands).map { b =>
      var h = 1125899906842597L
      var r = 0
      while (r < RowsPerBand) {
        h = h * 31 + sig(b * RowsPerBand + r)
        r += 1
      }
      BandRow(docId, b, h)
    }
  }

  /** (doc, band, bandHash) rows — group by (band, band_hash) downstream for
    * candidate pairs.
    */
  def bands(docs: Dataset[(Long, String)]): Dataset[BandRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.flatMap { case (id, text) => bandRows(id, text) }
  }

  /** Full near-duplicate detection: LSH candidate generation (shuffle on
    * (band, band_hash) buckets — never a cross join) followed by exact
    * shingle-Jaccard verification of each candidate pair. Returns pairs
    * (a < b) with jaccard ≥ threshold.
    */
  def nearDuplicatePairs(
      docs: Dataset[(Long, String)],
      threshold: Double = 0.8): Dataset[(Long, Long, Double)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val b = bands(docs).toDF("id", "band", "band_hash")
    val candidates = b.as("x").join(b.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    val texts = docs.toDF("id", "text")
    candidates
      .join(texts.withColumnRenamed("id", "a").withColumnRenamed("text", "ta"), "a")
      .join(texts.withColumnRenamed("id", "b").withColumnRenamed("text", "tb"), "b")
      .select(col("a"), col("b"), col("ta"), col("tb"))
      .as[(Long, Long, String, String)]
      .map { case (aId, bId, ta, tb) => (aId, bId, jaccard(ta, tb)) }
      .filter(_._3 >= threshold)
  }

  /** Exact word-shingle Jaccard for candidate verification. */
  def jaccard(a: String, b: String, k: Int = 3): Double = {
    val sa = shingles(a, k).toSet
    val sb = shingles(b, k).toSet
    if (sa.isEmpty && sb.isEmpty) 1.0
    else (sa & sb).size.toDouble / (sa | sb).size
  }
}
