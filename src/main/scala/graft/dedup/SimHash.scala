package graft.dedup

import graft.util.PyStr

/** 64-bit SimHash over word unigrams: near-duplicate docs have small
  * Hamming distance between fingerprints. Deterministic (splitmix64 token
  * hashes), no external state.
  */
object SimHash {

  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def simhash64(text: String): Long = {
    val votes = new Array[Int](64)
    PyStr.split(PyStr.lower(text)).foreach { tok =>
      val h = mix64(tok.hashCode.toLong)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** EXACT Hamming-neighborhood self-join over 64-bit fingerprints via
    * pigeonhole banding (the Manku/Jain/Das Sarma WWW'07 simhash-dedup
    * pattern): split the fingerprint into `maxDist + 1` chunks — a pair
    * within `maxDist` differing bits must agree on at least one chunk —
    * so candidates come from equality joins on the chunk keys (shuffle on
    * chunk values, never a cross join) and an exact popcount filter makes
    * the result exact, not approximate. All-columnar (bit ops +
    * `bit_count` stay in whole-stage codegen).
    *
    * Input: (doc_id, h). Output: (a, b, hamming), a < b,
    * hamming ≤ maxDist. Identical fingerprints (exact/normalized clones)
    * surface at distance 0 — the output is pairs within a clone group,
    * inherent to the contract like [[MinHashLsh.nearDuplicatePairs]].
    */
  def hammingPairs(
      docs: org.apache.spark.sql.DataFrame,
      maxDist: Int = 3): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    require(maxDist >= 0 && maxDist < 64, s"maxDist $maxDist out of range")
    val k = maxDist + 1
    val base = 64 / k
    val cands = (0 until k).map { i =>
      val lo = i * base
      val width = if (i == k - 1) 64 - lo else base
      val mask = if (width == 64) -1L else (1L << width) - 1
      def chunk(c: Column) = shiftrightunsigned(c, lo).bitwiseAND(lit(mask))
      val a = docs.select(col("doc_id").as("a"), col("h").as("ha"),
        chunk(col("h")).as("key"))
      val b = docs.select(col("doc_id").as("b"), col("h").as("hb"),
        chunk(col("h")).as("key"))
      a.join(b, Seq("key")).filter(col("a") < col("b"))
        .select("a", "b", "ha", "hb")
    }.reduce(_ unionByName _).distinct()
    cands
      .select(col("a"), col("b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxDist)
  }
}
