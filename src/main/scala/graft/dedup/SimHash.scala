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
    import org.apache.spark.sql.functions._
    require(maxDist >= 0 && maxDist < 64, s"maxDist $maxDist out of range")
    val k = maxDist + 1
    val base = 64 / k
    // 1. collapse identical fingerprints first (the MinHashLsh clone-
    // collapse pattern): boilerplate clone groups — the dominant hot-key
    // source — enter the join as ONE representative, not m rows whose
    // m² pairs would concentrate in a single chunk-key task
    val reps = docs.groupBy(col("h"))
      .agg(min("doc_id").as("rid"), count(lit(1)).as("n"))
    // 2. one posexplode into (chunk_idx, chunk_val) keys and ONE
    // equality self-join — not k separate self-joins, which would
    // evaluate the input lineage 2k times (8 scans + simhash passes at
    // maxDist 3 for an un-materialized input)
    val chunkArr = array((0 until k).map { i =>
      val lo = i * base
      val width = if (i == k - 1) 64 - lo else base
      val mask = if (width == 64) -1L else (1L << width) - 1
      shiftrightunsigned(col("h"), lo).bitwiseAND(lit(mask))
    }: _*)
    val keyed = reps.select(col("rid"), col("h"),
      posexplode(chunkArr).as(Seq("ci", "key")))
    val candReps = keyed.as("x").join(keyed.as("y"),
        col("x.ci") === col("y.ci") && col("x.key") === col("y.key") &&
          col("x.rid") < col("y.rid"))
      .select(col("x.rid").as("ra"), col("x.h").as("ha"),
        col("y.rid").as("rb"), col("y.h").as("hb"))
      .distinct()
      .select(col("ra"), col("rb"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxDist)
    // 3. expand back through the fingerprint groups with the same BLOCKED
    // bounded-per-task enumeration MinHashLsh uses: intra-group pairs at
    // distance 0 (m² output for an m-clone group is inherent to the pair
    // contract; the cluster contract is the scale path), cross-group rep
    // pairs through both member lists
    val groups = docs.select(col("doc_id"), col("h"))
      .join(reps.select(col("h"), col("rid")), "h")
      .select(col("doc_id").as("id"), col("rid").as("rep"))
    val intra = MinHashLsh.clonePairsBlocked(groups, 4096)
      .toDF("a", "b", "j")
      .select(col("a"), col("b"), lit(0).as("hamming"))
    val cross = MinHashLsh.expandRepPairsBlocked(groups,
        candReps.select(col("ra"), col("rb"),
          col("hamming").cast("double").as("j")), 4096)
      .toDF("a", "b", "j")
      .select(col("a"), col("b"), col("j").cast("int").as("hamming"))
    cross.unionByName(intra)
  }
}
