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

  /** Combination cap: C(numBlocks, maxDist) candidate tables per rep.
    * 64 covers every auto-sized configuration (maxDist 3 stops at b=8,
    * C(8,3)=56) while bounding the fan-out a caller can request.
    */
  private val MaxCombos = 64L

  private def binom(n: Int, k0: Int): Long = {
    val k = math.min(k0, n - k0)
    if (k < 0) return 0L
    var acc = 1L
    var i = 1
    while (i <= k) {
      acc = acc * (n - k + i) / i // n ≤ 64, so acc ≤ C(64,32) path is cut by the cap below long before overflow
      if (acc > MaxCombos * 64) return Long.MaxValue
      i += 1
    }
    acc
  }

  /** (combo_idx, packed key) rows for the block-combination scheme: for
    * each of the C(b, b−maxDist) block subsets, the selected block values
    * concatenated into one ≤64-bit key. Package-private so the
    * boundedness spec can measure per-(ci, key) bucket population.
    */
  private[graft] def blockCombinationKeys(
      reps: org.apache.spark.sql.DataFrame,
      maxDist: Int,
      b: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val wBase = 64 / b
    def blockWidth(i: Int): Int = if (i == b - 1) 64 - i * wBase else wBase
    def blockCol(i: Int): org.apache.spark.sql.Column = {
      val width = blockWidth(i)
      val mask = if (width == 64) -1L else (1L << width) - 1
      shiftrightunsigned(col("h"), i * wBase).bitwiseAND(lit(mask))
    }
    val combos = (0 until b).combinations(b - maxDist).toVector
    val keyArr = array(combos.map { sel =>
      // selected widths sum to ≤64, so the packed key fits one long;
      // shiftleft(acc, 64) only occurs for the single-full-width block
      // case, where acc is still the zero literal (Java shift-mod-64 is
      // then a no-op and the OR carries the value)
      sel.foldLeft(lit(0L)) { (acc, i) =>
        shiftleft(acc, blockWidth(i)).bitwiseOR(blockCol(i))
      }
    }: _*)
    reps.select(col("rid"), col("h"), posexplode(keyArr).as(Seq("ci", "key")))
  }

  /** Block count for [[hammingPairs]] auto-sized from corpus count — the
    * `Ann.autoBits` pattern the sf1 scale-up bench forced onto ANN: the
    * join key must carry ~log2(n / targetBucket) bits or expected bucket
    * population n/2^width (and with it per-key candidate pairs) grows
    * linearly with the corpus and the chunk-key self-join degenerates
    * quadratically. More blocks widen the key — combination keys span
    * (b − maxDist) blocks of 64/b bits — at the price of C(b, maxDist)
    * key tables per fingerprint (the Manku/Jain/Das Sarma WWW'07
    * trade-off). Smallest b whose key width reaches the target wins; if
    * none does within the combination cap, the widest feasible b wins.
    * maxDist=3: n ≤ ~4M → b=4 (16-bit keys, 4 tables), 10⁹ → b=5
    * (24-bit, 10 tables), 10¹² → b=7 (36-bit, 35 tables).
    */
  def autoBlocks(n: Long, maxDist: Int = 3, targetBucket: Int = 64): Int = {
    require(maxDist >= 0 && maxDist < 64, s"maxDist $maxDist out of range")
    val needed = math.ceil(
      math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2)).toInt
    val feasible = ((maxDist + 1) to 64).filter(b => binom(b, maxDist) <= MaxCombos)
    def width(b: Int) = (b - maxDist) * (64 / b)
    feasible.find(b => width(b) >= needed)
      .getOrElse(feasible.maxBy(b => (width(b), -b)))
  }

  /** EXACT Hamming-neighborhood self-join over 64-bit fingerprints via
    * block-combination pigeonhole keys (Manku/Jain/Das Sarma WWW'07):
    * split the fingerprint into `numBlocks` > maxDist blocks — a pair
    * within `maxDist` differing bits differs in at most maxDist blocks,
    * so it agrees on some (numBlocks − maxDist)-block combination — and
    * key the equality self-join on every such combination (shuffle on
    * combination values, never a cross join). An exact popcount filter
    * makes the result exact, not approximate. All-columnar (bit ops +
    * `bit_count` stay in whole-stage codegen).
    *
    * `numBlocks` 0 (default) auto-sizes from the corpus count
    * ([[autoBlocks]]; one map-only count job unless `numDocsHint` is
    * given) so per-key bucket population n/2^keyWidth stays ~flat as the
    * corpus grows — the fixed 4×16-bit chunking this replaces held
    * ~n/2¹⁶ reps per bucket, quadratic per key at 10⁹ distinct
    * fingerprints.
    *
    * Input: (doc_id, h). Output: (a, b, hamming), a < b,
    * hamming ≤ maxDist. Identical fingerprints (exact/normalized clones)
    * surface at distance 0 — the output is pairs within a clone group,
    * inherent to the contract like [[MinHashLsh.nearDuplicatePairs]].
    */
  def hammingPairs(
      docs: org.apache.spark.sql.DataFrame,
      maxDist: Int = 3,
      numBlocks: Int = 0,
      numDocsHint: Long = 0L,
      blockSize: Int = 4096,
      scope: graft.util.CacheScope = new graft.util.CacheScope)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val (groupsRaw, candReps, reps) =
      groupsAndRepPairs(docs, maxDist, numBlocks, numDocsHint, scope,
        cacheReps = true)
    // three consumers of the membership below (intra + both expansion
    // sides) — cache it (narrow id/rep longs)
    val groups = scope.own(groupsRaw)
    // expand back through the fingerprint groups with the same BLOCKED
    // bounded-per-task enumeration MinHashLsh uses: intra-group pairs at
    // distance 0 (m² output for an m-clone group is inherent to the pair
    // contract; [[hammingClusters]] is the scale path), cross-group rep
    // pairs through both member lists. MinHashLsh's small-group direct
    // dispatch was TRIED here and reverted (r6 continuation): its
    // max-group decision is a driver action at plan-BUILD time, which
    // breaks this operator's hinted zero-job construction contract
    // (PlanQualitySpec "hinted auto-sizers build plans without running
    // any job") — MinHash's operator never promised that, this one does.
    val intra = MinHashLsh.clonePairsBlocked(groups, blockSize)
      .toDF("a", "b", "j")
      .select(col("a"), col("b"), lit(0).as("hamming"))
    val cross = MinHashLsh.expandRepPairsBlocked(groups,
        candReps.select(col("ra"), col("rb"),
          col("hamming").cast("double").as("j")), blockSize)
      .toDF("a", "b", "j")
      .select(col("a"), col("b"), col("j").cast("int").as("hamming"))
    cross.unionByName(intra)
  }

  /** Scale-path simhash contract, mirroring
    * [[MinHashLsh.nearDuplicateClusters]]: ONE (doc_id, cluster) row per
    * input document — `cluster` is the minimum doc_id of the doc's
    * connected component in the hamming ≤ maxDist graph (identical
    * fingerprints collapse first; CC runs over the tiny rep-pair graph).
    * A 10⁶-copy boilerplate page costs 10⁶ assignment rows, never the
    * pair contract's 5·10¹¹ pairs. Unlike the MinHash cluster contract
    * this one is fully DETERMINISTIC (the pair join is exact, not
    * LSH-approximate), so the whole output is value-level oracle-able.
    */
  def hammingClusters(
      docs: org.apache.spark.sql.DataFrame,
      maxDist: Int = 3,
      numBlocks: Int = 0,
      numDocsHint: Long = 0L,
      scope: graft.util.CacheScope = new graft.util.CacheScope)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val (groups, candReps, _) =
      groupsAndRepPairs(docs, maxDist, numBlocks, numDocsHint, scope,
        cacheReps = false)
    // CC over rep pairs; ids zero-padded so Canonicalize's
    // lexicographic-min label == numeric-min doc id (the
    // nearDuplicateClusters pattern). The overall min doc id of a
    // component is always a representative (each rep is the min of its
    // fingerprint group), so min-rep == min-doc.
    def pad(c: org.apache.spark.sql.Column) = lpad(c.cast("string"), 20, "0")
    val edges = candReps.select(pad(col("ra")).as("src"), pad(col("rb")).as("dst"))
    val labels = graft.canon.Canonicalize.connectedComponents(edges)
      .select(col("node").cast("long").as("rep"),
        col("component").cast("long").as("cluster"))
    groups.join(labels, Seq("rep"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("cluster"), col("rep")).as("cluster"))
  }

  /** Shared front half: clone collapse over identical fingerprints,
    * block-combination candidate join, exact popcount verify. Returns
    * (groups = (id, rep) fingerprint membership, candReps = verified
    * (ra, rb, hamming) pairs BETWEEN representatives).
    */
  private def groupsAndRepPairs(
      docs: org.apache.spark.sql.DataFrame,
      maxDist: Int,
      numBlocks: Int,
      numDocsHint: Long,
      scope: graft.util.CacheScope,
      cacheReps: Boolean): (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.functions._
    require(maxDist >= 0 && maxDist < 64, s"maxDist $maxDist out of range")
    val b =
      if (numBlocks > 0) numBlocks
      else autoBlocks(
        if (numDocsHint > 0L) numDocsHint else docs.count(), maxDist)
    require(b > maxDist && b <= 64, s"numBlocks $b out of range for maxDist $maxDist")
    require(binom(b, maxDist) <= MaxCombos,
      s"numBlocks $b yields ${binom(b, maxDist)} combination tables (cap $MaxCombos)")
    // 1. collapse identical fingerprints first (the MinHashLsh clone-
    // collapse pattern): boilerplate clone groups — the dominant hot-key
    // source — enter the join as ONE representative, not m rows whose
    // m² pairs would concentrate in a single chunk-key task
    // cacheReps (the MinHashLsh reps-cache pattern — one narrow row
    // per DISTINCT fingerprint, the family's accepted cache budget):
    // the PAIRS path adds a max(n) dispatch action plus three join
    // consumers, where the cache measured −0.2 s; the CLUSTERS path's
    // consumers already share the aggregation exchange (AQE reuse) and
    // the same cache measured +0.2 s of pure barrier — so each caller
    // picks (interleaved best-of-5 ×3, r6 continuation)
    val repsRaw = docs.groupBy(col("h"))
      .agg(min("doc_id").as("rid"), count(lit(1)).as("n"))
    val reps = if (cacheReps) scope.own(repsRaw) else repsRaw
    // 2. one posexplode into (combo_idx, key) rows and ONE equality
    // self-join — not C(b, maxDist) separate self-joins, which would
    // evaluate the input lineage 2·C times
    val keyed = blockCombinationKeys(reps, maxDist, b)
    val candReps = keyed.as("x").join(keyed.as("y"),
        col("x.ci") === col("y.ci") && col("x.key") === col("y.key") &&
          col("x.rid") < col("y.rid"))
      .select(col("x.rid").as("ra"), col("x.h").as("ha"),
        col("y.rid").as("rb"), col("y.h").as("hb"))
      .distinct()
      .select(col("ra"), col("rb"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxDist)
    // groups deliberately NOT cached here: the clusters path consumes
    // it once (caching measured as pure barrier cost there); the pairs
    // path — three consumers — caches it itself
    val groups = docs.select(col("doc_id"), col("h"))
      .join(reps.select(col("h"), col("rid")), "h")
      .select(col("doc_id").as("id"), col("rid").as("rep"))
    (groups, candReps, reps)
  }
}
