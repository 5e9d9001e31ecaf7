package graft.dedup

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.PyStr

/** MinHash + LSH banding for near-duplicate detection at corpus scale.
  *
  * shingle (word 3-grams, 64-bit hashed) → 64 minhash values → 16 bands ×
  * 4 rows; docs sharing any (band, bandHash) bucket are near-dup
  * candidates. Verification never ships full texts per candidate pair:
  *
  *  1. exact clones collapse to one representative first (hash groupBy —
  *     a 10^6-copy boilerplate page costs one group, not 10^12 pairs in
  *     the LSH join),
  *  2. candidate pairs are prescreened on their minhash SIGNATURES
  *     (512 B each, already computed) — the estimated Jaccard is an
  *     unbiased binomial estimate of the true one, so a loose margin
  *     below the threshold keeps essentially all true positives,
  *  3. only surviving pairs fetch the two texts for exact shingle-Jaccard,
  *  4. clone groups expand back through the representative pairs.
  *
  * Deterministic throughout: splitmix64-seeded hashes, FNV-1a shingle
  * hashing (full 64-bit space — 32-bit `String.hashCode` saturates at web
  * scale and inflates Jaccard estimates).
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

  /** FNV-1a (over UTF-16 code units, splitmix64-finalized — a true 64-bit
    * shingle space) of `toks.slice(from, until).mkString(" ")` WITHOUT
    * materializing the joined string (hashes the separator char directly
    * between tokens) — byte-identical to hashing the join, minus one
    * string allocation+copy per shingle in the hottest loop of the dedup
    * family (guide §1.2 step 2: per-task work).
    */
  @inline private def hash64Join(
      toks: Array[String], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var t = from
    while (t < until) {
      if (t > from) { h ^= ' '; h *= 0x100000001b3L }
      val s = toks(t)
      var i = 0
      while (i < s.length) {
        h ^= s.charAt(i)
        h *= 0x100000001b3L
        i += 1
      }
      t += 1
    }
    mix64(h)
  }

  def shingles(text: String, k: Int = 3): Iterator[Long] = {
    val toks = PyStr.split(PyStr.lower(text)).toArray
    if (toks.length < k) Iterator.single(hash64Join(toks, 0, toks.length))
    else Iterator.range(0, toks.length - k + 1)
      .map(i => hash64Join(toks, i, i + k))
  }

  /** mix64(i) for lane i — loop-invariant across shingles, precomputed
    * once per JVM instead of NumHashes times per shingle (it was half of
    * every signature's mix64 work; values identical by construction).
    */
  private val SeedMix: Array[Long] =
    Array.tabulate(NumHashes)(i => mix64(i.toLong))

  def signature(text: String): Array[Long] = {
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    val seeds = SeedMix
    shingles(text).foreach { sh =>
      var i = 0
      while (i < NumHashes) {
        val h = mix64(sh ^ seeds(i))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** Fraction of agreeing minhash components — the unbiased estimator of
    * Jaccard similarity.
    */
  def estimateJaccard(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0
    var i = 0
    while (i < NumHashes) {
      if (a(i) == b(i)) eq += 1
      i += 1
    }
    eq.toDouble / NumHashes
  }

  def bandRowsFromSignature(docId: Long, sig: Array[Long]): Seq[BandRow] =
    (0 until Bands).map { b =>
      var h = 1125899906842597L
      var r = 0
      while (r < RowsPerBand) {
        h = h * 31 + sig(b * RowsPerBand + r)
        r += 1
      }
      BandRow(docId, b, h)
    }

  def bandRows(docId: Long, text: String): Seq[BandRow] =
    bandRowsFromSignature(docId, signature(text))

  /** (doc, band, bandHash) rows — group by (band, band_hash) downstream for
    * candidate pairs.
    */
  def bands(docs: Dataset[(Long, String)]): Dataset[BandRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.flatMap { case (id, text) => bandRows(id, text) }
  }

  /** Full near-duplicate detection. Returns pairs (a, b, jaccard) with
    * a < b and exact shingle-Jaccard ≥ threshold.
    *
    * @param sigMargin  how far below `threshold` the signature ESTIMATE may
    *                   fall before the pair is dropped unverified. 64
    *                   hashes give the estimate a binomial sd of
    *                   ≈ sqrt(j(1-j)/64) ≤ 0.0625; the default 3σ margin
    *                   keeps ≥99.8% of true borderline pairs while
    *                   filtering the bulk of sub-threshold candidates
    *                   before any text is shuffled.
    * @param bandBucketCap drop band buckets larger than this many DISTINCT
    *                   texts (exact clones are already collapsed, so a hit
    *                   means >cap genuinely-different texts collide in one
    *                   band — overwhelmingly boilerplate; capped buckets
    *                   are counted in the other 15 bands anyway).
    */
  /** Shared front half of near-dup detection: exact-clone collapse,
    * LSH banding over representatives, signature prescreen, exact
    * verification. Returns (groups = (id, rep) clone membership,
    * repPairs = verified near-dup pairs BETWEEN representatives).
    * `groups`/`sigs` are cached into the caller-owned `scope` — no
    * JVM-global cache registry, so concurrent calls never touch each
    * other's intermediates.
    */
  private def cloneGroupsAndRepPairs(
      docs: Dataset[(Long, String)],
      threshold: Double,
      sigMargin: Double,
      bandBucketCap: Int,
      scope: graft.util.CacheScope): (DataFrame, DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._

    // 1. collapse exact clones: one representative (min id) per text hash.
    // 128-bit MD5, not a 64-bit hash: merging on 64 bits produces ~n²/2⁶⁵
    // false merges — real collisions at 10¹²-doc scale (≈27k), negligible
    // at 128 bits. (64-bit hashing stays fine for SHINGLES, where minhash
    // tolerates rare collisions statistically.)
    // The digest runs ONCE: the old (id, h, text) mapPartitions fed three
    // consumers, each of which re-ran the full decode+digest text pass
    // (opaque closure — nothing prunes). Now the narrow (id, h) pair —
    // 25 B/doc, the same magnitude as the `groups` cache the operator
    // already takes — is computed in one pass and cached into the scope;
    // representative TEXTS come from a second plain scan of `docs`
    // semi-joined against the rep ids (no digest on that pass). Built-in
    // md5() was tried and REVERTED: Spark's Md5 expression constructs a
    // MessageDigest per ROW (commons-codec), and the synchronized JCA
    // provider lookup measured ~1 s SLOWER per query at 32 threads than
    // the per-partition digest this closure keeps.
    val idHash = scope.own(docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { case (id, text) =>
        (id, java.util.Base64.getEncoder.encodeToString(
          md.digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))))
      }
    }.toDF("id", "h"))
    // one aggregation yields the representative AND the clone-group size
    // (n rides along so the pairs path's blocked-vs-direct decision can
    // read max(n) off this cache instead of re-aggregating `groups`)
    val reps = scope.own(idHash.groupBy("h")
      .agg(min("id").as("rep"), count(lit(1)).as("n")))
    val groups = scope.own(
      idHash.join(reps, "h").select(col("id"), col("rep")))
    val repDocs = docs.toDF("id", "text")
      .join(reps.select(col("rep").as("id")), "id")
      .as[(Long, String)]

    // 2. LSH candidates over representatives, signatures computed ONCE
    val sigs = scope.own(
      repDocs.map { case (id, text) => (id, signature(text)) }.toDF("id", "sig"))
    // Candidate pairs as ONE shuffle on (band, band_hash): each bucket
    // group emits its in-bucket (a < b) pairs directly, with the cap
    // enforced in-group (an over-cap bucket drains without emitting —
    // same drop rule as before). This replaces the former bucket-size
    // aggregation + size join + bCapped SELF-join (which shipped every
    // band row twice and evaluated the banding lineage per side) —
    // strictly fewer exchanges and fewer shuffled bytes at any scale;
    // per-task bounds unchanged (≤ cap ids held, ≤ cap² pairs emitted
    // per bucket, exactly the old join task's bound).
    val candidates = sigs.as[(Long, Array[Long])]
      .flatMap { case (id, sig) =>
        bandRowsFromSignature(id, sig)
          .map(br => (br.doc_id, br.band, br.band_hash))
      }
      .groupByKey(r => (r._2, r._3))
      .flatMapGroups { (_, it) =>
        val buf = new scala.collection.mutable.ArrayBuffer[Long](8)
        var over = false
        it.foreach { r =>
          if (!over) {
            buf += r._1
            if (buf.length > bandBucketCap) over = true
          }
        }
        if (over) Iterator.empty
        else {
          val ids = buf.toArray
          java.util.Arrays.sort(ids)
          for {
            i <- ids.indices.iterator
            j <- (i + 1 until ids.length).iterator
          } yield (ids(i), ids(j))
        }
      }
      .toDF("a", "b")
      .distinct()

    // 3. signature prescreen: joins ship 512 B signatures, never texts
    val prescreened = candidates
      .join(sigs.withColumnRenamed("id", "a").withColumnRenamed("sig", "sa"), "a")
      .join(sigs.withColumnRenamed("id", "b").withColumnRenamed("sig", "sb"), "b")
      .select(col("a"), col("b"), col("sa"), col("sb"))
      .as[(Long, Long, Array[Long], Array[Long])]
      .map { case (aId, bId, sa, sb) => (aId, bId, estimateJaccard(sa, sb)) }
      .toDF("a", "b", "est")
      .filter(col("est") >= threshold - sigMargin)
      .select("a", "b")

    // 4. exact verification on the few survivors only
    val texts = repDocs.toDF("id", "text")
    val repPairs = prescreened
      .join(texts.withColumnRenamed("id", "a").withColumnRenamed("text", "ta"), "a")
      .join(texts.withColumnRenamed("id", "b").withColumnRenamed("text", "tb"), "b")
      .select(col("a"), col("b"), col("ta"), col("tb"))
      .as[(Long, Long, String, String)]
      .map { case (aId, bId, ta, tb) => (aId, bId, jaccard(ta, tb)) }
      .filter(_._3 >= threshold)
      .toDF("ra", "rb", "j")

    (groups, repPairs, reps)
  }

  /** Clone-internal pairs (jaccard 1.0) via BLOCKED enumeration: members
    * of each clone group are ranked, split into blocks of `blockSize`, and
    * each unordered block pair (bi ≤ bj) becomes an independent join key —
    * so a 10⁶-copy boilerplate group fans its m(m−1)/2 output pairs across
    * the cluster's reduce partitions instead of materializing them all in
    * ONE task (the round-2 scale-killer). Per join key, each side holds at
    * most `blockSize` rows, so no task's in-memory working set exceeds
    * 2·blockSize ids and no single key yields more than blockSize² pairs.
    * Only ids move — never texts. The O(m²) OUTPUT is inherent to the pair
    * contract; [[nearDuplicateClusters]] is the scale-path alternative.
    *
    * Exposed package-private for the boundedness spec.
    */
  private[graft] def clonePairsBlocked(
      groups: DataFrame,
      blockSize: Int): Dataset[(Long, Long, Double)] = {
    val spark = groups.sparkSession
    import spark.implicits._
    // rank within group: an O(m) sort per group (bounded work, unlike the
    // O(m²) enumeration this replaces)
    val w = Window.partitionBy("rep").orderBy("id")
    val ranked = groups
      .select(col("id"), col("rep"),
        ((row_number().over(w) - 1) / blockSize).cast("int").as("blk"))
    val nBlocks = ranked.groupBy("rep").agg(max("blk").as("max_blk"))
    // element of block b joins as LEFT for keys (b, c), c ∈ [b, maxBlk]
    val lefts = ranked.join(nBlocks, "rep")
      .select(col("id"), col("rep"), col("blk").as("bi"),
        explode(sequence(col("blk"), col("max_blk"))).as("bj"))
    // ... and as RIGHT for keys (a, b), a ∈ [0, b]
    val rights = ranked
      .select(col("id").as("rid"), col("rep"),
        explode(sequence(lit(0), col("blk"))).as("bi"), col("blk").as("bj"))
    lefts.join(rights, Seq("rep", "bi", "bj"))
      .filter(col("id") < col("rid"))
      .select(col("id"), col("rid"), lit(1.0).as("j"))
      .as[(Long, Long, Double)]
  }

  /** Per-task output for BOTH enumeration strategies is bounded by
    * blockSize²: when every clone group fits in one block the direct
    * single-shuffle paths already meet the bound (m(m−1)/2 ≤ blockSize²
    * and |A|·|B| ≤ blockSize²), so the blocked machinery (two window
    * ranks + explodes + wider joins — ~8 extra stages of fixed latency,
    * measured 3.3× on the sf0.1 bench where no group exceeds a handful
    * of clones) engages adaptively, only when a group is bigger than one
    * block. One cheap max-group-size job on the cached membership makes
    * the decision.
    *
    * Cache lifetime: intermediates (`groups`, `sigs`) are cached into
    * `scope`. Pass your own [[graft.util.CacheScope]] and close it after
    * the action that consumes the returned Dataset; with the default
    * (a fresh, never-closed scope) the caches live until the harness's
    * between-query `spark.catalog.clearCache()` or session end. Calls
    * are concurrency-safe either way — no shared mutable state.
    */
  def nearDuplicatePairs(
      docs: Dataset[(Long, String)],
      threshold: Double = 0.8,
      sigMargin: Double = 0.19,
      bandBucketCap: Int = 100000,
      cloneBlockSize: Int = 4096,
      scope: graft.util.CacheScope = new graft.util.CacheScope)
      : Dataset[(Long, Long, Double)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (groups, repPairs, reps) =
      cloneGroupsAndRepPairs(docs, threshold, sigMargin, bandBucketCap, scope)

    // max clone-group size straight off the cached reps table (count
    // per h ≡ count per rep; h↔rep is 1:1) — the former groups
    // re-aggregation cost an extra exchange per invocation
    val maxGroup = reps.agg(max("n")).as[Option[Long]].head().getOrElse(0L)

    val clonePairs =
      if (maxGroup <= cloneBlockSize) clonePairsDirect(groups)
      else clonePairsBlocked(groups, cloneBlockSize)
    val expanded =
      if (maxGroup <= cloneBlockSize) expandRepPairsDirect(groups, repPairs)
      else expandRepPairsBlocked(groups, repPairs, cloneBlockSize)
    expanded.union(clonePairs)
  }

  /** Single-shuffle clone enumeration — valid only when every group fits
    * one block (per-task output then ≤ blockSize² by construction).
    */
  private def clonePairsDirect(groups: DataFrame): Dataset[(Long, Long, Double)] = {
    val spark = groups.sparkSession
    import spark.implicits._
    groups.select("id", "rep").as[(Long, Long)].groupByKey(_._2)
      .flatMapGroups { (_, it) =>
        val ids = it.map(_._1).toArray.sorted
        for {
          i <- ids.indices.iterator
          j <- (i + 1 until ids.length).iterator
        } yield (ids(i), ids(j), 1.0)
      }
  }

  /** Two-join expansion — same small-group precondition as
    * [[clonePairsDirect]].
    */
  private def expandRepPairsDirect(
      groups: DataFrame,
      repPairs: DataFrame): Dataset[(Long, Long, Double)] = {
    val spark = groups.sparkSession
    import spark.implicits._
    repPairs
      .join(groups.withColumnRenamed("rep", "ra").withColumnRenamed("id", "ea"), "ra")
      .join(groups.withColumnRenamed("rep", "rb").withColumnRenamed("id", "eb"), "rb")
      .select(
        least(col("ea"), col("eb")).as("a"),
        greatest(col("ea"), col("eb")).as("b"),
        col("j"))
      .as[(Long, Long, Double)]
  }

  /** Expand verified representative pairs back through their clone
    * groups, BLOCKED on both sides: pair (ra, rb) between an |A|-clone
    * and a |B|-clone group yields |A|·|B| output pairs — inherent to the
    * pair contract — but a plain join keyed on ra/rb would compute each
    * pair's whole product in ONE task (two mutually-near-dup boilerplate
    * groups = the same blow-up shape the clone enumeration had). Members
    * of each side are split into blocks of `blockSize` and every
    * (ra, rb, blockA, blockB) cell becomes an independent join key.
    */
  private[graft] def expandRepPairsBlocked(
      groups: DataFrame,
      repPairs: DataFrame,
      blockSize: Int): Dataset[(Long, Long, Double)] = {
    val spark = groups.sparkSession
    import spark.implicits._
    val w = Window.partitionBy("rep").orderBy("id")
    val ranked = groups
      .select(col("id"), col("rep"),
        ((row_number().over(w) - 1) / blockSize).cast("int").as("blk"))
    val nBlocks = ranked.groupBy("rep").agg(max("blk").as("max_blk"))
    // left: members of ra, replicated across rb's blocks
    val lhs = repPairs
      .join(ranked.select(col("rep").as("ra"), col("id").as("ea"), col("blk").as("bi")), "ra")
      .join(nBlocks.select(col("rep").as("rb"), col("max_blk").as("max_b")), "rb")
      .select(col("ra"), col("rb"), col("j"), col("ea"), col("bi"),
        explode(sequence(lit(0), col("max_b"))).as("bj"))
    // right: members of rb, replicated across ra's blocks
    val rhs = repPairs.select(col("ra"), col("rb"))
      .join(ranked.select(col("rep").as("rb"), col("id").as("eb"), col("blk").as("bj")), "rb")
      .join(nBlocks.select(col("rep").as("ra"), col("max_blk").as("max_a")), "ra")
      .select(col("ra"), col("rb"), col("eb"), col("bj"),
        explode(sequence(lit(0), col("max_a"))).as("bi"))
    lhs.join(rhs, Seq("ra", "rb", "bi", "bj"))
      .select(
        least(col("ea"), col("eb")).as("a"),
        greatest(col("ea"), col("eb")).as("b"),
        col("j"))
      .as[(Long, Long, Double)]
  }

  /** Scale-path near-dup contract: one (doc_id, cluster) assignment per
    * input document instead of O(m²) pairs — `cluster` is the minimum
    * doc_id of the doc's near-duplicate cluster (exact clones collapsed
    * first, verified near-dup representative pairs then merged by
    * connected components). Singleton documents map to themselves, so the
    * output is exactly |docs| rows: a 10⁶-copy boilerplate page costs 10⁶
    * assignment rows, not 5·10¹¹ pairs. Downstream dedup keeps
    * `doc_id == cluster` (the canonical copy) and drops the rest.
    */
  def nearDuplicateClusters(
      docs: Dataset[(Long, String)],
      threshold: Double = 0.8,
      sigMargin: Double = 0.19,
      bandBucketCap: Int = 100000,
      scope: graft.util.CacheScope = new graft.util.CacheScope)
      : Dataset[(Long, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (groups, repPairs, _) =
      cloneGroupsAndRepPairs(docs, threshold, sigMargin, bandBucketCap, scope)

    // CC over the rep-pair graph (tiny next to the corpus: only verified
    // near-dup representatives appear). Canonicalize.connectedComponents
    // picks the lexicographic-min label, so ids are zero-padded to make
    // string order equal numeric order.
    def pad(c: org.apache.spark.sql.Column) = lpad(c.cast("string"), 20, "0")
    val edges = repPairs.select(pad(col("ra")).as("src"), pad(col("rb")).as("dst"))
    val labels = graft.canon.Canonicalize.connectedComponents(edges)
      .select(col("node").cast("long").as("rep"),
        col("component").cast("long").as("cluster"))
    groups.join(labels, Seq("rep"), "left")
      .select(col("id"), coalesce(col("cluster"), col("rep")).as("cluster"))
      .as[(Long, Long)]
  }

  /** Exact word-shingle Jaccard for candidate verification. */
  def jaccard(a: String, b: String, k: Int = 3): Double = {
    val sa = shingles(a, k).toSet
    val sb = shingles(b, k).toSet
    if (sa.isEmpty && sb.isEmpty) 1.0
    else (sa & sb).size.toDouble / (sa | sb).size
  }
}
