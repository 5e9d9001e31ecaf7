package graft.dedup

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.util.PyStr

/** Benchmark decontamination — the C4/GPT-3/Gopher 13-gram protocol:
  * remove training documents that share any n-gram of tokens with a
  * held-out evaluation/benchmark set, so eval scores measure
  * generalization rather than memorized test items. (Brown et al. 2020
  * §C used 13-gram overlap; Rae et al. 2021 and Raffel et al. 2020
  * apply the same shape.)
  *
  * Contract: a document is `contaminated` iff at least one of its
  * n-grams (lowercased whitespace tokens, sliding windows of `n`,
  * documents shorter than `n` tokens have NO grams) occurs anywhere in
  * the benchmark set's n-grams; `n_hits` counts the document's DISTINCT
  * overlapping grams. Grams travel as 64-bit FNV-1a/splitmix hashes
  * (8 B each, never the ~100 B strings) — the same
  * collision-is-statistically-negligible stance as the MinHash shingle
  * space ([[MinHashLsh]] scaladoc).
  *
  * Scale shape (never all-pairs):
  *  - benchmark sets are almost always SMALL next to the corpus (an
  *    eval suite is ~10⁴–10⁶ items): their distinct gram hashes are
  *    collected, sorted, and broadcast, and the corpus side is a
  *    single map-only pass with binary-search membership — zero
  *    shuffle of corpus data;
  *  - past `broadcastMaxGrams` the operator switches to a hash
  *    equi-join: per-doc-distinct (doc_id, gram_hash) rows against the
  *    distinct benchmark grams, then a count per doc — the shuffle is
  *    |matching grams|, bounded by corpus tokens, with no quadratic
  *    term anywhere.
  *
  * Both paths return one row per input document:
  * (doc_id, n_hits, contaminated).
  */
object Decontaminate {

  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a (UTF-16 code units, splitmix64-finalized) of
    * `toks.slice(from, until).mkString(" ")` WITHOUT materializing the
    * joined string — byte-identical values (the q77 oracle contract),
    * minus one ~n-token string allocation+copy per gram in the
    * decontamination hot loop (guide §1.2 step 2).
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

  /** Sliding n-gram hashes of a text; empty when the text has fewer
    * than `n` tokens (a short doc cannot contain a benchmark n-gram).
    */
  def gramHashes(text: String, n: Int): Iterator[Long] =
    gramHashesTokens(PyStr.split(PyStr.lower(text)), n)

  /** [[gramHashes]] over pre-lowered, pre-split tokens (the shared-pass
    * cascade entry). Must receive `PyStr.split(PyStr.lower(text))`.
    */
  def gramHashesTokens(toks: Vector[String], n: Int): Iterator[Long] =
    if (toks.length < n) Iterator.empty
    else {
      val arr = toks.toArray
      Iterator.range(0, arr.length - n + 1)
        .map(i => hash64Join(arr, i, i + n))
    }

  /** Distinct benchmark gram hashes, sorted for binary search. Driver
    * memory: 8 B per distinct gram (the broadcast path is only taken up
    * to `broadcastMaxGrams`, 16M grams = 128 MB worst case at the
    * default cap; size the cap to the driver).
    */
  def benchmarkGramArray(benchmark: Dataset[String], n: Int): Array[Long] = {
    val spark = benchmark.sparkSession
    import spark.implicits._
    val arr = benchmark
      .flatMap(gramHashes(_, n).toSeq.distinct)
      .distinct()
      .collect()
    java.util.Arrays.sort(arr)
    arr
  }

  /** Distinct overlapping grams of one text against a sorted gram
    * array; 0 (and no gram pass at all) when the array is empty. The
    * ONE implementation every caller shares — the broadcast operator
    * path and all three curation cascades ([[graft.pipeline.DocSignals]]).
    */
  def countHits(text: String, sortedGrams: Array[Long], n: Int): Int =
    if (sortedGrams.isEmpty) 0
    else countHitsTokens(PyStr.split(PyStr.lower(text)), sortedGrams, n)

  /** [[countHits]] over pre-lowered, pre-split tokens (the shared-pass
    * cascade entry). Must receive `PyStr.split(PyStr.lower(text))`.
    */
  def countHitsTokens(toks: Vector[String], sortedGrams: Array[Long], n: Int): Int =
    if (sortedGrams.isEmpty) 0
    else {
      val seen = new java.util.HashSet[java.lang.Long]()
      var hits = 0
      gramHashesTokens(toks, n).foreach { g =>
        if (java.util.Arrays.binarySearch(sortedGrams, g) >= 0 && seen.add(g))
          hits += 1
      }
      hits
    }

  /** Map-only contamination pass against a broadcast sorted gram array
    * — the small-benchmark fast path, also reusable inside a wider
    * single-scan cascade ([[graft.pipeline.Curate.curateDecontaminated]]).
    */
  def overlapBroadcast(
      docs: Dataset[(Long, String)],
      benchGrams: Array[Long],
      n: Int = 13): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(benchGrams)
    docs.mapPartitions { it =>
      val grams = bc.value
      it.map { case (id, text) => (id, countHits(text, grams, n)) }
    }.toDF("doc_id", "n_hits")
      .withColumn("contaminated", col("n_hits") > 0)
  }

  /** Shuffle-path contamination: per-doc-distinct gram rows hash-joined
    * against the distinct benchmark grams. Used when the benchmark gram
    * set is too large to broadcast.
    */
  def overlapJoin(
      docs: Dataset[(Long, String)],
      benchmark: Dataset[String],
      n: Int = 13): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // distinct-per-doc inside the map task (a doc's gram set fits in
    // memory; its size is bounded by the doc's token count) — the global
    // distinct shuffle this avoids would be over the corpus's full gram
    // stream, the largest intermediate in the job
    val docGrams = docs.flatMap { case (id, text) =>
      val set = new java.util.HashSet[java.lang.Long]()
      gramHashes(text, n).foreach(set.add(_))
      val out = new Array[(Long, Long)](set.size)
      val itr = set.iterator()
      var i = 0
      while (itr.hasNext) { out(i) = (id, itr.next()); i += 1 }
      out.toSeq
    }.toDF("doc_id", "g")
    val benchGrams = benchmark
      .flatMap(gramHashes(_, n).toSeq.distinct)
      .toDF("g").distinct()
    val hits = docGrams.join(benchGrams, "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    docs.select(col("_1").as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).cast("int").as("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0)
  }

  /** The operator: picks broadcast vs join from the benchmark's distinct
    * gram count. `benchGramsHint` (e.g. from prior lineage) skips the
    * sizing job; without it the benchmark side — the SMALL side by
    * assumption — is counted once.
    */
  def ngramOverlap(
      docs: Dataset[(Long, String)],
      benchmark: Dataset[String],
      n: Int = 13,
      // 16M grams = 128 MB broadcast (8 B/gram): every executor holds it
      // plus the driver collect, so the safe OUT-OF-THE-BOX ceiling is
      // deliberately modest — callers with big drivers/executors can
      // opt UP (the former 64M default meant a 512 MB surprise)
      broadcastMaxGrams: Long = 16000000L,
      benchGramsHint: Long = 0L): DataFrame = {
    val spark = benchmark.sparkSession
    import spark.implicits._
    if (benchGramsHint > 0L) {
      if (benchGramsHint <= broadcastMaxGrams)
        overlapBroadcast(docs, benchmarkGramArray(benchmark, n), n)
      else overlapJoin(docs, benchmark, n)
    } else {
      // one derivation of the distinct gram set for BOTH the sizing
      // count and the broadcast collect (they used to run the
      // flatMap+distinct twice back-to-back); cache released eagerly —
      // the collect is an action, and the join path re-derives lazily
      // from `benchmark` itself
      val grams = benchmark.flatMap(gramHashes(_, n).toSeq.distinct)
        .distinct().cache()
      try {
        val nGrams = grams.count()
        if (nGrams <= broadcastMaxGrams) {
          val arr = grams.collect()
          java.util.Arrays.sort(arr)
          overlapBroadcast(docs, arr, n)
        } else overlapJoin(docs, benchmark, n)
      } finally grams.unpersist(false)
    }
  }
}
