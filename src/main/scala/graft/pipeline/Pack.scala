package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.util.PyStr

/** Sequence packing for training-data serving — the concat-and-chunk
  * layout (GPT-style): documents are concatenated in doc_id order and
  * split into fixed `chunkTokens` windows; each document maps to its
  * half-open global token span [tok_start, tok_start + n_tokens) and
  * the inclusive chunk range [first_chunk, last_chunk] it overlaps
  * (−1/−1 for token-less documents, which occupy no span).
  *
  * The global running sum is computed SCALABLY, never through a
  * global-order window (whose plan collapses the corpus into ONE
  * task): documents are bucketed into contiguous doc_id ranges by
  * ARITHMETIC (pid = (doc_id − min)·B / span over B = 32·P buckets —
  * deterministic, no RangePartitioner sampling; 32× more buckets than
  * partitions so the pid→partition hash spreads evenly, guide §2.5),
  * per-bucket token totals are a tiny B-row driver collect, and the
  * cumulative bucket offsets ride back as a broadcast for a single map
  * pass. Two jobs total (min/max + totals) before the output pass; all
  * of them scan only (doc_id, n_tokens) — never text.
  *
  * doc_id DENSITY CONTRACT: pids bucket by id VALUE, so ids should fill
  * their [min, max] range reasonably densely (a sparse space such as
  * `monotonically_increasing_id` output collapses rows into few buckets
  * — still correct, but serialized; a loud warning fires and callers
  * should re-key by rank first).
  *
  * Token counts use the engine's standard whitespace tokenization
  * (PyStr.split — mirrored by `regexp_extract_all(text, '\S+')`).
  */
object Pack {

  def concatChunks(
      docs: Dataset[(Long, String)],
      chunkTokens: Int,
      partitions: Int = 0,
      scope: graft.util.CacheScope = new graft.util.CacheScope): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val parts =
      if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions

    // cached: (doc_id, n_tokens) is consumed by THREE actions (bounds,
    // totals, output) — without the cache each re-runs the text scan +
    // tokenization, two extra full-corpus passes at scale. Tiny rows
    // (16 B/doc); lifetime via the CacheScope convention
    val counted = scope.own(docs
      .map { case (id, text) => (id, PyStr.split(text).length.toLong) }
      .toDF("doc_id", "n_tokens"))

    // deterministic contiguous range bucketing (no sampling): pid is a
    // pure function of doc_id and the corpus [min, max]
    val bounds = counted.agg(min("doc_id"), max("doc_id")).head()
    if (bounds.isNullAt(0)) return spark.emptyDataFrame
      .select(lit(0L).as("doc_id"), lit(0L).as("n_tokens"),
        lit(0L).as("tok_start"), lit(-1L).as("first_chunk"),
        lit(-1L).as("last_chunk")).limit(0)
    val lo = bounds.getLong(0)
    val span = bounds.getLong(1) - lo + 1
    // 32x more range buckets than physical partitions: hashing a key
    // with only `parts` distinct values into `parts` partitions leaves
    // some partitions empty and others holding 2-3 buckets (the
    // guide-§2.5 synthetic-key collision skew); with parts·32 buckets
    // the hash spreads evenly and the per-bucket offset table is still
    // a tiny driver collect
    val buckets = parts * 32
    // fail fast on pathological id ranges: (doc_id − lo) · buckets must
    // not overflow Long (span itself wraps when ids span more than half
    // the Long domain, e.g. 64-bit hash-derived doc_ids) — a
    // non-monotone pid would silently corrupt the running-sum reseeding
    require(span > 0 && span <= Long.MaxValue / buckets,
      s"doc_id range [$lo, ${bounds.getLong(1)}] too wide for arithmetic " +
        s"range bucketing with $buckets buckets; re-key doc ids densely")
    val pidCol = ((col("doc_id") - lo) * buckets / span).cast("int")

    val bucketed = counted
      .repartition(parts, pidCol)
      .sortWithinPartitions("doc_id")
      .select(col("doc_id"), col("n_tokens"), pidCol.as("pid"))

    // per-bucket totals: buckets rows to the driver, cumulated in pid order
    val totals = bucketed.groupBy("pid")
      .agg(sum("n_tokens").as("tot"), count(lit(1)).as("nd"))
      .as[(Int, Long, Long)].collect()
    // density guard (documented contract: pid buckets by id VALUE, so a
    // sparse id space — e.g. monotonically_increasing_id, whose partition
    // index occupies the high bits — collapses rows into a handful of
    // buckets and serializes the output pass). Correctness is unaffected;
    // make the degeneration LOUD instead of a silent straggler.
    val nDocs = totals.iterator.map(_._3).sum
    if (totals.length.toLong < math.min(buckets.toLong, nDocs) / 8)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"Pack.concatChunks: $nDocs docs landed in only ${totals.length} of " +
          s"$buckets id-range buckets — doc_id space looks sparse; re-key " +
          "ids densely (rank) or pass explicit partitions to spread load")
    val offsets = new Array[Long](buckets)
    var acc = 0L
    val totMap = totals.iterator.map(t => (t._1, t._2)).toMap
    (0 until buckets).foreach { p =>
      offsets(p) = acc
      acc += totMap.getOrElse(p, 0L)
    }
    val bc = spark.sparkContext.broadcast(offsets)

    // several pids can hash into one physical partition; the doc_id
    // sort keeps each pid's rows contiguous (pid is monotone in
    // doc_id), so the running sum re-seeds from the broadcast offset
    // at every pid boundary
    bucketed.as[(Long, Long, Int)]
      .mapPartitions { it =>
        var curPid = -1
        var cum = 0L
        it.map { case (id, n, pid) =>
          if (pid != curPid) { curPid = pid; cum = bc.value(pid) }
          val start = cum
          cum += n
          val first = if (n == 0L) -1L else start / chunkTokens
          val last = if (n == 0L) -1L else (start + n - 1) / chunkTokens
          (id, n, start, first, last)
        }
      }
      .toDF("doc_id", "n_tokens", "tok_start", "first_chunk", "last_chunk")
  }
}
