package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.DocIn

class StreamingDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def ts(minute: Int) = Timestamp.valueOf(f"2025-09-27 10:$minute%02d:00")

  private val boiler = ("the same boilerplate footer content mirrored " +
    "across many hosts with identical wording throughout ") * 3
  private val variant = boiler.replace("identical wording", "slightly altered wording")
  private def fresh(i: Int) =
    s"completely distinct document number $i about topic$i " +
      s"and subject${i * 7} with unique words like word${i * 13} appearing"

  test("streaming near-dup: state carries across micro-batches, first-seen wins") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sdedup_docs").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sdedup_ckpt").toString

    // batch 1: the boilerplate original + distinct docs
    (Seq(DocIn(5L, ts(1), boiler)) ++ (10L to 14L).map(i => DocIn(i, ts(2), fresh(i.toInt))))
      .toDS().write.mode("append").parquet(dir)
    val v1 = StreamingDedup.runOnce(spark, dir, "sdedup_q", threshold = 0.5,
      checkpoint = Some(ckpt)).collect()
    assert(v1.isEmpty, s"no dups expected in batch 1: ${v1.toSeq}")

    // batch 2 (new files, same checkpoint): an exact clone of doc 5, a
    // near variant, and a genuinely new doc
    Seq(DocIn(20L, ts(30), boiler), DocIn(21L, ts(31), variant),
      DocIn(22L, ts(32), fresh(99))).toDS().write.mode("append").parquet(dir)
    val v2 = StreamingDedup.runOnce(spark, dir, "sdedup_q", threshold = 0.5,
      checkpoint = Some(ckpt))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(v2.contains(20L) && v2(20L)._1 == 5L && v2(20L)._2 == 1.0,
      s"clone not flagged against prior state: $v2")
    assert(v2.contains(21L) && v2(21L)._1 == 5L && v2(21L)._2 >= 0.5,
      s"near variant not flagged: $v2")
    assert(!v2.contains(22L), s"fresh doc falsely flagged: $v2")
  }

  test("streaming near-dup: deterministic within-batch order, bounded buckets") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sdedup2_docs").toString
    // five clones in ONE batch, increasing event time; tiny bucketCap
    val docs = (0 until 5).map(i => DocIn(100L + i, ts(i + 1), boiler)).toDS()
    docs.write.mode("append").parquet(dir)
    val stream = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[DocIn].schema)
      .parquet(dir).as[DocIn]
    val name = "sdedup_bounded"
    spark.streams.active.filter(_.name == name).foreach(_.stop())
    val q = StreamingDedup.candidates(stream, threshold = 0.5, bucketCap = 2)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val verdicts = StreamingDedup.verdicts(spark.table(name))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    // first doc (100) is the first-seen representative; every later clone
    // is flagged against it even though the bucket capped at 2 members
    assert(!verdicts.contains(100L))
    (101L to 104L).foreach(id => assert(verdicts.get(id).contains(100L),
      s"$id not flagged against first-seen rep: $verdicts"))
  }

  test("production sink: per-batch verdict partitions match the in-memory harness") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sdedup3_docs").toString
    val out = java.nio.file.Files.createTempDirectory("sdedup3_out").toString + "/v"
    (Seq(DocIn(5L, ts(1), boiler), DocIn(6L, ts(2), boiler),
      DocIn(7L, ts(3), variant)) ++
      (10L to 12L).map(i => DocIn(i, ts(4), fresh(i.toInt))))
      .toDS().write.mode("append").parquet(dir)
    StreamingDedup.run(spark, dir, "sdedup_prod", out, threshold = 0.5)
    val table = spark.read.parquet(out)
      .select("doc_id", "dup_of", "est")
      .as[(Long, Long, Double)].collect().toSet
    val harness = StreamingDedup.runOnce(spark, dir, "sdedup_prod_ref",
        threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(table == harness && table.nonEmpty,
      s"written table $table != harness $harness")
    // partition layout: one batch=<id> dir per micro-batch, so a batch
    // replayed after failure overwrites its own partition (idempotent)
    val parts = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName)
    assert(parts.nonEmpty && parts.forall(_.startsWith("batch=")), parts.toSeq)
  }

  test("event-time eviction: a dup arriving past the watermark is MISSED — the documented state-bound trade-off") {
    import spark.implicits._
    def minutes(m: Int) = Timestamp.valueOf(f"2025-09-27 ${10 + m / 60}%02d:${m % 60}%02d:00")
    def driveBatches(watermark: String): Map[Long, Long] = {
      val dir = java.nio.file.Files.createTempDirectory("sdedup4_docs").toString
      val ckpt = java.nio.file.Files.createTempDirectory("sdedup4_ckpt").toString
      val out0 = java.nio.file.Files.createTempDirectory("sdedup4_out").toString + "/v"
      def batch(docs: Seq[DocIn]): Unit = {
        docs.toDS().write.mode("append").parquet(dir)
        StreamingDedup.run(spark, dir, s"sdedup_evict_$watermark", out0,
          threshold = 0.5, checkpoint = Some(ckpt), watermark = watermark)
      }
      // b1: the original; b2/b3: unrelated fillers whose event times
      // advance the watermark past the original's bucket timeouts (the
      // timeout fires in b3, when the bucket sees no data and the
      // watermark — derived from b2's max event time — has passed it)
      batch(Seq(DocIn(1L, minutes(1), boiler)))
      batch(Seq(DocIn(2L, minutes(150), fresh(2))))
      batch(Seq(DocIn(3L, minutes(160), fresh(3))))
      // b4: an exact clone of doc 1, arriving 159 minutes after it
      batch(Seq(DocIn(4L, minutes(170), boiler)))
      spark.read.parquet(out0).select("doc_id", "dup_of")
        .as[(Long, Long)].collect().toMap
    }
    // 1-hour watermark: doc 1's buckets were evicted before the clone
    // arrived — the clone is NOT flagged (inherent false negative of
    // bounded state; arrival gap 159 min > 60 min delay)
    val evicted = driveBatches("1 hours")
    assert(!evicted.contains(4L),
      s"clone should MISS after eviction: $evicted")
    // 6-hour watermark on the same arrival pattern: state survives the
    // gap and the clone IS flagged — the miss window is exactly the
    // watermark delay, the knob operators size against recrawl cadence
    val kept = driveBatches("6 hours")
    assert(kept.get(4L).contains(1L),
      s"clone should match with a watermark longer than the gap: $kept")
  }
}
