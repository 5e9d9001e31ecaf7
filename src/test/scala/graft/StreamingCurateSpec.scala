package graft

import org.scalatest.funsuite.AnyFunSuite

class StreamingCurateSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def corpus: Seq[(Long, String)] = {
    val good = "the quick brown fox jumps over the lazy dog and then " +
      "walks along the river bank for a while at dusk in the calm evening " +
      "before it returns to the den where the young foxes wait for food"
    Seq(
      (0L, good),
      (1L, good + " with a small difference at the end of the text"),
      (2L, good), // exact clone of 0 → duplicate
      (3L, "der die das und in den von zu mit sich des auf für ist im " +
        "dem nicht ein eine als auch es an werden aus er hat dass sie"), // lang
      (4L, "the 123456789 987654321 111111111 222222222"), // quality (en, digit-heavy)
      (5L, ("the cat sat on the mat " * 30).trim), // repetition (top bigram, en)
      (6L, good)) // second clone → duplicate
  }

  test("streaming curation == batch curateFull on a replayed corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stream_curate").toString
    corpus.map { case (id, text) =>
      graft.streaming.StreamingDedup.DocIn(
        id, new java.sql.Timestamp(1600000000000L + id * 1000L), text)
    }.toDS().toDF().coalesce(2).write.mode("overwrite").parquet(s"$dir/in")
    graft.streaming.StreamingCurate.run(
      spark, s"$dir/in", "sc_spec", s"$dir/out")
    val streamed = spark.read.parquet(s"$dir/out")
      .select("doc_id", "lang_pred", "composite", "top_bigram_frac",
        "dup_line_frac", "verdict", "kept")
      .as[(Long, String, Double, Double, Double, String, Boolean)]
      .collect().toSet
    val batch = graft.pipeline.Curate.curateFull(corpus.toDS())
      .select("doc_id", "lang_pred", "composite", "top_bigram_frac",
        "dup_line_frac", "verdict", "kept")
      .as[(Long, String, Double, Double, Double, String, Boolean)]
      .collect().toSet
    assert(streamed == batch,
      s"stream/batch divergence:\n only stream: ${streamed -- batch}\n" +
        s" only batch: ${batch -- streamed}")
    // sanity on the planted shapes
    val verdicts = streamed.map(r => r._1 -> r._6).toMap
    assert(verdicts(0L) == "kept" && verdicts(2L) == "duplicate" &&
      verdicts(6L) == "duplicate")
    assert(verdicts(3L) == "lang" && verdicts(4L) == "quality" &&
      verdicts(5L) == "repetition")
  }

  test("streaming cascade with benchmark grams == batch curateDecontaminated") {
    import spark.implicits._
    val secret = (1 to 20).map(i => s"benchword$i").mkString(" ")
    val good = "the quick brown fox jumps over the lazy dog and then " +
      "walks along the river bank for a while at dusk in the calm evening"
    val all = corpus ++ Seq((7L, s"$good extended with $secret inside"))
    val grams = graft.dedup.Decontaminate.benchmarkGramArray(
      Seq(secret).toDS(), 13)
    val dir = java.nio.file.Files.createTempDirectory("stream_decon").toString
    all.map { case (id, text) =>
      graft.streaming.StreamingDedup.DocIn(
        id, new java.sql.Timestamp(1600000000000L + id * 1000L), text)
    }.toDS().toDF().coalesce(2).write.mode("overwrite").parquet(s"$dir/in")
    graft.streaming.StreamingCurate.run(
      spark, s"$dir/in", "sc_decon", s"$dir/out", benchGrams = grams)
    val streamed = spark.read.parquet(s"$dir/out")
      .select("doc_id", "verdict", "kept")
      .as[(Long, String, Boolean)].collect().toSet
    val batch = graft.pipeline.Curate.curateDecontaminated(all.toDS(), grams)
      .select("doc_id", "verdict", "kept")
      .as[(Long, String, Boolean)].collect().toSet
    assert(streamed == batch,
      s"divergence:\n only stream: ${streamed -- batch}\n only batch: ${batch -- streamed}")
    assert(streamed.exists(r => r._1 == 7L && r._2 == "contaminated"))
  }

  test("streaming curation keeper state survives a checkpointed restart") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stream_curate_ckpt").toString
    val (first, second) = corpus.splitAt(4)
    def stage(rows: Seq[(Long, String)], mode: String): Unit =
      rows.map { case (id, text) =>
        graft.streaming.StreamingDedup.DocIn(
          id, new java.sql.Timestamp(1600000000000L + id * 1000L), text)
      }.toDS().toDF().coalesce(1).write.mode(mode).parquet(s"$dir/in")
    stage(first, "overwrite")
    graft.streaming.StreamingCurate.run(spark, s"$dir/in", "sc_ckpt",
      s"$dir/out", checkpoint = Some(s"$dir/ckpt"))
    stage(second, "append")
    graft.streaming.StreamingCurate.run(spark, s"$dir/in", "sc_ckpt",
      s"$dir/out", checkpoint = Some(s"$dir/ckpt"))
    val verdicts = spark.read.parquet(s"$dir/out")
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    // doc 6 (clone of doc 0, arriving AFTER the restart) must still be
    // seen as a duplicate — keeper state was restored from the checkpoint
    assert(verdicts(6L) == "duplicate",
      s"keeper state lost across restart: $verdicts")
    assert(verdicts(0L) == "kept")
    assert(verdicts.size == corpus.size)
  }
}
