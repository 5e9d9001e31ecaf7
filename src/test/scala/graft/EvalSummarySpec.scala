package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A5/A6 golden parity: one Spark aggregation over all golden per-triple
  * evaluations must reproduce every author's recorded summary block
  * (triple_evaluator_fast.py:252-275) — counts exactly, means within float
  * re-association tolerance.
  */
class EvalSummarySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val base = Paths.get("/root/reference/evaluation_outputs")

  test("evaluation summaries recompute from per-triple records") {
    assume(Files.exists(base))
    import spark.implicits._
    val mapper = new ObjectMapper()

    val rows = Vector.newBuilder[(String, Double, Boolean)]
    val goldenSummaries = Map.newBuilder[String, (Long, Long, Double, Long, Long)]
    Files.list(base).iterator.asScala.map(_.getFileName.toString).toVector.sorted
      .foreach { a =>
        val f = base.resolve(s"$a/evaluations/${a}_llm_evaluation.json")
        if (Files.exists(f)) {
          val root = mapper.readTree(Files.newInputStream(f))
          val evals = Option(root.get("evaluations")).toVector
            .flatMap(_.elements().asScala)
          evals.foreach { e =>
            rows += ((a,
              Option(e.get("confidence")).map(_.asDouble()).getOrElse(0.0),
              Option(e.get("extractable")).exists(_.asBoolean())))
          }
          val s = root.get("summary")
          if (s != null && evals.nonEmpty) {
            goldenSummaries += (a -> ((
              s.get("total_triples").asLong(),
              s.get("extractable_triples").asLong(),
              s.get("avg_confidence").asDouble(),
              s.get("high_confidence_50").asLong(),
              s.get("high_confidence_80").asLong())))
          }
        }
      }

    val df = rows.result().toDF("docId", "confidence", "extractable")
    val computed = df.groupBy("docId").agg(
      count(lit(1)).as("total"),
      sum(when(col("extractable"), 1L).otherwise(0L)).as("extractableN"),
      avg("confidence").as("avgConf"),
      sum(when(col("confidence") >= 0.5, 1L).otherwise(0L)).as("hc50"),
      sum(when(col("confidence") >= 0.8, 1L).otherwise(0L)).as("hc80"))
      .as[(String, Long, Long, Double, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

    val golden = goldenSummaries.result()
    assert(golden.size >= 90)
    golden.foreach { case (a, (tot, ext, avgC, h50, h80)) =>
      val (cTot, cExt, cAvg, cH50, cH80) = computed(a)
      assert(cTot == tot, s"$a total")
      assert(cExt == ext, s"$a extractable")
      assert(cH50 == h50, s"$a hc50")
      assert(cH80 == h80, s"$a hc80")
      assert(math.abs(cAvg - avgC) < 1e-9, s"$a avg_confidence $cAvg vs $avgC")
    }
    info(s"validated ${golden.size} author summaries")
  }
}
