package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** The no-data-batch wrapper must be strictly scoped: disabled inside the
  * drain, and the session's previous setting restored afterwards — a drain
  * must never leak its override into unrelated queries on the shared
  * session (Bench/Verify run everything on one session).
  */
class StreamRunSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark
  private val Key = "spark.sql.streaming.noDataMicroBatches.enabled"

  test("withoutNoDataBatches disables within scope and restores the prior value") {
    // explicit prior value -> restored exactly
    spark.conf.set(Key, "true")
    StreamRun.withoutNoDataBatches(spark) {
      assert(spark.conf.get(Key) == "false")
    }
    assert(spark.conf.get(Key) == "true")

    // no explicit prior value -> back to the engine default (enabled)
    spark.conf.unset(Key)
    StreamRun.withoutNoDataBatches(spark) {
      assert(spark.conf.get(Key) == "false")
    }
    assert(spark.conf.get(Key) == "true",
      "engine default for no-data micro-batches is enabled")

    // restored even when the drain throws
    spark.conf.set(Key, "true")
    intercept[RuntimeException] {
      StreamRun.withoutNoDataBatches(spark) { throw new RuntimeException("boom") }
    }
    assert(spark.conf.get(Key) == "true")
    spark.conf.unset(Key)
  }
}
