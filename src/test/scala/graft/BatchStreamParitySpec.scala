package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingOps

/** Batch/stream parity: the streaming transforms accept any events-shaped
  * DataFrame, so running them over the batch fixture must reproduce the
  * batch window operators — one code path, two execution modes.
  */
class BatchStreamParitySpec extends AnyFunSuite with SparkFixture {

  test("streaming tumblingCounts over batch input equals batch windowTumbling") {
    val streamOp = StreamingOps.tumblingCounts(Tables.events(spark, sfDir))
      .select("bucket_start", "event_type", "n_events")
      .orderBy("bucket_start", "event_type")
      .collect().toSeq
    val batchOp = operators.TimeWindows.windowTumbling(spark, sfDir)
      .select("bucket_start", "event_type", "n_events")
      .collect().toSeq
    assert(streamOp === batchOp)
  }

  // dropDuplicatesWithinWatermark is streaming-only by design (Spark
  // rejects it on batch plans); its behavior is covered by StreamingSpec.
}
