package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingOps.Event

/** Stream-stream interval join: clicks joined to purchases of the same
  * user within 10 minutes — both sides watermarked so join state is
  * bounded and reclaimed (the only viable shape for unbounded streams).
  */
class StreamJoinSpec extends AnyFunSuite with SparkFixture {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 09:$minute%02d:00")

  test("stream-stream join matches pairs within the interval only") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]

    val c = clicks.toDF().select(col("event_id").as("click_id"),
      col("user_id"), col("ts").as("click_ts")).withWatermark("click_ts", "30 minutes")
    val p = purchases.toDF().select(col("event_id").as("purchase_id"),
      col("user_id").as("p_user"), col("ts").as("purchase_ts")).withWatermark("purchase_ts", "30 minutes")

    val joined = c.join(p,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"))
      .select("click_id", "purchase_id", "user_id")

    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      clicks.addData(Seq(Event(1, ts(0), 7, "click", 0), Event(2, ts(30), 7, "click", 0)))
      purchases.addData(Seq(
        Event(10, ts(5), 7, "purchase", 0),   // within 10m of click 1
        Event(11, ts(25), 7, "purchase", 0),  // matches nothing (click1 +25m, click2 -5m)
        Event(12, ts(35), 7, "purchase", 0))) // within 10m of click 2
      q.processAllAvailable()
    } finally q.stop()

    val pairs = spark.table("ssjoin").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 10L), (2L, 12L)))
  }
}
