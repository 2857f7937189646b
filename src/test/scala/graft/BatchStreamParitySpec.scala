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

  test("streaming CDC apply equals batch cdcApply under any batch slicing") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps.CdcOp
    // the SAME deterministic change log the batch operator derives
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100, 0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val log = o.map { case (k, st, c) => CdcOp(k, 1L, "I", st, c) } ++
      o.filter(_._2 == "O").map { case (k, st, c) => CdcOp(k, 2L, "U", st, c + c / 20) } ++
      o.filter(_._1 % 97 == 0).map { case (k, st, _) => CdcOp(k, 3L, "D", st, 0L) }
    def finalState(batches: Seq[Seq[CdcOp]], name: String): Map[Long, (String, String, Long)] = {
      val stream = MemoryStream[CdcOp]
      val q = graft.streaming.StreamingOps.cdcApplyStream(stream.toDS())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
        .groupBy(_._1).view.mapValues { rs =>
          val last = rs.maxBy(_._2); (last._3, last._4, last._5)
        }.toMap
    }
    // transformWithState needs the multi-column-family RocksDB provider
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val (oneShot, sliced) =
      try {
        // one big batch vs per-seq batches (a key's ops split across batches)
        (finalState(Seq(log.toSeq), "cdc_one"),
          finalState(Seq(
            log.filter(_.seq == 1L).toSeq, log.filter(_.seq == 2L).toSeq,
            log.filter(_.seq == 3L).toSeq), "cdc_sliced"))
      } finally prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    assert(oneShot === sliced, "batch slicing must not change the final state")
    // per-status reconciliation equals the batch operator
    val agg = oneShot.values.groupBy(_._2).view.mapValues { vs =>
      (vs.count(_._1 != "D").toLong, vs.count(_._1 == "D").toLong,
        vs.count(_._1 == "U").toLong,
        vs.filter(_._1 != "D").map(_._3).sum)
    }.toMap
    operators.QualityOps.cdcApply(spark, sfDir).collect().foreach { r =>
      val (live, del, upd, cents) = agg(r.getString(0))
      assert(r.getAs[Long]("n_live") === live)
      assert(r.getAs[Long]("n_deleted") === del)
      assert(r.getAs[Long]("n_updated") === upd)
      assert(r.getAs[Long]("live_cents") === cents)
    }
  }
}
