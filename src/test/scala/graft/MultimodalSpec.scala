package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Multimodal plumbing: binary payloads, typed metadata, mapPartitions
  * decode stub, frame sampling shapes.
  */
class MultimodalSpec extends AnyFunSuite with SparkFixture {

  test("media table has binary payload and typed metadata") {
    val df = Multimodal.mediaTable(spark, sfDir)
    assert(df.schema("payload").dataType.typeName === "binary")
    assert(df.schema("width").dataType.typeName === "integer")
    val fmts = df.select("fmt").distinct().collect().map(_.getString(0)).toSet
    assert(fmts === Set("img", "audio", "video"))
  }

  test("decode stub checksum equals driver-side recomputation") {
    import spark.implicits._
    val sample = Multimodal.mediaTable(spark, sfDir).limit(5).as[Multimodal.MediaRecord]
    val features = Multimodal.decodeFeatures(sample).collect().map(f => f.doc_id -> f).toMap
    sample.collect().foreach { r =>
      val expected = r.payload.map(_ & 0xff).map(_.toLong).sum
      assert(features(r.doc_id).checksum === expected)
      assert(features(r.doc_id).n_bytes === r.payload.length)
    }
  }

  test("frame sampling covers the payload with the configured stride") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val frames = Multimodal.frameSample(media, frameLen = 16, stride = 64)
    val counts = frames.groupBy("doc_id").count()
      .join(media.select(col("doc_id"), length(col("payload")).as("len")), "doc_id")
      .collect()
    assert(counts.nonEmpty)
    counts.foreach { r =>
      val expected = math.max(1, ((r.getAs[Int]("len") - 1) / 64) + 1)
      assert(r.getAs[Long]("count") === expected.toLong, s"doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("frame bytes are exact slices of the payload") {
    import spark.implicits._
    val media = Multimodal.mediaTable(spark, sfDir).limit(50)
    val one = media.filter(col("fmt") === "video").limit(1)
    val payload = one.select("payload").as[Array[Byte]].collect().head
    val frames = Multimodal.frameSample(one).orderBy("frame_idx")
      .select("frame_bytes").as[Array[Byte]].collect()
    frames.zipWithIndex.foreach { case (frame, i) =>
      val expected = payload.slice(i * 64, math.min(i * 64 + 16, payload.length))
      assert(frame.toSeq === expected.toSeq, s"frame $i")
    }
  }

  test("resize stub halves payload bytes and dims consistently") {
    val rows = Multimodal.resizePayload(Multimodal.mediaTable(spark, sfDir)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val orig = r.getAs[Int]("orig_bytes")
      val resized = r.getAs[Int]("resized_bytes")
      assert(resized === math.max(1, orig / 2), s"doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Int]("width") >= 1 && r.getAs[Int]("height") >= 1)
    }
  }
}
