package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Multimodal pipeline with the real JDK ImageIO codec: container layout,
  * lossless PNG round trip, pixel-exact decode/resize against the
  * closed-form formula the DuckDB oracles recompute.
  */
class MultimodalSpec extends AnyFunSuite with SparkFixture {

  test("media table has binary payload and typed metadata") {
    val df = Multimodal.mediaTable(spark, sfDir)
    assert(df.schema("payload").dataType.typeName === "binary")
    assert(df.schema("width").dataType.typeName === "integer")
    assert(df.schema("n_frames").dataType.typeName === "integer")
    val fmts = df.select("fmt").distinct().collect().map(_.getString(0)).toSet
    assert(fmts === Set("img", "audio", "video"))
  }

  test("payloads are real PNGs: driver-side ImageIO decode matches metadata and formula") {
    import spark.implicits._
    val recs = Multimodal.mediaTable(spark, sfDir)
      .filter(col("doc_id") < 12).as[Multimodal.MediaRecord].collect()
    assert(recs.nonEmpty)
    recs.foreach { r =>
      val frames = Multimodal.splitFrames(r.payload)
      assert(frames.length === r.n_frames, s"doc ${r.doc_id} frame count")
      frames.zipWithIndex.foreach { case (fb, f) =>
        // PNG magic bytes prove these are genuine encoded images, not raw buffers
        assert((fb(0) & 0xff) === 0x89 && fb(1) === 'P'.toByte, s"doc ${r.doc_id} PNG magic")
        val img = Multimodal.decodePng(fb)
        assert(img.getWidth === r.width && img.getHeight === r.height)
        for (y <- 0 until r.height; x <- 0 until r.width) {
          val rgb = img.getRGB(x, y)
          assert(((rgb >> 16) & 0xff) === Multimodal.pixelR(r.doc_id, f, x, y),
            s"doc ${r.doc_id} frame $f px($x,$y) R")
          assert((rgb & 0xff) === Multimodal.pixelB(r.doc_id, f, x, y),
            s"doc ${r.doc_id} frame $f px($x,$y) B")
        }
      }
    }
  }

  test("video docs carry doc_id % 4 + 2 frames and decode per frame") {
    import spark.implicits._
    val media = Multimodal.mediaTable(spark, sfDir)
      .filter(col("fmt") === "video" && col("doc_id") < 30).as[Multimodal.MediaRecord]
    val frames = Multimodal.decodedFrames(media).collect()
    val byDoc = frames.groupBy(_.doc_id)
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (d, fs) =>
      assert(fs.length === (d % 4 + 2).toInt, s"doc $d")
      assert(fs.map(_.frame_idx).sorted.toSeq === (0 until fs.length))
      // distinct frames: the frame index shifts every channel, so sums differ
      assert(fs.map(f => (f.r_sum, f.g_sum, f.b_sum)).distinct.length === fs.length)
    }
  }

  test("decode channel sums equal the closed-form oracle arithmetic") {
    val rows = Multimodal.multimodalDecode(spark, sfDir)
      .filter(col("doc_id") < 20).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      val (w, h) = (r.getAs[Int]("w_px"), r.getAs[Int]("h_px"))
      assert(w === (d % 16 + 1).toInt && h === (d % 9 + 1).toInt)
      val expR = (for (y <- 0 until h; x <- 0 until w) yield Multimodal.pixelR(d, 0, x, y).toLong).sum
      val expG = (for (y <- 0 until h; x <- 0 until w) yield Multimodal.pixelG(d, 0, x, y).toLong).sum
      assert(r.getAs[Long]("r_sum") === expR, s"doc $d r_sum")
      assert(r.getAs[Long]("g_sum") === expG, s"doc $d g_sum")
    }
  }

  test("dHash matches a driver-side recomputation from the pixel formula") {
    val rows = Multimodal.multimodalPhash(spark, sfDir)
      .filter(col("doc_id") < 30).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      val (w, h) = ((d % 16 + 1).toInt, (d % 9 + 1).toInt)
      def luma(sx: Int, sy: Int): Int =
        (77 * Multimodal.pixelR(d, 0, sx, sy) +
          150 * Multimodal.pixelG(d, 0, sx, sy) +
          29 * Multimodal.pixelB(d, 0, sx, sy)) >> 8
      var exp = 0L
      for (gy <- 0 until 8; gx <- 0 until 8)
        if (luma((gx + 1) * w / 9, gy * h / 8) > luma(gx * w / 9, gy * h / 8))
          exp |= (1L << (gy * 8 + gx))
      assert(r.getAs[Long]("phash") === exp, s"doc $d")
      assert(r.getAs[Long]("n_same") >= 1L)
    }
  }

  test("resize round trip is nearest-neighbor exact through re-encode") {
    val rows = Multimodal.multimodalResize(spark, sfDir)
      .filter(col("doc_id") < 40).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      val (ow, oh) = (r.getAs[Int]("w_px"), r.getAs[Int]("h_px"))
      assert(ow === math.max(1, (d % 16 + 1).toInt / 2))
      assert(oh === math.max(1, (d % 9 + 1).toInt / 2))
      val expB = (for (y <- 0 until oh; x <- 0 until ow)
        yield Multimodal.pixelB(d, 0, 2 * x, 2 * y).toLong).sum
      assert(r.getAs[Long]("b_sum") === expB, s"doc $d b_sum")
    }
  }

  test("WAV codec round-trips PCM16 exactly and rejects corrupt containers") {
    val samples = Array.tabulate(300)(i => Multimodal.sampleAt(7L, i).toShort)
    assert(samples.exists(_ < 0), "fixture must exercise negative samples")
    val wav = Multimodal.encodeWav(samples)
    assert(Multimodal.decodeWav(wav).toSeq === samples.toSeq)
    val badTag = wav.clone(); badTag(0) = 'X'.toByte
    intercept[IllegalArgumentException](Multimodal.decodeWav(badTag))
    intercept[IllegalArgumentException](Multimodal.decodeWav(wav.dropRight(2)))
    val stereo = wav.clone(); stereo(22) = 2 // fmt chunk channel count
    intercept[IllegalArgumentException](Multimodal.decodeWav(stereo))
  }

  test("phash near-dup pairs equal the driver-side all-pairs hamming scan") {
    val hashes = Multimodal.multimodalPhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).toSet
    val got = Multimodal.multimodalPhashNear(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === expected)
    assert(got.nonEmpty, "fixture should contain at least one near-identical pair")
  }
}
