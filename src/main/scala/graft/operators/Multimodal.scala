package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** North-star multimodal columns: media as opaque binary payloads with
  * typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The fixtures carry no real media, so payloads are the documents' UTF-8
  * bytes and the decoder is a DETERMINISTIC STUB (clearly marked below) —
  * but every piece of Spark plumbing is real: BinaryType columns, typed
  * Dataset records, mapPartitions batch processing (the Scala analog of
  * arrow-batched UDFs: per-partition iterator, amortized setup, no
  * per-row closure dispatch), and binary slicing for frame sampling.
  *
  * 100 TB notes: payload bytes dominate I/O — metadata-only predicates
  * (fmt/width/height) are plain columns so they prune parquet row groups
  * BEFORE payload pages are read; decode is per-partition so a real codec
  * would initialize once per task, and frame explosion multiplies rows,
  * never payload copies per frame beyond the slice.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, fmt: String, width: Int, height: Int,
                         payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, fmt: String, n_bytes: Int,
                           checksum: Long, mean_byte: Double)

  /** Media table: payload = UTF-8 bytes of text; fmt/width/height derived
    * deterministically from doc_id (stand-ins for real container metadata).
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      expr("element_at(array('img','audio','video'), cast(doc_id % 3 + 1 AS int))").as("fmt"),
      (col("doc_id") % 16 + 1).cast("int").as("width"),
      (col("doc_id") % 9 + 1).cast("int").as("height"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Decode + feature extraction over mapPartitions.
    * ==== STUB: a real implementation would decode image/audio bytes here
    * (codec init once per partition); the stub computes deterministic
    * byte-level features so schema, batching and downstream joins are
    * fully exercised. ====
    */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup happens HERE (once per task, not per row)
      it.map { r =>
        var sum = 0L
        var i = 0
        while (i < r.payload.length) { sum += (r.payload(i) & 0xff); i += 1 }
        MediaFeatures(r.doc_id, r.fmt, r.payload.length, sum,
          if (r.payload.length == 0) 0.0 else sum.toDouble / r.payload.length)
      }
    }
  }

  /** Frame sampling for "video" payloads: fixed-size binary slices every
    * `stride` bytes, exploded to (doc_id, frame_idx, frame_bytes) rows via
    * pure column expressions (sequence + substr on binary).
    */
  def frameSample(media: DataFrame, frameLen: Int = 16, stride: Int = 64): DataFrame =
    media.filter(col("fmt") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(lit(0), floor((length(col("payload")) - 1) / stride).cast("int")))))
      .selectExpr("doc_id", "frame_idx",
        s"substring(payload, frame_idx * $stride + 1, $frameLen) AS frame_bytes")

  /** Oracle-able metadata projection (integer arithmetic + octet_length —
    * DuckDB-twinned; validates the schema/partition layer of the pipeline).
    */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .select(col("doc_id"), col("fmt"), col("width"), col("height"),
        (col("width") * col("height")).as("pixels"),
        length(col("payload")).as("n_bytes"))
      .orderBy("doc_id")

  /** Rows-only end-to-end: decode-stub features joined back to metadata,
    * deterministic (checksums are pure byte arithmetic).
    */
  def multimodalDecode(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val media = mediaTable(s, dir).as[MediaRecord]
    decodeFeatures(media).toDF()
      .select(col("doc_id"), col("fmt"), col("n_bytes"), col("checksum"),
        round(col("mean_byte"), 4).as("mean_byte"))
      .orderBy("doc_id")
  }

  /** Rows-only: frame sampling output shape (frame counts + per-frame
    * checksums via native expression-free arithmetic).
    */
  def multimodalFrames(s: SparkSession, dir: String): DataFrame =
    frameSample(mediaTable(s, dir))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(length(col("frame_bytes"))).as("sampled_bytes"))
      .orderBy("doc_id")

  /** "Resize" for image payloads.
    * ==== STUB: a real implementation would decode, scale with an image
    * library, and re-encode; none ships in this environment, so the
    * deterministic stand-in crops the payload to its first 1/K bytes (a
    * genuine 1/K reduction in O(n) — a per-byte stride fold would copy
    * the accumulated prefix per element, O(n²) on real-size images) and
    * halves the metadata dims. The Spark-side contract is the real part:
    * payload bytes shrink, metadata stays consistent, and the op
    * composes with the decode/frame stages.
    */
  def resizePayload(media: DataFrame, factor: Int = 2): DataFrame =
    media.filter(col("fmt") === "img")
      .withColumn("payload_small", expr(
        s"substring(payload, 1, greatest(1, octet_length(payload) div $factor))"))
      .select(col("doc_id"),
        greatest(lit(1), (col("width") / factor).cast("int")).as("width"),
        greatest(lit(1), (col("height") / factor).cast("int")).as("height"),
        length(col("payload")).as("orig_bytes"),
        length(col("payload_small")).as("resized_bytes"))

  /** Rows-only: resize-stub output shape. */
  def multimodalResize(s: SparkSession, dir: String): DataFrame =
    resizePayload(mediaTable(s, dir)).orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> (multimodalMeta _),
    "q_multimodal_decode" -> (multimodalDecode _),
    "q_multimodal_frames" -> (multimodalFrames _),
    "q_multimodal_resize" -> (multimodalResize _))

  val oracles: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  ['img', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS fmt,
        |  CAST(doc_id % 16 + 1 AS INTEGER) AS width,
        |  CAST(doc_id % 9 + 1 AS INTEGER) AS height,
        |  CAST((doc_id % 16 + 1) * (doc_id % 9 + 1) AS INTEGER) AS pixels,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin)
}
