package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** §2.1 Scans / sources. The reference ingests CSV and JSON-lines (its API
  * payload format) and we store parquet at rest; these queries prove all
  * three read paths with explicit schemas (schema-on-read, never inference
  * on the hot path — at 100 TB schema inference is a full extra scan).
  *
  * CSV/JSONL queries round-trip a projection of lineitem through a tmp file
  * and are oracle-checked against the original parquet — i.e. the oracle
  * verifies the text formats preserve values exactly.
  */
object Scans {

  private def ioDir(kind: String, dir: String): String =
    s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_io/${kind}_v3_${DedupOps.cacheKey(dir, "lineitem")}"

  /** The round-trip files are a pure function of (sfDir, projection), so
    * the write happens once per tmp lifetime — repeated Verify/Bench runs
    * only pay the read side.
    */
  private def ensureWritten(path: String)(write: => Unit): Unit = {
    val marker = new java.io.File(path, "_SUCCESS")
    if (!marker.exists()) write
  }

  /** Columns chosen to round-trip text formats losslessly (ints, strings,
    * X.0 doubles, ms timestamps).
    */
  private val rtCols = Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")

  private val rtSchema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_returnflag", StringType),
    StructField("l_quantity", DoubleType)))

  def scanParquet(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"), col("l_shipdate"))
      .orderBy("l_orderkey", "l_linenumber")

  def scanCsv(s: SparkSession, dir: String): DataFrame = {
    val path = ioDir("csv", dir)
    ensureWritten(path) {
      Tables.lineitem(s, dir).select(rtCols.map(col): _*)
        .write.mode("overwrite").option("header", "true").csv(path)
    }
    s.read.schema(rtSchema).option("header", "true").csv(path)
      .orderBy("l_orderkey", "l_linenumber")
  }

  def scanJsonl(s: SparkSession, dir: String): DataFrame = {
    val path = ioDir("jsonl", dir)
    ensureWritten(path) {
      Tables.lineitem(s, dir)
        .select((rtCols :+ "l_shipdate").map(col): _*)
        .write.mode("overwrite").json(path)
    }
    s.read.schema(rtSchema.add(StructField("l_shipdate", TimestampType)))
      .json(path)
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** ORC round-trip — the second columnar format Spark ships natively.
    * Binary format, so unlike CSV/JSONL the full-fidelity columns
    * (double prices, timestamps) ride along untruncated.
    */
  def scanOrc(s: SparkSession, dir: String): DataFrame = {
    val path = ioDir("orc", dir)
    ensureWritten(path) {
      Tables.lineitem(s, dir)
        .select((rtCols ++ Seq("l_extendedprice", "l_shipdate")).map(col): _*)
        .write.mode("overwrite").orc(path)
    }
    s.read.orc(path).orderBy("l_orderkey", "l_linenumber")
  }

  /** XML round-trip — Spark 4 ships the (formerly spark-xml) source
    * natively. rowTag framing, explicit schema on the read (same
    * schema-on-read rule as CSV/JSONL: no inference scan). XML is ~10×
    * the bytes of CSV for the same rows, so the round-trip covers a
    * deterministic 1-in-10 orderkey slice — format fidelity is proven
    * per-row, no need to pay the verbosity on the full table.
    */
  def scanXml(s: SparkSession, dir: String): DataFrame = {
    val path = ioDir("xml", dir)
    ensureWritten(path) {
      Tables.lineitem(s, dir).filter(col("l_orderkey") % 10 === 0)
        .select(rtCols.map(col): _*)
        .write.mode("overwrite").option("rowTag", "row").format("xml").save(path)
    }
    s.read.schema(rtSchema).option("rowTag", "row").format("xml").load(path)
      .orderBy("l_orderkey", "l_linenumber")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_parquet" -> (scanParquet _),
    "q_scan_csv" -> (scanCsv _),
    "q_scan_jsonl" -> (scanJsonl _),
    "q_scan_orc" -> (scanOrc _),
    "q_scan_xml" -> (scanXml _))

  /** CSV/JSONL oracles read the parquet originals: equality proves the text
    * round-trip is lossless.
    */
  val oracles: Map[String, String] = Map(
    "q_scan_parquet" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag, l_shipdate
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_scan_csv" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_scan_jsonl" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, l_shipdate
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_scan_orc" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, l_extendedprice, l_shipdate
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_scan_xml" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
        |FROM lineitem WHERE l_orderkey % 10 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)
}
