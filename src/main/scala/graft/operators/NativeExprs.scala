package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions

/** §2.10/#61 queries exercising the native Catalyst expressions
  * (graft.functions) end-to-end through SQL registration — proving the
  * Expression + FunctionRegistry surface, with the haversine twin checked
  * against the same DuckDB oracle as the pure-column version.
  */
object NativeExprs {

  /** #61a native codegen haversine — same synthetic points as
    * ScalarFuncs.haversine, same oracle.
    */
  def haversineNative(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    Tables.customer(s, dir)
      .select(
        col("c_custkey"),
        (((col("c_custkey") * 7919) % 12000).cast("double") / 100 - 60).as("lat"),
        (((col("c_custkey") * 104729) % 36000).cast("double") / 100 - 180).as("lon"))
      .withColumn("km_to_austin",
        round(expr("graft_haversine(lat, lon, 30.2672, -97.7431)"), 4))
      .orderBy("c_custkey")
  }

  /** #61b native rolling-hash fingerprint (rows-only: DuckDB BIGINT
    * arithmetic traps on the intentional 64-bit wraparound).
    */
  def rollingHash(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    Tables.documents(s, dir)
      .selectExpr("doc_id", "graft_rolling_hash(text) AS fingerprint")
      .orderBy("doc_id")
  }

  /** #61c the custom whole-operator path: same rank-filter query as
    * q_win_topk_per_group, but with graft.plans.RankFilterToTopK +
    * TopKPerGroupStrategy installed, so Filter+Window is replaced by
    * TopKPerGroupExec. Same oracle as the window formulation — the
    * rewrite must be invisible to results.
    */
  def topkCustom(s: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftPlanner.install(s)
    Windows.winTopkPerGroup(s, dir)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_haversine_native" -> (haversineNative _),
    "q_fingerprint_native" -> (rollingHash _),
    "q_topk_custom" -> (topkCustom _))

  val oracles: Map[String, String] = Map(
    "q_haversine_native" -> ScalarFuncs.oracles("q_haversine"),
    "q_topk_custom" -> Windows.oracles("q_win_topk_per_group"))
}
