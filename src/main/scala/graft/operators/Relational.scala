package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.2 Projection / filter / predicates — the reference's field mapping,
  * validity filtering and category derivation, as declarative plans so
  * Catalyst pushes every predicate and projection into the parquet scan.
  */
object Relational {

  /** #7 column pruning + rename + computed net price. Pure per-row double
    * arithmetic is IEEE-identical on both engines; no rounding needed.
    */
  def projectRename(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(
        col("l_orderkey").as("order_id"),
        col("l_linenumber").as("line_no"),
        col("l_quantity").as("qty"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"))
      .orderBy("order_id", "line_no")

  /** #8 conjunctive range predicates — the reference's trip-validity QA
    * (duration/distance bounds, service-area membership) transposed. All
    * three predicates must appear in PushedFilters.
    */
  def filterValidity(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_quantity").between(5, 45)
        && col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_returnflag") =!= "A")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate")
      .orderBy("l_orderkey", "l_linenumber")

  /** #9 three-valued logic: nulls manufactured via nullif (the fixture data
    * has none), then null-safe equality / coalesce over them.
    */
  def filterNullSemantics(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("status_or_null", nullif(col("o_orderstatus"), lit("P")))
      .withColumn("is_f_nullsafe", col("status_or_null") <=> lit("F"))
      .withColumn("status_filled", coalesce(col("status_or_null"), lit("missing")))
      .filter(col("status_or_null").isNull || col("status_or_null") === "F")
      .select("o_orderkey", "status_or_null", "is_f_nullsafe", "status_filled")
      .orderBy("o_orderkey")

  /** #10 CASE WHEN derivation — the reference's category/bucket columns. */
  def caseDerive(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("price_tier",
        when(col("o_totalprice") < 50000, "small")
          .when(col("o_totalprice") < 150000, "medium")
          .when(col("o_totalprice") < 300000, "large")
          .otherwise("jumbo"))
      .select("o_orderkey", "o_totalprice", "price_tier")
      .orderBy("o_orderkey")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_project_rename" -> (projectRename _),
    "q_filter_validity" -> (filterValidity _),
    "q_filter_null_semantics" -> (filterNullSemantics _),
    "q_case_derive" -> (caseDerive _))

  val oracles: Map[String, String] = Map(
    "q_project_rename" ->
      """SELECT l_orderkey AS order_id, l_linenumber AS line_no, l_quantity AS qty,
        |  l_extendedprice * (1 - l_discount) AS net_price
        |FROM lineitem ORDER BY order_id, line_no""".stripMargin,
    "q_filter_validity" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_shipdate
        |FROM lineitem
        |WHERE l_quantity BETWEEN 5 AND 45
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_returnflag <> 'A'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_filter_null_semantics" ->
      """SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS status_or_null,
        |  NULLIF(o_orderstatus, 'P') IS NOT DISTINCT FROM 'F' AS is_f_nullsafe,
        |  COALESCE(NULLIF(o_orderstatus, 'P'), 'missing') AS status_filled
        |FROM orders
        |WHERE NULLIF(o_orderstatus, 'P') IS NULL OR NULLIF(o_orderstatus, 'P') = 'F'
        |ORDER BY o_orderkey""".stripMargin,
    "q_case_derive" ->
      """SELECT o_orderkey, o_totalprice,
        |  CASE WHEN o_totalprice < 50000 THEN 'small'
        |       WHEN o_totalprice < 150000 THEN 'medium'
        |       WHEN o_totalprice < 300000 THEN 'large'
        |       ELSE 'jumbo' END AS price_tier
        |FROM orders ORDER BY o_orderkey""".stripMargin)
}
