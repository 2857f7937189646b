package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SQL front door + optimizer-surface queries: multi-join analytics via
  * spark.sql over temp views (ReorderJoin / CostBasedJoinReorder
  * territory), subquery decorrelation (scalar + correlated EXISTS + IN),
  * and pivot. These prove a reference user could keep writing plain SQL
  * against this engine.
  */
object SqlSuite {

  private def views(s: SparkSession, dir: String): Unit =
    graft.SqlViews.ensure(s, dir)

  /** Shipping-priority classic (TPC-H Q3 shape, fixture date domain):
    * 3-way join, grouped decimal revenue, top-10 by revenue.
    */
  def sqlShippingPriority(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM v_customer
        |JOIN v_orders   ON c_custkey = o_custkey
        |JOIN v_lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin)
  }

  /** Returned-item reporting (TPC-H Q10 shape): 4-way join + top-20. */
  def sqlReturnedItems(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
        |FROM v_customer
        |JOIN v_orders   ON c_custkey = o_custkey
        |JOIN v_lineitem ON l_orderkey = o_orderkey
        |JOIN v_nation   ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin)
  }

  /** Scalar subquery: orders above the (exact decimal) global average. */
  def sqlScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(
      """SELECT o_orderkey, o_totalprice
        |FROM v_orders
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) FROM v_orders)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Correlated EXISTS — decorrelated by Catalyst into a semi join. */
  def sqlCorrelatedExists(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(
      """SELECT c_custkey, c_name
        |FROM v_customer c
        |WHERE EXISTS (SELECT 1 FROM v_orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** IN subquery over a dimension. */
  def sqlInSubquery(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(
      """SELECT s_suppkey, s_name
        |FROM v_supplier
        |WHERE s_nationkey IN (SELECT n_nationkey FROM v_nation WHERE n_regionkey = 2)
        |ORDER BY s_suppkey""".stripMargin)
  }

  /** Pivot: order counts by year × status (fixed status columns; nulls
    * filled to 0 to match the relational conditional-count twin).
    */
  def pivotStatus(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("y", year(col("o_orderdate")))
      .groupBy("y")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .na.fill(0, Seq("F", "O", "P"))
      .orderBy("y")

  /** Large-volume-customer classic (TPC-H Q18 shape). The DuckDB twin
    * keeps the textbook IN-over-grouped-HAVING formulation; the Spark
    * side runs the equivalent single-aggregate form (r22, guide §2.4):
    * the outer GROUP BY keys are ORDER grain (c_custkey, c_name,
    * o_orderkey, o_orderdate are all functionally determined by
    * o_orderkey under the inner FK joins), so the re-aggregated
    * total_qty IS the HAVING subquery's per-orderkey sum — the original
    * plan aggregated lineitem twice (two full scans; the optimizer
    * pushes the semi-join to BOTH sides of the orders⋈lineitem join)
    * and then re-aggregated the joined fact rows a third time. This
    * form pays ONE lineitem aggregate and joins the few qualifying
    * orders (equivalence proved by the unchanged oracle hash; the
    * r22 A/B measured 2.15 → ~1.2 s at sf0.1).
    */
  def sqlBigOrders(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(
      """SELECT c_custkey, c_name, o_orderkey, o_orderdate,
        |  CAST(sum_qty AS DOUBLE) AS total_qty
        |FROM (
        |  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty
        |  FROM v_lineitem
        |  GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150) big
        |JOIN v_orders   ON o_orderkey = big.l_orderkey
        |JOIN v_customer ON c_custkey = o_custkey
        |ORDER BY total_qty DESC, o_orderkey
        |LIMIT 50""".stripMargin)
  }

  /** National market share (TPC-H Q8 shape): 7-way star join — the
    * deepest join-reorder exercise in the suite — with a two-level
    * share division per year. Numerator and denominator are exact
    * decimal sums; their double quotient is a single correctly-rounded
    * op on both engines, then rounded to 6 dp.
    */
  def sqlMarketShare(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(
      """WITH rev AS (
        |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(12,2))
        |      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) AS volume,
        |    n2.n_name AS supp_nation
        |  FROM v_lineitem
        |  JOIN v_orders   ON l_orderkey = o_orderkey
        |  JOIN v_customer ON o_custkey = c_custkey
        |  JOIN v_nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN v_region    ON n1.n_regionkey = r_regionkey
        |  JOIN v_supplier  ON l_suppkey = s_suppkey
        |  JOIN v_nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'ASIA')
        |SELECT o_year,
        |  round(CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN volume
        |                      ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
        |        / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
        |FROM rev GROUP BY o_year ORDER BY o_year""".stripMargin)
  }

  /** Waiting-supplier classic (TPC-H Q21 shape). The DuckDB twin keeps
    * the textbook correlated EXISTS / NOT EXISTS formulation; the Spark
    * side runs the equivalent single-pass aggregate form (r22, guide
    * §3.4/§2.3): a late l1 row qualifies iff its order (status F) has
    * MORE THAN ONE distinct supplier overall (the EXISTS) and EXACTLY
    * ONE distinct supplier with a late line (the NOT EXISTS — l1's own
    * supplier is late, so "no OTHER late supplier" ⇔ late-supplier
    * count = 1), and numwait counts late l1 ROWS per supplier — i.e.
    * Σ of the per-(order, supplier) late-line counts. So: one
    * lineitem⋈orders pass aggregated to (orderkey, suppkey) grain with
    * a late-line count, one order-grain aggregate applying both
    * predicates and emitting the unique late supplier + its late-line
    * count, then a supplier-dimension join. The decorrelated plan
    * executed the fact join PLUS a semi AND an anti self-join of
    * lineitem (three fact-scale shuffles); this form pays one fact
    * join and two order-grain aggregates (equivalence proved by the
    * unchanged oracle hash at both graded scales).
    */
  def sqlWaitingSupplier(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(
      """WITH per_os AS (
        |  SELECT l_orderkey, l_suppkey,
        |    SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
        |             THEN 1 ELSE 0 END) AS n_late
        |  FROM v_lineitem
        |  JOIN v_orders ON o_orderkey = l_orderkey
        |  WHERE o_orderstatus = 'F'
        |  GROUP BY l_orderkey, l_suppkey),
        |per_o AS (
        |  SELECT l_orderkey,
        |    MAX(CASE WHEN n_late > 0 THEN l_suppkey END) AS late_supp,
        |    MAX(CASE WHEN n_late > 0 THEN n_late END) AS late_lines
        |  FROM per_os
        |  GROUP BY l_orderkey
        |  HAVING COUNT(*) > 1
        |     AND COUNT(CASE WHEN n_late > 0 THEN 1 END) = 1)
        |SELECT s_name, SUM(late_lines) AS numwait
        |FROM per_o JOIN v_supplier ON s_suppkey = late_supp
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)
  }

  /** Idle high-balance customers (TPC-H Q22 shape): scalar subquery
    * (average positive balance) + NOT EXISTS over recent orders,
    * re-aggregated per nation.
    */
  def sqlIdleCustomers(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(
      """SELECT n_name, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        |FROM v_customer JOIN v_nation ON c_nationkey = n_nationkey
        |WHERE c_acctbal > (
        |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
        |    FROM v_customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM v_orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY n_name ORDER BY n_name""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_market_share" -> (sqlMarketShare _),
    "q_sql_waiting_supplier" -> (sqlWaitingSupplier _),
    "q_sql_idle_customers" -> (sqlIdleCustomers _),
    "q_sql_big_orders" -> (sqlBigOrders _),
    "q_sql_shipping_priority" -> (sqlShippingPriority _),
    "q_sql_returned_items" -> (sqlReturnedItems _),
    "q_sql_scalar_subquery" -> (sqlScalarSubquery _),
    "q_sql_correlated_exists" -> (sqlCorrelatedExists _),
    "q_sql_in_subquery" -> (sqlInSubquery _),
    "q_pivot_status" -> (pivotStatus _))

  val oracles: Map[String, String] = Map(
    "q_sql_market_share" ->
      """WITH rev AS (
        |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(12,2))
        |      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) AS volume,
        |    n2.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN orders   ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region    ON n1.n_regionkey = r_regionkey
        |  JOIN supplier  ON l_suppkey = s_suppkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'ASIA')
        |SELECT o_year,
        |  round(CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN volume
        |                      ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
        |        / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
        |FROM rev GROUP BY o_year ORDER BY o_year""".stripMargin,
    "q_sql_waiting_supplier" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |              WHERE l3.l_orderkey = l1.l_orderkey
        |                AND l3.l_suppkey <> l1.l_suppkey
        |                AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "q_sql_idle_customers" ->
      """SELECT n_name, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_acctbal > (
        |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
        |    FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_sql_big_orders" ->
      """SELECT c_custkey, c_name, o_orderkey, o_orderdate,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150)
        |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate
        |ORDER BY total_qty DESC, o_orderkey
        |LIMIT 50""".stripMargin,
    "q_sql_shipping_priority" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin,
    "q_sql_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "q_sql_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "q_sql_correlated_exists" ->
      """SELECT c_custkey, c_name
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q_sql_in_subquery" ->
      """SELECT s_suppkey, s_name
        |FROM supplier
        |WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
        |ORDER BY s_suppkey""".stripMargin,
    "q_pivot_status" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY 1 ORDER BY y""".stripMargin)
}
