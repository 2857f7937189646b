package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fourth tranche of SQL-front-door analytics (SURVEY §2 #411–#413):
  * the WINDOW-function report shapes the first three suites don't
  * exercise through `spark.sql` — period-over-period growth (lag),
  * running share-of-total (two window frames over one pass), and
  * per-group top-n (row_number + filter). The point is the SQL text
  * itself: a reference user's dashboard queries paste in unchanged.
  *
  * Determinism: revenue stages to exact integer cents inside the SQL
  * (CAST(SUM(CAST(x AS DECIMAL)) * 100 AS BIGINT) — the graft.Det
  * policy spelled in SQL), every readout is a truncating integer
  * division (Spark `div` ≡ DuckDB `//`), every ORDER BY is total.
  *
  * Scale: each query shuffles the fact table once on its grouping key;
  * the window stages run on GROUPED relations (nation×year,
  * segment×month, nation×customer — dimension-bounded, not
  * fact-bounded); nation broadcasts at any SF.
  */
object SqlSuite4 {

  private def views(s: SparkSession, dir: String): Unit =
    graft.SqlViews.ensure(s, dir)

  /** #411 Year-over-year revenue growth per nation: lag over the
    * (nation) partitioning of the year-grain aggregate; growth in ppm
    * via truncating division, first year NULL.
    */
  def yoyGrowth(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(
      """SELECT n_name, yr, rev_cents,
        |  CASE WHEN prev > 0
        |    THEN ((rev_cents - prev) * 1000000) div prev END AS yoy_ppm
        |FROM (
        |  SELECT n_name, yr, rev_cents,
        |    LAG(rev_cents) OVER (PARTITION BY n_name ORDER BY yr) AS prev
        |  FROM (
        |    SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
        |      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
        |        AS rev_cents
        |    FROM v_orders
        |    JOIN v_customer ON o_custkey = c_custkey
        |    JOIN v_nation ON c_nationkey = n_nationkey
        |    GROUP BY n_name, year(o_orderdate)))
        |ORDER BY n_name, yr""".stripMargin)
  }

  /** #412 Running share-of-year per market segment: one month-grain
    * aggregate, then TWO window frames over it — the running cumulative
    * (rows unbounded-preceding) and the full-year total (unbounded
    * both ways) — emitting each month's year-to-date revenue share.
    */
  def runningShare(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(
      """SELECT c_mktsegment, yr, mon, rev_cents,
        |  (cum_cents * 1000000) div yr_cents AS ytd_share_ppm
        |FROM (
        |  SELECT c_mktsegment, yr, mon, rev_cents,
        |    SUM(rev_cents) OVER (PARTITION BY c_mktsegment, yr ORDER BY mon
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents,
        |    SUM(rev_cents) OVER (PARTITION BY c_mktsegment, yr) AS yr_cents
        |  FROM (
        |    SELECT c_mktsegment, CAST(year(o_orderdate) AS BIGINT) AS yr,
        |      CAST(month(o_orderdate) AS BIGINT) AS mon,
        |      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
        |        AS rev_cents
        |    FROM v_orders JOIN v_customer ON o_custkey = c_custkey
        |    GROUP BY c_mktsegment, year(o_orderdate), month(o_orderdate)))
        |ORDER BY c_mktsegment, yr, mon""".stripMargin)
  }

  /** #413 Top-3 customers per nation by lifetime revenue: row_number
    * over the (nation) partitioning of the customer-grain aggregate
    * with the (revenue DESC, custkey) total tie order, filtered ≤ 3 —
    * the per-group top-n SQL shape (Spark plans the rank+filter as a
    * WindowGroupLimit, never a global sort).
    */
  def top3PerNation(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(
      """SELECT n_name, rnk, c_custkey, rev_cents
        |FROM (
        |  SELECT n_name, c_custkey, rev_cents,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY n_name
        |      ORDER BY rev_cents DESC, c_custkey) AS BIGINT) AS rnk
        |  FROM (
        |    SELECT n_name, c_custkey,
        |      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
        |        AS rev_cents
        |    FROM v_orders
        |    JOIN v_customer ON o_custkey = c_custkey
        |    JOIN v_nation ON c_nationkey = n_nationkey
        |    GROUP BY n_name, c_custkey))
        |WHERE rnk <= 3
        |ORDER BY n_name, rnk""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_yoy_growth" -> (yoyGrowth _),
    "q_sql_running_share" -> (runningShare _),
    "q_sql_top3_nation" -> (top3PerNation _))

  val oracles: Map[String, String] = Map(
    "q_sql_yoy_growth" ->
      """SELECT n_name, yr, rev_cents,
        |  CASE WHEN prev > 0
        |    THEN ((rev_cents - prev) * 1000000) // prev END AS yoy_ppm
        |FROM (
        |  SELECT n_name, yr, rev_cents,
        |    LAG(rev_cents) OVER (PARTITION BY n_name ORDER BY yr) AS prev
        |  FROM (
        |    SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
        |      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
        |        AS rev_cents
        |    FROM orders
        |    JOIN customer ON o_custkey = c_custkey
        |    JOIN nation ON c_nationkey = n_nationkey
        |    GROUP BY n_name, year(o_orderdate)))
        |ORDER BY n_name, yr""".stripMargin,
    "q_sql_running_share" ->
      """SELECT c_mktsegment, yr, mon, rev_cents,
        |  (cum_cents * 1000000) // yr_cents AS ytd_share_ppm
        |FROM (
        |  SELECT c_mktsegment, yr, mon, rev_cents,
        |    CAST(SUM(rev_cents) OVER (PARTITION BY c_mktsegment, yr
        |      ORDER BY mon ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum_cents,
        |    CAST(SUM(rev_cents) OVER (PARTITION BY c_mktsegment, yr)
        |      AS BIGINT) AS yr_cents
        |  FROM (
        |    SELECT c_mktsegment, CAST(year(o_orderdate) AS BIGINT) AS yr,
        |      CAST(month(o_orderdate) AS BIGINT) AS mon,
        |      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
        |        AS rev_cents
        |    FROM orders JOIN customer ON o_custkey = c_custkey
        |    GROUP BY c_mktsegment, year(o_orderdate), month(o_orderdate)))
        |ORDER BY c_mktsegment, yr, mon""".stripMargin,
    "q_sql_top3_nation" ->
      """SELECT n_name, rnk, c_custkey, rev_cents
        |FROM (
        |  SELECT n_name, c_custkey, rev_cents,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY n_name
        |      ORDER BY rev_cents DESC, c_custkey) AS BIGINT) AS rnk
        |  FROM (
        |    SELECT n_name, c_custkey,
        |      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
        |        AS rev_cents
        |    FROM orders
        |    JOIN customer ON o_custkey = c_custkey
        |    JOIN nation ON c_nationkey = n_nationkey
        |    GROUP BY n_name, c_custkey))
        |WHERE rnk <= 3
        |ORDER BY n_name, rnk""".stripMargin)
}
