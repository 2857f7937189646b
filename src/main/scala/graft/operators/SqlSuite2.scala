package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Second tranche of SQL-front-door analytics: the remaining TPC-H query
  * shapes expressible over the fixture schema (no partsupp /
  * commitdate / shipmode / container columns, so Q4/Q12/Q17 are adapted
  * to equivalent predicates on the columns that exist). Everything runs
  * through spark.sql over temp views — the point is that a reference
  * user writing plain SQL gets Catalyst's join reordering, subquery
  * decorrelation (EXISTS / scalar), partial aggregation and broadcast
  * selection with zero engine-specific code.
  *
  * Determinism follows graft.Det: money math in DECIMAL(12,2)/(3,2)
  * (exact, order-free), only the final aggregate is surfaced as double;
  * ratios avoid round() (engine tie-break differs) in favor of
  * floor(x*1e8) integer micros.
  *
  * Scale notes per query are on each method; common to all: dimension
  * tables (nation/region/supplier at TPC-H ratios) broadcast, the fact
  * join keys hash-shuffle once, and every filter lands in the parquet
  * scan (PushedFilters verified by PlanShapeSpec patterns).
  */
object SqlSuite2 {

  private def views(s: SparkSession, dir: String): Unit =
    graft.SqlViews.ensure(s, dir)

  /** Order-priority checking (TPC-H Q4 shape). The reference schema has
    * no commitdate/receiptdate, so "late" is shipdate > orderdate + 30d.
    * EXISTS decorrelates to a left-semi join on o_orderkey; the date
    * window prunes orders before the join.
    */
  def priorityLate(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM v_orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM v_lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  /** Local-supplier volume (TPC-H Q5 shape): 6-way join where customer
    * and supplier share a nation, region-filtered. nation/region/supplier
    * broadcast; the c=s nationkey equality rides the join condition so
    * only one fact shuffle (orderkey) plus the suppkey hash remains.
    */
  def localVolume(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |       * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
        |FROM v_customer
        |JOIN v_orders   ON c_custkey = o_custkey
        |JOIN v_lineitem ON l_orderkey = o_orderkey
        |JOIN v_supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN v_nation   ON c_nationkey = n_nationkey
        |JOIN v_region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin)
  }

  /** Revenue-change forecast (TPC-H Q6 shape): pure scan-filter-agg —
    * every predicate pushes to parquet, zero joins, one partial+final
    * aggregate. The canonical "is pushdown working" query.
    */
  def revenueForecast(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |           * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM v_lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin)
  }

  /** Bilateral nation volume (TPC-H Q7 shape): the disjunctive
    * nation-pair predicate sits above two broadcast nation joins; the
    * fact side shuffles once per join key.
    */
  def nationVolume(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(
      """SELECT supp_nation, cust_nation, l_year, CAST(SUM(vol) AS DOUBLE) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |         CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |         CAST(l_extendedprice AS DECIMAL(12,2))
        |           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) AS vol
        |  FROM v_supplier
        |  JOIN v_lineitem ON s_suppkey = l_suppkey
        |  JOIN v_orders   ON o_orderkey = l_orderkey
        |  JOIN v_customer ON c_custkey = o_custkey
        |  JOIN v_nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN v_nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)
  }

  /** Late-line counting (TPC-H Q12 shape; l_linestatus stands in for the
    * missing shipmode). FILTER-clause conditional counts = one pass,
    * map-side combined.
    */
  def lateLines(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(
      """SELECT l_linestatus,
        |  COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT','2-HIGH'))     AS high_line_count,
        |  COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH')) AS low_line_count
        |FROM v_orders JOIN v_lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin)
  }

  /** Promotion-revenue share by month (TPC-H Q14 shape). The share is
    * floor(1e8·promo/total) — integer micro-units; round() is avoided
    * because Spark rounds HALF_UP where DuckDB rounds half-even.
    */
  def promoRevenue(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(
      """SELECT mo,
        |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev
        |                ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE) AS promo_rev,
        |  CAST(SUM(rev) AS DOUBLE) AS total_rev,
        |  CAST(floor(1e8 *
        |    CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev
        |                  ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
        |    / CAST(SUM(rev) AS DOUBLE)) AS BIGINT) AS promo_frac_e8
        |FROM (
        |  SELECT CAST(month(l_shipdate) AS BIGINT) AS mo, p_type,
        |         CAST(l_extendedprice AS DECIMAL(12,2))
        |           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) AS rev
        |  FROM v_lineitem JOIN v_part ON p_partkey = l_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00')
        |GROUP BY mo
        |ORDER BY mo""".stripMargin)
  }

  /** Top supplier (TPC-H Q15 shape): quarterly revenue CTE referenced
    * both as join input and inside an uncorrelated MAX scalar subquery —
    * equality on exact-decimal-derived doubles is engine-safe.
    */
  def topSupplier(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(
      """WITH rev AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |         * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS total_revenue
        |  FROM v_lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM v_supplier JOIN rev ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin)
  }

  /** Small-quantity revenue (TPC-H Q17 shape; brand+size replace the
    * missing container). The 0.2·avg threshold is evaluated by integer
    * cross-multiplication (qty·cnt·5 < sum_qty) — quantities are
    * whole-number doubles 1..50 (fixture-verified), so the BIGINT cast
    * is exact and the comparison is pure int64 in BOTH engines; a
    * decimal formulation would chain DECIMAL×BIGINT×INT past width 38
    * and silently promote to DOUBLE in DuckDB, moving the strict `<`
    * boundary. The per-part aggregate is tiny (≤ #parts rows) and
    * broadcasts at any scale.
    */
  def smallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(
      """WITH agg AS (
        |  SELECT l_partkey AS a_partkey,
        |         SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
        |         COUNT(*) AS cnt
        |  FROM v_lineitem GROUP BY l_partkey)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
        |       COUNT(*) AS n_lines
        |FROM v_lineitem
        |JOIN v_part ON p_partkey = l_partkey
        |JOIN agg    ON a_partkey = l_partkey
        |WHERE p_brand = 'Brand#23' AND p_size <= 10
        |  AND CAST(l_quantity AS BIGINT) * cnt * 5 < sum_qty""".stripMargin)
  }

  /** Disjunctive predicate revenue (TPC-H Q19 shape): three OR'd
    * (brand, size, quantity) conjuncts — Catalyst extracts the common
    * p_partkey equi-key so this stays a hash join with the disjunction
    * as a post-join filter, not a nested-loop.
    */
  def disjunctiveRevenue(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |       * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM v_lineitem JOIN v_part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_priority_late" -> (priorityLate _),
    "q_sql_local_volume" -> (localVolume _),
    "q_sql_revenue_forecast" -> (revenueForecast _),
    "q_sql_nation_volume" -> (nationVolume _),
    "q_sql_late_lines" -> (lateLines _),
    "q_sql_promo_revenue" -> (promoRevenue _),
    "q_sql_top_supplier" -> (topSupplier _),
    "q_sql_small_qty" -> (smallQtyRevenue _),
    "q_sql_disjunctive" -> (disjunctiveRevenue _))

  val oracles: Map[String, String] = Map(
    "q_sql_priority_late" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_sql_local_volume" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |       * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q_sql_revenue_forecast" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |            * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q_sql_nation_volume" ->
      """SELECT supp_nation, cust_nation, l_year, CAST(SUM(vol) AS DOUBLE) AS revenue FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |         CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |         CAST(l_extendedprice AS DECIMAL(12,2))
        |           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) AS vol
        |  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q_sql_late_lines" ->
      """SELECT l_linestatus,
        |  COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT','2-HIGH'))     AS high_line_count,
        |  COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH')) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q_sql_promo_revenue" ->
      """SELECT mo,
        |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev
        |                ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE) AS promo_rev,
        |  CAST(SUM(rev) AS DOUBLE) AS total_rev,
        |  CAST(floor(1e8 *
        |    CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev
        |                  ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
        |    / CAST(SUM(rev) AS DOUBLE)) AS BIGINT) AS promo_frac_e8
        |FROM (
        |  SELECT CAST(month(l_shipdate) AS BIGINT) AS mo, p_type,
        |         CAST(l_extendedprice AS DECIMAL(12,2))
        |           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) AS rev
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01')
        |GROUP BY mo ORDER BY mo""".stripMargin,
    "q_sql_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |         * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN rev ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q_sql_small_qty" ->
      """WITH agg AS (
        |  SELECT l_partkey AS a_partkey,
        |         SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
        |         COUNT(*) AS cnt
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
        |       COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN agg  ON a_partkey = l_partkey
        |WHERE p_brand = 'Brand#23' AND p_size <= 10
        |  AND CAST(l_quantity AS BIGINT) * cnt * 5 < sum_qty""".stripMargin,
    "q_sql_disjunctive" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |       * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin)
}
