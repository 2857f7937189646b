package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Third tranche of SQL-front-door analytics: the last TPC-H query shapes
  * not yet in SqlSuite/SqlSuite2 — Q2/Q9/Q13/Q16/Q20. The fixture has no
  * partsupp table, so the part↔supplier relation is derived through
  * lineitem and ps_supplycost is replaced by p_retailprice-based cost
  * (the SHAPES — correlated scalar-min subquery, LEFT JOIN with an
  * ON-clause filter, NOT IN + COUNT(DISTINCT), IN over a grouped HAVING —
  * are what's exercised, not TPC-H compliance).
  *
  * Determinism follows graft.Det: money math in exact DECIMAL, doubles
  * only compared/MIN'd (never re-accumulated), every ORDER BY total.
  *
  * Scale notes common to all five: nation/region/supplier/part broadcast
  * at TPC-H ratios (fact:dim ≥ 60:1 holds at any SF); each query
  * shuffles the fact table at most twice (join key + final group key);
  * subqueries decorrelate — Catalyst turns the Q2 scalar-min into an
  * aggregate-then-join, the Q16 NOT IN into a null-aware anti join, and
  * the Q20 IN into a left-semi join on the grouped HAVING output.
  */
object SqlSuite3 {

  private def views(s: SparkSession, dir: String): Unit =
    graft.SqlViews.ensure(s, dir)

  /** Customer order-count distribution (TPC-H Q13 shape). The defining
    * feature is the filter in the LEFT JOIN's ON clause (a WHERE filter
    * would silently turn the join inner and drop zero-order customers);
    * o_orderpriority <> '1-URGENT' stands in for the missing o_comment.
    * Double aggregation: per-customer count, then histogram of counts.
    * One shuffle per grouping; the second GROUP BY input is
    * customer-cardinality, not fact-cardinality.
    */
  def custDistribution(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |      FROM v_customer LEFT OUTER JOIN v_orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin)
  }

  /** Product-type profit by nation and year (TPC-H Q9 shape).
    * ps_supplycost is replaced by l_quantity·p_retailprice — the point
    * is the 5-way join + LIKE filter + two-level grouping. All decimal
    * widths stay far under 38 in BOTH engines (term1 DECIMAL(16,4),
    * term2 DECIMAL(19,4), difference ≤ DECIMAL(21,4)) so the aggregate
    * is exact and order-free; only the final sum surfaces as double.
    */
  def productProfit(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(
      """SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
        |FROM (
        |  SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |         CAST(l_extendedprice AS DECIMAL(12,2))
        |           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
        |         - CAST(l_quantity AS DECIMAL(8,2)) * CAST(p_retailprice AS DECIMAL(10,2)) AS amount
        |  FROM v_lineitem
        |  JOIN v_part     ON p_partkey = l_partkey
        |  JOIN v_supplier ON s_suppkey = l_suppkey
        |  JOIN v_orders   ON o_orderkey = l_orderkey
        |  JOIN v_nation   ON s_nationkey = n_nationkey
        |  WHERE p_name LIKE '%red%')
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year""".stripMargin)
  }

  /** Minimum-price supplier per part in a region (TPC-H Q2 shape). The
    * defining feature is the correlated scalar-MIN subquery referencing
    * the outer p_partkey; Catalyst decorrelates it to a per-part
    * aggregate joined back on (partkey, price). l_extendedprice is a
    * stored double that is only MIN'd and equality-compared — never
    * re-accumulated — so cross-engine exactness holds. DISTINCT because
    * a supplier can hit the same min price on several lineitems.
    */
  def minPriceSupplier(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(
      """SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name,
        |       l_extendedprice AS min_price
        |FROM v_part
        |JOIN v_lineitem ON p_partkey = l_partkey
        |JOIN v_supplier ON s_suppkey = l_suppkey
        |JOIN v_nation   ON s_nationkey = n_nationkey
        |JOIN v_region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE' AND p_size <= 5
        |  AND l_extendedprice = (
        |    SELECT MIN(l2.l_extendedprice)
        |    FROM v_lineitem l2
        |    JOIN v_supplier s2 ON s2.s_suppkey = l2.l_suppkey
        |    JOIN v_nation   n2 ON s2.s_nationkey = n2.n_nationkey
        |    JOIN v_region   r2 ON n2.n_regionkey = r2.r_regionkey
        |    WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
        |ORDER BY p_partkey, s_suppkey""".stripMargin)
  }

  /** Supplier count per part attribute (TPC-H Q16 shape): NOT IN over a
    * supplier subquery (null-aware anti join — s_suppkey is non-null so
    * it degenerates to a plain anti join) + COUNT(DISTINCT) per
    * 3-column group. The part↔supplier relation comes from lineitem.
    */
  def supplierCnt(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM v_lineitem JOIN v_part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#5' AND p_size IN (1,4,7,10,13,16,19,22)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM v_supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)
  }

  /** Promotion-candidate suppliers (TPC-H Q20 shape): IN over a grouped
    * HAVING subquery — suppliers who moved > 40 units of any 'small%'
    * part in 1996. Catalyst plans the IN as a left-semi join against
    * the (suppkey, partkey) aggregate; the nation filter broadcasts.
    * quantity is a whole-number double 1..50 (fixture-verified), so the
    * BIGINT cast makes the HAVING comparison pure int64 in both engines.
    */
  def promoSuppliers(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(
      """SELECT s_suppkey, s_name
        |FROM v_supplier JOIN v_nation ON s_nationkey = n_nationkey
        |WHERE n_name IN ('NATION_1','NATION_2','NATION_3')
        |  AND s_suppkey IN (
        |    SELECT l_suppkey
        |    FROM v_lineitem JOIN v_part ON p_partkey = l_partkey
        |    WHERE p_name LIKE 'small%'
        |      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |    GROUP BY l_suppkey, l_partkey
        |    HAVING SUM(CAST(l_quantity AS BIGINT)) > 40)
        |ORDER BY s_suppkey""".stripMargin)
  }

  /** Recursive CTE (Spark 4's WITH RECURSIVE, UNION ALL form): walk a
    * synthetic binary-tree hierarchy over nation (parent = (key-1) div 2)
    * to the root, reporting depth and ancestor-key sum. Terminates
    * because the ancestor key strictly decreases — the UNION ALL
    * restriction means cyclic graphs need the iterative DataFrame path
    * (DedupOps.dedupComponents) instead; this is the DAG/hierarchy use
    * case recursive CTEs exist for. Integer sums cast to BIGINT on both
    * engines (DuckDB SUM(int) promotes to DECIMAL(38,0)).
    */
  def recursiveWalk(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(
      """WITH RECURSIVE walk(nationkey, name, anc, depth) AS (
        |  SELECT n_nationkey, n_name, CAST(n_nationkey AS BIGINT), 0 FROM v_nation
        |  UNION ALL
        |  SELECT w.nationkey, w.name, (w.anc - 1) div 2, w.depth + 1
        |  FROM walk w WHERE w.anc > 0)
        |SELECT nationkey, name,
        |  CAST(max(depth) AS BIGINT) AS depth_to_root,
        |  CAST(sum(anc) AS BIGINT) AS anc_key_sum
        |FROM walk GROUP BY nationkey, name
        |ORDER BY nationkey""".stripMargin)
  }

  /** LATERAL correlated subquery with ORDER BY + LIMIT — the SQL-native
    * top-N-per-group (the DataFrame twin is q_win_topk_per_group /
    * TopKPerGroupExec): latest 2 orders per customer. Catalyst
    * decorrelates the lateral to a window under the hood; the total
    * (o_orderdate, o_orderkey) DESC order makes the pick deterministic.
    */
  def lateralTopN(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(
      """SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
        |FROM v_customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM v_orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 2) l
        |ORDER BY c_custkey, o_orderkey""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_cust_distribution" -> (custDistribution _),
    "q_sql_product_profit" -> (productProfit _),
    "q_sql_min_price_supplier" -> (minPriceSupplier _),
    "q_sql_supplier_cnt" -> (supplierCnt _),
    "q_sql_promo_suppliers" -> (promoSuppliers _),
    "q_sql_recursive_walk" -> (recursiveWalk _),
    "q_sql_lateral_topn" -> (lateralTopN _))

  val oracles: Map[String, String] = Map(
    "q_sql_cust_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q_sql_product_profit" ->
      """SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
        |FROM (
        |  SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |         CAST(l_extendedprice AS DECIMAL(12,2))
        |           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
        |         - CAST(l_quantity AS DECIMAL(8,2)) * CAST(p_retailprice AS DECIMAL(10,2)) AS amount
        |  FROM lineitem
        |  JOIN part     ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders   ON o_orderkey = l_orderkey
        |  JOIN nation   ON s_nationkey = n_nationkey
        |  WHERE p_name LIKE '%red%')
        |GROUP BY nation, o_year ORDER BY nation, o_year""".stripMargin,
    "q_sql_min_price_supplier" ->
      """SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name,
        |       l_extendedprice AS min_price
        |FROM part
        |JOIN lineitem ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE' AND p_size <= 5
        |  AND l_extendedprice = (
        |    SELECT MIN(l2.l_extendedprice)
        |    FROM lineitem l2
        |    JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
        |    JOIN nation   n2 ON s2.s_nationkey = n2.n_nationkey
        |    JOIN region   r2 ON n2.n_regionkey = r2.r_regionkey
        |    WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
        |ORDER BY p_partkey, s_suppkey""".stripMargin,
    "q_sql_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#5' AND p_size IN (1,4,7,10,13,16,19,22)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q_sql_recursive_walk" ->
      """WITH RECURSIVE walk(nationkey, name, anc, depth) AS (
        |  SELECT n_nationkey, n_name, CAST(n_nationkey AS BIGINT), 0 FROM nation
        |  UNION ALL
        |  SELECT w.nationkey, w.name, CAST(floor((w.anc - 1) / 2) AS BIGINT), w.depth + 1
        |  FROM walk w WHERE w.anc > 0)
        |SELECT nationkey, name,
        |  CAST(max(depth) AS BIGINT) AS depth_to_root,
        |  CAST(sum(anc) AS BIGINT) AS anc_key_sum
        |FROM walk GROUP BY nationkey, name
        |ORDER BY nationkey""".stripMargin,
    "q_sql_lateral_topn" ->
      """SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 2) l
        |ORDER BY c_custkey, o_orderkey""".stripMargin,
    "q_sql_promo_suppliers" ->
      """SELECT s_suppkey, s_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name IN ('NATION_1','NATION_2','NATION_3')
        |  AND s_suppkey IN (
        |    SELECT l_suppkey
        |    FROM lineitem JOIN part ON p_partkey = l_partkey
        |    WHERE p_name LIKE 'small%'
        |      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |    GROUP BY l_suppkey, l_partkey
        |    HAVING SUM(CAST(l_quantity AS BIGINT)) > 40)
        |ORDER BY s_suppkey""".stripMargin)
}
