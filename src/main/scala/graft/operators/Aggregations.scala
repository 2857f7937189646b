package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** §2.4 Aggregations. The reference's core data product is grouped trip
  * counts/averages; here as hash aggregates with map-side partial
  * aggregation (HashAggregateExec partial→final), which is the shape that
  * survives 100 TB: per-partition combine first, shuffle only group states.
  * All double measures follow the Det decimal policy (SURVEY.md §5.3).
  */
object Aggregations {

  /** #21 flagship — TPC-H-Q1-style pricing summary over lineitem. */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        Det.dsum(col("l_extendedprice")).as("sum_base_price"),
        Det.decSum(Det.money(col("l_extendedprice")) * Det.oneMinus(col("l_discount"))).as("sum_disc_price"),
        Det.decSum(Det.money(col("l_extendedprice")) * Det.oneMinus(col("l_discount")) * Det.onePlus(col("l_tax"))).as("sum_charge"),
        Det.davg(col("l_quantity")).as("avg_qty"),
        Det.davg(col("l_extendedprice")).as("avg_price"),
        Det.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** #22 global (no-key) aggregate — single-row totals. */
  def aggGlobal(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .agg(
        count(lit(1)).as("n_orders"),
        Det.dsum(col("o_totalprice")).as("total_price"),
        Det.davg(col("o_totalprice")).as("avg_price"),
        min(col("o_orderdate")).as("first_date"),
        max(col("o_orderdate")).as("last_date"))

  /** #23 exact distinct users per event type — Expand + two-phase agg. */
  def countDistinctUsers(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** #24 HLL approximate distinct — sketches merge commutatively so the
    * result is run-deterministic, but it is NOT DuckDB's approx algorithm:
    * queries-only, no oracle (rows-only check).
    */
  def approxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
      .orderBy("event_type")

  /** #24c HLL sketch RE-aggregation (Spark 4's Datasketches builtins):
    * per-(type, day) sketches union to per-type distinct estimates
    * without re-touching rows — the mergeable-cube pattern that makes
    * distinct counts incremental at 100 TB (daily sketch bytes persist;
    * month/quarter/lifetime rollups are unions of those partials, never
    * a rescan). Union is lossless at equal lgK, so the two-level
    * estimate is bit-identical to a direct one-level sketch — pinned in
    * QualitySpec alongside a 5% bound vs exact. Rows-only (DuckDB has
    * no Datasketches HLL twin).
    */
  def aggHllPartial(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      .groupBy("event_type")
      .agg(expr("CAST(hll_sketch_estimate(hll_union_agg(sk)) AS BIGINT)").as("approx_users"))
      .orderBy("event_type")

  /** HLL set-algebra: estimate the AUDIENCE OVERLAP |clickers ∩ buyers|
    * by inclusion-exclusion over three mergeable sketches (|A| + |B| −
    * |A∪B|) — the sketch-only answer to "how many users did both"
    * without ever shuffling user ids to one place. Rows-only by design
    * (estimates); QualitySpec bounds all four estimates against exact
    * distinct counts. The union sketch merges the two per-slice sketches
    * (hll_union_agg), not a rescan.
    */
  def aggHllIntersect(s: SparkSession, dir: String): DataFrame = {
    val sketches = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy("event_type")
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
    sketches
      .agg(
        expr("CAST(hll_sketch_estimate(hll_union_agg(sk)) AS BIGINT)").as("est_union"),
        expr("CAST(hll_sketch_estimate(max_by(sk, CASE WHEN event_type = 'click' " +
          "THEN 1 ELSE 0 END)) AS BIGINT)").as("est_clickers"),
        expr("CAST(hll_sketch_estimate(max_by(sk, CASE WHEN event_type = 'purchase' " +
          "THEN 1 ELSE 0 END)) AS BIGINT)").as("est_buyers"))
      .select(col("est_clickers"), col("est_buyers"), col("est_union"),
        greatest(col("est_clickers") + col("est_buyers") - col("est_union"), lit(0L))
          .as("est_overlap"))
  }

  /** Boolean + bitwise aggregate family per event type: count_if,
    * bool_and/bool_or, and bit_and/bit_or/bit_xor over the JSON-props
    * integer — the SQL-surface corner every migration eventually hits
    * (feature-flag folds, permission masks, parity checks). All six are
    * single-pass, map-side-combined, and integer/boolean exact, so the
    * cross-engine hash has no tolerance anywhere.
    */
  def aggBitwiseBool(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(expr("count_if(value > 300.0)").as("n_high"),
        expr("bool_and(value > 0.0)").as("all_positive"),
        expr("bool_or(value > 990.0)").as("any_extreme"),
        expr("bit_and(k)").as("k_and"),
        expr("bit_or(k)").as("k_or"),
        expr("bit_xor(k)").as("k_xor"))
      .orderBy("event_type")

  /** #24b approximate percentile sketch (GK/KLL-family) — the quantile
    * companion to HLL: mergeable per-partition sketches, the 100 TB
    * alternative to exact percentile's full sort. Rows-only (DuckDB's
    * approx_quantile is a different sketch); QualitySpec bounds the error
    * against the exact quantiles.
    */
  def approxPercentile(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderstatus")
      .agg(expr("percentile_approx(o_totalprice, array(0.25, 0.5, 0.75), 1000)").as("q"))
      .select(col("o_orderstatus"),
        element_at(col("q"), 1).as("p25"),
        element_at(col("q"), 2).as("p50"),
        element_at(col("q"), 3).as("p75"))
      .orderBy("o_orderstatus")

  /** O/D flow matrix — the reference's Data-Explorer data product: trip
    * counts + averages grouped by (origin cell, destination cell, period).
    * Cells derive deterministically from the keys (the same arithmetic
    * grid as q_pip_join); flows with < 3 trips are suppressed, the
    * k-anonymity rule public mobility extracts apply. One hash-agg
    * shuffle on the composite key at any scale.
    */
  def odFlows(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("o_cell", ((col("o_custkey") * 7919) % 10).cast("int"))
      .withColumn("d_cell", ((col("o_orderkey") * 104729) % 10).cast("int"))
      .withColumn("period", date_format(col("o_orderdate"), "yyyy"))
      .groupBy("o_cell", "d_cell", "period")
      .agg(count(lit(1)).as("n_trips"),
        Det.davg(Det.money(col("o_totalprice"))).as("avg_value"))
      .filter(col("n_trips") >= 3)
      .select(col("o_cell"), col("d_cell"), col("period"),
        col("n_trips"), round(col("avg_value"), 6).as("avg_value"))
      .orderBy("o_cell", "d_cell", "period")

  /** #25a rollup over (year, month) — multi-granularity publishing.
    * grouping() bits are computed explicitly so the encoding matches the
    * oracle bit-for-bit.
    */
  def aggRollup(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("y", year(col("o_orderdate")))
      .withColumn("m", month(col("o_orderdate")))
      .rollup("y", "m")
      .agg(count(lit(1)).as("n_orders"), Det.dsum(col("o_totalprice")).as("revenue"),
        (grouping(col("y")) * 2 + grouping(col("m"))).cast("int").as("gid"))
      .orderBy(asc("gid"), asc_nulls_first("y"), asc_nulls_first("m"))

  /** #25b cube over (orderstatus, priority). */
  def aggCube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        (grouping(col("o_orderstatus")) * 2 + grouping(col("o_orderpriority"))).cast("int").as("gid"))
      .orderBy(asc("gid"), asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))

  /** #25c explicit GROUPING SETS via SQL over a temp view (the one
    * contract-permitted side effect).
    */
  def aggGroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(1) AS n_orders
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  /** #26 filtered/conditional aggregates. */
  def aggConditional(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(
        count(when(col("o_totalprice") > 200000, lit(1))).as("n_big"),
        count(when(col("o_orderstatus") === "F", lit(1))).as("n_finished"),
        Det.decSum(when(col("o_orderstatus") === "F", Det.money(col("o_totalprice")))
          .otherwise(lit(0).cast("decimal(12,2)"))).as("finished_revenue"))
      .orderBy("o_orderpriority")

  /** #27 collect_list/set — wrapped in sort_array for determinism. The
    * graded projection joins the array to a string: the driver's pandas
    * canonicalization cannot hash ndarray cells, so array outputs are
    * string-canonicalized on BOTH engines.
    */
  def aggCollect(s: SparkSession, dir: String): DataFrame =
    // customer scales with the corpus — no forced hint; the planner
    // broadcasts it at fixture sf and shuffle-joins on custkey at TB
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(array_join(sort_array(collect_set(col("o_orderpriority"))), ",").as("priorities"),
        count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment")

  /** #28 exact percentiles per group. Median of 2-dp doubles is exact; the
    * quartile interpolation is rounded to 4 dp on both sides.
    */
  def aggPercentile(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderstatus")
      .agg(
        expr("median(o_totalprice)").as("p50"),
        round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(o_totalprice, 0.75)"), 4).as("p75"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  /** #29 stddev/var/corr/covar — NOT via the built-in float aggregates,
    * whose partial-merge order is nondeterministic under shuffle; instead
    * exact decimal moment sums (x and x² of 2-dp values are exact 4-dp
    * decimals) plugged into the textbook formulas as identical double
    * expression trees on both engines.
    */
  def aggStats(s: SparkSession, dir: String): DataFrame = {
    // moments must be EXACT: squares/products are computed in the decimal
    // domain (2-dp casts are tie-free, decimal multiplication is exact) —
    // casting a double product to decimal instead hits representation ties
    // that Spark (shortest-string HALF_UP) and DuckDB (exact binary) round
    // differently, which flipped the last ulp of corr at sf0.001
    val q = Det.money(col("l_quantity"))
    val p = Det.money(col("l_extendedprice"))
    val n = count(lit(1)).cast("double")
    val sq = sum(q).cast("double")
    val sp = sum(p).cast("double")
    val sqq = sum(q * q).cast("double")
    val spp = sum(p * p).cast("double")
    val sqp = sum(q * p).cast("double")
    val varQ = (sqq - sq * sq / n) / (n - 1)
    val varP = (spp - sp * sp / n) / (n - 1)
    val covQP = (sqp - sq * sp / n) / (n - 1)
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        varQ.as("var_qty"),
        sqrt(varQ).as("stddev_qty"),
        covQP.as("covar_qty_price"),
        (covQP / (sqrt(varQ) * sqrt(varP))).as("corr_qty_price"),
        n.cast("long").as("n"))
      .orderBy("l_returnflag")
  }

  /** #30 argmax — most expensive part per brand; struct-max gives a total
    * (price, name) order so ties are broken identically everywhere.
    */
  def aggArgmax(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .groupBy("p_brand")
      .agg(max(struct(col("p_retailprice"), col("p_name"))).as("top"))
      .select(col("p_brand"), col("top.p_name").as("top_part"),
        col("top.p_retailprice").as("top_price"))
      .orderBy("p_brand")

  /** Incremental aggregate maintenance: partial aggregates computed on
    * two disjoint slices (a "base" snapshot and a "delta" batch) are
    * MERGED into the exact full-table result — sum/count merge by sum,
    * min/max by min/max, avg derived after the merge from the merged
    * (sum, n). This is the algebraic property every 100 TB incremental
    * pipeline leans on (update aggregates from a day's delta without
    * rescanning history); the oracle computes the same aggregate
    * directly over the whole table, so the equality of the two plans
    * IS the graded claim. Decimal sums make the merge bit-exact.
    */
  def aggIncremental(s: SparkSession, dir: String): DataFrame = {
    def partial(df: DataFrame): DataFrame =
      df.groupBy("l_returnflag").agg(
        count(lit(1)).as("n_rows"),
        sum(Det.money(col("l_quantity"))).as("sum_qty_dec"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))
    val li = Tables.lineitem(s, dir)
    val base = partial(li.filter(pmod(col("l_orderkey"), lit(10)) =!= 0))
    val delta = partial(li.filter(pmod(col("l_orderkey"), lit(10)) === 0))
    base.unionAll(delta)
      .groupBy("l_returnflag")
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("sum_qty_dec")).as("merged_qty"),
        min(col("min_price")).as("min_price"),
        max(col("max_price")).as("max_price"))
      .select(col("l_returnflag"), col("n_rows"),
        col("merged_qty").cast("double").as("sum_qty"),
        round(col("merged_qty").cast("double") / col("n_rows"), 6).as("avg_qty"),
        col("min_price"), col("max_price"))
      .orderBy("l_returnflag")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_incremental" -> (aggIncremental _),
    "q_agg_pricing_summary" -> (pricingSummary _),
    "q_agg_global" -> (aggGlobal _),
    "q_agg_count_distinct" -> (countDistinctUsers _),
    "q_agg_approx_distinct" -> (approxDistinct _),
    "q_agg_hll_partial" -> (aggHllPartial _),
    "q_agg_hll_intersect" -> (aggHllIntersect _),
    "q_agg_approx_percentile" -> (approxPercentile _),
    "q_agg_bitwise_bool" -> (aggBitwiseBool _),
    "q_od_flows" -> (odFlows _),
    "q_agg_rollup" -> (aggRollup _),
    "q_agg_cube" -> (aggCube _),
    "q_agg_gsets" -> (aggGroupingSets _),
    "q_agg_conditional" -> (aggConditional _),
    "q_agg_collect" -> (aggCollect _),
    "q_agg_percentile" -> (aggPercentile _),
    "q_agg_stats" -> (aggStats _),
    "q_agg_argmax" -> (aggArgmax _))

  val oracles: Map[String, String] = Map(
    "q_agg_bitwise_bool" ->
      """WITH e AS (
        |  SELECT event_type, value,
        |    CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type,
        |  COUNT(*) FILTER (value > 300.0) AS n_high,
        |  bool_and(value > 0.0) AS all_positive,
        |  bool_or(value > 990.0) AS any_extreme,
        |  bit_and(k) AS k_and, bit_or(k) AS k_or, bit_xor(k) AS k_xor
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_agg_incremental" ->
      """SELECT l_returnflag, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  round(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
        |  MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_global" ->
      """SELECT COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  MIN(o_orderdate) AS first_date,
        |  MAX(o_orderdate) AS last_date
        |FROM orders""".stripMargin,
    "q_agg_count_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_agg_rollup" ->
      """SELECT y, m, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  CAST(GROUPING(y) * 2 + GROUPING(m) AS INTEGER) AS gid
        |FROM (SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
        |             CAST(month(o_orderdate) AS INTEGER) AS m, o_totalprice FROM orders)
        |GROUP BY ROLLUP (y, m)
        |ORDER BY gid, y NULLS FIRST, m NULLS FIRST""".stripMargin,
    "q_agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INTEGER) AS gid
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_agg_gsets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_agg_conditional" ->
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(12,2))
        |                ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS finished_revenue
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_agg_collect" ->
      """SELECT c_mktsegment, array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities,
        |  COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_agg_percentile" ->
      """SELECT o_orderstatus,
        |  median(o_totalprice) AS p50,
        |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        |  round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_agg_stats" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sq,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sp,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sqq,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS spp,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sqp
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  (sqq - sq * sq / n) / (n - 1) AS var_qty,
        |  sqrt((sqq - sq * sq / n) / (n - 1)) AS stddev_qty,
        |  (sqp - sq * sp / n) / (n - 1) AS covar_qty_price,
        |  ((sqp - sq * sp / n) / (n - 1)) / (sqrt((sqq - sq * sq / n) / (n - 1)) * sqrt((spp - sp * sp / n) / (n - 1))) AS corr_qty_price,
        |  CAST(n AS BIGINT) AS n
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q_agg_argmax" ->
      """SELECT p_brand, p_name AS top_part, p_retailprice AS top_price
        |FROM part
        |QUALIFY row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_name DESC) = 1
        |ORDER BY p_brand""".stripMargin,
    "q_od_flows" ->
      """SELECT CAST((o_custkey * 7919) % 10 AS INTEGER) AS o_cell,
        |  CAST((o_orderkey * 104729) % 10 AS INTEGER) AS d_cell,
        |  strftime(o_orderdate, '%Y') AS period,
        |  COUNT(*) AS n_trips,
        |  round(CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DECIMAL(18,4))) AS DOUBLE)
        |        / COUNT(*), 6) AS avg_value
        |FROM orders
        |GROUP BY 1, 2, 3 HAVING COUNT(*) >= 3
        |ORDER BY o_cell, d_cell, period""".stripMargin)
}
