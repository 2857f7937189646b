package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.5 Window functions — trip sequencing, dedup-keep-latest, running
  * totals. Every window is partitioned on a key (user/customer/brand), so at
  * 100 TB the work distributes as one shuffle per window spec; ordering keys
  * always extend to a total order so ranks are deterministic. Windowed sums
  * of doubles go through exact decimals like the grouped aggregates.
  */
object Windows {

  private def secs(c: org.apache.spark.sql.Column) = c.cast("long")

  /** #31 rank family over a total per-partition order. */
  def winRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"))
      .orderBy("o_custkey", "rn")
  }

  /** Distribution window functions — percent_rank / cume_dist (+ decile
    * ntile), completing the rank family in #31. Both are exact-integer
    * ratios ((rank−1)/(n−1), rank_hi/n) evaluated as one double division
    * — correctly rounded identically in both engines — over a total
    * per-partition order (o_totalprice ties broken by o_orderkey), so
    * values are reproducible at any parallelism.
    */
  def winCume(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        ntile(10).over(w).as("decile"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** #32 per-user event sequencing: gap to previous event in whole seconds
    * (epoch floored identically on both engines).
    */
  def winLagSequence(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts")
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        (secs(col("ts")) - secs(lag(col("ts"), 1).over(w))).as("gap_sec"))
      .orderBy("event_id")
  }

  /** #33 running sum + trailing 3-row average per customer (exact decimal). */
  def winRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val money = col("o_totalprice").cast("decimal(18,4)")
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(money).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_total"),
        (sum(money).over(w.rowsBetween(-2, Window.currentRow)).cast("double") /
          count(lit(1)).over(w.rowsBetween(-2, Window.currentRow))).as("moving_avg3"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** #34 time-range frame: per-user trailing-1h sum of value over an epoch-
    * seconds RANGE frame.
    */
  def winRangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("sec").rangeBetween(-3600, 0)
    Tables.events(s, dir)
      .withColumn("sec", secs(col("ts")))
      .select(col("event_id"), col("user_id"), col("sec"),
        sum(col("value").cast("decimal(18,4)")).over(w).cast("double").as("sum_1h"))
      .orderBy("event_id")
  }

  /** #35 the reference's dedup: keep the latest record per key (trip-ID +
    * modified-date transposed to (user_id, event_type) + ts).
    */
  def dedupKeepLatest(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy(desc("ts"), desc("event_id"))
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("event_id", "user_id", "event_type", "ts")
      .orderBy("user_id", "event_type")
  }

  /** #36 top-3 parts by price per brand, totally tie-broken. */
  def winTopkPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("p_brand").orderBy(desc("p_retailprice"), asc("p_partkey"))
    Tables.part(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("p_brand", "rn", "p_partkey", "p_name", "p_retailprice")
      .orderBy("p_brand", "rn")
  }

  /** Time-windowed deduplication: an event survives iff the previous
    * event with the same (user_id, event_type) is more than 600 s older
    * (the batch twin of the streaming watermark-dedup in
    * StreamingOps). Note the lag is against the previous RAW event, not
    * the previous KEPT one — that variant is inherently sequential
    * state (the streaming op's job); this one is a single key-
    * partitioned window, embarrassingly parallel at any scale.
    */
  def dedupWindowed(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .withColumn("gap", secs(col("ts")) - secs(lag(col("ts"), 1).over(w)))
      .filter(col("gap").isNull || col("gap") > 600)
      .select("event_id", "user_id", "event_type", "ts")
      .orderBy("event_id")
  }

  /** Rolling LOWER median of the last 5 values per user — the robust
    * smoother that, unlike the mean, ignores single spikes. Median
    * rank is (m+1) div 2 over the m ≤ 5 values in frame (for odd m the
    * true median, for even m the lower of the two middles) — an
    * integer-exact definition, so micro-unit values survive the
    * cross-engine hash compare with no float averaging of middle
    * elements. The 5-element frame list is collected, sorted, and
    * indexed per row: constant work per row on a key-partitioned
    * window, no global step.
    */
  def winRollingMedian(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-4, 0)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        floor(col("value") * 1e6).cast("long").as("vmicro"))
      .withColumn("frame", array_sort(collect_list(col("vmicro")).over(w)))
      .select(col("user_id"), col("event_id"),
        element_at(col("frame"), expr("(size(frame) + 1) div 2").cast("int"))
          .as("med_micro"))
      .orderBy("user_id", "event_id")
  }

  /** Ratio-to-report: each nation's share of its region's revenue, the
    * window formulation (sum over the region partition) rather than a
    * join-back — one shuffle on the partition key, and the window input
    * is the already-reduced nation-level aggregate (|nations| rows), so
    * the window itself is trivially small at any corpus scale. Revenue
    * sums are exact decimals; the share divides two exact decimals cast
    * to double (one correctly-rounded op on both engines) and rounds to
    * 6 dp, the Det ratio discipline.
    */
  def winRatioReport(s: SparkSession, dir: String): DataFrame = {
    import graft.Det
    val nationRev = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      // stay decimal through the window sum: a double window sum would be
      // partition-order-sensitive; decimal addition is exact either way
      .agg(sum(Det.money(col("o_totalprice"))).as("nation_rev_dec"))
    val w = Window.partitionBy("r_name")
    nationRev
      .withColumn("region_rev_dec", sum(col("nation_rev_dec")).over(w))
      .select(col("r_name"), col("n_name"),
        col("nation_rev_dec").cast("double").as("nation_rev"),
        round(col("nation_rev_dec").cast("double") / col("region_rev_dec").cast("double"),
          6).as("share"))
      .orderBy("r_name", "n_name")
  }

  /** Last-observation-carried-forward: a metric observed only on
    * purchase events is forward-filled across each user's event stream —
    * the sensor/price-feed fill every time-series migration needs. One
    * window per user (last + IGNORE NULLS over a running frame); values
    * pass through unchanged so the cross-engine hash is exact.
    */
  def winLocf(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("observed", when(col("event_type") === "purchase", col("value")))
      .withColumn("filled", last(col("observed"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("event_id"), col("observed"), col("filled"))
      .orderBy("user_id", "event_id")
  }

  /** Running COUNT(DISTINCT) per user — Spark rejects distinct aggregates
    * over windows, so the idiomatic rewrite is size(collect_set().over):
    * same semantics (nulls dropped), bounded state (the distinct domain
    * here is the small event_type vocabulary). The DuckDB twin uses the
    * native COUNT(DISTINCT ...) OVER, proving the rewrite equivalent.
    */
  def winDistinctRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("n_types_seen", size(collect_set(col("event_type")).over(w)).cast("long"))
      .select(col("user_id"), col("event_id"), col("n_types_seen"))
      .orderBy("user_id", "event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_win_rolling_median" -> (winRollingMedian _),
    "q_win_ratio_report" -> (winRatioReport _),
    "q_win_locf" -> (winLocf _),
    "q_win_distinct_running" -> (winDistinctRunning _),
    "q_dedup_windowed" -> (dedupWindowed _),
    "q_win_rank" -> (winRank _),
    "q_win_lag_sequence" -> (winLagSequence _),
    "q_win_cume" -> (winCume _),
    "q_win_running" -> (winRunning _),
    "q_win_range_frame" -> (winRangeFrame _),
    "q_dedup_keep_latest" -> (dedupKeepLatest _),
    "q_win_topk_per_group" -> (winTopkPerGroup _))

  val oracles: Map[String, String] = Map(
    "q_win_locf" ->
      """SELECT user_id, event_id,
        |  CASE WHEN event_type = 'purchase' THEN value END AS observed,
        |  last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q_win_distinct_running" ->
      """SELECT user_id, event_id,
        |  COUNT(DISTINCT event_type)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_types_seen
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q_win_ratio_report" ->
      """WITH nr AS (
        |  SELECT r_name, n_name,
        |    SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS nation_rev_dec
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name)
        |SELECT r_name, n_name,
        |  CAST(nation_rev_dec AS DOUBLE) AS nation_rev,
        |  round(CAST(nation_rev_dec AS DOUBLE)
        |    / CAST(SUM(nation_rev_dec) OVER (PARTITION BY r_name) AS DOUBLE), 6) AS share
        |FROM nr ORDER BY r_name, n_name""".stripMargin,
    "q_win_rolling_median" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(floor(value * 1e6) AS BIGINT) AS vmicro
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id,
        |    list_sort(list(vmicro) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS frame
        |  FROM e)
        |SELECT user_id, event_id, frame[(len(frame) + 1) // 2] AS med_micro
        |FROM f ORDER BY user_id, event_id""".stripMargin,
    "q_dedup_windowed" ->
      """WITH g AS (
        |  SELECT event_id, user_id, event_type, ts,
        |    CAST(floor(epoch(ts)) AS BIGINT)
        |      - CAST(floor(epoch(lag(ts, 1) OVER w)) AS BIGINT) AS gap
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id))
        |SELECT event_id, user_id, event_type, ts
        |FROM g WHERE gap IS NULL OR gap > 600
        |ORDER BY event_id""".stripMargin,
    "q_win_rank" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  row_number() OVER w AS rn, rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk, ntile(4) OVER w AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,
    "q_win_cume" ->
      """SELECT o_custkey, o_orderkey,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume,
        |  CAST(ntile(10) OVER w AS INTEGER) AS decile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_lag_sequence" ->
      """SELECT event_id, user_id, ts,
        |  CAST(floor(epoch(ts)) AS BIGINT)
        |    - CAST(floor(epoch(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts))) AS BIGINT) AS gap_sec
        |FROM events ORDER BY event_id""".stripMargin,
    "q_win_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
        |    OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
        |    OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / count(*) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg3
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_range_frame" ->
      """SELECT event_id, user_id, sec,
        |  CAST(sum(CAST(value AS DECIMAL(18,4)))
        |    OVER (PARTITION BY user_id ORDER BY sec
        |          RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_1h
        |FROM (SELECT event_id, user_id, value,
        |        CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events)
        |ORDER BY event_id""".stripMargin,
    "q_dedup_keep_latest" ->
      """SELECT event_id, user_id, event_type, ts FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id, event_type
        |                           ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id, event_type""".stripMargin,
    "q_win_topk_per_group" ->
      """SELECT p_brand,
        |  row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS rn,
        |  p_partkey, p_name, p_retailprice
        |FROM part
        |QUALIFY rn <= 3
        |ORDER BY p_brand, rn""".stripMargin)
}
