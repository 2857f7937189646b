package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Product-analytics operators over the event stream: ordered funnel
  * conversion and weekly cohort retention — the two canonical "did the
  * user progress" aggregations. Both reduce the event log to one row
  * per user with a single hash aggregate (min-timestamp per step /
  * first-activity week), so the shuffle volume is #users, not #events,
  * and the second-stage aggregate is tiny at any scale.
  */
object EventOps {

  /** Strictly-ordered funnel view → click → purchase: per user take the
    * FIRST timestamp of each step, then count users whose first click
    * followed their first view and first purchase followed that click.
    * Null min-timestamps (step never reached) fail the > comparison, so
    * no explicit null handling is needed.
    */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val steps = Tables.events(s, dir)
      .groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_buy"))
    steps.agg(
      count(lit(1)).as("n_users"),
      count(when(col("t_view").isNotNull, lit(1))).as("step_view"),
      count(when(col("t_view").isNotNull && col("t_click") > col("t_view"), lit(1))).as("step_click"),
      count(when(col("t_view").isNotNull && col("t_click") > col("t_view")
        && col("t_buy") > col("t_click"), lit(1))).as("step_buy"))
  }

  /** Weekly cohort retention: cohort = Monday of the user's first active
    * week; one row per (cohort, week-offset) with the distinct users
    * still active. Week arithmetic stays integral (datediff/7 on
    * week-truncated dates is exact), so no engine rounding is involved.
    */
  def retention(s: SparkSession, dir: String): DataFrame = {
    val active = Tables.events(s, dir)
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
      .distinct()
    val first = active.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
    active.join(first, Seq("user_id"))
      .groupBy(col("cohort_wk"),
        floor(datediff(col("wk"), col("cohort_wk")) / 7).cast("long").as("offset_wk"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_wk", "offset_wk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_funnel" -> (funnel _),
    "q_retention" -> (retention _))

  val oracles: Map[String, String] = Map(
    "q_funnel" ->
      """WITH t AS (
        |  SELECT user_id,
        |    MIN(ts) FILTER (WHERE event_type = 'view')     AS t_view,
        |    MIN(ts) FILTER (WHERE event_type = 'click')    AS t_click,
        |    MIN(ts) FILTER (WHERE event_type = 'purchase') AS t_buy
        |  FROM events GROUP BY user_id)
        |SELECT COUNT(*) AS n_users,
        |  COUNT(*) FILTER (WHERE t_view IS NOT NULL) AS step_view,
        |  COUNT(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view) AS step_click,
        |  COUNT(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view
        |                     AND t_buy > t_click) AS step_buy
        |FROM t""".stripMargin,
    "q_retention" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
        |f AS (SELECT user_id, MIN(wk) AS cohort_wk FROM a GROUP BY user_id)
        |SELECT cohort_wk, date_diff('day', cohort_wk, wk) // 7 AS offset_wk, COUNT(*) AS n_users
        |FROM a JOIN f USING (user_id)
        |GROUP BY cohort_wk, offset_wk ORDER BY cohort_wk, offset_wk""".stripMargin)
}
