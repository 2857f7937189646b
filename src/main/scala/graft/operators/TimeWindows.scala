package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** §2.9 batch forms of the streaming time windows — tumbling, sliding and
  * session windows over the event stream. The same expressions run
  * unchanged under readStream + watermark (see graft.streaming); batch
  * versions are the oracle-checkable surface. Grouped sums follow the Det
  * decimal policy.
  */
object TimeWindows {

  /** #51 1-hour tumbling window per event type. */
  def windowTumbling(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Det.dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("bucket_start", "event_type")

  /** #52 1-hour window sliding every 15 minutes (4× row expansion via
    * Expand — the standard Spark sliding-window plan).
    */
  def windowSliding(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("bucket_start"), col("event_type"), col("n_events"))
      .orderBy("bucket_start", "event_type")

  /** #53 session windows: 30-minute inactivity gap per user. Sessions are
    * half-open [first, last+gap) — an event exactly 30 minutes after the
    * previous one starts a NEW session, mirrored in the oracle's
    * gaps-and-islands formulation with a >= comparison.
    */
  def windowSession(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), Det.dsum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_window_tumbling" -> (windowTumbling _),
    "q_window_sliding" -> (windowSliding _),
    "q_window_session" -> (windowSession _))

  val oracles: Map[String, String] = Map(
    "q_window_tumbling" ->
      """SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket_start, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2 ORDER BY bucket_start, event_type""".stripMargin,
    "q_window_sliding" ->
      """SELECT time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE AS bucket_start,
        |  event_type, COUNT(*) AS n_events
        |FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) offs(k)
        |GROUP BY 1, 2 ORDER BY bucket_start, event_type""".stripMargin,
    "q_window_session" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |islands AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        |  user_id, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM islands
        |GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin)
}
