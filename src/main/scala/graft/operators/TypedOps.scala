package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Typed Dataset surface (KeyValueGroupedDataset): cogroup over two typed
  * groupings — the imperative escape hatch for per-key merge logic that
  * genuinely doesn't fit a join (the reference's per-device record-merging
  * loops). Shapes like a shuffle-both-sides join; state per key is the
  * iterators only. Top-level case classes so Janino-generated encoders
  * can reach them.
  */
case class CustRow(c_custkey: Long, c_acctbal: Double, c_mktsegment: String)
case class OrdRow(o_custkey: Long, o_totalprice: Double)
case class CustOrders(c_custkey: Long, c_mktsegment: String, n_orders: Long, total: Double)

object TypedOps {

  /** cogroup customers with their orders; per-key merge sums exactly via
    * BigDecimal (the typed analog of the Det policy), emitting one row per
    * customer that has orders.
    */
  def cogroupCustOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment")).as[CustRow]
    val ord = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_totalprice")).as[OrdRow]
    cust.groupByKey(_.c_custkey)
      .cogroup(ord.groupByKey(_.o_custkey)) { (key, cs, os) =>
        val c = cs.toSeq
        val orders = os.toSeq
        if (c.isEmpty || orders.isEmpty) Iterator.empty
        else {
          val total = orders
            .map(o => BigDecimal(o.o_totalprice).setScale(4, BigDecimal.RoundingMode.HALF_UP))
            .sum
          Iterator.single(CustOrders(key, c.head.c_mktsegment, orders.size.toLong, total.toDouble))
        }
      }
      .toDF()
      .orderBy("c_custkey")
  }

  /** DataFrameNaFunctions: fill / replace over a manufactured-null column. */
  def naFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("status_or_null", nullif(col("o_orderstatus"), lit("P")))
      .na.fill("missing", Seq("status_or_null"))
      .na.replace("o_orderpriority", Map("1-URGENT" -> "URGENT", "5-LOW" -> "LOW"))
      .select("o_orderkey", "status_or_null", "o_orderpriority")
      .orderBy("o_orderkey")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cogroup_typed" -> (cogroupCustOrders _),
    "q_na_funcs" -> (naFuncs _))

  val oracles: Map[String, String] = Map(
    "q_cogroup_typed" ->
      """SELECT c_custkey, c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_mktsegment
        |ORDER BY c_custkey""".stripMargin,
    "q_na_funcs" ->
      """SELECT o_orderkey,
        |  COALESCE(NULLIF(o_orderstatus, 'P'), 'missing') AS status_or_null,
        |  CASE o_orderpriority WHEN '1-URGENT' THEN 'URGENT'
        |                       WHEN '5-LOW' THEN 'LOW'
        |                       ELSE o_orderpriority END AS o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin)
}
