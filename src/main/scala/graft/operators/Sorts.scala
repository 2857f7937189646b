package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.6 global sorts and top-k. The multi-key sort is a range-partitioned
  * SortExec (sampled boundaries — scales to any size); the top-k compiles
  * to TakeOrderedAndProjectExec, which keeps a bounded per-partition heap
  * and never materializes a full sort — the only sane top-k at 100 TB.
  */
object Sorts {

  /** #37 global multi-key sort (desc price, asc key tie-break). */
  def sortMultikey(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))

  /** #38 global top-20 most expensive orders. */
  def topk(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(20)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sort_multikey" -> (sortMultikey _),
    "q_topk" -> (topk _))

  val oracles: Map[String, String] = Map(
    "q_sort_multikey" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin)
}
