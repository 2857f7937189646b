package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.7 Set operations, duplicate elimination, and the reference's
  * Socrata-style upsert (new batch replaces matching keys, appends rest).
  * intersect/except compile to semi/anti joins; exact dedup is expressed as
  * a group-by (not dropDuplicates) so the surviving row is deterministic.
  */
object SetOps {

  private def fSlice(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
  private def uSlice(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")

  /** #39 bag union of two order slices, tagged by origin. */
  def unionAll(s: SparkSession, dir: String): DataFrame =
    fSlice(s, dir).select(col("o_orderkey"), lit("f").as("tag"))
      .unionByName(uSlice(s, dir).select(col("o_orderkey"), lit("u").as("tag")))
      .orderBy("tag", "o_orderkey")

  /** #40 set union of customer keys from two segments. */
  def unionDistinct(s: SparkSession, dir: String): DataFrame = {
    val a = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val b = Tables.customer(s, dir).filter(col("c_acctbal") > 8000).select("c_custkey")
    a.union(b).distinct().orderBy("c_custkey")
  }

  /** #41 INTERSECT — compiled by Spark to a distinct + left-semi join. */
  def intersectKeys(s: SparkSession, dir: String): DataFrame = {
    val building = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val withOpen = Tables.orders(s, dir).filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("c_custkey"))
    building.intersect(withOpen).orderBy("c_custkey")
  }

  /** #42 EXCEPT — customers with no 'O' order (anti-join under the hood). */
  def exceptKeys(s: SparkSession, dir: String): DataFrame = {
    val all = Tables.customer(s, dir).select("c_custkey")
    val withOpen = Tables.orders(s, dir).filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("c_custkey"))
    all.except(withOpen).orderBy("c_custkey")
  }

  /** #43 exact dedup on a derived content key (all fixture texts are
    * distinct, so the key is the first-5-token prefix). Group-by keeps
    * min(doc_id) — deterministic, unlike dropDuplicates whose survivor
    * depends on partition order. At 100 TB this is the standard
    * hash-partitioned exact-dedup: one shuffle on the content hash.
    */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("key", array_join(slice(split(col("text"), " "), 1, 5), " "))
      .groupBy("key")
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_dups"))
      .orderBy("key")

  /** #6 upsert: the new batch wins on key collision, the rest of the old
    * set survives — anti-join + union, the scalable MERGE shape.
    */
  def upsert(s: SparkSession, dir: String): DataFrame = {
    val old = fSlice(s, dir).select(col("o_orderkey"), col("o_totalprice"), lit("old").as("src"))
    val fresh = uSlice(s, dir).select(col("o_orderkey"), col("o_totalprice"), lit("new").as("src"))
    old.join(fresh.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
      .unionByName(fresh)
      .orderBy("o_orderkey")
  }

  /** Socrata-style batch publish serialization: each row becomes a JSON
    * object (to_json over a struct — field order fixed by the struct),
    * rows are grouped into key-range batches of 500 and concatenated into
    * one `[...]` array payload per batch — the reference's
    * rows-per-request publish format. Key-range batching (not
    * row_number) keeps it one shuffle and deterministic; the in-batch
    * order is pinned by sorting the collected (key, json) structs.
    */
  def publishJson(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("row_json", to_json(struct(
        col("o_orderkey"), col("o_orderstatus"),
        // dates ride as yyyy-MM-dd strings: engines disagree on JSON
        // timestamp rendering (ISO 'T' + millis vs space-separated)
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"))))
      .withColumn("batch_id", floor(col("o_orderkey") / 500).cast("long"))
      .groupBy("batch_id")
      .agg(
        count(lit(1)).as("n_rows"),
        concat(lit("["),
          array_join(transform(
            sort_array(collect_list(struct(col("o_orderkey"), col("row_json")))),
            p => p.getField("row_json")), ","),
          lit("]")).as("payload"))
      .orderBy("batch_id")

  /** Full MERGE INTO semantics in one relational pass — the lakehouse
    * statement every warehouse migration asks about first. Target =
    * finished orders; source = urgent orders carrying a data-derived op
    * (small ones are retractions, the rest upserts). One full-outer join
    * on the key expresses all four MERGE arms branch-free:
    * WHEN MATCHED AND op='delete'  THEN DELETE (filtered out),
    * WHEN MATCHED                  THEN UPDATE (source price wins),
    * WHEN NOT MATCHED AND op!='delete' THEN INSERT,
    * plus untouched target rows pass through. Exactly one shuffle (or a
    * broadcast when the source is dim-sized); the same single-join shape
    * Delta/Iceberg MERGE compiles to before write-back.
    */
  def mergeFull(s: SparkSession, dir: String): DataFrame = {
    val target = fSlice(s, dir)
      .select(col("o_orderkey").as("t_key"), col("o_totalprice").as("t_price"))
    val source = uSlice(s, dir)
      .select(col("o_orderkey").as("s_key"), col("o_totalprice").as("s_price"),
        when(col("o_totalprice") < 50000, "delete").otherwise("upsert").as("op"))
    target.join(source, col("t_key") === col("s_key"), "full_outer")
      // matched-delete AND source-only-delete both drop; target-only rows
      // carry a NULL op and must survive (NULL != 'delete' is NULL, so the
      // null-safe form is required, not a plain !=)
      .filter(!(col("op") <=> "delete"))
      .select(
        coalesce(col("t_key"), col("s_key")).as("o_orderkey"),
        coalesce(col("s_price"), col("t_price")).as("o_totalprice"),
        when(col("s_key").isNull, "kept")
          .when(col("t_key").isNull, "inserted")
          .otherwise("updated").as("action"))
      .orderBy("o_orderkey")
  }

  /** INTERSECT ALL — bag semantics: each supplier key survives with
    * min(multiplicity in returned lines, multiplicity in accepted
    * lines). The BAG variants are genuinely different operators from
    * #41/#42 (Spark compiles them to a count-aggregate + generate
    * rather than a semi/anti join) and are what dedup-accounting
    * queries actually need ("how many shipments does each supplier
    * have on BOTH sides?"). Shuffles once on the value key with
    * map-side partial counts.
    */
  def intersectAllKeys(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R").select("l_suppkey")
    val a = Tables.lineitem(s, dir).filter(col("l_returnflag") === "A").select("l_suppkey")
    r.intersectAll(a).orderBy("l_suppkey")
  }

  /** EXCEPT ALL — bag difference: returned-line supplier keys with
    * accepted-line multiplicities subtracted (max(0, cR − cA) copies
    * survive). Same count-aggregate shape as [[intersectAllKeys]].
    */
  def exceptAllKeys(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R").select("l_suppkey")
    val a = Tables.lineitem(s, dir).filter(col("l_returnflag") === "A").select("l_suppkey")
    r.exceptAll(a).orderBy("l_suppkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_intersect_all" -> (intersectAllKeys _),
    "q_except_all" -> (exceptAllKeys _),
    "q_union_all" -> (unionAll _),
    "q_union_distinct" -> (unionDistinct _),
    "q_intersect" -> (intersectKeys _),
    "q_except" -> (exceptKeys _),
    "q_dedup_exact" -> (dedupExact _),
    "q_upsert" -> (upsert _),
    "q_merge_full" -> (mergeFull _),
    "q_publish_json" -> (publishJson _))

  val oracles: Map[String, String] = Map(
    "q_intersect_all" ->
      """SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
        |INTERSECT ALL
        |SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
        |ORDER BY l_suppkey""".stripMargin,
    "q_except_all" ->
      """SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
        |EXCEPT ALL
        |SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
        |ORDER BY l_suppkey""".stripMargin,
    "q_union_all" ->
      """SELECT o_orderkey, 'f' AS tag FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT o_orderkey, 'u' AS tag FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY tag, o_orderkey""".stripMargin,
    "q_union_distinct" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT c_custkey FROM customer WHERE c_acctbal > 8000
        |ORDER BY c_custkey""".stripMargin,
    "q_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY c_custkey""".stripMargin,
    "q_except" ->
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY c_custkey""".stripMargin,
    "q_dedup_exact" ->
      """SELECT array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ') AS key,
        |  MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_dups
        |FROM documents GROUP BY 1 ORDER BY key""".stripMargin,
    "q_merge_full" ->
      """WITH target AS (
        |  SELECT o_orderkey AS t_key, o_totalprice AS t_price
        |  FROM orders WHERE o_orderstatus = 'F'),
        |source AS (
        |  SELECT o_orderkey AS s_key, o_totalprice AS s_price,
        |    CASE WHEN o_totalprice < 50000 THEN 'delete' ELSE 'upsert' END AS op
        |  FROM orders WHERE o_orderpriority = '1-URGENT')
        |SELECT coalesce(t_key, s_key) AS o_orderkey,
        |  coalesce(s_price, t_price) AS o_totalprice,
        |  CASE WHEN s_key IS NULL THEN 'kept'
        |       WHEN t_key IS NULL THEN 'inserted'
        |       ELSE 'updated' END AS action
        |FROM target FULL OUTER JOIN source ON t_key = s_key
        |WHERE op IS DISTINCT FROM 'delete'
        |ORDER BY o_orderkey""".stripMargin,
    "q_upsert" ->
      """SELECT o.o_orderkey, o.o_totalprice, 'old' AS src
        |FROM orders o
        |WHERE o.o_orderstatus = 'F'
        |  AND NOT EXISTS (SELECT 1 FROM orders n
        |                  WHERE n.o_orderpriority = '1-URGENT' AND n.o_orderkey = o.o_orderkey)
        |UNION ALL
        |SELECT o_orderkey, o_totalprice, 'new' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_orderkey""".stripMargin,
    "q_publish_json" ->
      """WITH r AS (
        |  SELECT o_orderkey,
        |    CAST(floor(o_orderkey / 500) AS BIGINT) AS batch_id,
        |    to_json(struct_pack(
        |      o_orderkey := o_orderkey,
        |      o_orderstatus := o_orderstatus,
        |      o_orderdate := strftime(o_orderdate, '%Y-%m-%d'),
        |      o_orderpriority := o_orderpriority)) AS row_json
        |  FROM orders)
        |SELECT batch_id, COUNT(*) AS n_rows,
        |  '[' || string_agg(row_json, ',' ORDER BY o_orderkey) || ']' AS payload
        |FROM r GROUP BY batch_id ORDER BY batch_id""".stripMargin)
}
