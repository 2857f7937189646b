package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over the document-similarity graph — the
  * crawl-prioritization shape (rank pages/domains by their position in
  * the near-dup/link structure) and the second iterative-dataflow
  * operator next to [[DedupOps.dedupComponents]].
  *
  * Determinism across engines AND shuffles: ranks are INTEGER
  * micro-units and every step is integer arithmetic (`div`), so partial
  * sums commute exactly — no floating-point accumulation order anywhere.
  * The DuckDB twin is a recursive CTE running the identical recurrence.
  */
object GraphOps {

  private val Iterations = 5
  private val UnitMass = 1000000L // 1.0 in micro-units

  /** Fixed-point PageRank (damping 0.85, 5 rounds) on the symmetrized
    * exact-Jaccard pair graph: r'(v) = 0.15 + 0.85·Σ_{u→v} r(u) div
    * deg(u), all in micro-units. Per round: one join on the edge list +
    * one aggregate — the standard distributed PageRank shape; ranks
    * localCheckpoint per round so lineage stays flat.
    */
  def pageRank(s: SparkSession, dir: String): DataFrame = {
    val pairs = DedupOps.materializedEdges(s, dir)
    val sym = pairs.unionByName(
      pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    val deg = sym.groupBy(col("doc_a").as("node")).agg(count(lit(1)).as("deg"))
    // out-degree rides ON the edge list (joined once, persisted): each of
    // the 5 rounds then needs only the single ranks join
    val symDeg = sym
      .join(deg.select(col("node").as("doc_a"), col("deg")), Seq("doc_a"))
      .persist()
    var ranks = deg.select(col("node"), lit(UnitMass).as("r")).localCheckpoint()
    (1 to Iterations).foreach { _ =>
      val contrib = symDeg
        .join(ranks.select(col("node").as("doc_a"), col("r")), Seq("doc_a"))
        .select(col("doc_b"), expr("r div deg").as("c"))
      ranks = contrib.groupBy(col("doc_b").as("node"))
        .agg(sum(col("c")).as("in_mass"))
        .select(col("node"),
          (lit(150000L) + expr("(85 * in_mass) div 100")).as("r"))
        .localCheckpoint()
    }
    symDeg.unpersist()
    ranks.select(col("node").as("doc_id"), col("r").as("rank_micros"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_pagerank" -> (pageRank _))

  val oracles: Map[String, String] = Map(
    "q_graph_pagerank" ->
      """WITH RECURSIVE base AS (
        |  SELECT doc_id, lang, source, list_distinct(string_split(text, ' ')) AS tokset
        |  FROM documents),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM base a JOIN base b
        |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        |  WHERE round(CAST(len(list_intersect(a.tokset, b.tokset)) AS DOUBLE)
        |          / len(list_distinct(a.tokset || b.tokset)), 6) >= 0.2),
        |e(a, b) AS (
        |  SELECT doc_a, doc_b FROM pairs UNION ALL SELECT doc_b, doc_a FROM pairs),
        |deg AS (SELECT a, COUNT(*) AS d FROM e GROUP BY a),
        |pr(iter, node, r) AS (
        |  SELECT 0, a, CAST(1000000 AS BIGINT) FROM deg
        |  UNION ALL
        |  SELECT iter + 1, e.b,
        |    CAST(150000 + (85 * SUM(pr.r // deg.d)) // 100 AS BIGINT)
        |  FROM pr JOIN e ON pr.node = e.a JOIN deg ON deg.a = pr.node
        |  WHERE iter < 5
        |  GROUP BY iter + 1, e.b)
        |SELECT node AS doc_id, r AS rank_micros
        |FROM pr WHERE iter = 5 ORDER BY doc_id""".stripMargin)
}
