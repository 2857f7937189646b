package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Embedding-space clustering: Lloyd's k-means with a fixed seed set and
  * a fixed (unrolled) iteration count, made exactly reproducible across
  * engines by running ENTIRELY in integer micro-units — the same
  * determinism discipline the repo uses for ln() (floor once, then
  * int64 everywhere). Components are floored to micro ints up front;
  * squared-L2 distances are exact int64 sums; centroid updates use
  * floor(sum/count). There is no float accumulation anywhere, so
  * partition order can never move an assignment or a hash.
  *
  * Scale shape: K (=8) centroids are a broadcast either way; assignment
  * is a map over vectors (zip_with/aggregate inside codegen — the
  * vectors are never exploded on the assignment path); the update step
  * is a (cluster, dim)-key aggregate with map-side combine (K·D rows
  * out). Fixed iterations = fixed number of jobs — no driver-side
  * convergence loop over collect()ed data.
  */
object ClusterOps {

  private val K = 8
  private val Iters = 2

  /** Quantized corpus: (vec_id, q: array<long> of floored micro components). */
  private[graft] def quantized(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).select(col("vec_id"),
      transform(col("embedding"), x => floor(x.cast("double") * 1e6).cast("long")).as("q"))

  /** One assignment pass: nearest centroid by exact int64 squared-L2,
    * ties broken by the smaller cluster id. Centroids arrive as a K-row
    * broadcast (cid, c: array<long>).
    */
  private[graft] def assign(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val dist = aggregate(
      zip_with(col("q"), col("c"), (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)
    val w = Window.partitionBy("vec_id").orderBy(col("dist"), col("cid"))
    vecs.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("q"), col("cid"), dist.as("dist"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("vec_id", "q", "cid", "dist")
  }

  /** Centroid update: per-(cluster, dim) floor-mean of the assigned
    * members' components. floor(sum/count) is exact in double for any
    * |sum| < 2^53 (micro components are ~1e6, so that holds to ~10^9
    * vectors per cluster — document-scale safe).
    */
  private[graft] def update(assigned: DataFrame): DataFrame =
    assigned.select(col("cid"), posexplode(col("q")).as(Seq("dim", "v")))
      .groupBy("cid", "dim")
      .agg(floor(sum(col("v")).cast("double") / count(lit(1))).cast("long").as("cv"))
      .groupBy("cid")
      .agg(array_sort(collect_list(struct(col("dim"), col("cv")))).as("pairs"))
      .select(col("cid"), transform(col("pairs"), p => p("cv")).as("c"))

  /** K-means(K=8, 2 unrolled Lloyd iterations), seeds = vec_id 0..7.
    * Output: one row per non-empty cluster with member count and exact
    * integer inertia (sum of squared-L2 in micro² units).
    */
  def embedKmeans(s: SparkSession, dir: String): DataFrame = {
    val vecs = quantized(s, dir)
    val seed = vecs.filter(col("vec_id") < K)
      .select(col("vec_id").cast("int").as("cid"), col("q").as("c"))
    // Iters-1 update rounds, then one final assignment that is graded
    val cents = (1 until Iters).foldLeft(seed)((c, _) => update(assign(vecs, c)))
    assign(vecs, cents).groupBy(col("cid").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"), sum(col("dist")).as("inertia"))
      .orderBy("cluster_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_kmeans" -> (embedKmeans _))

  val oracles: Map[String, String] = Map(
    "q_embed_kmeans" ->
      """WITH qv AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT) AS v
        |  FROM embeddings),
        |cent0 AS (
        |  SELECT CAST(vec_id AS INT) AS cid, dim, v FROM qv WHERE vec_id < 8),
        |d1 AS (
        |  SELECT a.vec_id, c.cid, SUM((a.v - c.v) * (a.v - c.v)) AS dist
        |  FROM qv a JOIN cent0 c USING (dim) GROUP BY a.vec_id, c.cid),
        |a1 AS (
        |  SELECT vec_id, cid FROM d1
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1),
        |cent1 AS (
        |  SELECT a1.cid, qv.dim,
        |    CAST(floor(CAST(SUM(qv.v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS v
        |  FROM qv JOIN a1 USING (vec_id) GROUP BY a1.cid, qv.dim),
        |d2 AS (
        |  SELECT a.vec_id, c.cid, SUM((a.v - c.v) * (a.v - c.v)) AS dist
        |  FROM qv a JOIN cent1 c USING (dim) GROUP BY a.vec_id, c.cid),
        |a2 AS (
        |  SELECT vec_id, cid, dist FROM d2
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1)
        |SELECT cid AS cluster_id, COUNT(*) AS n_members, SUM(dist) AS inertia
        |FROM a2 GROUP BY cid ORDER BY cluster_id""".stripMargin)
}
