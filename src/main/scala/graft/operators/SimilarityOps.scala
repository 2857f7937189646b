package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** North-star similarity search over the embeddings table.
  *
  * Scale story: brute-force cosine top-k is the exactness baseline — the
  * probe side is tiny and broadcast, so the big side streams through one
  * scan with no shuffle of the corpus (rank is a per-probe window over
  * k·|probes| rows). The sign-random-projection LSH variant is the 100 TB
  * path: corpus bucketed by a 16-bit hyperplane signature (one scan),
  * probes search only their bucket — the candidate join is an equi-join on
  * the signature, trading recall for a ~2^16 search-space reduction.
  */
object SimilarityOps {

  private def vectors(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .withColumn("v", transform(col("embedding"), x => x.cast("double")))
      .withColumn("norm", sqrt(aggregate(transform(col("v"), x => x * x), lit(0.0), _ + _)))

  private val dot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  /** #64 brute-force cosine top-5 for the 10 probe vectors (vec_id < 10):
    * the exact baseline every ANN variant is graded against.
    */
  def simCosineTopk(s: SparkSession, dir: String): DataFrame = {
    val base = vectors(s, dir)
    val probes = base.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("norm").as("pnorm"))
    val cand = base.select(col("vec_id").as("cand_id"), col("v").as("cv"), col("norm").as("cnorm"))
    val scored = cand.join(broadcast(probes), col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"),
        round(dot(col("pv"), col("cv")) / (col("pnorm") * col("cnorm")), 6).as("cosine"))
    val w = Window.partitionBy("probe_id").orderBy(desc("cosine"), asc("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .orderBy("probe_id", "rank")
  }

  /** Deterministic pseudo-random hyperplanes via splitmix64 — regenerated
    * identically on every run/executor; 4 planes → 16 buckets, sized so a
    * bucket holds ~1/16 of the corpus (recall/speedup trade-off knob).
    */
  private val NumPlanes = 4
  lazy val planes: Seq[Seq[Double]] = {
    def splitmix(seed: Long): Long = {
      var z = seed + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    (0 until NumPlanes).map { p =>
      (0 until 64).map { i =>
        (math.floorMod(splitmix(p.toLong * 64 + i), 1000L).toDouble / 1000.0) - 0.5
      }
    }
  }

  /** Sign-random-projection LSH: corpus bucketed by the sign pattern of
    * NumPlanes fixed hyperplane projections; probes search only their own
    * bucket. Rows-only query (the hyperplane constants have no SQL twin
    * worth maintaining).
    */
  def simLshBucketed(s: SparkSession, dir: String): DataFrame = {
    val sigBits = planes.zipWithIndex.map { case (pl, i) =>
      when(dot(col("v"), typedLit(pl)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    val base = vectors(s, dir).withColumn("bucket", sigBits.reduce(_.bitwiseOR(_)))
    val probes = base.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"),
        col("norm").as("pnorm"), col("bucket"))
    val cand = base.select(col("vec_id").as("cand_id"), col("v").as("cv"),
      col("norm").as("cnorm"), col("bucket"))
    val scored = cand.join(broadcast(probes), Seq("bucket"))
      .filter(col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"),
        round(dot(col("pv"), col("cv")) / (col("pnorm") * col("cnorm")), 6).as("cosine"))
    val w = Window.partitionBy("probe_id").orderBy(desc("cosine"), asc("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .orderBy("probe_id", "rank")
  }

  /** #65 multimodal join: text metadata ⋈ vectors on aligned ids with a
    * combined relational + vector-norm predicate.
    */
  def multimodalJoin(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).filter(col("lang") === "en")
      .join(vectors(s, dir), col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("label"), round(col("norm"), 6).as("l2_norm"))
      .filter(col("l2_norm") > 0.5)
      .orderBy("doc_id")

  /** #66 L2 normalization: unit-norm vectors (elements rounded to 4 dp for
    * the cross-engine compare) + a checksum that the post-norm L2 is 1.
    */
  def embedNormalize(s: SparkSession, dir: String): DataFrame =
    vectors(s, dir)
      .select(col("vec_id"),
        round(col("norm"), 6).as("l2_norm"),
        transform(col("v"), x => round(x / col("norm"), 4)).as("unit_vec"),
        round(aggregate(transform(col("v"), x => (x / col("norm")) * (x / col("norm"))),
          lit(0.0), _ + _), 4).as("unit_norm_sq"))
      .orderBy("vec_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sim_cosine_topk" -> (simCosineTopk _),
    "q_sim_lsh_bucketed" -> (simLshBucketed _),
    "q_multimodal_join" -> (multimodalJoin _),
    "q_embed_normalize" -> (embedNormalize _))

  val oracles: Map[String, String] = Map(
    "q_sim_cosine_topk" ->
      """WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings)
        |SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
        |  round(list_cosine_similarity(p.v, c.v), 6) AS cosine,
        |  CAST(row_number() OVER (PARTITION BY p.vec_id
        |    ORDER BY round(list_cosine_similarity(p.v, c.v), 6) DESC, c.vec_id ASC) AS INTEGER) AS rank
        |FROM base p JOIN base c ON p.vec_id < 10 AND p.vec_id <> c.vec_id
        |QUALIFY rank <= 5
        |ORDER BY probe_id, rank""".stripMargin,
    "q_multimodal_join" ->
      """SELECT doc_id, lang, source, n_chars, label,
        |  round(sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 6) AS l2_norm
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |WHERE lang = 'en'
        |  AND round(sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 6) > 0.5
        |ORDER BY doc_id""".stripMargin,
    "q_embed_normalize" ->
      """WITH base AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |    sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS norm
        |  FROM embeddings)
        |SELECT vec_id, round(norm, 6) AS l2_norm,
        |  list_transform(v, x -> round(x / norm, 4)) AS unit_vec,
        |  round(list_aggregate(list_transform(v, x -> (x / norm) * (x / norm)), 'sum'), 4) AS unit_norm_sq
        |FROM base ORDER BY vec_id""".stripMargin)
}
