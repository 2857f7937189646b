package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** North-star near-duplicate detection: MinHash+LSH, SimHash, blocked
  * n-gram Jaccard, and embedding-cosine near-dup. (Exact dedup is
  * SetOps.dedupExact.)
  *
  * Scale design — the whole point of these shapes at 100 TB:
  *  - MinHash/LSH: signatures are pure column expressions (xxhash64 ·
  *    transform · array_min, all codegen'd); candidate generation is an
  *    equi-join on (band, band_hash) — never an all-pairs product. Cost is
  *    O(N · perms) + join on collision buckets.
  *  - SimHash: one 64-bit fingerprint per doc; candidate pairs via the
  *    pigeonhole block join (hamming ≤ 3 ⇒ one of four 16-bit chunks
  *    equal), again an equi-join.
  *  - Exact Jaccard runs only on (lang, source)-blocked pairs — the
  *    classic blocking strategy that keeps the quadratic term bounded per
  *    block.
  */
object DedupOps {

  /** 3-token shingles of each document, represented directly as 64-bit
    * hashes: tokens are hashed once, a shingle hash is the hash of the
    * three token hashes — no shingle strings are ever materialized
    * (at corpus scale the concat alone dominates the signature cost).
    */
  private def docsWithShingleHashes(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    Tables.documents(s, dir)
      .withColumn("tokh", transform(toks, t => xxhash64(t)))
      .withColumn("sh_hashes",
        when(size(col("tokh")) >= 3,
          array_distinct(transform(sequence(lit(0), size(col("tokh")) - 3),
            i => xxhash64(
              element_at(col("tokh"), i + 1),
              element_at(col("tokh"), i + 2),
              element_at(col("tokh"), i + 3)))))
          .otherwise(array(xxhash64(col("text")))))
      .select(col("doc_id"), col("sh_hashes"))
  }

  private val NumPerms = 64
  private val Bands = 16 // 16 bands × 4 rows

  /** #63 MinHash + banded LSH near-dup pipeline: shingle → 64-perm MinHash
    * (perm j = min over shingles of xxhash64(j ++ shingle)) → 16 4-row
    * bands → band-bucket equi-join for candidates → exact Jaccard ≥ 0.5
    * confirm. xxhash64 has no DuckDB twin, so this is a rows-only query;
    * the exact-Jaccard twin below is the hash-free oracle-checked path.
    */
  def dedupNearMinhash(s: SparkSession, dir: String): DataFrame = {
    // Explode to (doc, shingle) rows and compute the 64 permutation minima
    // as codegen'd partial aggregates — NOT as nested array lambdas, whose
    // interpreted evaluation gets re-inlined per consumer and explodes
    // cost. This shape is also the distributed formulation: map-side
    // combine reduces each partition to one 64-minimum state per doc.
    val exploded = docsWithShingleHashes(s, dir)
      .select(col("doc_id"), explode(col("sh_hashes")).as("sh_hash"))
    val sigCols = (0 until NumPerms).map(j =>
      min(xxhash64(lit(j), col("sh_hash"))).as(s"m$j"))
    val sigs = exploded.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    val bandCols = (0 until Bands).map(b =>
      xxhash64(concat_ws(",", (0 until 4).map(r => col(s"m${b * 4 + r}").cast("string")): _*)).as(s"band$b"))
    val banded = sigs.select(col("doc_id") +: bandCols: _*)
    val melted = banded.select(col("doc_id"),
      posexplode(array((0 until Bands).map(b => col(s"band$b")): _*)).as(Seq("band_idx", "band_hash")))
    // Candidates via bucket-collect + pair-explode instead of a self-join:
    // a DataFrame self-join would execute the whole signature subplan
    // twice (Spark reuses no common subplans without caching), and at
    // scale the join side is the full corpus again. One shuffle on the
    // band key, pairs generated inside each (small) bucket.
    val candidates = melted.groupBy("band_idx", "band_hash")
      .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
      .filter(size(col("docs")) > 1)
      .select(explode(expr(
        """flatten(transform(docs, (a, i) ->
          |  transform(slice(docs, i + 2, size(docs)), b -> struct(a AS doc_a, b AS doc_b))))""".stripMargin))
        .as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .distinct()
    val sets = Tables.documents(s, dir)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("tokset"))
    candidates
      .join(sets.select(col("doc_id").as("doc_a"), col("tokset").as("set_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("tokset").as("set_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("set_a"), col("set_b"))).cast("double") /
          size(array_union(col("set_a"), col("set_b")))).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
      .orderBy("doc_a", "doc_b")
  }

  /** n-gram (token-set) Jaccard similarity over (lang, source)-blocked
    * pairs — bounded-quadratic blocked all-pairs, oracle-checked.
    */
  def dedupJaccardBlocked(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir)
      .withColumn("tokset", array_distinct(split(col("text"), " ")))
      .select(col("doc_id"), col("lang"), col("source"), col("tokset"))
    val a = base.select(col("lang"), col("source"), col("doc_id").as("doc_a"), col("tokset").as("set_a"))
    val b = base.select(col("lang"), col("source"), col("doc_id").as("doc_b"), col("tokset").as("set_b"))
    a.join(b, Seq("lang", "source"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("lang"), col("source"), col("doc_a"), col("doc_b"),
        round(size(array_intersect(col("set_a"), col("set_b"))).cast("double") /
          size(array_union(col("set_a"), col("set_b"))), 6).as("jaccard"))
      .filter(col("jaccard") >= 0.2)
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash fingerprint + hamming-≤3 candidate pairs via the 4-chunk
    * pigeonhole block join. Rows-only (hash algorithm is Spark-native).
    */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    val tokenFreq = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("freq"))
      .withColumn("h", xxhash64(col("token")))
    val bitSums: Seq[Column] = (0 until 64).map { bit =>
      sum(when(col("h").bitwiseAND(lit(1L << bit)) =!= 0, col("freq"))
        .otherwise(-col("freq"))).as(s"bit$bit")
    }
    val simhash: Column = (0 until 64)
      .map(bit => when(col(s"bit$bit") > 0, lit(1L << bit)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    val sigs = tokenFreq.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), simhash.as("simhash"))
    val chunked = sigs.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("chunk_idx", "chunk")))
    // bucket-collect + pair-explode (see dedupNearMinhash): one signature
    // computation, pairs generated inside each chunk bucket
    chunked.groupBy("chunk_idx", "chunk")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("simhash")))).as("docs"))
      .filter(size(col("docs")) > 1)
      .select(explode(expr(
        """flatten(transform(docs, (a, i) ->
          |  transform(slice(docs, i + 2, size(docs)), b ->
          |    struct(a.doc_id AS doc_a, b.doc_id AS doc_b,
          |           a.simhash AS sim_a, b.simhash AS sim_b))))""".stripMargin))
        .as("p"))
      .select(col("p.doc_a"), col("p.doc_b"),
        bit_count(col("p.sim_a").bitwiseXOR(col("p.sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy("doc_a", "doc_b")
  }

  /** Embedding-cosine near-dup within label blocks, oracle-checked against
    * DuckDB's list_cosine_similarity (both sides rounded to 6 dp).
    */
  def dedupEmbedCosine(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val base = Tables.embeddings(s, dir)
      // norm + pairwise dot through the native codegen'd kernel (same
      // left-fold op order as the HOF formulation → identical doubles)
      .withColumn("norm", sqrt(expr("graft_dot(embedding, embedding)")))
      .select(col("vec_id"), col("label"), col("embedding"), col("norm"))
    val a = base.select(col("label"), col("vec_id").as("vec_a"), col("embedding").as("va"), col("norm").as("na"))
    val b = base.select(col("label"), col("vec_id").as("vec_b"), col("embedding").as("vb"), col("norm").as("nb"))
    a.join(b, Seq("label"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("label"), col("vec_a"), col("vec_b"),
        round(expr("graft_dot(va, vb)") / (col("na") * col("nb")), 6).as("cosine"))
      .filter(col("cosine") >= 0.35)
      .orderBy("vec_a", "vec_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_near_minhash" -> (dedupNearMinhash _),
    "q_dedup_jaccard_blocked" -> (dedupJaccardBlocked _),
    "q_dedup_simhash" -> (dedupSimhash _),
    "q_dedup_embed_cosine" -> (dedupEmbedCosine _))

  val oracles: Map[String, String] = Map(
    "q_dedup_jaccard_blocked" ->
      """WITH base AS (
        |  SELECT doc_id, lang, source, list_distinct(string_split(text, ' ')) AS tokset
        |  FROM documents)
        |SELECT a.lang, a.source, a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  round(CAST(len(list_intersect(a.tokset, b.tokset)) AS DOUBLE)
        |        / len(list_distinct(a.tokset || b.tokset)), 6) AS jaccard
        |FROM base a JOIN base b
        |  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        |WHERE round(CAST(len(list_intersect(a.tokset, b.tokset)) AS DOUBLE)
        |        / len(list_distinct(a.tokset || b.tokset)), 6) >= 0.2
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_dedup_embed_cosine" ->
      """WITH base AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings)
        |SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(list_cosine_similarity(a.v, b.v), 6) AS cosine
        |FROM base a JOIN base b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.35
        |ORDER BY vec_a, vec_b""".stripMargin)
}
