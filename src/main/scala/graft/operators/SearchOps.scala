package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Retrieval operators over the document corpus: BM25 ranking against a
  * fixed query and an inverted-index (posting-list) build. Both are
  * linear corpus scans with token-key aggregates — the 100 TB shape is
  * one tokenize pass, map-side-combined term statistics (vocabulary-
  * sized, broadcastable), and a bounded top-k, never an all-pairs or
  * global-window step.
  */
object SearchOps {

  private val K1 = 1.2 // BM25 tf saturation; same literal → same double in both engines
  private val B  = 0.75 // length normalization; 3/4 is exactly representable

  /** BM25 top-50 documents for the fixed query {join, vector, scan}.
    *
    * Determinism discipline (same as TF-IDF/perplexity): the only libm
    * call, ln(), is floored to integer nanos ONCE per term
    * (idf_nano); every other step — the length-normalized tf ratio and
    * the idf·ratio product — is a short, identically-ordered chain of
    * correctly-rounded IEEE double ops, then floored to int64 nanos
    * per (doc, term) BEFORE the per-doc sum, so summation order can
    * never move a hash. avgdl is carried as the exact integer pair
    * (total_len, n_docs) rather than a pre-divided double.
    *
    * Scale: df/total_len/n_docs are one vocabulary-sized aggregate
    * (broadcast); scoring is a map over matched postings; the final
    * top-50 is TakeOrderedAndProject (no global sort materialized).
    */
  def textBm25(s: SparkSession, dir: String): DataFrame = {
    val qTerms = Seq("join", "vector", "scan")
    val docs = Tables.documents(s, dir)
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val corpus = dl.agg(sum(col("dl")).as("total_len"), count(lit(1)).as("n_docs"))
    val tf = tok.filter(col("token").isin(qTerms: _*))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), Seq("token"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(corpus))
      // Robertson-Sparck-Jones idf with the +1 floor (Lucene form): always > 0
      .withColumn("idf_nano",
        floor(log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) * 1e9).cast("long"))
      // dl/avgdl == dl*n_docs/total_len with one exact int64 product and one double div
      .withColumn("ratio",
        (col("dl") * col("n_docs")).cast("double") / col("total_len"))
      .withColumn("score_nano",
        floor(col("idf_nano") * ((col("tf") * (lit(K1) + 1.0)) /
          (col("tf") + lit(K1) * (lit(1.0) - lit(B) + lit(B) * col("ratio"))))).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"),
        round(sum(col("score_nano")) / 1e9, 6).as("bm25"))
      .withColumn("sn", (col("bm25") * 1e6).cast("long"))
      .orderBy(col("sn").desc, col("doc_id"))
      .limit(50)
      .drop("sn")
  }

  /** Inverted index: one row per vocabulary term with document
    * frequency, total term frequency, and a posting list capped at the
    * top-8 documents by (tf DESC, doc_id ASC), serialized "doc:tf".
    *
    * Scale: the posting cap is enforced by a window PARTITIONED BY
    * token (vocabulary-parallel, never global), so per-term state is
    * bounded no matter how many documents a hot term appears in; the
    * full-df/total_tf stats come from the same token-key aggregate the
    * cap ranking uses — one tokenize pass, two token-key shuffles.
    */
  def textPostings(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val tf = tok.groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))
    val stats = tf.groupBy("token")
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("total_tf"))
    val w = Window.partitionBy("token").orderBy(col("tf").desc, col("doc_id"))
    val top = tf.withColumn("rn", row_number().over(w)).filter(col("rn") <= 8)
      .groupBy("token")
      .agg(array_join(transform(array_sort(collect_list(struct(col("rn"), col("doc_id"), col("tf")))),
        e => concat(e("doc_id"), lit(":"), e("tf"))), ",").as("postings"))
    stats.join(top, Seq("token"))
      .select("token", "df", "total_tf", "postings")
      .orderBy("token")
  }

  /** Token co-occurrence with PMI: top-20 token pairs by pointwise
    * mutual information ln(c12·N / (c1·c2)) over document-level
    * incidence, support ≥ 20 docs. Scale control is STRUCTURAL: pairs
    * are generated only within the top-64-df vocabulary (broadcast
    * semi-join prefilter), so the per-document pair fan-out is ≤ 64²/2
    * regardless of corpus vocabulary growth; margins still come from
    * the full vocabulary. PMI follows the ln()-nano discipline
    * (floored once per pair; the ln argument is one exact int64
    * product per side), and the final top-20 is TakeOrderedAndProject.
    */
  def textCooccur(s: SparkSession, dir: String): DataFrame = {
    val docTok = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .distinct()
    val margins = docTok.groupBy("token").agg(count(lit(1)).as("c1"))
    val vocab = margins.orderBy(col("c1").desc, col("token")).limit(64).select("token")
    val tv = docTok.join(broadcast(vocab), Seq("token"))
    val nDocs = Tables.documents(s, dir).agg(count(lit(1)).as("n_docs"))
    val pairs = tv.as("a").join(tv.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.token") < col("b.token"))
      .groupBy(col("a.token").as("t1"), col("b.token").as("t2"))
      .agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= 20)
    pairs
      .join(broadcast(margins.select(col("token").as("t1"), col("c1").as("m1"))), Seq("t1"))
      .join(broadcast(margins.select(col("token").as("t2"), col("c1").as("m2"))), Seq("t2"))
      .crossJoin(broadcast(nDocs))
      .withColumn("pmi_nano",
        floor(log((col("c12") * col("n_docs")).cast("double")
          / (col("m1") * col("m2")).cast("double")) * 1e9).cast("long"))
      .orderBy(col("pmi_nano").desc, col("t1"), col("t2"))
      .limit(20)
      .select("t1", "t2", "c12", "pmi_nano")
  }

  /** #289 Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR 2009)
    * — THE hybrid-search combiner: for each query term, fuse a lexical
    * ranking (tf desc) with an independent prior ranking (document
    * length desc, standing in for the semantic/recency ranker) by
    * RRF(d) = Σ_r 1/(60 + rank_r(d)), kept integer as 10⁹ div (60+rank)
    * so fusion scores and their ordering are exact; top-5 fused docs
    * per term.
    *
    * Scale: the candidate set per term is the docs CONTAINING the term
    * (the postings row set — the standard fusion input, both rankings
    * over the same candidates so every rank is defined); both rankings
    * are term-PARTITIONED windows over that bounded relation; one
    * explode + one tf aggregate is the only corpus-sized work.
    */
  def rankFusion(s: SparkSession, dir: String): DataFrame = {
    val qTerms = Seq("join", "vector", "scan")
    val tf = Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars"),
        explode(split(col("text"), " ")).as("token"))
      .filter(col("token").isin(qTerms: _*))
      .groupBy("token", "doc_id")
      .agg(count(lit(1)).as("tf"), max(col("n_chars")).as("n_chars"))
    val wA = Window.partitionBy("token").orderBy(desc("tf"), asc("doc_id"))
    val wB = Window.partitionBy("token").orderBy(desc("n_chars"), asc("doc_id"))
    val wF = Window.partitionBy("token").orderBy(desc("fused_nano"), asc("doc_id"))
    tf.withColumn("rank_tf", row_number().over(wA))
      .withColumn("rank_len", row_number().over(wB))
      .withColumn("fused_nano",
        expr("1000000000 div (60 + rank_tf) + 1000000000 div (60 + rank_len)"))
      .withColumn("rank", row_number().over(wF))
      .filter(col("rank") <= 5)
      .select(col("token"), col("rank"), col("doc_id"),
        col("rank_tf"), col("rank_len"), col("fused_nano"))
      .orderBy("token", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rank_fusion" -> (rankFusion _),
    "q_text_bm25" -> (textBm25 _),
    "q_text_postings" -> (textPostings _),
    "q_text_cooccur" -> (textCooccur _))

  val oracles: Map[String, String] = Map(
    "q_rank_fusion" ->
      """WITH tf AS (
        |  SELECT token, doc_id, COUNT(*) AS tf, MAX(n_chars) AS n_chars
        |  FROM (
        |    SELECT doc_id, n_chars, unnest(string_split(text, ' ')) AS token
        |    FROM documents)
        |  WHERE token IN ('join', 'vector', 'scan')
        |  GROUP BY token, doc_id),
        |r AS (
        |  SELECT token, doc_id,
        |    row_number() OVER (PARTITION BY token
        |      ORDER BY tf DESC, doc_id) AS rank_tf,
        |    row_number() OVER (PARTITION BY token
        |      ORDER BY n_chars DESC, doc_id) AS rank_len
        |  FROM tf),
        |f AS (
        |  SELECT token, doc_id, rank_tf, rank_len,
        |    1000000000 // (60 + rank_tf) + 1000000000 // (60 + rank_len)
        |      AS fused_nano
        |  FROM r)
        |SELECT token, CAST(row_number() OVER (PARTITION BY token
        |    ORDER BY fused_nano DESC, doc_id) AS INTEGER) AS rank,
        |  doc_id, CAST(rank_tf AS INTEGER) AS rank_tf,
        |  CAST(rank_len AS INTEGER) AS rank_len,
        |  CAST(fused_nano AS BIGINT) AS fused_nano
        |FROM f
        |QUALIFY row_number() OVER (PARTITION BY token
        |  ORDER BY fused_nano DESC, doc_id) <= 5
        |ORDER BY token, rank""".stripMargin,
    "q_text_bm25" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
        |corpus AS (SELECT CAST(SUM(dl) AS BIGINT) AS total_len, COUNT(*) AS n_docs FROM dl),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok
        |       WHERE token IN ('join', 'vector', 'scan') GROUP BY doc_id, token),
        |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
        |scored AS (
        |  SELECT tf.doc_id,
        |    CAST(floor(
        |      CAST(floor(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * 1e9) AS BIGINT)
        |      * ((tf * (1.2 + 1.0)) /
        |         (tf + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(dl.dl * n_docs AS DOUBLE) / total_len))))
        |    ) AS BIGINT) AS score_nano
        |  FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN corpus)
        |SELECT doc_id, COUNT(*) AS n_terms,
        |  round(CAST(SUM(score_nano) AS BIGINT) / 1e9, 6) AS bm25
        |FROM scored GROUP BY doc_id
        |ORDER BY CAST(round(CAST(SUM(score_nano) AS BIGINT) / 1e9, 6) * 1e6 AS BIGINT) DESC, doc_id
        |LIMIT 50""".stripMargin,
    "q_text_cooccur" ->
      """WITH tokd AS (
        |  SELECT DISTINCT doc_id, token FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)),
        |m AS (SELECT token, COUNT(*) AS c1 FROM tokd GROUP BY token),
        |vocab AS (SELECT token FROM m ORDER BY c1 DESC, token LIMIT 64),
        |tv AS (SELECT tokd.* FROM tokd JOIN vocab USING (token)),
        |nd AS (SELECT COUNT(*) AS n_docs FROM documents),
        |p AS (
        |  SELECT a.token AS t1, b.token AS t2, COUNT(*) AS c12
        |  FROM tv a JOIN tv b ON a.doc_id = b.doc_id AND a.token < b.token
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 20),
        |j AS (
        |  SELECT t1, t2, c12,
        |    CAST(floor(ln(CAST(c12 * n_docs AS DOUBLE) / CAST(m1.c1 * m2.c1 AS DOUBLE)) * 1e9) AS BIGINT)
        |      AS pmi_nano
        |  FROM p JOIN m m1 ON p.t1 = m1.token JOIN m m2 ON p.t2 = m2.token CROSS JOIN nd)
        |SELECT t1, t2, c12, pmi_nano FROM j
        |ORDER BY pmi_nano DESC, t1, t2 LIMIT 20""".stripMargin,
    "q_text_postings" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT token, doc_id, COUNT(*) AS tf FROM tok GROUP BY token, doc_id),
        |stats AS (SELECT token, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf
        |          FROM tf GROUP BY token),
        |ranked AS (
        |  SELECT token, doc_id, tf,
        |    row_number() OVER (PARTITION BY token ORDER BY tf DESC, doc_id) AS rn
        |  FROM tf),
        |top AS (
        |  SELECT token, string_agg(doc_id || ':' || tf, ',' ORDER BY rn) AS postings
        |  FROM ranked WHERE rn <= 8 GROUP BY token)
        |SELECT token, df, total_tf, postings
        |FROM stats JOIN top USING (token)
        |ORDER BY token""".stripMargin)
}
