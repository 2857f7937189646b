package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Corpus-wide token statistics for training-data curation: the exact
  * duplicated-span registry (the first stage of exact-substring dedup à
  * la "Deduplicating Training Data Makes Language Models Better"), a
  * hashing-trick collision audit, and a Zipf-law slope fit validating
  * the token frequency profile.
  *
  * Scale design: every op here is explode → groupBy — one linear pass
  * and one hash shuffle on the token/span key with full map-side
  * partial aggregation; no windows over row-cardinality relations. The
  * only window (Zipf rank) sits above a LIMIT 100, so it is
  * constant-bounded by construction. Determinism: counts are exact
  * integers; ln() is floored to integer nano-nats once per distinct
  * integer argument (the repo-wide convention, [[EvalOps]]); the single
  * terminal double division is mirrored expression-for-expression in
  * the DuckDB twins and rounded to 6dp.
  */
object CorpusOps {

  private val SpanTokens = 8

  private def lnNano(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(log(c.cast("double")) * 1e9).cast("long")

  /** Registry of exact 8-token spans appearing in ≥2 distinct documents
    * — the candidate list an exact-substring deduplicator would cut.
    * One explode (≈ one row per token, linear) and one groupBy(span)
    * with map-side combine; cross-document templates collapse at the
    * reduce side. At 100 TB you would group on a 128-bit span hash and
    * carry the span text only as a min() exemplar — here the span IS
    * short (8 tokens), so grouping on it directly keeps the op
    * oracle-checkable without a hash-collision caveat.
    */
  def dedupSpanExact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= SpanTokens)
      .select(col("doc_id"), explode(
        expr(s"transform(sequence(1, size(w) - ${SpanTokens - 1}), i -> array_join(slice(w, i, $SpanTokens), ' '))"))
        .as("span"))
      .groupBy("span")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occur"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy(desc("n_docs"), desc("n_occur"), col("span"))

  /** Hashing-trick collision audit: tokens → 64 feature buckets via the
    * cross-engine md5-prefix integer (the repo's seeded-hash pattern,
    * PipelineOps.splitAssign), reporting per-bucket occurrence mass and
    * distinct-token collision load. The 64-row output is what you read
    * before choosing a feature-hash width: a bucket holding 40 distinct
    * tokens at 10× the mean mass says the width is too small. One
    * explode + one 64-group aggregate; countDistinct adds the standard
    * two-phase expand, still keyed by (bucket, tok) — linear.
    */
  def textFeatureHash(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .select(col("tok"),
        pmod(conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"), lit(64L))
          .as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_occur"), countDistinct(col("tok")).as("n_distinct"))
      .orderBy("bucket")

  /** Zipf-law slope over the top-100 tokens: least-squares fit of
    * ln(freq) against ln(rank); a healthy natural-language corpus sits
    * near slope −1, while templated/synthetic text flattens or
    * steepens. The frequency table is a linear token aggregate; the
    * top-100 is TakeOrderedAndProject (no global sort); the rank window
    * sits above LIMIT 100 so its single partition holds exactly 100
    * rows at any corpus size. Both ln() inputs are exact integers
    * (rank, freq) floored to nano-nats, so the regression sums are
    * integer-exact cross-engine; slope and intercept are the terminal
    * doubles at 6dp.
    */
  def textZipf(s: SparkSession, dir: String): DataFrame = {
    val top = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), col("tok")).limit(100)
    val pts = top
      .withColumn("rank", row_number().over(Window.orderBy(desc("freq"), col("tok"))))
      .select(lnNano(col("rank")).cast(DecimalType(38, 0)).as("x"),
        lnNano(col("freq")).cast(DecimalType(38, 0)).as("y"))
    pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .withColumn("slope",
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
      .select(col("n").as("n_points"),
        round(col("slope"), 6).as("zipf_slope"),
        round((col("sy").cast("double") - col("slope") * col("sx").cast("double")) /
          col("n"), 6).as("intercept_nano"))
  }

  /** Top-20 bigram continuations of the corpus language model:
    * P(w2|w1) in exact ppm, where the conditioning mass c1 counts w1 in
    * bigram-initial position (= Σ_w2 c12, so probabilities sum to 1 per
    * w1 exactly). The integer division c12·10⁶ div c1 is trunc==floor
    * (both operands positive), bit-identical cross-engine with no ln or
    * float anywhere. One explode to the bigram relation (linear), two
    * vocab-bounded aggregates, a vocab-keyed join (AQE broadcasts the
    * unigram side), and a TakeOrderedAndProject top-20 — no global
    * sort.
    */
  def textBigramLm(s: SparkSession, dir: String): DataFrame = {
    val bigrams = Tables.documents(s, dir)
      .select(split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(w) - 1), i -> struct(w[i-1] AS w1, w[i] AS w2))"))
        .as("b"))
      .select(col("b.w1"), col("b.w2"))
    val c12 = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = bigrams.groupBy("w1").agg(count(lit(1)).as("c1"))
    c12.join(c1, Seq("w1"))
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        expr("(c12 * 1000000L) div c1").as("p_ppm"))
      .orderBy(desc("c12"), col("w1"), col("w2"))
      .limit(20)
  }

  private val DupGramTokens = 5

  /** Corpus-level duplicate n-gram fraction per document — the Gopher /
    * RefinedWeb quality signal ("fraction of the doc made of n-grams
    * that also occur elsewhere"): for each doc, the share of its 5-gram
    * occurrences whose gram appears ≥ 2 times ACROSS THE WHOLE CORPUS
    * (including intra-doc repeats; [[graft.operators.TextOps]]'s
    * q_text_repetition is the intra-doc-only sibling). Shape: one
    * explode (linear), ONE shuffle on the gram for a window count (the
    * global occurrence total rides the same hashpartitioning(gram) the
    * rows already need — a groupBy+join-back formulation re-shuffles
    * the full gram set a second time and measured ~1.8× slower; with
    * mostly-unique grams the forgone map-side combine compresses
    * nothing anyway), one groupBy(doc) — every stage hash-partitioned,
    * no all-pairs anywhere. Grouping on the short gram text directly
    * keeps it oracle-checkable (same no-hash-caveat argument as
    * [[dedupSpanExact]]); at 100 TB you'd swap in a 128-bit gram hash
    * and the plan shape is unchanged. The ≥ 5-token guard is inert on
    * the fixtures (min doc length is 10).
    */
  def textDupNgrams(s: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= DupGramTokens)
      .select(col("doc_id"), explode(
        expr(s"transform(sequence(1, size(w) - ${DupGramTokens - 1}), " +
          s"i -> array_join(slice(w, i, $DupGramTokens), ' '))")).as("gram"))
    grams
      .withColumn("n_total", count(lit(1)).over(Window.partitionBy("gram")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("n_total") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .select(col("doc_id"), col("n_grams"), col("n_dup"),
        round(col("n_dup").cast("double") / col("n_grams"), 6).as("dup_frac"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_bigram_lm" -> (textBigramLm _),
    "q_dedup_span_exact" -> (dedupSpanExact _),
    "q_text_feature_hash" -> (textFeatureHash _),
    "q_text_dup_ngrams" -> (textDupNgrams _),
    "q_text_zipf" -> (textZipf _))

  val oracles: Map[String, String] = Map(
    // same gram construction (5-token windows over the whitespace split),
    // same global-count join, same terminal 6dp rounding of an exact
    // integer ratio
    "q_text_dup_ngrams" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 5),
        |g AS (
        |  SELECT doc_id,
        |    unnest([array_to_string(w[i:i+4], ' ') FOR i IN range(1, len(w) - 3)]) AS gram
        |  FROM toks),
        |c AS (SELECT gram, COUNT(*) AS n_total FROM g GROUP BY gram)
        |SELECT doc_id, COUNT(*) AS n_grams,
        |  CAST(SUM(CASE WHEN n_total >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |  round(CAST(SUM(CASE WHEN n_total >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |        / COUNT(*), 6) AS dup_frac
        |FROM g JOIN c USING (gram)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_text_bigram_lm" ->
      """WITH t AS (
        |  SELECT string_split(text, ' ') AS w FROM documents WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (
        |  SELECT unnest([{'w1': w[i], 'w2': w[i+1]} FOR i IN range(1, len(w))]) AS b
        |  FROM t),
        |pairs AS (SELECT b.w1 AS w1, b.w2 AS w2 FROM bg),
        |c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY w1, w2),
        |c1 AS (SELECT w1, COUNT(*) AS c1 FROM pairs GROUP BY w1)
        |SELECT w1, w2, c12, c1, (c12 * 1000000) // c1 AS p_ppm
        |FROM c12 JOIN c1 USING (w1)
        |ORDER BY c12 DESC, w1, w2 LIMIT 20""".stripMargin,
    "q_dedup_span_exact" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    unnest([array_to_string(w[i:i+7], ' ') FOR i IN range(1, len(w) - 6)]) AS span
        |  FROM t WHERE len(w) >= 8)
        |SELECT span, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occur,
        |  MIN(doc_id) AS first_doc
        |FROM g GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2
        |ORDER BY n_docs DESC, n_occur DESC, span""".stripMargin,
    "q_text_feature_hash" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |b AS (
        |  SELECT tok,
        |    ('0x' || substring(md5(tok), 1, 8))::BIGINT % 64 AS bucket
        |  FROM toks)
        |SELECT bucket, COUNT(*) AS n_occur, COUNT(DISTINCT tok) AS n_distinct
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_text_zipf" ->
      """WITH freq AS (
        |  SELECT tok, COUNT(*) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY tok ORDER BY freq DESC, tok LIMIT 100),
        |pts AS (
        |  SELECT CAST(CAST(floor(ln(CAST(row_number() OVER (ORDER BY freq DESC, tok) AS DOUBLE)) * 1e9) AS BIGINT) AS HUGEINT) AS x,
        |    CAST(CAST(floor(ln(CAST(freq AS DOUBLE)) * 1e9) AS BIGINT) AS HUGEINT) AS y
        |  FROM freq),
        |agg AS (
        |  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx
        |  FROM pts),
        |sl AS (
        |  SELECT n, sx, sy,
        |    CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
        |  FROM agg)
        |SELECT n AS n_points, round(slope, 6) AS zipf_slope,
        |  round((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / n, 6) AS intercept_nano
        |FROM sl""".stripMargin)
}
