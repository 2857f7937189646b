package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-13 parameter-selection and pipeline-audit operators (SURVEY §2
  * #373–#378) — the "knob" layer of the engine: every operator here
  * either SELECTS a parameter for another family (LSH band/row geometry,
  * smoothing α, mixture temperature, Kneser–Ney discount) or AUDITS a
  * parameterized pipeline against its exact baseline (ANN recall,
  * collocation significance). They all run over relations the graded
  * families already produce, so their scale story is inherited: nothing
  * here adds a corpus-sized shuffle beyond the producers'.
  *
  * Exactness: counts are integers; every transcendental (ln, exp)
  * evaluates over exact integers or 6dp-rounded doubles and floors to
  * nano/micro BEFORE any aggregation, so all sums stay integer-exact
  * (the repo-wide rule for order-sensitive doubles).
  */
object TuningOps {

  /** Shared bigram count relations (c12, c1) — the same bigram spine as
    * [[CorpusOps.textBigramLm]]. */
  private def bigrams(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(w) - 1), i -> struct(w[i-1] AS w1, w[i] AS w2))"))
        .as("b"))
      .select(col("b.w1"), col("b.w2"))

  /** #373 Interpolated Kneser–Ney bigram probabilities (D = 3/4) for the
    * top-20 bigrams: P_KN(w₂|w₁) = max(c₁₂−D,0)/c₁ + λ(w₁)·P_cont(w₂)
    * with the CONTINUATION unigram P_cont(w₂) = N₁₊(·w₂)/|bigram types|
    * — the smoothing that beats MLE (#"q_text_bigram_lm") and add-k
    * everywhere because it asks "how many contexts does w₂ complete",
    * not "how often does w₂ occur". Kneser & Ney 1995.
    *
    * D = 3/4 keeps everything rational: every term is a staged integer
    * division in ppm ((4c₁₂−3)·10⁶ div 4c₁, etc.), mirrored verbatim in
    * the twin — no floats anywhere. Scale: two vocab-bounded aggregates
    * + two distinct-counts on the bigram relation (one explode, linear),
    * a vocab-keyed join, top-20 via TakeOrderedAndProject.
    */
  def textKneserNey(s: SparkSession, dir: String): DataFrame = {
    val bg = bigrams(s, dir)
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("c1"),
      countDistinct(col("w2")).as("n1fwd"))
    val cont = bg.select(col("w1"), col("w2")).distinct()
      .groupBy("w2").agg(count(lit(1)).as("n1back"))
    val btypes = bg.select(col("w1"), col("w2")).distinct()
      .agg(count(lit(1)).as("btypes"))
    c12.join(c1, Seq("w1")).join(cont, Seq("w2"))
      .crossJoin(broadcast(btypes))
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        col("n1back"), col("btypes"),
        expr("(greatest(4 * c12 - 3, 0) * 1000000) div (4 * c1)")
          .as("disc_ppm"),
        expr("(3 * n1fwd * 1000000) div (4 * c1)").as("lambda_ppm"),
        expr("(n1back * 1000000) div btypes").as("pcont_ppm"))
      .withColumn("p_kn_ppm",
        expr("disc_ppm + (lambda_ppm * pcont_ppm) div 1000000"))
      .orderBy(desc("c12"), col("w1"), col("w2"))
      .limit(20)
  }

  /** #374 Dunning log-likelihood-ratio collocations: top-20 bigrams by
    * the G² significance of their 2×2 contingency table against
    * independence — the collocation test that, unlike PMI (#q_text_
    * cooccur / q_mutual_info), does not explode on rare pairs. LLR =
    * 2[H(k₁₁)+H(k₁₂)+H(k₂₁)+H(k₂₂)+H(N)−H(r₁)−H(r₂)−H(c₁)−H(c₂)] with
    * H(x)=x·ln x — each H term is count × floor-nano-ln (exact int), so
    * the whole statistic aggregates in integers and emits in milli.
    * Scale: the same bigram spine; the contingency join is vocab-keyed.
    */
  def textCollocationLlr(s: SparkSession, dir: String): DataFrame = {
    val bg = bigrams(s, dir)
    def h(c: Column): Column =
      when(c > 0, c * floor(log(c.cast("double")) * 1e9).cast("long"))
        .otherwise(lit(0L))
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("k11"))
    val r = bg.groupBy("w1").agg(count(lit(1)).as("r1"))
    val c = bg.groupBy("w2").agg(count(lit(1)).as("c1n"))
    val n = bg.agg(count(lit(1)).as("nn"))
    c12.join(r, Seq("w1")).join(c, Seq("w2")).crossJoin(broadcast(n))
      .withColumn("k12", col("r1") - col("k11"))
      .withColumn("k21", col("c1n") - col("k11"))
      .withColumn("k22", col("nn") - col("r1") - col("c1n") + col("k11"))
      .withColumn("llr_nano",
        (h(col("k11")) + h(col("k12")) + h(col("k21")) + h(col("k22")) +
          h(col("nn")) - h(col("r1")) - h(col("nn") - col("r1")) -
          h(col("c1n")) - h(col("nn") - col("c1n"))) * 2)
      .select(col("w1"), col("w2"), col("k11"), col("r1"), col("c1n"),
        expr("llr_nano div 1000000").as("llr_milli"))
      .orderBy(desc("llr_milli"), col("w1"), col("w2"))
      .limit(20)
  }

  /** #375 ANN recall audit: per-probe recall@5 of BOTH approximate
    * index shapes (multi-table sign-LSH #q_sim_lsh_bucketed, IVF
    * #q_sim_ivf_bucketed) against the exact brute-force top-5
    * (#q_sim_cosine_topk) — the measurement that turns "the ANN
    * returns 5 neighbors" into "the ANN returns the RIGHT neighbors",
    * and the one readout that justifies nprobe/table-count choices.
    * Pure set intersection of the three graded relations on
    * (probe_id, cand_id) — counts only, no new similarity math.
    */
  def embedKnnRecall(s: SparkSession, dir: String): DataFrame = {
    val brute = SimilarityOps.simCosineTopk(s, dir)
      .select(col("probe_id"), col("cand_id"))
    def recallOf(method: String, ann: DataFrame): DataFrame =
      ann.select(col("probe_id"), col("cand_id"))
        .join(brute, Seq("probe_id", "cand_id"), "left_semi")
        .groupBy("probe_id").agg(count(lit(1)).as("hits"))
        .join(brute.select(col("probe_id")).distinct(), Seq("probe_id"),
          "right_outer")
        .select(lit(method).as("method"), col("probe_id"),
          coalesce(col("hits"), lit(0L)).as("hits"))
    recallOf("ivf", SimilarityOps.simIvfBucketed(s, dir))
      .unionByName(recallOf("lsh", SimilarityOps.simLshBucketed(s, dir)))
      .withColumn("recall_ppm", expr("(hits * 1000000) div 5"))
      .orderBy("method", "probe_id")
  }

  /** #376 Temperature-scaled mixture weights (τ = 0.7): the multilingual
    * /multi-source sampling rule p_s ∝ w_s^τ that up-weights small
    * sources without letting any source dominate — the standard
    * corpus-mixing knob (vs the proportional weights of q_mix_weights).
    * w^τ is spelled exp(τ·ln w) IDENTICALLY on both engines and floored
    * to nano before the normalizing sum, so the normalization is an
    * exact integer division. One source-grain aggregate.
    */
  def mixTemperature(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum(col("n_docs")).as("nn"))
    val scored = counts.crossJoin(broadcast(tot))
      .withColumn("w_ppm", expr("(n_docs * 1000000) div nn"))
      .withColumn("a_nano",
        floor(exp(lit(0.7) * log(col("n_docs").cast("double") / col("nn")))
          * 1e9).cast("long"))
    scored
      .withColumn("a_sum", sum(col("a_nano")).over(Window.partitionBy()))
      .select(col("source"), col("n_docs"), col("w_ppm"),
        expr("(a_nano * 1000000) div a_sum").as("p_tau_ppm"))
      .withColumn("boost_ppm",
        expr("(p_tau_ppm * 1000000) div greatest(w_ppm, 1)"))
      .orderBy("source")
  }

  /** #377 Smoothing-constant selection for the EWMA forecaster: SSE of
    * the one-step-ahead truncated-EMA forecast over the daily revenue
    * series per priority, for α ∈ {1/8..7/8} — model selection by
    * backtest, the honest way to pick q_ts_ewma's α. Weights are exact
    * rationals (a·(8−a)^(j−1)·8^(8−j) over lags 1..8), the forecast is
    * one mirrored truncating division, and squared errors stage through
    * DECIMAL (err ~ 3e14 micro-cents would overflow a long square).
    * is_best flags the per-priority argmin via a window on the
    * |pri|×7 result relation.
    */
  def tsAlphaSelect(s: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val daily = Tables.orders(s, dir)
      .groupBy(col("o_orderpriority").as("pri"),
        date_trunc("day", col("o_orderdate")).as("day"))
      .agg((sum(graft.Det.money(col("o_totalprice"))) * 100).cast("long").as("v"))
    val w = Window.partitionBy("pri").orderBy("day")
    val lagged = (1 to 8).foldLeft(daily) { (df, j) =>
      df.withColumn(s"l$j", lag(col("v"), j).over(w))
    }.filter(col("l1").isNotNull)
    // r21: all 7 α-candidates ride ONE aggregate pass — the former
    // 7-arm union re-evaluated the daily aggregate + 8-lag window once
    // per arm (7 scans, 7 window sorts for identical inputs); here each
    // arm is just 3 more projected columns over the same lagged rows,
    // and the 7 SSE columns unpivot via stack() to the identical
    // (pri, alpha_eighths, n_days, sse) relation
    var withErr = lagged
    val sseAggs = (1 to 7).map { a =>
      val ws = (1 to 8).map { j =>
        var p = a.toLong
        (1 until j).foreach(_ => p *= (8 - a))
        (1 to (8 - j)).foreach(_ => p *= 8)
        p
      }
      val num = (1 to 8).map(j =>
        coalesce(col(s"l$j").cast(dec) * ws(j - 1), lit(0L).cast(dec)))
        .reduce(_ + _)
      val den = (1 to 8).map(j =>
        when(col(s"l$j").isNotNull, lit(ws(j - 1))).otherwise(lit(0L)))
        .reduce(_ + _)
      withErr = withErr
        .withColumn(s"num$a", num).withColumn(s"den$a", den)
        .withColumn(s"fc$a", expr(s"cast((num$a * 1000000) div den$a as long)"))
        .withColumn(s"err$a", (col("v") * 1000000L - col(s"fc$a")).cast(dec))
      sum(col(s"err$a") * col(s"err$a")).as(s"sse$a")
    }
    val all = withErr
      .groupBy("pri")
      .agg(count(lit(1)).as("n_days"), sseAggs: _*)
      .selectExpr("pri", "n_days",
        "stack(7, " + (1 to 7).map(a => s"$a, sse$a").mkString(", ") +
          ") as (alpha_eighths, sse)")
      .select(col("pri"), col("alpha_eighths"), col("n_days"), col("sse"))
    // rank on the EXACT decimal SSE (a truncated readout would tie at
    // small sf, and Spark's decimal `div` silently WRAPS past 2^63 —
    // the q_stats_ols_multi footgun, re-caught by the r13 sf0.1 sweep);
    // the emitted magnitude column downscales by 1e18, safe to ~1e19
    // daily cents
    val wBest = Window.partitionBy("pri")
      .orderBy(col("sse"), col("alpha_eighths"))
    all.withColumn("is_best", row_number().over(wBest) === 1)
      .select(col("pri"), col("alpha_eighths"), col("n_days"),
        expr("cast(sse div 1000000000000000000 as long)").as("sse_e18"),
        col("is_best"))
      .orderBy("pri", "alpha_eighths")
  }

  /** #378 MinHash-LSH band geometry planning over the MEASURED pair
    * similarities: for each candidate (bands b × rows r) with b·r = 64
    * (the production signature width), the S-curve collision
    * probability p = 1−(1−J^r)^b of every confirmed pair, giving the
    * expected candidate volume and the count of pairs the geometry
    * would catch with ≥50% probability — parameter selection from
    * data, not from the textbook curve alone. J^r and (1−J^r)^b spell
    * exp(r·ln J) / exp(b·ln q) identically on both engines and floor
    * to nano per pair before summing. Runs over the materialized
    * jaccard relation — no new pair scan.
    */
  def dedupLshTuning(s: SparkSession, dir: String): DataFrame = {
    val geoms = Seq((32, 2), (16, 4), (8, 8), (4, 16))
    val pairs = DedupOps.materializedJaccard(s, dir)
      .select(expr("cast(round(jaccard * 1e6) as long)").as("j_ppm"))
    val g = geoms.map { case (b, r) =>
      val jr = exp(lit(r.toDouble) * log(col("j_ppm").cast("double") / 1e6))
      val p = when(col("j_ppm") >= 1000000L, lit(1.0))
        .otherwise(lit(1.0) - exp(lit(b.toDouble) * log(lit(1.0) - jr)))
      pairs
        .withColumn("p_nano", floor(p * 1e9).cast("long"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("p_nano")).as("psum_nano"),
          sum(when(col("p_nano") >= 500000000L, 1L).otherwise(0L))
            .as("n_confident"))
        .select(lit(b).as("bands"), lit(r).as("rows_per_band"),
          col("n_pairs"),
          expr("psum_nano div 1000000").as("exp_candidates_milli"),
          col("n_confident"))
    }
    g.reduce(_ unionByName _).orderBy("bands")
  }

  /** #414 IVF nprobe sweep: recall@5 and candidate volume at nprobe ∈
    * {1, 2, 4, 8} against the exact #64 top-5 — the tuning CURVE behind
    * #75's fixed nprobe=4 (and behind #375's single-point audit): how
    * much recall each additional probed list buys and at what candidate
    * cost. The expensive parts run ONCE: the [[SimilarityOps.ivfParts]]
    * build is shared, each candidate pair scores its cosine a single
    * time and carries the SMALLEST centroid rank that reaches it
    * (min-crank attribution), so the four sweep points are pure
    * filter + rank over one scored relation (a candidate set is a
    * superset of every smaller-nprobe set by construction). Scale: the
    * sweep adds only the ×|nprobe values| rank pass over the bounded
    * per-probe candidate relation — the corpus-sized work is the same
    * one assignment pass #75 already does.
    */
  def simNprobeSweep(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (base, probeLists, assign) = SimilarityOps.ivfParts(s, dir, 8)
    val attributed = probeLists.select("probe_id", "cent_id", "crank")
      .join(assign, Seq("cent_id"))
      .filter(col("probe_id") =!= col("vec_id"))
      .groupBy(col("probe_id"), col("vec_id").as("cand_id"))
      .agg(min(col("crank")).as("mc"))
    val scored = attributed
      .join(base.select(col("vec_id").as("cand_id"), col("embedding").as("cv"),
        col("norm").as("cnorm")), Seq("cand_id"))
      .join(broadcast(base.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
          col("norm").as("pnorm"))), Seq("probe_id"))
      .select(col("probe_id"), col("cand_id"), col("mc"),
        round(expr("graft_dot(pv, cv)") / (col("pnorm") * col("cnorm")), 6)
          .as("cosine"))
    val swept = scored
      .crossJoin(broadcast(s.range(1).select(
        explode(array(lit(1), lit(2), lit(4), lit(8))).as("nprobe"))))
      .filter(col("mc") <= col("nprobe"))
    val w = Window.partitionBy("nprobe", "probe_id")
      .orderBy(desc("cosine"), asc("cand_id"))
    val top5 = swept.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
    val brute = SimilarityOps.simCosineTopk(s, dir)
      .select(col("probe_id"), col("cand_id"))
    val nProbes = brute.select(countDistinct(col("probe_id")).as("npr"))
    val volumes = swept.groupBy("nprobe")
      .agg(count(lit(1)).as("n_candidates"))
    val hits = top5.join(brute, Seq("probe_id", "cand_id"), "left_semi")
      .groupBy("nprobe").agg(count(lit(1)).as("hits"))
    // left join from volumes: a (theoretical) zero-hit sweep point must
    // still emit its row identically on both engines
    volumes.join(hits, Seq("nprobe"), "left_outer")
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      .crossJoin(broadcast(nProbes))
      .select(col("nprobe").cast("long").as("nprobe"), col("n_candidates"),
        col("hits"), expr("(hits * 1000000) div (npr * 5)").as("recall_ppm"))
      .orderBy("nprobe")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_kneser_ney" -> (textKneserNey _),
    "q_text_collocation_llr" -> (textCollocationLlr _),
    "q_embed_knn_recall" -> (embedKnnRecall _),
    "q_mix_temperature" -> (mixTemperature _),
    "q_ts_alpha_select" -> (tsAlphaSelect _),
    "q_dedup_lsh_tuning" -> (dedupLshTuning _),
    "q_sim_nprobe_sweep" -> (simNprobeSweep _))

  private val BigramSql =
    """bg AS (
      |  SELECT w[i] AS w1, w[i + 1] AS w2
      |  FROM (SELECT string_split(text, ' ') AS w FROM documents),
      |    LATERAL (SELECT unnest(range(1, len(w))) AS i)
      |  WHERE len(w) >= 2)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_text_kneser_ney" ->
      s"""WITH $BigramSql,
         |c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
         |c1 AS (SELECT w1, COUNT(*) AS c1,
         |         COUNT(DISTINCT w2) AS n1fwd FROM bg GROUP BY w1),
         |cont AS (SELECT w2, COUNT(*) AS n1back FROM
         |  (SELECT DISTINCT w1, w2 FROM bg) GROUP BY w2),
         |bt AS (SELECT COUNT(*) AS btypes FROM
         |  (SELECT DISTINCT w1, w2 FROM bg)),
         |j AS (
         |  SELECT c12.w1, c12.w2, c12.c12, c1.c1, cont.n1back, bt.btypes,
         |    CAST((GREATEST(4 * c12.c12 - 3, 0) * 1000000) // (4 * c1.c1)
         |      AS BIGINT) AS disc_ppm,
         |    CAST((3 * c1.n1fwd * 1000000) // (4 * c1.c1) AS BIGINT)
         |      AS lambda_ppm,
         |    CAST((cont.n1back * 1000000) // bt.btypes AS BIGINT) AS pcont_ppm
         |  FROM c12 JOIN c1 USING (w1) JOIN cont USING (w2), bt)
         |SELECT w1, w2, c12, c1, n1back, btypes,
         |  disc_ppm, lambda_ppm, pcont_ppm,
         |  disc_ppm + (lambda_ppm * pcont_ppm) // 1000000 AS p_kn_ppm
         |FROM j ORDER BY c12 DESC, w1, w2 LIMIT 20""".stripMargin,
    "q_text_collocation_llr" ->
      s"""WITH $BigramSql,
         |c12 AS (SELECT w1, w2, COUNT(*) AS k11 FROM bg GROUP BY w1, w2),
         |r AS (SELECT w1, COUNT(*) AS r1 FROM bg GROUP BY w1),
         |c AS (SELECT w2, COUNT(*) AS c1n FROM bg GROUP BY w2),
         |n AS (SELECT COUNT(*) AS nn FROM bg),
         |k AS (
         |  SELECT c12.w1, c12.w2, k11, r1, c1n, nn,
         |    r1 - k11 AS k12, c1n - k11 AS k21,
         |    nn - r1 - c1n + k11 AS k22
         |  FROM c12 JOIN r USING (w1) JOIN c USING (w2), n),
         |h AS (
         |  SELECT w1, w2, k11, r1, c1n,
         |    ((CASE WHEN k11 > 0 THEN k11 * CAST(FLOOR(LN(CAST(k11 AS DOUBLE)) * 1e9) AS BIGINT) ELSE 0 END)
         |     + (CASE WHEN k12 > 0 THEN k12 * CAST(FLOOR(LN(CAST(k12 AS DOUBLE)) * 1e9) AS BIGINT) ELSE 0 END)
         |     + (CASE WHEN k21 > 0 THEN k21 * CAST(FLOOR(LN(CAST(k21 AS DOUBLE)) * 1e9) AS BIGINT) ELSE 0 END)
         |     + (CASE WHEN k22 > 0 THEN k22 * CAST(FLOOR(LN(CAST(k22 AS DOUBLE)) * 1e9) AS BIGINT) ELSE 0 END)
         |     + (CASE WHEN nn > 0 THEN nn * CAST(FLOOR(LN(CAST(nn AS DOUBLE)) * 1e9) AS BIGINT) ELSE 0 END)
         |     - (CASE WHEN r1 > 0 THEN r1 * CAST(FLOOR(LN(CAST(r1 AS DOUBLE)) * 1e9) AS BIGINT) ELSE 0 END)
         |     - (CASE WHEN nn - r1 > 0 THEN (nn - r1) * CAST(FLOOR(LN(CAST(nn - r1 AS DOUBLE)) * 1e9) AS BIGINT) ELSE 0 END)
         |     - (CASE WHEN c1n > 0 THEN c1n * CAST(FLOOR(LN(CAST(c1n AS DOUBLE)) * 1e9) AS BIGINT) ELSE 0 END)
         |     - (CASE WHEN nn - c1n > 0 THEN (nn - c1n) * CAST(FLOOR(LN(CAST(nn - c1n AS DOUBLE)) * 1e9) AS BIGINT) ELSE 0 END)
         |    ) * 2 AS llr_nano
         |  FROM k)
         |SELECT w1, w2, k11, r1, c1n,
         |  CAST(llr_nano // 1000000 AS BIGINT) AS llr_milli
         |FROM h ORDER BY llr_milli DESC, w1, w2 LIMIT 20""".stripMargin,
    "q_embed_knn_recall" -> {
      // compose the three graded sim twins verbatim as subqueries — ONE
      // definition of each pipeline rides both engines' audits
      val brute = SimilarityOps.oracles("q_sim_cosine_topk")
      val lsh = SimilarityOps.oracles("q_sim_lsh_bucketed")
      val ivf = SimilarityOps.oracles("q_sim_ivf_bucketed")
      s"""WITH brute AS (SELECT probe_id, cand_id FROM ($brute)),
         |annl AS (SELECT probe_id, cand_id FROM ($lsh)),
         |anni AS (SELECT probe_id, cand_id FROM ($ivf)),
         |probes AS (SELECT DISTINCT probe_id FROM brute),
         |hl AS (
         |  SELECT a.probe_id, COUNT(*) AS hits
         |  FROM annl a JOIN brute b
         |    ON b.probe_id = a.probe_id AND b.cand_id = a.cand_id
         |  GROUP BY a.probe_id),
         |hi AS (
         |  SELECT a.probe_id, COUNT(*) AS hits
         |  FROM anni a JOIN brute b
         |    ON b.probe_id = a.probe_id AND b.cand_id = a.cand_id
         |  GROUP BY a.probe_id),
         |u AS (
         |  SELECT 'ivf' AS method, p.probe_id,
         |    CAST(COALESCE(hi.hits, 0) AS BIGINT) AS hits
         |  FROM probes p LEFT JOIN hi ON hi.probe_id = p.probe_id
         |  UNION ALL
         |  SELECT 'lsh' AS method, p.probe_id,
         |    CAST(COALESCE(hl.hits, 0) AS BIGINT) AS hits
         |  FROM probes p LEFT JOIN hl ON hl.probe_id = p.probe_id)
         |SELECT method, probe_id, hits,
         |  (hits * 1000000) // 5 AS recall_ppm
         |FROM u ORDER BY method, probe_id""".stripMargin
    },
    "q_mix_temperature" ->
      """WITH counts AS (
        |  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS nn FROM counts),
        |scored AS (
        |  SELECT source, n_docs,
        |    CAST((n_docs * 1000000) // nn AS BIGINT) AS w_ppm,
        |    CAST(FLOOR(EXP(0.7 * LN(CAST(n_docs AS DOUBLE) / nn)) * 1e9)
        |      AS BIGINT) AS a_nano
        |  FROM counts, tot)
        |SELECT source, n_docs, w_ppm,
        |  CAST((a_nano * 1000000) // SUM(a_nano) OVER () AS BIGINT)
        |    AS p_tau_ppm,
        |  CAST(((a_nano * 1000000) // SUM(a_nano) OVER ()) * 1000000
        |    // GREATEST(w_ppm, 1) AS BIGINT) AS boost_ppm
        |FROM scored ORDER BY source""".stripMargin,
    "q_ts_alpha_select" -> {
      val lagSql = (1 to 8).map(j =>
        s"LAG(v, $j) OVER (PARTITION BY pri ORDER BY day) AS l$j")
        .mkString(",\n    ")
      val alphaSql = (1 to 7).map { a =>
        val ws = (1 to 8).map { j =>
          var p = a.toLong
          (1 until j).foreach(_ => p *= (8 - a))
          (1 to (8 - j)).foreach(_ => p *= 8)
          p
        }
        val num = (1 to 8).map(j =>
          s"COALESCE(CAST(l$j AS HUGEINT) * ${ws(j - 1)}, 0)").mkString(" + ")
        val den = (1 to 8).map(j =>
          s"(CASE WHEN l$j IS NOT NULL THEN ${ws(j - 1)} ELSE 0 END)")
          .mkString(" + ")
        s"""SELECT pri, $a AS alpha_eighths, COUNT(*) AS n_days,
           |  SUM(
           |    CAST(v * 1000000 - CAST(($num) * 1000000 // ($den) AS BIGINT)
           |      AS HUGEINT)
           |    * (v * 1000000 - CAST(($num) * 1000000 // ($den) AS BIGINT))
           |  ) AS sse
           |FROM lagged WHERE l1 IS NOT NULL GROUP BY pri""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH daily AS (
         |  SELECT o_orderpriority AS pri, date_trunc('day', o_orderdate) AS day,
         |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS v
         |  FROM orders GROUP BY 1, 2),
         |lagged AS (
         |  SELECT pri, day, v,
         |    $lagSql
         |  FROM daily),
         |allrows AS (
         |$alphaSql)
         |SELECT pri, alpha_eighths, n_days,
         |  CAST(sse // 1000000000000000000 AS BIGINT) AS sse_e18,
         |  (ROW_NUMBER() OVER (PARTITION BY pri
         |     ORDER BY sse, alpha_eighths) = 1) AS is_best
         |FROM allrows ORDER BY pri, alpha_eighths""".stripMargin
    },
    "q_dedup_lsh_tuning" -> {
      val pairCte =
        """WITH base AS (
          |  SELECT doc_id, lang, source,
          |    list_distinct(string_split(text, ' ')) AS tokset
          |  FROM documents),
          |p AS (
          |  SELECT CAST(round(round(CAST(len(list_intersect(a.tokset, b.tokset)) AS DOUBLE)
          |      / len(list_distinct(a.tokset || b.tokset)), 6) * 1e6) AS BIGINT) AS j_ppm
          |  FROM base a JOIN base b
          |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
          |  WHERE round(CAST(len(list_intersect(a.tokset, b.tokset)) AS DOUBLE)
          |          / len(list_distinct(a.tokset || b.tokset)), 6) >= 0.2)""".stripMargin
      val geomSql = Seq((32, 2), (16, 4), (8, 8), (4, 16)).map { case (b, r) =>
        s"""SELECT $b AS bands, $r AS rows_per_band, COUNT(*) AS n_pairs,
           |  CAST(SUM(p_nano) // 1000000 AS BIGINT) AS exp_candidates_milli,
           |  CAST(SUM(CASE WHEN p_nano >= 500000000 THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_confident
           |FROM (
           |  SELECT CAST(FLOOR(
           |    (CASE WHEN j_ppm >= 1000000 THEN 1.0
           |          ELSE 1.0 - EXP($b.0 * LN(1.0 -
           |            EXP($r.0 * LN(CAST(j_ppm AS DOUBLE) / 1e6)))) END)
           |    * 1e9) AS BIGINT) AS p_nano
           |  FROM p)""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""$pairCte
         |SELECT * FROM (
         |$geomSql)
         |ORDER BY bands""".stripMargin
    },
    "q_sim_nprobe_sweep" -> {
      val brute = SimilarityOps.oracles("q_sim_cosine_topk")
      // the v/cents/assign pipeline mirrors the q_sim_ivf_bucketed twin
      // (C = 16 centroids, md5 sample); crank runs to 8 here and each
      // candidate keeps its smallest reaching crank
      s"""WITH v AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |cents AS (
         |  SELECT vec_id AS cent_id, v AS cv FROM v
         |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
         |assign AS (
         |  SELECT vec_id, cent_id FROM (
         |    SELECT a.vec_id, c.cent_id,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY list_cosine_similarity(a.v, c.cv) DESC, c.cent_id DESC) AS rn
         |    FROM v a CROSS JOIN cents c)
         |  WHERE rn = 1),
         |pl AS (
         |  SELECT probe_id, cent_id, crank FROM (
         |    SELECT p.vec_id AS probe_id, c.cent_id,
         |      row_number() OVER (PARTITION BY p.vec_id
         |        ORDER BY list_cosine_similarity(p.v, c.cv) DESC, c.cent_id ASC) AS crank
         |    FROM v p CROSS JOIN cents c WHERE p.vec_id < 10)
         |  WHERE crank <= 8),
         |attr AS (
         |  SELECT pl.probe_id, a.vec_id AS cand_id, MIN(pl.crank) AS mc
         |  FROM pl JOIN assign a ON pl.cent_id = a.cent_id
         |  WHERE a.vec_id <> pl.probe_id
         |  GROUP BY pl.probe_id, a.vec_id),
         |scored AS (
         |  SELECT probe_id, cand_id, mc,
         |    round(list_cosine_similarity(pv.v, cv.v), 6) AS cosine
         |  FROM attr
         |  JOIN v pv ON pv.vec_id = probe_id
         |  JOIN v cv ON cv.vec_id = cand_id),
         |np AS (SELECT unnest([1, 2, 4, 8]) AS nprobe),
         |swept AS (
         |  SELECT np.nprobe, s.probe_id, s.cand_id, s.cosine
         |  FROM scored s JOIN np ON s.mc <= np.nprobe),
         |top5 AS (
         |  SELECT nprobe, probe_id, cand_id FROM swept
         |  QUALIFY row_number() OVER (PARTITION BY nprobe, probe_id
         |    ORDER BY cosine DESC, cand_id ASC) <= 5),
         |brute AS (SELECT probe_id, cand_id FROM ($brute)),
         |npr AS (SELECT COUNT(DISTINCT probe_id) AS npr FROM brute),
         |vol AS (SELECT nprobe, COUNT(*) AS n_candidates FROM swept
         |        GROUP BY nprobe),
         |hits AS (
         |  SELECT t.nprobe, COUNT(*) AS hits
         |  FROM top5 t JOIN brute b
         |    ON b.probe_id = t.probe_id AND b.cand_id = t.cand_id
         |  GROUP BY t.nprobe)
         |SELECT CAST(vol.nprobe AS BIGINT) AS nprobe, vol.n_candidates,
         |  CAST(COALESCE(hits.hits, 0) AS BIGINT) AS hits,
         |  CAST((COALESCE(hits.hits, 0) * 1000000) // (npr.npr * 5) AS BIGINT)
         |    AS recall_ppm
         |FROM vol LEFT JOIN hits ON hits.nprobe = vol.nprobe CROSS JOIN npr
         |ORDER BY nprobe""".stripMargin
    })
}
