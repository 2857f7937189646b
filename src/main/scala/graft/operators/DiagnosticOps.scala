package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Det, Tables}

/** Round-13 additions, SURVEY §2 #387–#393: the residual-diagnostics
  * battery a forecasting pipeline runs between fitting and trusting a
  * model (Ljung–Box whiteness, KPSS level-stationarity, Lo–MacKinlay
  * variance ratio, spectral entropy), plus three classical tests the
  * inference family still lacked (Bartlett equal-variance, Friedman
  * blocked ranks, paired t).
  *
  * Exactness discipline (the repo-wide rule, see [[graft.Det]]): series
  * values stage to exact integer cents; deviations multiply through by n
  * so every centered term is an exact integer; products go to
  * DECIMAL(38,0) (DuckDB HUGEINT) BEFORE summation; each readout is one
  * truncating integer division (Spark `div` and DuckDB `//` both
  * truncate toward zero, verified incl. negatives) or one mirrored
  * double expression over exact sub-2^53 integers.
  */
object DiagnosticOps {

  /** Global daily revenue in exact integer cents. The relation is
    * CALENDAR-bounded (~2.4k rows at any corpus size), so the
    * single-series windows below never see corpus-sized input — the one
    * corpus-scaled job is the day aggregate, which map-side combines.
    */
  private def dailyGlobal(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg((sum(Det.money(col("o_totalprice"))) * 100).cast("long").as("v"))

  private val dec = DecimalType(38, 0)

  /** #387 Ljung–Box whiteness test on the daily revenue series, lags
    * k = 1..8: rho_k from the centered cross products, Q(K) =
    * n(n+2)·Σ_{k≤K} rho_k²/(n−k) reported cumulatively per lag — the
    * standard residual-autocorrelation screen run after any forecast
    * fit (#255 Holt, #112 revenue forecast). Centering multiplies
    * through by n (c_t = n·v_t − S, exact int64), cross products stage
    * to DECIMAL(38,0), rho lands in ppm via one truncating division,
    * and Q accumulates rho²/(n−k) in exact integers before one terminal
    * div. Envelope: |c| ≤ n·|v| ~ 1e12·cents at sf0.1 ⇒ c² ~ 1e24,
    * Σ·1e6 ~ 1e33 — three decades inside DECIMAL(38,0) with 100×
    * headroom on daily cents. Scale: day aggregate, one 8-lag window
    * on the 2.4k-row series, 8-row readout.
    */
  def tsLjungBox(s: SparkSession, dir: String): DataFrame = {
    val daily = dailyGlobal(s, dir)
    val stats = daily.agg(count(lit(1)).as("n"),
      sum(col("v").cast(dec)).as("sv"))
    val w = Window.orderBy("day")
    val c0 = daily.crossJoin(broadcast(stats))
      .withColumn("c", (col("v").cast(dec) * col("n") - col("sv")).cast(dec))
    val withLags = (1 to 8).foldLeft(c0) { (df, k) =>
      df.withColumn(s"l$k", lag(col("c"), k).over(w))
    }
    val stacked = withLags.select(col("n"), col("c"),
      expr("stack(8, 1, l1, 2, l2, 3, l3, 4, l4, 5, l5, 6, l6, 7, l7, 8, l8) " +
        "AS (k, ck)"))
      .filter(col("ck").isNotNull)
      .groupBy("k")
      .agg(max(col("n")).as("n"), sum(col("c") * col("ck")).as("num"))
    val den = c0.agg(sum(col("c") * col("c")).as("den"))
    stacked.crossJoin(broadcast(den))
      .withColumn("rho_ppm", expr("cast((num * 1000000) div den as long)"))
      .withColumn("term",
        expr("cast(rho_ppm as decimal(38,0)) * rho_ppm div (n - k)"))
      .withColumn("q_milli",
        expr("cast((n * (n + 2) * cast(sum(term) over (order by k) " +
          "as decimal(38,0))) div 1000000000 as long)"))
      .select(col("k").cast("long").as("k"), col("n"), col("rho_ppm"),
        col("q_milli"))
      .orderBy("k")
  }

  /** #388 KPSS level-stationarity statistic on the daily revenue
    * series: eta = Σ_t S_t² / (n²·s²) with S_t the partial sums of
    * demeaned values and s² the lag-0 long-run variance — the
    * complement of #311 ADF (KPSS null = stationary, ADF null = unit
    * root; agreeing verdicts are the actionable signal). Multiplying
    * the demeaned series by n keeps every term integer; partial sums
    * and squared sums downscale div 1e3 symmetrically (ratio
    * preserved, truncation identical on both engines) to hold ΣS''²
    * inside DECIMAL(38,0) — envelope ~1e33 at sf0.1 with 100× daily-
    * cent headroom. Verdict flags compare against the published 10/5/1%
    * critical values in exact ppm. Scale: day aggregate + one
    * cumulative window on the calendar-bounded series.
    */
  def tsKpss(s: SparkSession, dir: String): DataFrame = {
    val daily = dailyGlobal(s, dir)
    val stats = daily.agg(count(lit(1)).as("n"),
      sum(col("v").cast(dec)).as("sv"))
    val w = Window.orderBy("day")
    daily.crossJoin(broadcast(stats))
      .withColumn("c", (col("v").cast(dec) * col("n") - col("sv")).cast(dec))
      .withColumn("cc", expr("cast(c div 1000 as decimal(38,0))"))
      .withColumn("sp", expr("cast(sum(c) over (order by day) div 1000 " +
        "as decimal(38,0))"))
      .groupBy()
      .agg(max(col("n")).as("n"), sum(col("sp") * col("sp")).as("ssq"),
        sum(col("cc") * col("cc")).as("csq"))
      .withColumn("eta_ppm", expr("cast((ssq * 1000000) div (n * csq) as long)"))
      .select(col("n"), col("eta_ppm"),
        (col("eta_ppm") > 347000L).as("reject_10pct"),
        (col("eta_ppm") > 463000L).as("reject_5pct"),
        (col("eta_ppm") > 739000L).as("reject_1pct"))
  }

  /** #389 Lo–MacKinlay variance ratio VR(q=5) on daily revenue
    * first differences: Var(5-day change) / (5·Var(1-day change)) —
    * the random-walk test (VR≈1 under iid increments; VR<1 mean
    * reversion; VR>1 momentum/trend). Differences quantize to whole
    * dollars (cents div 100, trunc-identical on both engines incl.
    * negatives — VR is scale-invariant and daily diffs are ~1e6
    * dollars, so the quantization is ~1e-8 relative); both variance
    * numerators are the exact integer n·Σd² − (Σd)² form in
    * DECIMAL(38,0); the ratio is ONE truncating division with the two
    * counts' squares cross-multiplied in, so no float enters at all.
    * Envelope ~8e32 at sf0.1 ⇒ ~100× daily-dollar headroom before a
    * loud ANSI DECIMAL overflow. Scale: calendar-bounded series, two
    * lag columns on one window pass.
    */
  def tsVarianceRatio(s: SparkSession, dir: String): DataFrame = {
    val d = dailyGlobal(s, dir)
      .withColumn("d1", expr("(v - lag(v, 1) over (order by day)) div 100"))
      .withColumn("d5", expr("(v - lag(v, 5) over (order by day)) div 100"))
    val a1 = d.filter(col("d1").isNotNull)
      .agg(count(lit(1)).as("n1"), sum(col("d1").cast(dec)).as("s1"),
        sum(col("d1").cast(dec) * col("d1")).as("q1"))
    val a5 = d.filter(col("d5").isNotNull)
      .agg(count(lit(1)).as("n5"), sum(col("d5").cast(dec)).as("s5"),
        sum(col("d5").cast(dec) * col("d5")).as("q5"))
    a1.crossJoin(broadcast(a5))
      .withColumn("var1num", expr("n1 * q1 - s1 * s1"))
      .withColumn("var5num", expr("n5 * q5 - s5 * s5"))
      .select(col("n1"), col("n5"),
        expr("cast((var5num * n1 * n1 * 1000000) div " +
          "(5 * var1num * n5 * n5) as long)").as("vr_ppm"))
  }

  /** #390 Spectral entropy of the daily revenue series: Shannon
    * entropy of the normalized Schuster periodogram (#368, reused
    * verbatim — the twin composes the #368 twin as a subquery) over
    * wave numbers k = 1..8, normalized by ln(8) — one number that
    * separates "one dominant cycle" (≈0) from "white spectrum" (≈1),
    * the screen before seasonal-model selection. Powers downscale to
    * e27 units (div 1e9 — entropy is normalization-invariant; powers
    * are ~8e17 at sf0.1 and grow with corpus², so e27 units keep >100×
    * headroom) so BOTH
    * the per-bin values and their total stay under 2^53, keeping every
    * int→double exact on both engines (a HUGEINT→DOUBLE above 2^53
    * double-rounds in DuckDB — the Det decimal caveat); the entropy
    * then uses the repo's integer-ln pattern (ln floored to nano
    * BEFORE the sum, H_nano = lnS − ΣP·lnP div S), zero bins excluded
    * by the 0·ln 0 convention on both engines. Scale: an 8-row
    * reduction after #368.
    */
  def tsSpectralEntropy(s: SparkSession, dir: String): DataFrame = {
    SeriesOps.tsPeriodogram(s, dir)
      .select(col("k"), expr("power_e18 div 1000000000").as("p"))
      .filter(col("p") > 0L)
      .groupBy()
      .agg(count(lit(1)).as("n_bins"), sum(col("p").cast(dec)).as("sp"),
        sum(col("p").cast(dec) *
          floor(log(col("p").cast("double")) * 1e9).cast("long")).as("plp"))
      .withColumn("h_nano",
        floor(log(col("sp").cast("double")) * 1e9).cast("long") -
          expr("cast(plp div sp as long)"))
      .select(col("n_bins"), col("h_nano"),
        expr("h_nano div 1000000").as("h_milli"),
        expr("(h_nano * 1000000) div 2079441541").as("h_norm_ppm"))
  }

  /** #391 Bartlett's test for variance homogeneity of lineitem
    * quantity across return flags — the gate before pooling variances
    * into #225 Welch / #325 Tukey (Bartlett is the high-power,
    * normality-assuming sibling of #321 Levene already in the tree).
    * Power sums are exact integers well under 2^53 (Σq² ≤ 5e10 even at
    * 100× sf0.1), so each group's variance is a mirrored double over
    * exact ints (the #370 Jarque–Bera pattern) — but the CROSS-GROUP
    * sums must not be float sums (k-row double addition is partial-
    * order-sensitive), so every per-group contribution stages to an
    * exact integer first: (n−1)·vi to milli, (n−1)·⌊ln vi·1e9⌋ as an
    * integer product, 1e12 div (n−1) in pico. The final statistic is
    * then a mirrored double sequence over those exact integer totals.
    * One map-side-combined aggregate; algebra on the |flags|-row
    * result.
    */
  def statsBartlett(s: SparkSession, dir: String): DataFrame = {
    val q = col("l_quantity").cast("long")
    val g = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag").as("flag"))
      .agg(count(lit(1)).as("n"), sum(q).as("s1"), sum(q * q).as("s2"))
      .withColumn("vi",
        (col("s2").cast("double") -
          col("s1").cast("double") * col("s1") / col("n")) / (col("n") - 1))
      .withColumn("a_milli",
        floor((col("n") - 1).cast("double") * col("vi") * 1e3).cast("long"))
      .withColumn("b_nano",
        (col("n") - 1) * floor(log(col("vi")) * 1e9).cast("long"))
      .withColumn("inv_pico", expr("1000000000000 div (n - 1)"))
    g.groupBy()
      .agg(count(lit(1)).as("k"), sum(col("n")).as("nt"),
        sum(col("a_milli")).as("sa"), sum(col("b_nano")).as("sb"),
        sum(col("inv_pico")).as("si"))
      .withColumn("sp2",
        col("sa").cast("double") / 1e3 / (col("nt") - col("k")))
      .withColumn("t_raw",
        (col("nt") - col("k")).cast("double") * log(col("sp2")) -
          col("sb").cast("double") / 1e9)
      .withColumn("cfac",
        lit(1.0) + (col("si").cast("double") / 1e12 -
          lit(1.0) / (col("nt") - col("k"))) / (lit(3.0) * (col("k") - 1)))
      .select(col("k"), col("nt").as("n_total"),
        floor(col("sp2") * 1e3).cast("long").as("pooled_var_milli"),
        floor(col("t_raw") * 1e3).cast("long").as("t_raw_milli"),
        floor(col("cfac") * 1e6).cast("long").as("c_micro"),
        floor(col("t_raw") / col("cfac") * 1e3).cast("long").as("t_milli"))
  }

  /** #392 Friedman blocked-rank test: months are blocks, the five
    * order priorities are treatments, monthly revenue (exact cents)
    * the response — "does priority mix shift revenue consistently
    * month after month?" without any normality assumption (the
    * blocked sibling of #315 Kruskal–Wallis; #349 Kendall's W is the
    * same statistic's agreement normalization). Only complete blocks
    * enter (all k treatments present). Ranks are exact integers
    * (rank over cents with the priority key as the deterministic
    * tiebreak — cent-level revenue ties are measure-zero but the
    * order must still be total on both engines); chi2_F =
    * 12·ΣR_j²/(nk(k+1)) − 3n(k+1) is exact rational → one truncating
    * milli division. Scale: month×priority aggregate (calendar-
    * bounded), ranks on the |blocks|-partitioned window.
    */
  def statsFriedman(s: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(s, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("m"),
        col("o_orderpriority").as("pri"))
      .agg((sum(Det.money(col("o_totalprice"))) * 100).cast("long").as("v"))
    val k = monthly.select(countDistinct(col("pri")).as("k"))
    val complete = monthly
      .withColumn("nb", count(lit(1)).over(Window.partitionBy("m")))
      .crossJoin(broadcast(k))
      .filter(col("nb") === col("k"))
    val ranked = complete
      .withColumn("r", rank().over(
        Window.partitionBy("m").orderBy(col("v"), col("pri"))))
    val sums = ranked.groupBy("pri")
      .agg(max(col("k")).as("k"), count(lit(1)).as("n_blocks"),
        sum(col("r")).as("rank_sum"))
    val stat = sums.groupBy()
      .agg(max(col("k")).as("k2"), max(col("n_blocks")).as("nb2"),
        sum(col("rank_sum") * col("rank_sum")).as("rsq"))
      .select(col("k2"), col("nb2"),
        (expr("(12000 * rsq) div (nb2 * k2 * (k2 + 1))") -
          lit(3000L) * col("nb2") * (col("k2") + 1)).as("chi2_milli"))
    sums.crossJoin(broadcast(stat))
      .select(col("pri"), col("n_blocks"), col("rank_sum"),
        expr("(rank_sum * 1000) div n_blocks").as("mean_rank_milli"),
        col("chi2_milli"))
      .orderBy("pri")
  }

  /** #519 Nemenyi post-hoc after Friedman (#346): the pairwise
    * mean-rank differences across the five priority classes against
    * the critical difference CD = q₀.₀₅·√(k(k+1)/(6N)) (Demšar 2006;
    * q₀.₀₅ = 2.728 for k = 5, a PINNED tabulated constant — the flag
    * is NULL if the priority alphabet ever isn't 5, stated). WHY:
    * Friedman (#346) only says SOME priority ranks differently across
    * months; every concrete action ("treat 1-URGENT separately")
    * needs to know WHICH pairs differ, and running pairwise Wilcoxons
    * uncorrected inflates the family error — Nemenyi is the standard
    * rank-based multiple-comparison answer.
    *
    * Exactness: the #346 ranked relation verbatim (tie-aware RANK over
    * complete month blocks); mean ranks in exact milli (ONE truncating
    * division each); pairwise |Δ| exact integers; the CD is one
    * mirrored double (√ on exact integer ratio arguments), floored to
    * milli once. Scale: the rank window partitions by month over the
    * calendar-bounded monthly relation; the pair grid is k² ≤ 25 rows.
    */
  def statsNemenyi(s: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(s, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("m"),
        col("o_orderpriority").as("pri"))
      .agg((sum(Det.money(col("o_totalprice"))) * 100).cast("long").as("v"))
    val k = monthly.select(countDistinct(col("pri")).as("k"))
    val complete = monthly
      .withColumn("nb", count(lit(1)).over(Window.partitionBy("m")))
      .crossJoin(broadcast(k))
      .filter(col("nb") === col("k"))
    val ranked = complete
      .withColumn("r", rank().over(
        Window.partitionBy("m").orderBy(col("v"), col("pri"))))
    val means = ranked.groupBy("pri")
      .agg(max(col("k")).as("k"), count(lit(1)).as("n_blocks"),
        sum(col("r")).as("rank_sum"))
      .select(col("pri"), col("k"), col("n_blocks"),
        expr("(rank_sum * 1000) div n_blocks").as("mr_milli"))
      .localCheckpoint()
    val cd = means.agg(max(col("k")).as("kk"), max(col("n_blocks")).as("nn"))
      .select(col("kk"), col("nn"),
        expr("CASE WHEN kk = 5 THEN cast(floor(2.728 * " +
          "sqrt(cast(kk * (kk + 1) as double) / (6.0 * nn)) * 1000) " +
          "as bigint) END").as("cd_milli"))
    means.as("a")
      .join(means.select(col("pri").as("pri_b"), col("mr_milli").as("mr_b")),
        col("a.pri") < col("pri_b"))
      .crossJoin(broadcast(cd))
      .select(col("a.pri").as("pri_a"), col("pri_b"),
        col("a.mr_milli").as("mr_a_milli"), col("mr_b").as("mr_b_milli"),
        abs(col("a.mr_milli") - col("mr_b")).as("diff_milli"),
        col("cd_milli"))
      .withColumn("differs_05", col("diff_milli") > col("cd_milli"))
      .orderBy("pri_a", "pri_b")
  }

  /** #393 Paired t-test on per-customer revenue across the fixture's
    * two halves (orders before vs from 1995-06-01; customers active in
    * both): the self-controlled before/after design that #225 Welch
    * (independent groups) cannot express. Half-revenues are exact
    * cents; the difference quantizes to whole kilodollars (cents div
    * 1e5, trunc-identical both engines — the documented resolution
    * trade that keeps Σd² an exact double at 100× sf0.1, ≤1e14 ≪
    * 2^53). The t statistic is the mirrored double sequence over
    * (n, Σd, Σd²); mean difference additionally reads out exactly in
    * milli-kilodollars. Scale: one customer-key aggregate with the
    * pivot folded in (two conditional sums — NO join), algebra on the
    * 1-row result.
    */
  def statsPairedT(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("1995-06-01").cast("date")
    val per = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg((sum(when(col("o_orderdate") < cut,
          Det.money(col("o_totalprice"))).otherwise(lit(0).cast(DecimalType(12, 2))))
          * 100).cast("long").as("h1"),
        (sum(when(col("o_orderdate") >= cut,
          Det.money(col("o_totalprice"))).otherwise(lit(0).cast(DecimalType(12, 2))))
          * 100).cast("long").as("h2"),
        sum(when(col("o_orderdate") < cut, 1L).otherwise(0L)).as("c1"),
        sum(when(col("o_orderdate") >= cut, 1L).otherwise(0L)).as("c2"))
      .filter(col("c1") > 0L && col("c2") > 0L)
      .withColumn("d", expr("(h2 - h1) div 100000"))
    per.groupBy()
      .agg(count(lit(1)).as("n"), sum(col("d")).as("sd"),
        sum(col("d") * col("d")).as("sq"))
      .withColumn("mean_d", col("sd").cast("double") / col("n"))
      .withColumn("var_d",
        (col("sq").cast("double") / col("n") - col("mean_d") * col("mean_d")) *
          col("n") / (col("n") - 1))
      .select(col("n"), col("sd").as("sum_d_kusd"),
        expr("(sd * 1000) div n").as("mean_d_milli"),
        floor(col("mean_d") / sqrt(col("var_d") / col("n")) * 1e3)
          .cast("long").as("t_milli"))
  }

  /** #425 Hill tail-index estimator over the top k = 100 order values:
    * α̂ = k / Σ_{i≤k} (ln x_(i) − ln x_(k+1)) — the heavy-tail exponent
    * that decides whether means/variances of the value distribution
    * even exist (α ≤ 2 ⇒ infinite variance ⇒ every CLT-based test in
    * the tree is on thin ice for this column) — the EVT complement of
    * the #204 skew report. The order statistics come from ONE bounded
    * TakeOrderedAndProject (101 rows by (cents DESC, orderkey) — a
    * total order, never a global sort); each ln floors to nano over an
    * exact integer input, the excess sum is exact, and both readouts
    * are truncating divisions. Scale: top-k heap per partition + one
    * 101-row reduction, independent of corpus size.
    */
  def statsHill(s: SparkSession, dir: String): DataFrame = {
    val k = 100
    val top = Tables.orders(s, dir)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .orderBy(desc("cents"), asc("o_orderkey"))
      .limit(k + 1)
    // rank INSIDE the bounded 101-row relation: boundary ties resolve by
    // the same total (cents DESC, key) order that selected the rows
    val ranked = top.withColumn("rn", row_number().over(
      Window.orderBy(desc("cents"), asc("o_orderkey"))))
    val thr = ranked.filter(col("rn") === k + 1)
      .select(col("cents").as("x_thr"))
    ranked.filter(col("rn") <= k)
      .crossJoin(broadcast(thr))
      .select(col("cents"), col("x_thr"),
        (floor(log(col("cents").cast("double")) * 1e9).cast("long") -
          floor(log(col("x_thr").cast("double")) * 1e9).cast("long"))
          .as("excess_nano"))
      .agg(count(lit(1)).as("k_used"), max(col("x_thr")).as("x_thr"),
        sum(col("excess_nano")).as("sum_nano"))
      .select(col("k_used"), col("x_thr").as("threshold_cents"),
        col("sum_nano"),
        expr("sum_nano div k_used").as("hill_inv_nano"),
        expr("(k_used * 1000000000000) div sum_nano").as("alpha_milli"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stats_nemenyi" -> (statsNemenyi _),
    "q_stats_hill" -> (statsHill _),
    "q_ts_ljung_box" -> (tsLjungBox _),
    "q_ts_kpss" -> (tsKpss _),
    "q_ts_variance_ratio" -> (tsVarianceRatio _),
    "q_ts_spectral_entropy" -> (tsSpectralEntropy _),
    "q_stats_bartlett" -> (statsBartlett _),
    "q_stats_friedman" -> (statsFriedman _),
    "q_stats_paired_t" -> (statsPairedT _))

  private val DailyGlobalSql =
    """daily AS (
      |  SELECT date_trunc('day', o_orderdate) AS day,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS v
      |  FROM orders GROUP BY 1)""".stripMargin

  private val CenteredSql =
    """st AS (SELECT COUNT(*) AS n, SUM(CAST(v AS HUGEINT)) AS sv FROM daily),
      |c AS (
      |  SELECT day, CAST(v AS HUGEINT) * st.n - st.sv AS c, st.n
      |  FROM daily, st)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_stats_hill" ->
      """WITH top AS (
        |  SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders ORDER BY cents DESC, o_orderkey LIMIT 101),
        |ranked AS (
        |  SELECT cents,
        |    row_number() OVER (ORDER BY cents DESC, o_orderkey) AS rn
        |  FROM top),
        |thr AS (SELECT cents AS x_thr FROM ranked WHERE rn = 101),
        |terms AS (
        |  SELECT r.cents, thr.x_thr,
        |    CAST(FLOOR(LN(CAST(r.cents AS DOUBLE)) * 1e9) AS BIGINT)
        |      - CAST(FLOOR(LN(CAST(thr.x_thr AS DOUBLE)) * 1e9) AS BIGINT)
        |      AS excess_nano
        |  FROM ranked r, thr WHERE r.rn <= 100),
        |agg AS (
        |  SELECT COUNT(*) AS k_used, MAX(x_thr) AS x_thr,
        |    CAST(SUM(excess_nano) AS BIGINT) AS sum_nano
        |  FROM terms)
        |SELECT k_used, x_thr AS threshold_cents, sum_nano,
        |  sum_nano // k_used AS hill_inv_nano,
        |  (k_used * 1000000000000) // sum_nano AS alpha_milli
        |FROM agg""".stripMargin,
    "q_ts_ljung_box" ->
      s"""WITH $DailyGlobalSql,
         |$CenteredSql,
         |lags AS (
         |  SELECT k.k, c.n, c.c,
         |    LAG(c.c, k.k) OVER (PARTITION BY k.k ORDER BY c.day) AS ck
         |  FROM c, (SELECT unnest(range(1, 9)) AS k) k),
         |num AS (
         |  SELECT k, MAX(n) AS n, SUM(c * ck) AS num
         |  FROM lags WHERE ck IS NOT NULL GROUP BY k),
         |den AS (SELECT SUM(c * c) AS den FROM c),
         |rho AS (
         |  SELECT k, n, CAST((num * 1000000) // den.den AS BIGINT) AS rho_ppm
         |  FROM num, den),
         |q AS (
         |  SELECT k, n, rho_ppm,
         |    SUM(CAST(rho_ppm AS HUGEINT) * rho_ppm // (n - k))
         |      OVER (ORDER BY k) AS acc
         |  FROM rho)
         |SELECT CAST(k AS BIGINT) AS k, n, rho_ppm,
         |  CAST((n * (n + 2) * acc) // 1000000000 AS BIGINT) AS q_milli
         |FROM q ORDER BY k""".stripMargin,
    "q_ts_kpss" ->
      s"""WITH $DailyGlobalSql,
         |$CenteredSql,
         |ps AS (
         |  SELECT n, c // 1000 AS cc,
         |    SUM(c) OVER (ORDER BY day) // 1000 AS sp
         |  FROM c),
         |agg AS (
         |  SELECT MAX(n) AS n, SUM(sp * sp) AS ssq, SUM(cc * cc) AS csq
         |  FROM ps)
         |SELECT n, CAST((ssq * 1000000) // (n * csq) AS BIGINT) AS eta_ppm,
         |  (ssq * 1000000) // (n * csq) > 347000 AS reject_10pct,
         |  (ssq * 1000000) // (n * csq) > 463000 AS reject_5pct,
         |  (ssq * 1000000) // (n * csq) > 739000 AS reject_1pct
         |FROM agg""".stripMargin,
    "q_ts_variance_ratio" ->
      s"""WITH $DailyGlobalSql,
         |d AS (
         |  SELECT (v - LAG(v, 1) OVER (ORDER BY day)) // 100 AS d1,
         |    (v - LAG(v, 5) OVER (ORDER BY day)) // 100 AS d5
         |  FROM daily),
         |a1 AS (
         |  SELECT COUNT(*) AS n1, SUM(CAST(d1 AS HUGEINT)) AS s1,
         |    SUM(CAST(d1 AS HUGEINT) * d1) AS q1
         |  FROM d WHERE d1 IS NOT NULL),
         |a5 AS (
         |  SELECT COUNT(*) AS n5, SUM(CAST(d5 AS HUGEINT)) AS s5,
         |    SUM(CAST(d5 AS HUGEINT) * d5) AS q5
         |  FROM d WHERE d5 IS NOT NULL)
         |SELECT n1, n5,
         |  CAST(((n5 * q5 - s5 * s5) * n1 * n1 * 1000000) //
         |    (5 * (n1 * q1 - s1 * s1) * n5 * n5) AS BIGINT) AS vr_ppm
         |FROM a1, a5""".stripMargin,
    "q_ts_spectral_entropy" ->
      s"""WITH pg AS (
         |  SELECT k, power_e18 // 1000000000 AS p
         |  FROM (${SeriesOps.oracles("q_ts_periodogram")})
         |  WHERE power_e18 // 1000000000 > 0),
         |agg AS (
         |  SELECT COUNT(*) AS n_bins, SUM(CAST(p AS HUGEINT)) AS sp,
         |    SUM(CAST(p AS HUGEINT) *
         |      CAST(FLOOR(LN(CAST(p AS DOUBLE)) * 1e9) AS BIGINT)) AS plp
         |  FROM pg),
         |h AS (
         |  SELECT n_bins,
         |    CAST(FLOOR(LN(CAST(sp AS DOUBLE)) * 1e9) AS BIGINT)
         |      - CAST(plp // sp AS BIGINT) AS h_nano
         |  FROM agg)
         |SELECT n_bins, h_nano,
         |  CAST(h_nano // 1000000 AS BIGINT) AS h_milli,
         |  CAST((h_nano * 1000000) // 2079441541 AS BIGINT) AS h_norm_ppm
         |FROM h""".stripMargin,
    "q_stats_bartlett" ->
      """WITH g AS (
        |  SELECT l_returnflag AS flag, COUNT(*) AS n,
        |    SUM(CAST(l_quantity AS BIGINT)) AS s1,
        |    SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s2
        |  FROM lineitem GROUP BY 1),
        |v AS (
        |  SELECT flag, n,
        |    (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1) AS vi
        |  FROM g),
        |staged AS (
        |  SELECT flag, n,
        |    CAST(FLOOR(CAST(n - 1 AS DOUBLE) * vi * 1e3) AS BIGINT) AS a_milli,
        |    (n - 1) * CAST(FLOOR(LN(vi) * 1e9) AS BIGINT) AS b_nano,
        |    1000000000000 // (n - 1) AS inv_pico
        |  FROM v),
        |agg AS (
        |  SELECT COUNT(*) AS k, SUM(n) AS nt,
        |    CAST(SUM(a_milli) AS BIGINT) AS sa,
        |    CAST(SUM(b_nano) AS BIGINT) AS sb,
        |    CAST(SUM(inv_pico) AS BIGINT) AS si
        |  FROM staged),
        |s AS (
        |  SELECT k, nt, CAST(sa AS DOUBLE) / 1e3 / (nt - k) AS sp2, sb, si
        |  FROM agg),
        |t AS (
        |  SELECT k, nt, sp2,
        |    CAST(nt - k AS DOUBLE) * LN(sp2) - CAST(sb AS DOUBLE) / 1e9 AS t_raw,
        |    1.0 + (CAST(si AS DOUBLE) / 1e12 - 1.0 / (nt - k))
        |      / (3.0 * (k - 1)) AS cfac
        |  FROM s)
        |SELECT k, CAST(nt AS BIGINT) AS n_total,
        |  CAST(FLOOR(sp2 * 1e3) AS BIGINT) AS pooled_var_milli,
        |  CAST(FLOOR(t_raw * 1e3) AS BIGINT) AS t_raw_milli,
        |  CAST(FLOOR(cfac * 1e6) AS BIGINT) AS c_micro,
        |  CAST(FLOOR(t_raw / cfac * 1e3) AS BIGINT) AS t_milli
        |FROM t""".stripMargin,
    "q_stats_nemenyi" ->
      """WITH monthly AS (
        |  SELECT date_trunc('month', o_orderdate) AS m,
        |    o_orderpriority AS pri,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS v
        |  FROM orders GROUP BY 1, 2),
        |kk AS (SELECT COUNT(DISTINCT pri) AS k FROM monthly),
        |complete AS (
        |  SELECT m, pri, v, kk.k
        |  FROM (SELECT *, COUNT(*) OVER (PARTITION BY m) AS nb FROM monthly), kk
        |  WHERE nb = kk.k),
        |ranked AS (
        |  SELECT pri, k,
        |    RANK() OVER (PARTITION BY m ORDER BY v, pri) AS r
        |  FROM complete),
        |means AS (
        |  SELECT pri, MAX(k) AS k, CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |    (CAST(SUM(r) AS BIGINT) * 1000) // COUNT(*) AS mr_milli
        |  FROM ranked GROUP BY pri),
        |cd AS (
        |  SELECT MAX(k) AS kk, MAX(n_blocks) AS nn,
        |    CASE WHEN MAX(k) = 5 THEN
        |      CAST(FLOOR(2.728 * SQRT(CAST(MAX(k) * (MAX(k) + 1) AS DOUBLE)
        |        / (6.0 * MAX(n_blocks))) * 1000) AS BIGINT) END AS cd_milli
        |  FROM means)
        |SELECT a.pri AS pri_a, b.pri AS pri_b,
        |  a.mr_milli AS mr_a_milli, b.mr_milli AS mr_b_milli,
        |  abs(a.mr_milli - b.mr_milli) AS diff_milli, cd.cd_milli,
        |  abs(a.mr_milli - b.mr_milli) > cd.cd_milli AS differs_05
        |FROM means a JOIN means b ON a.pri < b.pri, cd
        |ORDER BY pri_a, pri_b""".stripMargin,
    "q_stats_friedman" ->
      """WITH monthly AS (
        |  SELECT date_trunc('month', o_orderdate) AS m,
        |    o_orderpriority AS pri,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS v
        |  FROM orders GROUP BY 1, 2),
        |kk AS (SELECT COUNT(DISTINCT pri) AS k FROM monthly),
        |complete AS (
        |  SELECT m, pri, v, kk.k
        |  FROM (SELECT *, COUNT(*) OVER (PARTITION BY m) AS nb FROM monthly), kk
        |  WHERE nb = kk.k),
        |ranked AS (
        |  SELECT pri, k,
        |    RANK() OVER (PARTITION BY m ORDER BY v, pri) AS r
        |  FROM complete),
        |sums AS (
        |  SELECT pri, MAX(k) AS k, COUNT(*) AS n_blocks,
        |    CAST(SUM(r) AS BIGINT) AS rank_sum
        |  FROM ranked GROUP BY pri),
        |stat AS (
        |  SELECT MAX(k) AS k2, MAX(n_blocks) AS nb2,
        |    SUM(rank_sum * rank_sum) AS rsq
        |  FROM sums)
        |SELECT s.pri, s.n_blocks, s.rank_sum,
        |  (s.rank_sum * 1000) // s.n_blocks AS mean_rank_milli,
        |  CAST((12000 * t.rsq) // (t.nb2 * t.k2 * (t.k2 + 1))
        |    - 3000 * t.nb2 * (t.k2 + 1) AS BIGINT) AS chi2_milli
        |FROM sums s, stat t ORDER BY s.pri""".stripMargin,
    "q_stats_paired_t" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CASE WHEN o_orderdate < DATE '1995-06-01'
        |      THEN CAST(o_totalprice AS DECIMAL(12,2)) ELSE 0 END) * 100
        |      AS BIGINT) AS h1,
        |    CAST(SUM(CASE WHEN o_orderdate >= DATE '1995-06-01'
        |      THEN CAST(o_totalprice AS DECIMAL(12,2)) ELSE 0 END) * 100
        |      AS BIGINT) AS h2,
        |    SUM(CASE WHEN o_orderdate < DATE '1995-06-01' THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN o_orderdate >= DATE '1995-06-01' THEN 1 ELSE 0 END) AS c2
        |  FROM orders GROUP BY 1),
        |d AS (
        |  SELECT (h2 - h1) // 100000 AS d
        |  FROM per WHERE c1 > 0 AND c2 > 0),
        |agg AS (
        |  SELECT COUNT(*) AS n, CAST(SUM(d) AS BIGINT) AS sd,
        |    CAST(SUM(d * d) AS BIGINT) AS sq
        |  FROM d),
        |mm AS (
        |  SELECT n, sd, CAST(sd AS DOUBLE) / n AS mean_d,
        |    (CAST(sq AS DOUBLE) / n - (CAST(sd AS DOUBLE) / n)
        |      * (CAST(sd AS DOUBLE) / n)) * n / (n - 1) AS var_d
        |  FROM agg)
        |SELECT n, sd AS sum_d_kusd,
        |  (sd * 1000) // n AS mean_d_milli,
        |  CAST(FLOOR(mean_d / sqrt(var_d / n) * 1e3) AS BIGINT) AS t_milli
        |FROM mm""".stripMargin)
}
