package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Det, Tables}

/** Round-17 additions, SURVEY §2 #468–#471 and #473: the remaining
  * canonical nonparametric/diagnostic tests the inference family
  * lacked — Wilcoxon signed-rank (the PAIRED member next to
  * Mann-Whitney's unpaired #213), Pettitt's changepoint (the
  * rank-based break locator next to CUSUM #165 / Page-Hinkley #347),
  * Kuiper's cyclic two-sample test (the circular KS variant #195
  * cannot replace on a day-of-week domain), Breusch-Pagan
  * heteroscedasticity (the regression diagnostic DW #346 doesn't
  * cover), and Cochran-Armitage (the ordered-alternative member of
  * the chi-square family #154).
  *
  * House exactness discipline throughout: integer micro/cents staging,
  * 2×midrank integers for tie-exact rank algebra (2·midrank =
  * 2·RANK + tie_count − 1, always an integer), DECIMAL(38,0)
  * accumulation, and ONE mirrored floored-double readout per z/stat.
  */
object NonparamOps {

  private val dec = DecimalType(38, 0)

  /** Daily event-value mass per type in exact integer micro — the
    * hodgesLehmann staging (InferenceOps), restricted to the two
    * compared types.
    */
  private def dailyMass(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("v"))

  /** #468 Wilcoxon signed-rank test on the paired daily (click,
    * purchase) value masses (paired on common days): d = purchase −
    * click, zeros dropped (the standard convention), |d| ranked with
    * MIDRANKS carried as the exact integer 2·midrank = 2·RANK +
    * tie_count − 1, W⁺ carried doubled (w2_plus = Σ_{d>0} 2·midrank).
    * z normalizes against E[2W⁺] = n(n+1)/2·2 /2 = n(n+1)/2 and the
    * tie-corrected variance: 48·Var(W⁺) = 2n(n+1)(2n+1) − Σ(t³−t),
    * so Var(2W⁺) = var48/12 — the Σ(t³−t) term sums per ROW as
    * (t²−1) (each tie group of size t contributes t rows × (t²−1) =
    * t³−t, no per-group pass needed).
    *
    * The paired answer Mann-Whitney (#213) can't give: same-day
    * pairing removes the between-day variance, so a consistent
    * within-day shift is detectable long before the unpaired test
    * sees it. Zero rows when no nonzero-diff common day (both
    * engines). Scale: the pair relation is calendar-bounded; global
    * windows sit above the (event_type, day) aggregate
    * (GlobalWindowSpec carrier).
    */
  def wilcoxonSigned(s: SparkSession, dir: String): DataFrame = {
    val daily = dailyMass(s, dir)
    val x = daily.filter(col("event_type") === "click")
      .select(col("day"), col("v").as("vx"))
    val y = daily.filter(col("event_type") === "purchase")
      .select(col("day"), col("v").as("vy"))
    val d = x.join(y, Seq("day"))
      .select((col("vy") - col("vx")).as("d"))
      .filter(col("d") =!= 0L)
      .withColumn("absd", abs(col("d")))
    val wRank = Window.orderBy("absd")
    val wTie = Window.partitionBy("absd")
    d.withColumn("rk", rank().over(wRank).cast("long"))
      .withColumn("t", count(lit(1)).over(wTie))
      .withColumn("m2", lit(2L) * col("rk") + col("t") - 1L)
      .groupBy(lit(1).as("g"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("d") > 0, col("m2")).otherwise(0L)).as("w2_plus"),
        sum(col("t") * col("t") - 1L).as("tie_term"))
      .select(col("n_pairs"), col("w2_plus"), col("tie_term"),
        expr("(n_pairs * (n_pairs + 1)) div 2").as("e_w2"),
        expr("2 * n_pairs * (n_pairs + 1) * (2 * n_pairs + 1) - tie_term")
          .as("var48"))
      .withColumn("z_milli",
        expr("cast(floor(cast(w2_plus - e_w2 as double) / " +
          "sqrt(cast(var48 as double) / 12.0) * 1000) as bigint)"))
      .withColumn("shift_significant_05", abs(col("z_milli")) > 1960L)
      .select("n_pairs", "w2_plus", "e_w2", "tie_term", "z_milli",
        "shift_significant_05")
  }

  /** Day-indexed global daily revenue in exact integer cents with
    * 2×midranks of v — the shared head of [[pettitt]].
    */
  private def dailyRevenueRanked(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg((sum(Det.money(col("o_totalprice"))) * 100).cast("long").as("v"))
    val wRank = Window.orderBy("v")
    val wTie = Window.partitionBy("v")
    val wSeq = Window.orderBy("day")
    daily
      .withColumn("m2", lit(2L) * rank().over(wRank).cast("long") +
        count(lit(1)).over(wTie) - 1L)
      .withColumn("t", row_number().over(wSeq).cast("long"))
  }

  /** #469 Pettitt changepoint test on the global daily revenue series:
    * U_t = Σ_{i≤t}Σ_{j>t} sgn(x_i − x_j) located via the exact midrank
    * identity U_t = Σ_{i≤t}(2R_i) − t(N+1) (the pairwise double sum
    * collapses because Σ_{j≠i} sgn(x_i−x_j) = 2R_i − (N+1) holds
    * EXACTLY under midranks, and the within-prefix part cancels by
    * antisymmetry) — so the O(N²) definition costs one rank pass plus
    * one cumulative sum. K = max_{t<N} |U_t|, break day = earliest
    * argmax; significance via the asymptotic p = 2·exp(−6K²/(N³+N²)),
    * tested at 5% by the EXACT integer cross-multiplication
    * 6K²·10⁹ > ln(40)_nano·(N³+N²) in DECIMAL (ln(1/0.025) = ln 40,
    * floored to nano = 3688879454, pinned both engines).
    *
    * The rank-based break locator next to the parametric family:
    * CUSUM (#165) needs a variance scale, Page-Hinkley (#347) a drift
    * parameter, the binary-segmentation changepoint (#293) a model —
    * Pettitt is the assumption-free "where did the level shift"
    * answer. Scale: calendar-bounded series; global windows above the
    * day aggregate (GlobalWindowSpec carrier).
    */
  def pettitt(s: SparkSession, dir: String): DataFrame = {
    val wCum = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val frame = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val u = dailyRevenueRanked(s, dir)
      .withColumn("n", count(lit(1)).over(frame))
      .withColumn("u", sum(col("m2")).over(wCum) - col("t") * (col("n") + 1L))
      .filter(col("t") < col("n"))
      .withColumn("au", abs(col("u")))
      .withColumn("k", max(col("au")).over(frame))
    u.filter(col("au") === col("k"))
      .groupBy(lit(1).as("g"))
      .agg(max(col("n")).as("n_days"), max(col("k")).as("k_stat"),
        min(col("day")).as("d0"),
        expr("min_by(u, day)").as("u_at_max"))
      .select(col("n_days"), col("k_stat"),
        date_format(col("d0"), "yyyy-MM-dd").as("break_day"),
        col("u_at_max"))
      .withColumn("change_significant_05",
        expr("cast(6 as decimal(38,0)) * k_stat * k_stat * 1000000000 > " +
          "cast(3688879454 as decimal(38,0)) * " +
          "(n_days * n_days * n_days + n_days * n_days)"))
  }

  /** #470 Kuiper two-sample test on the DAY-OF-WEEK distributions of
    * click vs purchase events: V = D⁺ + D⁻ over the 7-point CDFs —
    * the cyclic variant of KS (#195). On a circular domain KS is
    * origin-dependent (a shift past the week boundary hides mass in
    * the wrap-around); Kuiper's V is invariant to the choice of
    * origin, which is exactly what a weekday-seasonality drift check
    * needs. Weekday = (epoch days) % 7 (identical on both engines —
    * no locale-dependent dayofweek), the 7-cell grid ZERO-FILLED from
    * an explicit spine so absent cells shift no CDF step. D⁺/D⁻ ride
    * as exact cross-multiplied integers ca·n_b − cb·n_a; ppm readout
    * and the asymptotic 5% flag (crit ≈ 1.747/√n_eff, n_eff =
    * n_a·n_b/(n_a+n_b)) are each ONE mirrored floored expression,
    * NULL-guarded when either sample is empty. Scale: one 7-row
    * aggregate over a filtered scan; everything after is on 7 rows.
    */
  def kuiper(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(
        (datediff(to_date(date_trunc("day", col("ts"))), lit("1970-01-01"))
          % 7).cast("long").as("dow"),
        when(col("event_type") === "click", 1L).otherwise(0L).as("a"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("b"))
      .groupBy("dow").agg(sum(col("a")).as("a_n"), sum(col("b")).as("b_n"))
    val spine = s.range(0, 7).select(col("id").as("dow"))
    val filled = spine.join(counts, Seq("dow"), "left")
      .select(col("dow"), coalesce(col("a_n"), lit(0L)).as("a_n"),
        coalesce(col("b_n"), lit(0L)).as("b_n"))
    val wCum = Window.orderBy("dow")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val frame = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    filled
      .withColumn("ca", sum(col("a_n")).over(wCum))
      .withColumn("cb", sum(col("b_n")).over(wCum))
      .withColumn("na", sum(col("a_n")).over(frame))
      .withColumn("nb", sum(col("b_n")).over(frame))
      .groupBy(lit(1).as("g"))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        max(col("ca") * col("nb") - col("cb") * col("na")).as("d_plus_num"),
        max(col("cb") * col("na") - col("ca") * col("nb")).as("d_minus_num"))
      // one-sided maxima are >= 0 (both CDFs end equal at the last cell)
      .select(col("n_a"), col("n_b"), col("d_plus_num"), col("d_minus_num"),
        expr("CASE WHEN n_a > 0 AND n_b > 0 THEN " +
          "((d_plus_num + d_minus_num) * 1000000) div (n_a * n_b) END")
          .as("v_ppm"))
      .withColumn("crit_ppm",
        expr("CASE WHEN n_a > 0 AND n_b > 0 THEN " +
          "cast(floor(1747000 / sqrt(cast(n_a as double) * n_b / " +
          "(n_a + n_b))) as bigint) END"))
      .withColumn("cyclic_drift_05", col("v_ppm") > col("crit_ppm"))
  }

  /** #471 Breusch-Pagan heteroscedasticity test on the daily-revenue
    * trend regression: OLS of daily cents y on the day index t, then
    * BP = n·R² of the auxiliary regression of the squared residuals
    * on t — the "does the variance drift with the trend" diagnostic
    * Durbin-Watson (#346, serial correlation) doesn't cover, and the
    * precondition check for every equal-variance test downstream
    * (#321/#391). χ²₁ 5% critical = 3.841.
    *
    * Exactness staging: the residual numerator E_t = y_t·D − (Sy·Stt −
    * St·Sty) − b_num·t is EXACT DECIMAL (D = n·Stt − St², b_num =
    * n·Sty − St·Sy), floored ONCE to cents via div D, then downscaled
    * div 1000 (residuals in 10-dollar units — keeps Σw⁴ inside
    * DECIMAL(38,0) at any realistic daily magnitude; BP is
    * scale-invariant up to the shared flooring, which both engines
    * apply identically). The auxiliary R² then reads from five exact
    * integer sums; the ONE floored-double readout mirrors the
    * expression order verbatim (the #370 JB pattern), with the DuckDB
    * twin casting its HUGEINT sums through VARCHAR (the Det
    * decimal→double caveat). Zero-variance guard: NULL when the
    * squared residuals are constant. Scale: calendar-bounded series;
    * one day aggregate is the only corpus-sized job.
    */
  def breuschPagan(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg((sum(Det.money(col("o_totalprice"))) * 100).cast("long").as("v"))
    val wSeq = Window.orderBy("day")
    val frame = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val idx = daily
      .withColumn("t", (row_number().over(wSeq) - 1).cast("long"))
      .withColumn("n", count(lit(1)).over(frame))
      .withColumn("st", sum(col("t")).over(frame))
      .withColumn("stt", sum(col("t") * col("t")).over(frame))
      .withColumn("sy", sum(col("v").cast(dec)).over(frame))
      .withColumn("sty", sum(col("t").cast(dec) * col("v")).over(frame))
    val resid = idx
      .withColumn("dd", (col("n") * col("stt") - col("st") * col("st")).cast(dec))
      .withColumn("bnum", col("n").cast(dec) * col("sty") - col("st").cast(dec) * col("sy"))
      .withColumn("anum", col("sy") * col("stt") - col("st").cast(dec) * col("sty"))
      .withColumn("w",
        expr("((v * dd - anum - bnum * t) div dd) div 1000"))
    resid
      .groupBy(lit(1).as("g"))
      .agg(max(col("n")).as("n_days"), max(col("st")).as("st"),
        max(col("stt")).as("stt"),
        // first factor staged through DECIMAL to match the twin's
        // CAST(w AS HUGEINT) * w — int64 w·w wraps past |w| ~ 3e9
        sum(col("w").cast(dec) * col("w")).as("sw2"),
        sum((col("t") * col("w")).cast(dec) * col("w")).as("stw2"),
        sum((col("w") * col("w")).cast(dec) * col("w") * col("w")).as("sw4"))
      .select(col("n_days"), col("sw2").cast("long").as("s_w2"),
        (col("n_days") * col("stt") - col("st") * col("st")).as("var_t"),
        (col("n_days").cast(dec) * col("stw2") -
          col("st").cast(dec) * col("sw2")).as("cov"),
        (col("n_days").cast(dec) * col("sw4") -
          col("sw2").cast(dec) * col("sw2")).as("var_w2"))
      .withColumn("bp_milli",
        expr("CASE WHEN var_w2 > 0 THEN cast(floor(" +
          "cast(cov as double) * cast(cov as double) / " +
          "(cast(var_t as double) * cast(var_w2 as double)) " +
          "* n_days * 1000) as bigint) END"))
      .select(col("n_days"), col("s_w2"), col("bp_milli"),
        (col("bp_milli") > 3841L).as("het_significant_05"))
  }

  /** #473 Cochran-Armitage trend test: does the LATE-SHIPMENT rate of
    * lineitems (the fixture has no commitdate, so "late" = shipped more
    * than 30 days after the order date — the #114 q_sql_late_lines
    * convention) trend monotonically across the five ORDERED priority
    * classes of their parent orders? Scores s_g = the priority digit;
    * T_c·N = N·Σs_g x_g − X·Σs_g n_g exact int64; z = T_c/√Var with
    * Var = p(1−p)[Σn s² − (Σn s)²/N] — assembled as ONE mirrored
    * floored-double expression over five exact integer sums (each
    * inside int64; only the final product crosses 2^53, identically
    * rounded on both engines by the shared expression order).
    *
    * The ordered-alternative member of the χ² family: #154's
    * independence test spends its power across ALL deviation
    * patterns; CA concentrates on the monotone one, the actual
    * operational question ("do urgent orders ship less late, "
    * "monotonically?"). Scale: one equi-join lineitem⋈orders on the
    * order key (both corpus-sized, shuffle-partitioned; AQE picks
    * broadcast when orders fits) into a 5-row aggregate.
    */
  def cochranArmitage(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.orders(s, dir)
      .select(col("o_orderkey").as("okey"), col("o_orderdate"),
        substring(col("o_orderpriority"), 1, 1).cast("long").as("sg"))
    Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("okey"), col("l_shipdate"))
      .join(g, Seq("okey"))
      .select(col("sg"),
        when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
          1L).otherwise(0L).as("late"))
      .groupBy("sg")
      .agg(count(lit(1)).as("n_g"), sum(col("late")).as("x_g"))
      .groupBy(lit(1).as("gg"))
      .agg(sum(col("n_g")).as("n"), sum(col("x_g")).as("x"),
        sum(col("sg") * col("n_g")).as("sns"),
        sum(col("sg") * col("sg") * col("n_g")).as("snss"),
        sum(col("sg") * col("x_g")).as("ssx"))
      .select(col("n").as("n_lines"), col("x").as("n_late"),
        (col("n") * col("ssx") - col("x") * col("sns")).as("t_num"),
        col("n"), col("x"), col("sns"), col("snss"))
      // degenerate guard: an all-late or no-late corpus (or a single
      // priority class) has zero trend variance — NULL z, mirrored
      .withColumn("z_milli",
        expr("CASE WHEN x > 0 AND x < n AND n * snss - sns * sns > 0 THEN " +
          "cast(floor(cast(t_num as double) / sqrt(" +
          "cast(x as double) * (n - x) * (n * snss - sns * sns) / n) " +
          "* 1000) as bigint) END"))
      .select(col("n_lines"), col("n_late"), col("t_num"), col("z_milli"),
        (abs(col("z_milli")) > 1960L).as("trend_significant_05"))
  }

  /** #475 Jonckheere-Terpstra ordered-alternative test: do lineitem
    * quantities shift monotonically across the five ORDERED priority
    * classes? JT = Σ_{i<j} U_ij carried DOUBLED (jt_x2 = Σ over group
    * pairs of 2·#{x<y} + #{x=y}, an exact integer), E[2JT] =
    * (N² − Σn_g²)/2, and the FULL tie-corrected null variance
    * (Hollander-Wolfe): 72·Var's three terms A, B, C assembled from
    * exact group (n_g) and pooled-value (t_u) tie counts in
    * DECIMAL(38,0), the single z readout in mirrored double order
    * (DuckDB HUGEINTs through VARCHAR — the Det cast caveat).
    *
    * WHY next to #315/#473: Kruskal-Wallis (#315) spends its power on
    * ANY group difference; CA (#473) orders a binary rate; JT is the
    * ordered test for a full ordinal response — the "does quantity
    * drift with priority" question a mixture designer actually asks.
    * Scale: the corpus-sized work is one join + one (group, value)
    * grid aggregate (≤ 5·50 cells — quantity is a bounded small int);
    * the pair algebra runs on the ≤250-row grid's self-join.
    */
  def jonckheere(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.orders(s, dir)
      .select(col("o_orderkey").as("okey"),
        substring(col("o_orderpriority"), 1, 1).cast("long").as("sg"))
    val cells = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("okey"),
        col("l_quantity").cast("long").as("q"))
      .join(g, Seq("okey"))
      .groupBy("sg", "q").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val jt2 = cells.as("a")
      .join(broadcast(cells.as("b")), col("a.sg") < col("b.sg"))
      .select((col("a.c") * col("b.c") *
        (when(col("a.q") < col("b.q"), 2L)
          .when(col("a.q") === col("b.q"), 1L).otherwise(0L))).as("term"))
      .agg(sum(col("term")).as("jt_x2"))
    val grp = cells.groupBy("sg").agg(sum(col("c")).as("n_g"))
      .agg(sum(col("n_g")).as("n"),
        sum(col("n_g") * col("n_g")).as("sn2"),
        sum((col("n_g") * (col("n_g") - 1L)).cast(dec) *
          (lit(2L) * col("n_g") + 5L)).as("ga"),
        sum((col("n_g") * (col("n_g") - 1L)).cast(dec) *
          (col("n_g") - 2L)).as("gb"),
        sum(col("n_g") * (col("n_g") - 1L)).as("gc"))
    val tie = cells.groupBy("q").agg(sum(col("c")).as("t_u"))
      .agg(sum((col("t_u") * (col("t_u") - 1L)).cast(dec) *
          (lit(2L) * col("t_u") + 5L)).as("ta"),
        sum((col("t_u") * (col("t_u") - 1L)).cast(dec) *
          (col("t_u") - 2L)).as("tb"),
        sum(col("t_u") * (col("t_u") - 1L)).as("tc"))
    jt2.crossJoin(broadcast(grp)).crossJoin(broadcast(tie))
      .select(col("n").as("n_lines"), col("jt_x2"),
        expr("(n * n - sn2) div 2").as("e_jt_x2"),
        (col("n").cast(dec) * (col("n") - 1L) * (lit(2L) * col("n") + 5L) -
          col("ga") - col("ta")).as("va"),
        (col("gb") * col("tb")).as("vb"),
        (col("gc").cast(dec) * col("tc")).as("vc"), col("n"))
      .withColumn("v72",
        expr("cast(va as double) / 72.0 + " +
          "cast(vb as double) / (36.0 * n * (n - 1) * (n - 2)) + " +
          "cast(vc as double) / (8.0 * n * (n - 1))"))
      // zero-variance guard (the Chow/BP CASE pattern): all-tied data
      // (or n ≤ 2 groups' worth of rows) makes the null variance 0, so
      // z divides by zero — NULL readout, mirrored in the twin
      .withColumn("z_milli",
        expr("CASE WHEN n > 2 AND v72 > 0 THEN " +
          "cast(floor(cast(jt_x2 - e_jt_x2 as double) / (2.0 * sqrt(v72)) " +
          "* 1000) as bigint) END"))
      .select(col("n_lines"), col("jt_x2"), col("e_jt_x2"), col("z_milli"),
        (abs(col("z_milli")) > 1960L).as("trend_significant_05"))
  }

  /** #501 Somers' D (with Goodman-Kruskal gamma alongside) for the
    * ordinal priority → quantity association: D_yx = (C − D)/(C + D +
    * T_y) over all cross-priority lineitem pairs — concordant,
    * discordant, and response-tied pair masses assembled EXACTLY from
    * the same ≤ 5·50-cell (priority, quantity) grid as #475. WHY next
    * to #475: Jonckheere answers "IS there an ordered shift" (a test);
    * Somers' D is the EFFECT SIZE that survives the answer — the
    * probability-scale asymmetric association (predictor = priority,
    * response = quantity) a mixture designer reports once JT rejects,
    * and gamma is its tie-agnostic companion (the two bracketing how
    * much the tie mass dilutes the signal).
    *
    * Exactness: every pair mass is Σ c_a·c_b with the first factor
    * staged through DECIMAL(38,0) (HUGEINT in the twin — C ~ N²/4
    * wraps int64 past ~6e9 lines); the two readouts are ONE truncating
    * ppm division each, CASE-guarded for the degenerate single-group /
    * all-tied corpus (NULL, mirrored). Counts emit as BIGINT —
    * documented envelope: exact to ~9e18 pairs, i.e. ~4e9 lines.
    * Scale: one join + grid aggregate is the corpus-sized work; the
    * pair algebra runs on the ≤250-row grid's broadcast self-join.
    */
  def somersD(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.orders(s, dir)
      .select(col("o_orderkey").as("okey"),
        substring(col("o_orderpriority"), 1, 1).cast("long").as("sg"))
    val cells = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("okey"),
        col("l_quantity").cast("long").as("q"))
      .join(g, Seq("okey"))
      .groupBy("sg", "q").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    cells.as("a")
      .join(broadcast(cells.as("b")), col("a.sg") < col("b.sg"))
      .select((col("a.c").cast(dec) * col("b.c")).as("w"),
        col("a.q").as("qa"), col("b.q").as("qb"))
      .groupBy(lit(1).as("gg"))
      .agg(sum(when(col("qa") < col("qb"), col("w"))).as("nc"),
        sum(when(col("qa") > col("qb"), col("w"))).as("nd"),
        sum(when(col("qa") === col("qb"), col("w"))).as("ty"))
      .select(col("nc").cast("long").as("concordant"),
        col("nd").cast("long").as("discordant"),
        col("ty").cast("long").as("ties_y"),
        expr("CASE WHEN nc + nd + ty > 0 THEN " +
          "cast(((nc - nd) * 1000000) div (nc + nd + ty) as long) END")
          .as("somers_d_ppm"),
        expr("CASE WHEN nc + nd > 0 THEN " +
          "cast(((nc - nd) * 1000000) div (nc + nd) as long) END")
          .as("gamma_ppm"))
  }

  /** #476 Chow structural-break test on the daily-revenue trend OLS at
    * the calendar midpoint (h = N div 2): F = ((SSE_pooled − SSE₁ −
    * SSE₂)/2) / ((SSE₁+SSE₂)/(N−4)) — did the level/slope regime
    * CHANGE where Pettitt (#469) locates a shift? The two are the
    * planned pair: the rank test finds the break day model-free, the
    * Chow F quantifies it against the linear model at a FIXED split
    * (here the midpoint, so the test stays a pure corpus function).
    *
    * Per-segment sums (m, St, Stt int64; Sy, Syy, Sty DECIMAL) are
    * exact; each SSE evaluates in double with the expression order
    * mirrored VERBATIM (Syy − Sy²/m − (Sty − St·Sy/m)²/(Stt − St²/m),
    * the #370 JB pattern; DuckDB HUGEINTs through VARCHAR); the flag
    * uses the asymptotic χ²₂/2 5% bound (f > 2.996), stated as such.
    * NULL-guarded for N < 5 or degenerate segments. Scale:
    * calendar-bounded; one day aggregate is the corpus-sized job.
    */
  def chow(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg((sum(Det.money(col("o_totalprice"))) * 100).cast("long").as("v"))
    val wSeq = Window.orderBy("day")
    val frame = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val idx = daily
      .withColumn("t", (row_number().over(wSeq) - 1).cast("long"))
      .withColumn("n", count(lit(1)).over(frame))
      .withColumn("seg", when(col("t") < expr("n div 2"), 0L).otherwise(1L))
    def sums(df: DataFrame) = df.agg(
      count(lit(1)).as("m"), sum(col("t")).as("st"),
      sum(col("t") * col("t")).as("stt"),
      sum(col("v").cast(dec)).as("sy"),
      sum(col("v").cast(dec) * col("v")).as("syy"),
      sum(col("t").cast(dec) * col("v")).as("sty"))
    val sseExpr = "cast(syy as double) - cast(sy as double) * " +
      "cast(sy as double) / m - (cast(sty as double) - st * " +
      "cast(sy as double) / m) * (cast(sty as double) - st * " +
      "cast(sy as double) / m) / (cast(stt as double) - " +
      "cast(st as double) * st / m)"
    def sseOf(df: DataFrame, name: String) =
      sums(df).select(col("m").as(s"m_$name"),
        expr(sseExpr).as(s"sse_$name"))
    sseOf(idx, "p")
      .crossJoin(broadcast(sseOf(idx.filter(col("seg") === 0L), "1")))
      .crossJoin(broadcast(sseOf(idx.filter(col("seg") === 1L), "2")))
      .select(col("m_p").as("n_days"), col("m_1").as("n_seg1"),
        col("sse_p"), col("sse_1"), col("sse_2"))
      .withColumn("f_milli",
        expr("CASE WHEN n_days >= 5 AND sse_1 + sse_2 > 0 THEN " +
          "cast(floor(((sse_p - sse_1 - sse_2) / 2.0) / " +
          "((sse_1 + sse_2) / (n_days - 4.0)) * 1000) as bigint) END"))
      .select(col("n_days"), col("n_seg1"), col("f_milli"),
        (col("f_milli") > 2996L).as("break_significant_05"))
  }

  /** Joined lineitem rows with priority score and late flag — the
    * shared head of [[cochranArmitage]], [[mantelHaenszel]] and
    * [[cohensH]] (the #114 late convention).
    */
  private def lateByPriority(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.orders(s, dir)
      .select(col("o_orderkey").as("okey"), col("o_orderdate"),
        substring(col("o_orderpriority"), 1, 1).cast("long").as("sg"),
        year(col("o_orderdate")).cast("long").as("yr"))
    Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("okey"), col("l_shipdate"))
      .join(g, Seq("okey"))
      .select(col("sg"), col("yr"),
        when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
          1L).otherwise(0L).as("late"))
  }

  /** #484 Mantel-Haenszel common odds ratio across ORDER-YEAR strata:
    * exposure = high priority (digit ≤ 2), outcome = late shipment;
    * OR_MH = Σ(a_k d_k/n_k) / Σ(b_k c_k/n_k) with each per-stratum
    * term floored ONCE at 1e6 scale (a·d·1e6 div n — documented
    * staging, mirrored), the ratio ONE more milli division; the
    * POOLED odds ratio (collapsing strata) rides alongside — the
    * Simpson's-paradox probe: pooled ≉ MH means year is a confounder
    * and every unstratified late-rate readout upstream is suspect.
    *
    * WHY next to #473/#154: CA tests the monotone trend, χ² the
    * association — MH is the CONFOUNDER-ADJUSTED effect size, the
    * first thing an analyst computes when a rate comparison spans a
    * time-varying mix. Scale: one join + a |years|×2×2-bounded
    * aggregate.
    */
  def mantelHaenszel(s: SparkSession, dir: String): DataFrame =
    lateByPriority(s, dir)
      .select(col("yr"), (col("sg") <= 2L).as("exp"), col("late"))
      .groupBy("yr")
      .agg(sum(when(col("exp") && col("late") === 1L, 1L).otherwise(0L)).as("a"),
        sum(when(col("exp") && col("late") === 0L, 1L).otherwise(0L)).as("b"),
        sum(when(!col("exp") && col("late") === 1L, 1L).otherwise(0L)).as("c"),
        sum(when(!col("exp") && col("late") === 0L, 1L).otherwise(0L)).as("d"))
      .select(col("yr"), col("a"), col("b"), col("c"), col("d"),
        (col("a") + col("b") + col("c") + col("d")).as("n"))
      .groupBy(lit(1).as("g"))
      .agg(count(lit(1)).as("n_strata"),
        sum(expr("(a * d * 1000000) div n")).as("r_e6"),
        sum(expr("(b * c * 1000000) div n")).as("s_e6"),
        sum(col("a")).as("sa"), sum(col("b")).as("sb"),
        sum(col("c")).as("sc"), sum(col("d")).as("sd"))
      .select(col("n_strata"),
        expr("CASE WHEN s_e6 > 0 THEN (r_e6 * 1000) div s_e6 END")
          .as("or_mh_milli"),
        expr("CASE WHEN sb * sc > 0 THEN " +
          "(cast(sa as decimal(38,0)) * sd * 1000) div " +
          "(cast(sb as decimal(38,0)) * sc) END").cast("long")
          .as("or_pooled_milli"))

  /** #486 Cohen's h effect size between the late-shipment PROPORTIONS
    * of the most urgent (digit 1) and least urgent (digit 5) priority
    * classes: h = 2·arcsin√p₁ − 2·arcsin√p₂ — the variance-stabilized
    * proportion difference whose magnitude is comparable ACROSS
    * baseline rates (a 5-point gap means different things at p=0.5 vs
    * p=0.02; h doesn't). Completes the effect-size shelf: #316
    * Cohen's d (means), #438 Cliff's delta (ordinal), h (proportions)
    * — the numbers a decision memo quotes AFTER #273's z says
    * "significant". One mirrored floored-double readout over four
    * exact integer counts; conventional |h| ≥ 0.2 "at least small"
    * flag. Scale: one join + a 2-row aggregate.
    */
  def cohensH(s: SparkSession, dir: String): DataFrame =
    lateByPriority(s, dir)
      .filter(col("sg") === 1L || col("sg") === 5L)
      .groupBy(lit(1).as("g"))
      .agg(sum(when(col("sg") === 1L, 1L).otherwise(0L)).as("n1"),
        sum(when(col("sg") === 1L, col("late")).otherwise(0L)).as("x1"),
        sum(when(col("sg") === 5L, 1L).otherwise(0L)).as("n2"),
        sum(when(col("sg") === 5L, col("late")).otherwise(0L)).as("x2"))
      .select(col("n1"), col("x1"), col("n2"), col("x2"))
      .withColumn("h_milli",
        expr("CASE WHEN n1 > 0 AND n2 > 0 THEN " +
          "cast(floor((2 * asin(sqrt(cast(x1 as double) / n1)) - " +
          "2 * asin(sqrt(cast(x2 as double) / n2))) * 1000) as bigint) END"))
      .withColumn("at_least_small_effect", abs(col("h_milli")) >= 200L)

  /** #490 Distribution-free median confidence interval for the daily
    * revenue level, via binomial order statistics: the 95% CI is
    * [x₍ₗ₎, x₍ᵤ₎] with l = floor((n − 1.96·√n)/2) clamped to ≥ 1 and
    * u = n + 1 − l (the symmetric sign-test inversion — no normality,
    * no variance estimate, EXACT order-statistic picks under the
    * (v, day) total order). The median itself rides as the #456
    * lo/hi/point convention. The interval the point estimators leave
    * open: #173 gives a weighted median, #456 the shift's point
    * estimate — this says how UNCERTAIN the level's center is, in
    * value units, robust to the revenue series' heavy tail. l/u are
    * the ONLY floored doubles (identical expression both engines);
    * everything else is rank filtering. Scale: calendar-bounded;
    * global windows above the day aggregate (GlobalWindowSpec
    * carrier).
    */
  def medianCi(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg((sum(Det.money(col("o_totalprice"))) * 100).cast("long").as("v"))
    val w = Window.orderBy("v", "day")
    val frame = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    daily
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(frame))
      .withColumn("l",
        expr("greatest(1L, cast(floor((n - 1.96 * sqrt(cast(n as double))) " +
          "/ 2) as bigint))"))
      .withColumn("u", col("n") + 1L - col("l"))
      .filter(col("r") === col("l") || col("r") === col("u") ||
        col("r") === expr("(n + 1) div 2") || col("r") === expr("(n + 2) div 2"))
      .groupBy(lit(1).as("g"))
      .agg(max(col("n")).as("n_days"), max(col("l")).as("l_rank"),
        max(col("u")).as("u_rank"),
        min(when(col("r") === col("l"), col("v"))).as("ci_lo"),
        max(when(col("r") === col("u"), col("v"))).as("ci_hi"),
        min(when(col("r") === expr("(n + 1) div 2"), col("v"))).as("med_lo"),
        max(when(col("r") === expr("(n + 2) div 2"), col("v"))).as("med_hi"))
      .select(col("n_days"), col("l_rank"), col("u_rank"),
        col("ci_lo"), col("ci_hi"),
        expr("(med_lo + med_hi) div 2").as("median_cents"))
  }

  /** #492 AR(1) mean-reversion half-life of the daily revenue level:
    * regress Δy_t on y_{t−1} (the discrete Ornstein-Uhlenbeck fit),
    * φ = 1 + b, half-life = −ln 2 / ln φ in milli-days — the SPEED
    * quantification the stationarity family only gates on: #311 ADF
    * says WHETHER the level mean-reverts, #322 Hurst says in which
    * regime, this says HOW FAST a shock decays, the number a
    * forecasting horizon or an anomaly-recovery SLA actually uses.
    * Exact integer/DECIMAL sums (m, Σx, Σy, Σxy, Σx² with x = lagged
    * cents, y = Δ); b and the half-life are ONE mirrored-double chain
    * (HUGEINT via VARCHAR in the twin); NULL unless 0 < φ < 1 (a
    * negative φ oscillates rather than decays monotonically, φ ≥ 1
    * never reverts ⇒ no half-life either way, stated). Scale: calendar-bounded;
    * one lag window above the day aggregate.
    */
  def tsHalflife(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg((sum(Det.money(col("o_totalprice"))) * 100).cast("long").as("v"))
    val w = Window.orderBy("day")
    daily
      .withColumn("pv", lag(col("v"), 1).over(w))
      .filter(col("pv").isNotNull)
      .select(col("pv").as("x"), (col("v") - col("pv")).as("y"))
      .groupBy(lit(1).as("g"))
      .agg(count(lit(1)).as("m"),
        sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
        sum(col("x").cast(dec) * col("y")).as("sxy"),
        sum(col("x").cast(dec) * col("x")).as("sxx"))
      .select(col("m").as("n_days"),
        expr("cast(floor((cast(m as double) * cast(sxy as double) - " +
          "cast(sx as double) * cast(sy as double)) / " +
          "(cast(m as double) * cast(sxx as double) - " +
          "cast(sx as double) * cast(sx as double)) * 1000000) as bigint)")
          .as("b_ppm"), col("m"), col("sx"), col("sy"), col("sxy"), col("sxx"))
      .withColumn("phi_ppm", col("b_ppm") + 1000000L)
      // half-life is defined for monotone decay only: 0 < φ < 1 (a
      // negative φ oscillates, φ ≥ 1 never reverts) — NULL otherwise
      .withColumn("halflife_milli",
        expr("CASE WHEN phi_ppm > 0 AND phi_ppm < 1000000 THEN " +
          "cast(floor(-ln(2.0) / ln(cast(phi_ppm as double) / 1e6) " +
          "* 1000) as bigint) END"))
      .select("n_days", "b_ppm", "phi_ppm", "halflife_milli")
  }

  /** #502 ARCH(1) LM test on the daily ln-revenue returns: is today's
    * squared return predicted by yesterday's — volatility CLUSTERING —
    * LM = n·R² of the lag-1 regression of y_t = r²_t on y_{t−1}, χ²₁
    * 5% flag at 3.841 (Engle 1982, one lag). WHY next to the vol
    * family: #462/#459/#463 ESTIMATE per-day volatility and #492 times
    * mean reversion of the LEVEL; none asks whether variance itself is
    * autocorrelated — the property that decides if a constant-variance
    * anomaly threshold (#312 z-scores, #327 ATR bands) is even valid.
    * LM rejecting says thresholds must be conditional (EWVAR #391).
    *
    * Exactness: r_t = ⌊ln v_t·10⁹⌋ − ⌊ln v_{t−1}·10⁹⌋ (exact integer
    * difference of house nano-lns); y = (r·r) div 10⁶ exact (re-staged
    * through DECIMAL before the square — nano r² wraps int64); the six
    * regression sums are pure DECIMAL; R² is ONE mirrored double chain
    * (HUGEINTs through VARCHAR in the twin), NULL-guarded for
    * zero-variance series. Scale: calendar-bounded — the day aggregate
    * is the only corpus-sized job; one lag window above it.
    */
  def tsArchLm(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg((sum(Det.money(col("o_totalprice"))) * 100).cast("long").as("v"))
      .filter(col("v") > 0)
    val w = Window.orderBy("day")
    daily
      .withColumn("lnv", floor(log(col("v").cast("double")) * 1e9).cast("long"))
      .withColumn("r", col("lnv") - lag(col("lnv"), 1).over(w))
      .filter(col("r").isNotNull)
      .withColumn("y", expr("(cast(r as decimal(38,0)) * r) div 1000000"))
      .withColumn("x", lag(col("y"), 1).over(w))
      .filter(col("x").isNotNull)
      .groupBy(lit(1).as("g"))
      .agg(count(lit(1)).as("m"),
        sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
        sum(col("x").cast(dec) * col("y")).as("sxy"),
        sum(col("x").cast(dec) * col("x")).as("sxx"),
        sum(col("y").cast(dec) * col("y")).as("syy"))
      .select(col("m").as("n_pairs"),
        (col("m").cast(dec) * col("sxy") - col("sx") * col("sy")).as("cnum"),
        (col("m").cast(dec) * col("sxx") - col("sx") * col("sx")).as("vx"),
        (col("m").cast(dec) * col("syy") - col("sy") * col("sy")).as("vy"),
        col("m"))
      .withColumn("lm_milli",
        expr("CASE WHEN vx > 0 AND vy > 0 THEN " +
          "cast(floor(cast(cnum as double) * cast(cnum as double) / " +
          "(cast(vx as double) * cast(vy as double)) * m * 1000) as bigint) " +
          "END"))
      .select(col("n_pairs"), col("lm_milli"),
        (col("lm_milli") > 3841L).as("arch_effect_05"))
  }

  /** #510 CUSUM-of-squares (Inclán–Tiao) variance-change locator on
    * the daily ln-revenue returns: S_k = Σ_{t≤k} r²_t / Σ r², D =
    * max_k |S_k − k/n| with the argmax day — WHERE the variance regime
    * changed. WHY next to #502/#469: ARCH LM (#502) says variance is
    * serially dependent, Pettitt (#469) locates a LEVEL shift
    * rank-free; CUSUMSQ is the matching locator for a VOLATILITY
    * break — the day a monitoring threshold (#312/#391) should be
    * re-based from. 5% flag via the Inclán–Tiao normalization
    * √(n/2)·D > 1.358 (asymptotic Brownian-bridge band, stated).
    *
    * Exactness: the #502 return staging verbatim (exact nano-ln
    * differences, y = r² div 10⁶); the deviation is the CROSS-
    * MULTIPLIED exact integer |cum_k·n − k·T| (the #451 pattern — no
    * per-k division), ONE terminal ppm division, argmax day earliest
    * on ties (the Zipf-GOF WHERE dev = max convention); the flag's
    * √(n/2) is one mirrored double. Scale: calendar-bounded — the day
    * aggregate is the only corpus-sized job; the cumulative window
    * rides the bounded day relation.
    */
  def tsCusumSq(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg((sum(Det.money(col("o_totalprice"))) * 100).cast("long").as("v"))
      .filter(col("v") > 0)
    val w = Window.orderBy("day")
    val cum = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ys = daily
      .withColumn("lnv", floor(log(col("v").cast("double")) * 1e9).cast("long"))
      .withColumn("r", col("lnv") - lag(col("lnv"), 1).over(w))
      .filter(col("r").isNotNull)
      .withColumn("y", expr("(cast(r as decimal(38,0)) * r) div 1000000"))
      .withColumn("k", row_number().over(w).cast("long"))
      .withColumn("cy", sum(col("y").cast(dec)).over(cum))
      .localCheckpoint()
    val tot = ys.agg(max(col("k")).as("n"), sum(col("y").cast(dec)).as("t"))
    val dev = ys.crossJoin(broadcast(tot))
      .select(col("day"), col("k"), col("n"), col("t"),
        abs(col("cy") * col("n") - col("t") * col("k")).as("d"))
      .localCheckpoint()
    val dmax = dev.agg(max(col("d")).as("dm"))
    dev.crossJoin(broadcast(dmax))
      .filter(col("d") === col("dm"))
      .groupBy(lit(1).as("g"))
      .agg(max(col("n")).as("n_returns"),
        min(col("k")).as("break_k"),
        min(date_format(col("day"), "yyyy-MM-dd")).as("break_day"),
        max(col("dm")).as("dm"), max(col("n")).as("n"), max(col("t")).as("t"))
      .select(col("n_returns"), col("break_k"), col("break_day"),
        expr("CASE WHEN t > 0 THEN " +
          "cast((dm * 1000000) div (cast(n as decimal(38,0)) * t) as long) " +
          "END").as("d_ppm"))
      .withColumn("variance_break_05",
        expr("cast(floor(sqrt(cast(n_returns as double) / 2.0) * d_ppm) " +
          "as bigint) > 1358000"))
  }

  /** #495 Welch's ANOVA on lineitem quantity across the three return
    * flags: the unequal-variance k-group test #226's classic ANOVA
    * assumes away (and #321 Levene only GATES on) — weights w_j =
    * n_j/s²_j, F* = [Σw(x̄−x̄_w)²/(k−1)] / [1 + 2(k−2)/(k²−1)·Λ],
    * Welch-Satterthwaite df₂ = (k²−1)/(3Λ). Determinism discipline:
    * per-group sums are exact integers; the THREE-GROUP reductions are
    * PIVOTED into one row and summed in WRITTEN order (A + N + R) —
    * never a float SUM aggregate, whose partial-aggregation order
    * would diverge between engines and partitionings; the flag set is
    * pinned to {A, N, R} (asserted by the n_a/n_n/n_r columns being
    * non-null). 5% flag via the large-sample χ²₂/2 bound (stated).
    * Scale: one map-side-combined 3-row aggregate; the algebra runs
    * on one row.
    */
  def welchAnova(s: SparkSession, dir: String): DataFrame = {
    val q = col("l_quantity").cast("long")
    val g = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag").as("flag"))
      .agg(count(lit(1)).as("n"), sum(q.cast(dec)).as("s1"),
        sum((q * q).cast(dec)).as("s2"))
    def pick(f: String, c: String) = max(when(col("flag") === f, col(c)))
    val one = g.groupBy(lit(1).as("g"))
      .agg(pick("A", "n").as("n_a"), pick("A", "s1").as("s1_a"),
        pick("A", "s2").as("s2_a"),
        pick("N", "n").as("n_n"), pick("N", "s1").as("s1_n"),
        pick("N", "s2").as("s2_n"),
        pick("R", "n").as("n_r"), pick("R", "s1").as("s1_r"),
        pick("R", "s2").as("s2_r"))
    one
      .withColumn("f_milli", expr(WelchExprs.fMilli))
      .withColumn("df2_milli", expr(WelchExprs.df2Milli))
      .select(col("n_a"), col("n_n"), col("n_r"), col("f_milli"),
        col("df2_milli"),
        (col("f_milli") > 2995L).as("variance_unequal_means_differ_05"))
  }

  /** #496 Circular mean + Rayleigh uniformity test of CLICK arrivals
    * over the day-of-week circle: resultant components C = Σ n_d·cos θ_d,
    * S = Σ n_d·sin θ_d with θ_d = 2π·d/7 (d = epoch-days % 7, the #470
    * convention) — trig evaluated ONCE per cell (7 values) and floored
    * to nano, so C and S are exact integer combinations of exact
    * counts; Rayleigh z = (C² + S²)/n via DECIMAL, mean direction via
    * one mirrored atan2. The parametric companion of Kuiper (#470):
    * Kuiper detects ANY cyclic difference between two samples, Rayleigh
    * tests ONE sample against uniformity and hands back the mean
    * direction — "is there a preferred weekday, and which" — the
    * readout a send-time/capacity decision actually uses. 5% flag at
    * z > ln 20 (p = e^(−z)). Scale: one 7-row aggregate over a
    * filtered scan.
    */
  def rayleigh(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_type") === "click")
      .select((datediff(to_date(date_trunc("day", col("ts"))),
        lit("1970-01-01")) % 7).cast("long").as("dow"))
      .groupBy("dow").agg(count(lit(1)).as("n_d"))
      .select(col("n_d"),
        expr("cast(floor(cos(2 * pi() * dow / 7) * 1e9) as bigint)").as("cn"),
        expr("cast(floor(sin(2 * pi() * dow / 7) * 1e9) as bigint)").as("sn"))
      .groupBy(lit(1).as("g"))
      .agg(sum(col("n_d")).as("n_events"),
        sum(col("n_d") * col("cn")).as("c_nano"),
        sum(col("n_d") * col("sn")).as("s_nano"))
      .select(col("n_events"), col("c_nano"), col("s_nano"),
        expr("cast((cast(c_nano as decimal(38,0)) * c_nano + " +
          "cast(s_nano as decimal(38,0)) * s_nano) div " +
          "(cast(n_events as decimal(38,0)) * 1000000000000000) as long)")
          .as("z_milli"),
        expr("cast(floor(atan2(cast(s_nano as double), " +
          "cast(c_nano as double)) * 1000) as bigint)").as("mean_dir_milli"))
      .withColumn("weekday_preference_05", col("z_milli") > 2995L)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stats_rayleigh" -> (rayleigh _),
    "q_stats_welch_anova" -> (welchAnova _),
    "q_stats_median_ci" -> (medianCi _),
    "q_ts_halflife" -> (tsHalflife _),
    "q_ts_arch_lm" -> (tsArchLm _),
    "q_ts_cusumsq" -> (tsCusumSq _),
    "q_stats_mantel_haenszel" -> (mantelHaenszel _),
    "q_stats_cohens_h" -> (cohensH _),
    "q_stats_jonckheere" -> (jonckheere _),
    "q_stats_somers_d" -> (somersD _),
    "q_ts_chow" -> (chow _),
    "q_stats_wilcoxon_signed" -> (wilcoxonSigned _),
    "q_stats_pettitt" -> (pettitt _),
    "q_stats_kuiper" -> (kuiper _),
    "q_stats_breusch_pagan" -> (breuschPagan _),
    "q_stats_cochran_armitage" -> (cochranArmitage _))

  private val DailyMassSql =
    """daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS day,
      |    CAST(SUM(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT) AS v
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |  GROUP BY 1, 2)""".stripMargin

  private val LateByPrioritySql =
    """li AS (
      |  SELECT CAST(substring(o.o_orderpriority, 1, 1) AS BIGINT) AS sg,
      |    CAST(year(o.o_orderdate) AS BIGINT) AS yr,
      |    CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      |      THEN 1 ELSE 0 END AS late
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)""".stripMargin

  /** The Welch readout expression chain over the pivoted one-row sums —
    * shared VERBATIM by the Spark plan and the DuckDB twin so the
    * written-order double arithmetic is identical by construction.
    */
  private[graft] object WelchExprs {
    private def grp(sfx: String): (String, String, String) = (
      s"(cast(s1_$sfx as double) / n_$sfx)",
      s"((cast(n_$sfx as double) * cast(s2_$sfx as double) - " +
        s"cast(s1_$sfx as double) * cast(s1_$sfx as double)) / " +
        s"(cast(n_$sfx as double) * (n_$sfx - 1)))",
      s"n_$sfx")
    private val (mA, vA, nA) = grp("a")
    private val (mN, vN, nN) = grp("n")
    private val (mR, vR, nR) = grp("r")
    private val wA = s"($nA / $vA)"
    private val wN = s"($nN / $vN)"
    private val wR = s"($nR / $vR)"
    private val wSum = s"($wA + $wN + $wR)"
    private val xw = s"(($wA * $mA + $wN * $mN + $wR * $mR) / $wSum)"
    val aNum: String = s"(($wA * ($mA - $xw) * ($mA - $xw) + " +
      s"$wN * ($mN - $xw) * ($mN - $xw) + " +
      s"$wR * ($mR - $xw) * ($mR - $xw)) / 2.0)"
    val lam: String =
      s"(((1.0 - $wA / $wSum) * (1.0 - $wA / $wSum) / ($nA - 1) + " +
      s"(1.0 - $wN / $wSum) * (1.0 - $wN / $wSum) / ($nN - 1) + " +
      s"(1.0 - $wR / $wSum) * (1.0 - $wR / $wSum) / ($nR - 1)))"
    // Zero-variance guard (the Chow/BP CASE pattern): a constant group
    // makes some v_j = 0, so w_j = n/0 diverges — Spark's non-ANSI
    // bigint cast of the resulting NaN/Inf silently yields 0 while
    // DuckDB errors, breaking the cross-engine contract on degenerate
    // data. NULL readout unless every group has n > 1 and s² > 0.
    private val defined: String =
      s"($nA > 1 AND $nN > 1 AND $nR > 1 AND " +
      s"$vA > 0 AND $vN > 0 AND $vR > 0)"
    val fMilli: String = s"CASE WHEN $defined THEN " +
      s"cast(floor($aNum / (1.0 + 0.25 * $lam) * 1000) as bigint) END"
    val df2Milli: String = s"CASE WHEN $defined THEN " +
      s"cast(floor(8.0 / (3.0 * $lam) * 1000) as bigint) END"
  }

  private val DailyRevSql =
    """daily AS (
      |  SELECT date_trunc('day', o_orderdate) AS day,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS v
      |  FROM orders GROUP BY 1)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_stats_rayleigh" ->
      """WITH ev AS (
        |  SELECT (CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01') % 7
        |      AS dow
        |  FROM events WHERE event_type = 'click'),
        |g AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_d FROM ev GROUP BY dow),
        |t AS (
        |  SELECT n_d,
        |    CAST(FLOOR(COS(2 * pi() * dow / 7) * 1e9) AS BIGINT) AS cn,
        |    CAST(FLOOR(SIN(2 * pi() * dow / 7) * 1e9) AS BIGINT) AS sn
        |  FROM g),
        |a AS (
        |  SELECT 1 AS gg, CAST(SUM(n_d) AS BIGINT) AS n_events,
        |    CAST(SUM(n_d * cn) AS BIGINT) AS c_nano,
        |    CAST(SUM(n_d * sn) AS BIGINT) AS s_nano
        |  FROM t GROUP BY gg)
        |SELECT n_events, c_nano, s_nano,
        |  CAST((CAST(c_nano AS HUGEINT) * c_nano +
        |        CAST(s_nano AS HUGEINT) * s_nano) //
        |    (CAST(n_events AS HUGEINT) * 1000000000000000) AS BIGINT)
        |    AS z_milli,
        |  CAST(FLOOR(ATAN2(CAST(s_nano AS DOUBLE), CAST(c_nano AS DOUBLE))
        |    * 1000) AS BIGINT) AS mean_dir_milli,
        |  CAST((CAST(c_nano AS HUGEINT) * c_nano +
        |        CAST(s_nano AS HUGEINT) * s_nano) //
        |    (CAST(n_events AS HUGEINT) * 1000000000000000) AS BIGINT) > 2995
        |    AS weekday_preference_05
        |FROM a""".stripMargin,
    "q_stats_welch_anova" ->
      s"""WITH g AS (
         |  SELECT l_returnflag AS flag, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
         |    CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
         |      AS BIGINT) AS s2
         |  FROM lineitem GROUP BY 1),
         |one AS (
         |  SELECT 1 AS gg,
         |    MAX(CASE WHEN flag = 'A' THEN n END) AS n_a,
         |    MAX(CASE WHEN flag = 'A' THEN s1 END) AS s1_a,
         |    MAX(CASE WHEN flag = 'A' THEN s2 END) AS s2_a,
         |    MAX(CASE WHEN flag = 'N' THEN n END) AS n_n,
         |    MAX(CASE WHEN flag = 'N' THEN s1 END) AS s1_n,
         |    MAX(CASE WHEN flag = 'N' THEN s2 END) AS s2_n,
         |    MAX(CASE WHEN flag = 'R' THEN n END) AS n_r,
         |    MAX(CASE WHEN flag = 'R' THEN s1 END) AS s1_r,
         |    MAX(CASE WHEN flag = 'R' THEN s2 END) AS s2_r
         |  FROM g GROUP BY gg),
         |s AS (
         |  SELECT n_a, n_n, n_r,
         |    ${WelchExprs.fMilli} AS f_milli,
         |    ${WelchExprs.df2Milli} AS df2_milli
         |  FROM one)
         |SELECT n_a, n_n, n_r, f_milli, df2_milli,
         |  f_milli > 2995 AS variance_unequal_means_differ_05
         |FROM s""".stripMargin,
    "q_stats_median_ci" ->
      s"""WITH $DailyRevSql,
         |rk AS (
         |  SELECT v,
         |    CAST(ROW_NUMBER() OVER (ORDER BY v, day) AS BIGINT) AS r,
         |    CAST(COUNT(*) OVER () AS BIGINT) AS n
         |  FROM daily),
         |b AS (
         |  SELECT v, r, n,
         |    greatest(1, CAST(FLOOR((n - 1.96 * SQRT(CAST(n AS DOUBLE))) / 2)
         |      AS BIGINT)) AS l
         |  FROM rk),
         |f AS (
         |  SELECT 1 AS g, MAX(n) AS n_days, MAX(l) AS l_rank,
         |    MAX(n + 1 - l) AS u_rank,
         |    MIN(CASE WHEN r = l THEN v END) AS ci_lo,
         |    MAX(CASE WHEN r = n + 1 - l THEN v END) AS ci_hi,
         |    MIN(CASE WHEN r = (n + 1) // 2 THEN v END) AS med_lo,
         |    MAX(CASE WHEN r = (n + 2) // 2 THEN v END) AS med_hi
         |  FROM b
         |  WHERE r = l OR r = n + 1 - l OR r = (n + 1) // 2 OR r = (n + 2) // 2
         |  GROUP BY g)
         |SELECT n_days, l_rank, u_rank, ci_lo, ci_hi,
         |  CAST((med_lo + med_hi) // 2 AS BIGINT) AS median_cents
         |FROM f""".stripMargin,
    "q_ts_cusumsq" ->
      s"""WITH $DailyRevSql,
         |lnv AS (
         |  SELECT day,
         |    CAST(FLOOR(LN(CAST(v AS DOUBLE)) * 1e9) AS BIGINT) AS lnv
         |  FROM daily WHERE v > 0),
         |r AS (
         |  SELECT day, lnv - LAG(lnv) OVER (ORDER BY day) AS r
         |  FROM lnv),
         |yv AS (
         |  SELECT day,
         |    CAST((CAST(r AS HUGEINT) * r) // 1000000 AS BIGINT) AS y,
         |    CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS k
         |  FROM r WHERE r IS NOT NULL),
         |c AS (
         |  SELECT day, k, y,
         |    SUM(CAST(y AS HUGEINT)) OVER (ORDER BY day) AS cy,
         |    CAST(MAX(k) OVER () AS BIGINT) AS n,
         |    SUM(CAST(y AS HUGEINT)) OVER () AS t
         |  FROM yv),
         |d AS (
         |  SELECT day, k, n, t, abs(cy * n - t * k) AS dv,
         |    MAX(abs(cy * n - t * k)) OVER () AS dm
         |  FROM c),
         |a AS (
         |  SELECT 1 AS g, CAST(MAX(n) AS BIGINT) AS n_returns,
         |    MIN(k) AS break_k,
         |    MIN(strftime(day, '%Y-%m-%d')) AS break_day,
         |    MAX(dm) AS dm, MAX(n) AS n, MAX(t) AS t
         |  FROM d WHERE dv = dm GROUP BY g),
         |s AS (
         |  SELECT n_returns, break_k, break_day,
         |    CASE WHEN t > 0 THEN
         |      CAST((dm * 1000000) // (CAST(n AS HUGEINT) * t) AS BIGINT) END
         |      AS d_ppm
         |  FROM a)
         |SELECT n_returns, break_k, break_day, d_ppm,
         |  CAST(FLOOR(SQRT(CAST(n_returns AS DOUBLE) / 2.0) * d_ppm)
         |    AS BIGINT) > 1358000 AS variance_break_05
         |FROM s""".stripMargin,
    "q_ts_arch_lm" ->
      s"""WITH $DailyRevSql,
         |lnv AS (
         |  SELECT day,
         |    CAST(FLOOR(LN(CAST(v AS DOUBLE)) * 1e9) AS BIGINT) AS lnv
         |  FROM daily WHERE v > 0),
         |r AS (
         |  SELECT lnv - LAG(lnv) OVER (ORDER BY day) AS r, day
         |  FROM lnv),
         |yv AS (
         |  SELECT day,
         |    CAST((CAST(r AS HUGEINT) * r) // 1000000 AS BIGINT) AS y
         |  FROM r WHERE r IS NOT NULL),
         |p AS (
         |  SELECT LAG(y) OVER (ORDER BY day) AS x, y FROM yv),
         |a AS (
         |  SELECT 1 AS g, CAST(COUNT(*) AS BIGINT) AS m,
         |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
         |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
         |    SUM(CAST(y AS HUGEINT) * y) AS syy
         |  FROM p WHERE x IS NOT NULL GROUP BY g),
         |b AS (
         |  SELECT m AS n_pairs, m,
         |    CAST(m AS HUGEINT) * sxy - sx * sy AS cnum,
         |    CAST(m AS HUGEINT) * sxx - sx * sx AS vx,
         |    CAST(m AS HUGEINT) * syy - sy * sy AS vy
         |  FROM a),
         |s AS (
         |  SELECT n_pairs,
         |    CASE WHEN vx > 0 AND vy > 0 THEN
         |      CAST(FLOOR(CAST(CAST(cnum AS VARCHAR) AS DOUBLE) *
         |        CAST(CAST(cnum AS VARCHAR) AS DOUBLE) /
         |        (CAST(CAST(vx AS VARCHAR) AS DOUBLE) *
         |         CAST(CAST(vy AS VARCHAR) AS DOUBLE)) * m * 1000) AS BIGINT)
         |    END AS lm_milli
         |  FROM b)
         |SELECT n_pairs, lm_milli, lm_milli > 3841 AS arch_effect_05
         |FROM s""".stripMargin,
    "q_ts_halflife" ->
      s"""WITH $DailyRevSql,
         |lg AS (
         |  SELECT LAG(v) OVER (ORDER BY day) AS x, v
         |  FROM daily),
         |p AS (SELECT x, v - x AS y FROM lg WHERE x IS NOT NULL),
         |a AS (
         |  SELECT 1 AS g, CAST(COUNT(*) AS BIGINT) AS m,
         |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
         |    SUM(CAST(x AS HUGEINT) * x) AS sxx
         |  FROM p GROUP BY g),
         |b AS (
         |  SELECT m AS n_days,
         |    CAST(FLOOR((CAST(m AS DOUBLE) *
         |      CAST(CAST(sxy AS VARCHAR) AS DOUBLE) -
         |      CAST(CAST(sx AS VARCHAR) AS DOUBLE) *
         |      CAST(CAST(sy AS VARCHAR) AS DOUBLE)) /
         |      (CAST(m AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE) -
         |      CAST(CAST(sx AS VARCHAR) AS DOUBLE) *
         |      CAST(CAST(sx AS VARCHAR) AS DOUBLE)) * 1000000) AS BIGINT)
         |      AS b_ppm
         |  FROM a),
         |s AS (
         |  SELECT n_days, b_ppm, b_ppm + 1000000 AS phi_ppm FROM b)
         |SELECT n_days, b_ppm, phi_ppm,
         |  CASE WHEN phi_ppm > 0 AND phi_ppm < 1000000 THEN
         |    CAST(FLOOR(-ln(2.0) / ln(CAST(phi_ppm AS DOUBLE) / 1e6) * 1000)
         |      AS BIGINT) END AS halflife_milli
         |FROM s""".stripMargin,
    "q_stats_mantel_haenszel" ->
      s"""WITH $LateByPrioritySql,
         |st AS (
         |  SELECT yr,
         |    CAST(SUM(CASE WHEN sg <= 2 AND late = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
         |    CAST(SUM(CASE WHEN sg <= 2 AND late = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
         |    CAST(SUM(CASE WHEN sg > 2 AND late = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
         |    CAST(SUM(CASE WHEN sg > 2 AND late = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
         |  FROM li GROUP BY yr),
         |agg AS (
         |  SELECT 1 AS g, CAST(COUNT(*) AS BIGINT) AS n_strata,
         |    CAST(SUM((a * d * 1000000) // (a + b + c + d)) AS BIGINT) AS r_e6,
         |    CAST(SUM((b * c * 1000000) // (a + b + c + d)) AS BIGINT) AS s_e6,
         |    CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb,
         |    CAST(SUM(c) AS BIGINT) AS sc, CAST(SUM(d) AS BIGINT) AS sd
         |  FROM st GROUP BY g)
         |SELECT n_strata,
         |  CASE WHEN s_e6 > 0 THEN CAST((r_e6 * 1000) // s_e6 AS BIGINT) END
         |    AS or_mh_milli,
         |  CASE WHEN sb * sc > 0 THEN
         |    CAST((CAST(sa AS HUGEINT) * sd * 1000) //
         |      (CAST(sb AS HUGEINT) * sc) AS BIGINT) END AS or_pooled_milli
         |FROM agg""".stripMargin,
    "q_stats_cohens_h" ->
      s"""WITH $LateByPrioritySql,
         |a AS (
         |  SELECT 1 AS g,
         |    CAST(SUM(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(SUM(CASE WHEN sg = 1 THEN late ELSE 0 END) AS BIGINT) AS x1,
         |    CAST(SUM(CASE WHEN sg = 5 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         |    CAST(SUM(CASE WHEN sg = 5 THEN late ELSE 0 END) AS BIGINT) AS x2
         |  FROM li WHERE sg = 1 OR sg = 5 GROUP BY g),
         |s AS (
         |  SELECT n1, x1, n2, x2,
         |    CASE WHEN n1 > 0 AND n2 > 0 THEN
         |      CAST(FLOOR((2 * ASIN(SQRT(CAST(x1 AS DOUBLE) / n1)) -
         |        2 * ASIN(SQRT(CAST(x2 AS DOUBLE) / n2))) * 1000) AS BIGINT)
         |      END AS h_milli
         |  FROM a)
         |SELECT n1, x1, n2, x2, h_milli,
         |  abs(h_milli) >= 200 AS at_least_small_effect
         |FROM s""".stripMargin,
    "q_stats_somers_d" ->
      """WITH li AS (
        |  SELECT CAST(substring(o.o_orderpriority, 1, 1) AS BIGINT) AS sg,
        |    CAST(l.l_quantity AS BIGINT) AS q
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |cells AS MATERIALIZED (
        |  SELECT sg, q, CAST(COUNT(*) AS BIGINT) AS c FROM li GROUP BY sg, q),
        |p AS (
        |  SELECT 1 AS gg,
        |    SUM(CASE WHEN a.q < b.q THEN CAST(a.c AS HUGEINT) * b.c END) AS nc,
        |    SUM(CASE WHEN a.q > b.q THEN CAST(a.c AS HUGEINT) * b.c END) AS nd,
        |    SUM(CASE WHEN a.q = b.q THEN CAST(a.c AS HUGEINT) * b.c END) AS ty
        |  FROM cells a JOIN cells b ON a.sg < b.sg
        |  GROUP BY gg)
        |SELECT CAST(nc AS BIGINT) AS concordant,
        |  CAST(nd AS BIGINT) AS discordant,
        |  CAST(ty AS BIGINT) AS ties_y,
        |  CASE WHEN nc + nd + ty > 0 THEN
        |    CAST(((nc - nd) * 1000000) // (nc + nd + ty) AS BIGINT) END
        |    AS somers_d_ppm,
        |  CASE WHEN nc + nd > 0 THEN
        |    CAST(((nc - nd) * 1000000) // (nc + nd) AS BIGINT) END
        |    AS gamma_ppm
        |FROM p""".stripMargin,
    "q_stats_jonckheere" ->
      """WITH li AS (
        |  SELECT CAST(substring(o.o_orderpriority, 1, 1) AS BIGINT) AS sg,
        |    CAST(l.l_quantity AS BIGINT) AS q
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |cells AS MATERIALIZED (
        |  SELECT sg, q, CAST(COUNT(*) AS BIGINT) AS c FROM li GROUP BY sg, q),
        |jt AS (
        |  SELECT CAST(SUM(a.c * b.c *
        |    (CASE WHEN a.q < b.q THEN 2 WHEN a.q = b.q THEN 1 ELSE 0 END))
        |    AS BIGINT) AS jt_x2
        |  FROM cells a JOIN cells b ON a.sg < b.sg),
        |gs AS (SELECT sg, SUM(c) AS n_g FROM cells GROUP BY sg),
        |grp AS (
        |  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
        |    CAST(SUM(n_g * n_g) AS BIGINT) AS sn2,
        |    SUM(CAST(n_g * (n_g - 1) AS HUGEINT) * (2 * n_g + 5)) AS ga,
        |    SUM(CAST(n_g * (n_g - 1) AS HUGEINT) * (n_g - 2)) AS gb,
        |    CAST(SUM(n_g * (n_g - 1)) AS BIGINT) AS gc
        |  FROM gs),
        |ts AS (SELECT q, SUM(c) AS t_u FROM cells GROUP BY q),
        |tie AS (
        |  SELECT SUM(CAST(t_u * (t_u - 1) AS HUGEINT) * (2 * t_u + 5)) AS ta,
        |    SUM(CAST(t_u * (t_u - 1) AS HUGEINT) * (t_u - 2)) AS tb,
        |    CAST(SUM(t_u * (t_u - 1)) AS BIGINT) AS tc
        |  FROM ts),
        |b AS (
        |  SELECT n AS n_lines, jt_x2,
        |    CAST((n * n - sn2) // 2 AS BIGINT) AS e_jt_x2,
        |    CAST(n AS HUGEINT) * (n - 1) * (2 * n + 5) - ga - ta AS va,
        |    gb * tb AS vb, CAST(gc AS HUGEINT) * tc AS vc, n
        |  FROM jt, grp, tie),
        |v AS (
        |  SELECT n_lines, jt_x2, e_jt_x2, n,
        |    CAST(CAST(va AS VARCHAR) AS DOUBLE) / 72.0 +
        |    CAST(CAST(vb AS VARCHAR) AS DOUBLE) /
        |      (36.0 * n * (n - 1) * (n - 2)) +
        |    CAST(CAST(vc AS VARCHAR) AS DOUBLE) / (8.0 * n * (n - 1)) AS v72
        |  FROM b),
        |s AS (
        |  SELECT n_lines, jt_x2, e_jt_x2,
        |    CASE WHEN n > 2 AND v72 > 0 THEN
        |      CAST(FLOOR(CAST(jt_x2 - e_jt_x2 AS DOUBLE) / (2.0 * SQRT(v72))
        |        * 1000) AS BIGINT)
        |    END AS z_milli
        |  FROM v)
        |SELECT n_lines, jt_x2, e_jt_x2, z_milli,
        |  abs(z_milli) > 1960 AS trend_significant_05
        |FROM s""".stripMargin,
    "q_ts_chow" -> {
      def sseSql(src: String, name: String) =
        s"""a_$name AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS m,
           |    CAST(SUM(t) AS BIGINT) AS st, CAST(SUM(t * t) AS BIGINT) AS stt,
           |    SUM(CAST(v AS HUGEINT)) AS sy,
           |    SUM(CAST(v AS HUGEINT) * v) AS syy,
           |    SUM(CAST(t AS HUGEINT) * v) AS sty
           |  FROM $src),
           |s_$name AS (
           |  SELECT m AS m_$name,
           |    CAST(CAST(syy AS VARCHAR) AS DOUBLE)
           |    - CAST(CAST(sy AS VARCHAR) AS DOUBLE) *
           |      CAST(CAST(sy AS VARCHAR) AS DOUBLE) / m
           |    - (CAST(CAST(sty AS VARCHAR) AS DOUBLE) - st *
           |       CAST(CAST(sy AS VARCHAR) AS DOUBLE) / m) *
           |      (CAST(CAST(sty AS VARCHAR) AS DOUBLE) - st *
           |       CAST(CAST(sy AS VARCHAR) AS DOUBLE) / m) /
           |      (CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st / m)
           |    AS sse_$name
           |  FROM a_$name)""".stripMargin
      s"""WITH daily AS (
         |  SELECT date_trunc('day', o_orderdate) AS day,
         |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS v
         |  FROM orders GROUP BY 1),
         |idx0 AS (
         |  SELECT v,
         |    CAST(ROW_NUMBER() OVER (ORDER BY day) - 1 AS BIGINT) AS t
         |  FROM daily),
         |idx AS (
         |  SELECT v, t, CAST(COUNT(*) OVER () AS BIGINT) AS n,
         |    CASE WHEN t < CAST(COUNT(*) OVER () AS BIGINT) // 2
         |      THEN 0 ELSE 1 END AS seg
         |  FROM idx0),
         |${sseSql("idx", "p")},
         |${sseSql("(SELECT * FROM idx WHERE seg = 0)", "1")},
         |${sseSql("(SELECT * FROM idx WHERE seg = 1)", "2")},
         |b AS (
         |  SELECT m_p AS n_days, m_1 AS n_seg1, sse_p, sse_1, sse_2
         |  FROM s_p, s_1, s_2),
         |s AS (
         |  SELECT n_days, n_seg1,
         |    CASE WHEN n_days >= 5 AND sse_1 + sse_2 > 0 THEN
         |      CAST(FLOOR(((sse_p - sse_1 - sse_2) / 2.0) /
         |        ((sse_1 + sse_2) / (n_days - 4.0)) * 1000) AS BIGINT) END
         |      AS f_milli
         |  FROM b)
         |SELECT n_days, n_seg1, f_milli, f_milli > 2996 AS break_significant_05
         |FROM s""".stripMargin
    },
    "q_stats_wilcoxon_signed" ->
      s"""WITH $DailyMassSql,
         |x AS (SELECT day, v AS vx FROM daily WHERE event_type = 'click'),
         |y AS (SELECT day, v AS vy FROM daily WHERE event_type = 'purchase'),
         |d AS (
         |  SELECT y.vy - x.vx AS d, abs(y.vy - x.vx) AS absd
         |  FROM x JOIN y USING (day) WHERE y.vy - x.vx <> 0),
         |rk AS (
         |  SELECT d,
         |    2 * CAST(RANK() OVER (ORDER BY absd) AS BIGINT)
         |      + CAST(COUNT(*) OVER (PARTITION BY absd) AS BIGINT) - 1 AS m2,
         |    CAST(COUNT(*) OVER (PARTITION BY absd) AS BIGINT) AS t
         |  FROM d),
         |a AS (
         |  SELECT 1 AS g, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |    CAST(SUM(CASE WHEN d > 0 THEN m2 ELSE 0 END) AS BIGINT) AS w2_plus,
         |    CAST(SUM(t * t - 1) AS BIGINT) AS tie_term
         |  FROM rk GROUP BY g),
         |b AS (
         |  SELECT n_pairs, w2_plus, tie_term,
         |    CAST((n_pairs * (n_pairs + 1)) // 2 AS BIGINT) AS e_w2,
         |    CAST(2 * n_pairs * (n_pairs + 1) * (2 * n_pairs + 1) - tie_term
         |      AS BIGINT) AS var48
         |  FROM a)
         |SELECT n_pairs, w2_plus, e_w2, tie_term,
         |  CAST(FLOOR(CAST(w2_plus - e_w2 AS DOUBLE) /
         |    SQRT(CAST(var48 AS DOUBLE) / 12.0) * 1000) AS BIGINT) AS z_milli,
         |  abs(CAST(FLOOR(CAST(w2_plus - e_w2 AS DOUBLE) /
         |    SQRT(CAST(var48 AS DOUBLE) / 12.0) * 1000) AS BIGINT)) > 1960
         |    AS shift_significant_05
         |FROM b""".stripMargin,
    "q_stats_pettitt" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', o_orderdate) AS day,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |rk AS (
        |  SELECT day,
        |    2 * CAST(RANK() OVER (ORDER BY v) AS BIGINT)
        |      + CAST(COUNT(*) OVER (PARTITION BY v) AS BIGINT) - 1 AS m2,
        |    CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS n
        |  FROM daily),
        |u AS (
        |  SELECT day, n,
        |    SUM(m2) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
        |      - t * (n + 1) AS u
        |  FROM rk WHERE TRUE QUALIFY t < n),
        |k AS (
        |  SELECT day, n, u, abs(u) AS au, MAX(abs(u)) OVER () AS k FROM u)
        |SELECT MAX(n) AS n_days, CAST(MAX(k) AS BIGINT) AS k_stat,
        |  strftime(MIN(day), '%Y-%m-%d') AS break_day,
        |  CAST(min_by(u, day) AS BIGINT) AS u_at_max,
        |  CAST(6 AS HUGEINT) * MAX(k) * MAX(k) * 1000000000 >
        |    CAST(3688879454 AS HUGEINT) *
        |    (MAX(n) * MAX(n) * MAX(n) + MAX(n) * MAX(n))
        |    AS change_significant_05
        |FROM k WHERE au = k""".stripMargin,
    "q_stats_kuiper" ->
      """WITH ev AS (
        |  SELECT (CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01') % 7
        |      AS dow,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS b
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |g AS (SELECT dow, SUM(a) AS a_n, SUM(b) AS b_n FROM ev GROUP BY 1),
        |spine AS (SELECT unnest(range(0, 7)) AS dow),
        |f AS (
        |  SELECT s.dow, COALESCE(g.a_n, 0) AS a_n, COALESCE(g.b_n, 0) AS b_n
        |  FROM spine s LEFT JOIN g ON s.dow = g.dow),
        |c AS (
        |  SELECT dow,
        |    SUM(a_n) OVER (ORDER BY dow) AS ca,
        |    SUM(b_n) OVER (ORDER BY dow) AS cb,
        |    SUM(a_n) OVER () AS na, SUM(b_n) OVER () AS nb
        |  FROM f),
        |a AS (
        |  SELECT 1 AS g, CAST(MAX(na) AS BIGINT) AS n_a,
        |    CAST(MAX(nb) AS BIGINT) AS n_b,
        |    CAST(MAX(ca * nb - cb * na) AS BIGINT) AS d_plus_num,
        |    CAST(MAX(cb * na - ca * nb) AS BIGINT) AS d_minus_num
        |  FROM c GROUP BY g)
        |SELECT n_a, n_b, d_plus_num, d_minus_num,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN
        |    CAST(((d_plus_num + d_minus_num) * 1000000) // (n_a * n_b)
        |      AS BIGINT) END AS v_ppm,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN
        |    CAST(FLOOR(1747000 / SQRT(CAST(n_a AS DOUBLE) * n_b /
        |      (n_a + n_b))) AS BIGINT) END AS crit_ppm,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN
        |    CAST(((d_plus_num + d_minus_num) * 1000000) // (n_a * n_b)
        |      AS BIGINT) END >
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN
        |    CAST(FLOOR(1747000 / SQRT(CAST(n_a AS DOUBLE) * n_b /
        |      (n_a + n_b))) AS BIGINT) END AS cyclic_drift_05
        |FROM a""".stripMargin,
    "q_stats_breusch_pagan" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', o_orderdate) AS day,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |idx0 AS (
        |  SELECT v,
        |    CAST(ROW_NUMBER() OVER (ORDER BY day) - 1 AS BIGINT) AS t
        |  FROM daily),
        |idx AS (
        |  SELECT v, t,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS n,
        |    CAST(SUM(t) OVER () AS BIGINT) AS st,
        |    CAST(SUM(t * t) OVER () AS BIGINT) AS stt,
        |    SUM(CAST(v AS HUGEINT)) OVER () AS sy,
        |    SUM(CAST(t AS HUGEINT) * v) OVER () AS sty
        |  FROM idx0),
        |r AS (
        |  SELECT n, st, stt,
        |    ((CAST(v AS HUGEINT) * (n * stt - st * st)
        |      - (sy * stt - CAST(st AS HUGEINT) * sty)
        |      - (CAST(n AS HUGEINT) * sty - CAST(st AS HUGEINT) * sy) * t)
        |      // (n * stt - st * st)) // 1000 AS w, t
        |  FROM idx),
        |a AS (
        |  SELECT 1 AS g, MAX(n) AS n_days, MAX(st) AS st, MAX(stt) AS stt,
        |    SUM(CAST(w AS HUGEINT) * w) AS sw2,
        |    SUM(CAST(t * w AS HUGEINT) * w) AS stw2,
        |    SUM(CAST(w * w AS HUGEINT) * w * w) AS sw4
        |  FROM r GROUP BY g),
        |b AS (
        |  SELECT n_days, CAST(sw2 AS BIGINT) AS s_w2,
        |    n_days * stt - st * st AS var_t,
        |    CAST(n_days AS HUGEINT) * stw2 - CAST(st AS HUGEINT) * sw2 AS cov,
        |    CAST(n_days AS HUGEINT) * sw4 - sw2 * sw2 AS var_w2
        |  FROM a),
        |s AS (
        |  SELECT n_days, s_w2,
        |    CASE WHEN var_w2 > 0 THEN CAST(FLOOR(
        |      CAST(CAST(cov AS VARCHAR) AS DOUBLE) *
        |      CAST(CAST(cov AS VARCHAR) AS DOUBLE) /
        |      (CAST(var_t AS DOUBLE) *
        |       CAST(CAST(var_w2 AS VARCHAR) AS DOUBLE))
        |      * n_days * 1000) AS BIGINT) END AS bp_milli
        |  FROM b)
        |SELECT n_days, s_w2, bp_milli, bp_milli > 3841 AS het_significant_05
        |FROM s""".stripMargin,
    "q_stats_cochran_armitage" ->
      """WITH li AS (
        |  SELECT l.l_orderkey,
        |    CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
        |      THEN 1 ELSE 0 END AS late,
        |    CAST(substring(o.o_orderpriority, 1, 1) AS BIGINT) AS sg
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |g AS (
        |  SELECT sg, CAST(COUNT(*) AS BIGINT) AS n_g,
        |    CAST(SUM(late) AS BIGINT) AS x_g
        |  FROM li GROUP BY sg),
        |a AS (
        |  SELECT 1 AS gg, CAST(SUM(n_g) AS BIGINT) AS n,
        |    CAST(SUM(x_g) AS BIGINT) AS x,
        |    CAST(SUM(sg * n_g) AS BIGINT) AS sns,
        |    CAST(SUM(sg * sg * n_g) AS BIGINT) AS snss,
        |    CAST(SUM(sg * x_g) AS BIGINT) AS ssx
        |  FROM g GROUP BY gg),
        |b AS (
        |  SELECT n AS n_lines, x AS n_late, n * ssx - x * sns AS t_num,
        |    n, x, sns, snss
        |  FROM a),
        |s AS (
        |  SELECT n_lines, n_late, t_num,
        |    CASE WHEN x > 0 AND x < n AND n * snss - sns * sns > 0 THEN
        |      CAST(FLOOR(CAST(t_num AS DOUBLE) / SQRT(
        |        CAST(x AS DOUBLE) * (n - x) * (n * snss - sns * sns) / n)
        |        * 1000) AS BIGINT) END AS z_milli
        |  FROM b)
        |SELECT n_lines, n_late, t_num, z_milli,
        |  abs(z_milli) > 1960 AS trend_significant_05
        |FROM s""".stripMargin)
}
