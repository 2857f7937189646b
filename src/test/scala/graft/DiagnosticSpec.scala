package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the DiagnosticOps battery (#387–#393) beyond the
  * oracle hash: bounds, monotonicity, and exact driver recomputations
  * of the staged composites (same JVM libm → bit-equal).
  */
class DiagnosticSpec extends AnyFunSuite with SparkFixture {

  test("Ljung-Box: rho bounded, Q cumulative non-decreasing, 8 lags") {
    val rows = operators.DiagnosticOps.tsLjungBox(spark, sfDir).collect()
    assert(rows.length === 8)
    assert(rows.map(_.getLong(0)).toSeq === (1L to 8L))
    rows.foreach { r =>
      assert(math.abs(r.getLong(2)) <= 1000000L, "rho outside [-1, 1] ppm")
    }
    val qs = rows.map(_.getLong(3))
    qs.zip(qs.tail).foreach { case (a, b) => assert(a <= b, "Q not cumulative") }
    assert(qs.head >= 0L)
  }

  test("KPSS: eta positive; verdict flags recompute from eta exactly") {
    val r = operators.DiagnosticOps.tsKpss(spark, sfDir).collect().head
    val eta = r.getLong(1)
    assert(eta > 0L)
    assert(r.getBoolean(2) === (eta > 347000L))
    assert(r.getBoolean(3) === (eta > 463000L))
    assert(r.getBoolean(4) === (eta > 739000L))
  }

  test("variance ratio: positive, and counts differ by exactly 4 lags") {
    val r = operators.DiagnosticOps.tsVarianceRatio(spark, sfDir).collect().head
    assert(r.getLong(2) > 0L)
    assert(r.getLong(0) - r.getLong(1) === 4L)
  }

  test("spectral entropy: normalized value inside [0, 1e6]") {
    val r = operators.DiagnosticOps.tsSpectralEntropy(spark, sfDir)
      .collect().head
    val norm = r.getLong(3)
    assert(norm >= 0L && norm <= 1000000L)
    assert(r.getLong(1) >= r.getLong(2) * 1000000L) // nano >= milli scale-up
  }

  test("Bartlett: correction factor > 1, corrected stat <= raw stat") {
    val r = operators.DiagnosticOps.statsBartlett(spark, sfDir).collect().head
    assert(r.getLong(0) >= 2L, "needs at least two groups")
    assert(r.getLong(4) > 1000000L, "Bartlett C is always > 1")
    assert(r.getLong(5) <= r.getLong(3), "corrected stat must shrink")
    assert(r.getLong(2) > 0L, "pooled variance positive")
  }

  test("Friedman: per-block ranks conserve k(k+1)/2, chi2 consistent") {
    val rows = operators.DiagnosticOps.statsFriedman(spark, sfDir).collect()
    val k = rows.length.toLong
    assert(k === 5L, "five order priorities")
    val nb = rows.head.getLong(1)
    assert(rows.forall(_.getLong(1) === nb), "unequal block counts")
    assert(rows.map(_.getLong(2)).sum === nb * k * (k + 1) / 2,
      "rank mass not conserved")
    val rsq = rows.map(r => r.getLong(2) * r.getLong(2)).sum
    val expected = (12000L * rsq) / (nb * k * (k + 1)) - 3000L * nb * (k + 1)
    assert(rows.forall(_.getLong(4) === expected), "chi2_milli recompute")
  }

  test("Hill: exactly k excesses, all non-negative, alpha recomputes") {
    val r = operators.DiagnosticOps.statsHill(spark, sfDir).collect().head
    assert(r.getLong(0) === 100L)
    assert(r.getLong(2) >= 0L, "excess sum non-negative by construction")
    assert(r.getLong(3) === r.getLong(2) / 100L)
    if (r.getLong(2) > 0L)
      assert(r.getLong(4) === 100L * 1000000000000L / r.getLong(2))
  }

  test("Theil: weights sum to unit mass; decomposition identity holds") {
    val rows = operators.StatsOps.statsTheil(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val wSum = rows.map(_.getLong(3)).sum
    assert(math.abs(wSum - 1000000L) <= rows.length,
      s"segment weights must sum to ~1e6 ppm (got $wSum)")
    val within = rows.map(r => r.getLong(3) * r.getLong(4)).sum / 1000000L
    val between = rows.head.getLong(5)
    assert(rows.forall(_.getLong(5) === between), "between term is global")
    val total = rows.head.getLong(6)
    assert(rows.forall(_.getLong(6) === total))
    assert(math.abs(total - (within + between)) <= 1L,
      "T_total must equal weighted within + between (up to 1 nano)")
    rows.foreach(r => assert(r.getLong(4) >= 0L, "within-Theil >= 0"))
    assert(total >= 0L)
  }

  test("paired t: mean readout recomputes; t sign tracks the mean") {
    val r = operators.DiagnosticOps.statsPairedT(spark, sfDir).collect().head
    val (n, sd) = (r.getLong(0), r.getLong(1))
    assert(n > 0L)
    // Spark div and JVM long division both truncate toward zero
    assert(r.getLong(2) === sd * 1000L / n, "mean_d_milli recompute")
    if (sd != 0L)
      assert((r.getLong(3) > 0L) === (sd > 0L), "t sign tracks mean sign")
  }
}
