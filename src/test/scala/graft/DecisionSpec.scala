package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the DecisionOps composites (#400–#405): verdict
  * recomputation, bound checks, conservation, and monotonicity — the
  * invariants a value-hash against the twin can't distinguish from
  * coincidence.
  */
class DecisionSpec extends AnyFunSuite with SparkFixture {

  test("TOST: verdict recomputes from the two one-sided statistics") {
    val r = operators.DecisionOps.statsTost(spark, sfDir).collect().head
    assert(r.getLong(0) > 0L && r.getLong(1) > 0L)
    assert(r.getBoolean(6) ===
      (r.getLong(4) > 1644L && r.getLong(5) > 1644L))
  }

  test("Youden: J = TPR - FPR at the reported threshold, all in [0, 1e6]") {
    val r = operators.DecisionOps.evalYouden(spark, sfDir).collect().head
    val (tpr, fpr, j) = (r.getLong(3), r.getLong(4), r.getLong(5))
    assert(j === tpr - fpr)
    assert(tpr >= 0L && tpr <= 1000000L && fpr >= 0L && fpr <= 1000000L)
    assert(j >= 0L, "the trivial all-positive threshold already gives J = 0")
  }

  test("rolling beta: the index conserves the per-day type masses") {
    val rows = operators.DecisionOps.winBeta(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 1L && r.getLong(2) <= 8L, "frame size")
    }
  }

  test("Markov entropy rate: non-negative, bounded by ln(#states)") {
    val r = operators.DecisionOps.markovEntropyRate(spark, sfDir)
      .collect().head
    val (k, hNano) = (r.getLong(0), r.getLong(1))
    assert(k >= 2L)
    assert(hNano >= 0L)
    assert(hNano <= math.ceil(math.log(k.toDouble) * 1e9).toLong,
      "entropy rate can't exceed the uniform bound")
  }

  test("prune curve: decile masses conserve the corpus, kept is the tail") {
    val rows = operators.DecisionOps.pruneCurve(spark, sfDir).collect()
      .sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq === (0L to 9L))
    val total = rows.map(_.getLong(1)).sum
    val totalDocs = Tables.documents(spark, sfDir)
      .filter("size(split(text, ' ')) > 0").count()
    assert(total === totalDocs, "decile doc mass must conserve the corpus")
    rows.foreach { r =>
      val d = r.getLong(0)
      val expectKept = rows.filter(_.getLong(0) > d).map(_.getLong(1)).sum
      assert(r.getLong(5) === expectKept, s"kept_docs at decile $d")
      assert(r.getLong(3) <= r.getLong(4), "h_min <= h_max inside a decile")
    }
    assert(rows.last.getLong(5) === 0L, "pruning everything keeps nothing")
  }

  test("funnel window sweep: conversions cumulative in the window") {
    val rows = operators.DecisionOps.funnelWindowSweep(spark, sfDir).collect()
      .sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq === Seq(3600L, 21600L, 86400L, 259200L))
    val clicks = rows.map(_.getLong(2))
    clicks.zip(clicks.tail).foreach { case (a, b) =>
      assert(a <= b, "a wider window can only credit more clicks")
    }
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "full conversions subset clicks")
      assert(r.getLong(2) <= r.getLong(1), "clicks subset views")
      assert(r.getLong(4) === r.getLong(2) * 1000000L / r.getLong(1))
    }
  }

  test("unicity: monotone in k, unique counts bounded by users") {
    val rows = operators.DecisionOps.privacyUnicity(spark, sfDir).collect()
      .sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) === r.getLong(2) * 1000000L / r.getLong(1))
    }
    // a longer prefix can only sharpen identification among the users
    // that HAVE k events; with the fixture's dense traces user sets are
    // identical across k, so unicity must be non-decreasing
    if (rows.map(_.getLong(1)).distinct.length == 1) {
      val u = rows.map(_.getLong(3))
      u.zip(u.tail).foreach { case (a, b) => assert(a <= b) }
    }
  }

  test("Atkinson: index in [0, 1e6), zero only under perfect equality") {
    val rows = operators.StatsOps.statsAtkinson(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getLong(4)
      assert(a >= 0L && a < 1000000L)
      assert(r.getLong(3) === r.getLong(2) / r.getLong(1), "mean recompute")
    }
  }

  test("sequential monitor: looks accumulate, boundaries decay, flags recompute") {
    val rows = operators.DecisionOps.abSequential(spark, sfDir).collect()
      .sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq === (1L to 5L))
    val n1s = rows.map(_.getLong(1))
    n1s.zip(n1s.tail).foreach { case (a, b) =>
      assert(a <= b, "look samples must accumulate")
    }
    val bs = rows.map(_.getLong(4))
    assert(bs.toSeq === Seq(4562L, 3226L, 2634L, 2281L, 2040L))
    var stopped = false
    rows.foreach { r =>
      assert(r.getBoolean(5) === (r.getLong(3) > r.getLong(4)))
      stopped = stopped || r.getBoolean(5)
      assert(r.getBoolean(6) === stopped, "stopped_by_now recompute")
    }
  }

  test("personalized PageRank: seed ranks first, 20 rows, mass positive") {
    val rows = operators.GraphOps.pagerankPersonalized(spark, sfDir).collect()
    assert(rows.length === 20)
    assert(rows.map(_.getLong(3)).toSeq === (1L to 20L))
    val seed = rows.head.getLong(0)
    assert(rows.forall(_.getLong(0) === seed))
    assert(rows.head.getLong(1) === seed,
      "the restart node must hold the top PPR score")
    val rs = rows.map(_.getLong(2))
    rs.zip(rs.tail).foreach { case (a, b) => assert(a >= b) }
  }

  test("hazard: rates bounded, risk set shrinks, Nelson-Aalen accumulates") {
    val rows = operators.DecisionOps.eventHazard(spark, sfDir).collect()
      .sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L)
    }
    val risks = rows.map(_.getLong(1))
    risks.zip(risks.tail).foreach { case (a, b) =>
      assert(a > b, "risk set must strictly shrink with duration")
    }
    val cums = rows.map(_.getLong(4))
    cums.zip(cums.tail).foreach { case (a, b) => assert(a <= b) }
    assert(cums.last === rows.map(_.getLong(3)).sum,
      "NA cumulative is exactly the sum of the truncated hazards")
  }
}
