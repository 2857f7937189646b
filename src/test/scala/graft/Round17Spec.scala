package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-17 pins:
  *
  *  1. the r17 derived-materialization tier is OUTPUT-INVARIANT: the
  *     struct-equiv confirmed pair set, the ktruss round-0 triangle
  *     support, and the full-grid power spectrum (the three r16-verdict
  *     amortizations) each equal their from-scratch kernels;
  *  2. the ktruss FIXPOINT CERTIFICATE (r16 ADVICE): the graded fixture
  *     must certify the fixpoint strictly inside the `TrussRounds`
  *     bound — a future corpus whose peel cascade outruns the bound
  *     fails here loudly instead of silently emitting a truncated
  *     truss — plus round-accounting pins on crafted graphs;
  *  3. the cumulative periodogram's degenerate-calendar contract (r16
  *     ADVICE): nd <= 2 yields an EMPTY frequency grid and a ZERO-row
  *     readout on both engines (Spark's sequence(1, 0) descends;
  *     the guard filter restores the empty contract);
  *  4. exact driver replays for the seven r17 graded additions
  *     (#460-#466): equiv-partner histogram identity, spectral
  *     flatness, Cox-Stuart, Parkinson, Rogers-Satchell, Amihud,
  *     Sortino — BigInt arithmetic with the same floored-nano libm
  *     staging Spark's codegen executes, so equality is exact.
  */
class Round17Spec extends AnyFunSuite with SparkFixture {

  // ---- 1. r17 derived-materialization output invariance ----------------

  test("materializedStructEquivPairs equals the from-scratch LSH+confirm kernel") {
    graft.functions.GraftFunctions.register(spark)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))
    val fresh = operators.GraphOps.structEquivPlan(spark, sfDir)
      .collect().map(key).sorted
    val memo = operators.GraphOps.materializedStructEquivPairs(spark, sfDir)
      .collect().map(key).sorted
    assert(memo.nonEmpty && memo.toSeq === fresh.toSeq)
  }

  test("materializedTriangleSupport equals the wedge kernel over a fresh orientation") {
    val e = operators.DedupOps.materializedEdges(spark, sfDir)
    val deg = operators.GraphOps.materializedDegrees(spark, sfDir)
    val fresh = operators.GraphOps
      .triangleSupportOf(operators.GraphOps.orientEdges(e, deg))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val memo = operators.GraphOps.materializedTriangleSupport(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(memo.nonEmpty && memo.toSeq === fresh.toSeq)
  }

  test("materializedPowerSpectrum equals the from-scratch Fourier-grid plan") {
    val daily = Tables.orders(spark, sfDir)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg((sum(Det.money(col("o_totalprice"))) * 100).cast("long").as("v"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), BigInt(r.getDecimal(1).toBigInteger))
    val fresh = operators.SeriesOps.powerSpectrumPlanOf(daily)
      .collect().map(key).sortBy(_._1)
    val memo = operators.SeriesOps.materializedPowerSpectrum(spark, sfDir)
      .collect().map(key).sortBy(_._1)
    assert(memo.nonEmpty && memo.toSeq === fresh.toSeq)
  }

  // ---- 2. ktruss fixpoint certificate ----------------------------------

  test("ktruss certifies the fixpoint strictly inside TrussRounds on the fixture") {
    val trace = operators.GraphOps.ktrussTrace(
      operators.DedupOps.materializedEdges(spark, sfDir)
        .select("doc_a", "doc_b"),
      firstSupport =
        Some(operators.GraphOps.materializedTriangleSupport(spark, sfDir)))
    assert(trace.fixpoint,
      "the graded fixture must reach the 4-truss fixpoint; a false here " +
        "means q_graph_ktruss is emitting a bounded-round SUPERSET — bump " +
        "TrussRounds (the early-exit keeps extra rounds free at fixpoint)")
    assert(trace.roundsUsed < operators.GraphOps.TrussRounds,
      s"fixpoint used ${trace.roundsUsed} of ${operators.GraphOps.TrussRounds} " +
        "rounds — certification requires a no-drop round strictly inside the bound")
  }

  test("ktruss trace round accounting: K4 certifies in 0, a 3-strip cascades in 2") {
    import spark.implicits._
    def trace(pairs: Seq[(Long, Long)]) = operators.GraphOps.ktrussTrace(
      pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .toDF("doc_a", "doc_b"))
    // K4: round 0 drops nothing -> immediate certificate
    val k4 = trace(for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j))
    assert(k4.fixpoint && k4.roundsUsed === 0)
    assert(k4.result.count() === 6L)
    // strip of 3 edge-sharing triangles {1,2,3},{2,3,4},{3,4,5}: round 0
    // peels the support-1 boundary, round 1 peels the now-triangle-less
    // interior pair, round 2 certifies on the empty survivor set
    val strip = trace(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (1L, 3L), (2L, 4L), (3L, 5L)))
    assert(strip.fixpoint && strip.roundsUsed === 2)
    assert(strip.result.count() === 0L)
  }

  // ---- 3. degenerate-calendar contracts (r16 ADVICE) -------------------

  private def dailyFrameOf(vs: Seq[Long]) = {
    import spark.implicits._
    vs.zipWithIndex
      .map { case (v, i) => (java.sql.Date.valueOf(f"2024-01-${i + 1}%02d"), v) }
      .toDF("day", "v")
  }

  test("cumulative periodogram: nd <= 2 yields an empty grid and ZERO rows") {
    // sequence(1, (nd-1) div 2) would DESCEND to [1, 0] at nd = 2 (upper
    // bound 0) and emit a spurious j = 0 frequency without the guard;
    // DuckDB's range(1, 1) is empty, so the shared contract is zero rows
    assert(operators.SeriesOps.tsCumPeriodogramOf(dailyFrameOf(Seq(5L)))
      .collect().isEmpty)
    assert(operators.SeriesOps.tsCumPeriodogramOf(dailyFrameOf(Seq(5L, 7L)))
      .collect().isEmpty)
    // flatness over the same empty spectrum: zero rows (GROUP BY g contract)
    assert(operators.SeriesOps.tsSpectralFlatnessOf(
      operators.SeriesOps.powerSpectrumPlanOf(dailyFrameOf(Seq(5L, 7L))))
      .collect().isEmpty)
    // first non-degenerate calendar (nd = 3 -> exactly one frequency):
    // the guard must be a no-op, not an over-filter — and a series whose
    // every power floors to 0 after the e18 downscale must emit NULL ppm
    // (the zero-total guard) instead of an ANSI divide-by-zero
    val tiny = operators.SeriesOps.tsCumPeriodogramOf(
      dailyFrameOf(Seq(5L, 7L, 4L))).collect()
    assert(tiny.length === 1)
    assert(tiny(0).getLong(1) === 0L, "powers of a cent-scale 3-day series floor to 0")
    assert(tiny(0).isNullAt(3), "zero total -> NULL d_max_ppm on both engines")
    val real = operators.SeriesOps.tsCumPeriodogramOf(
      dailyFrameOf(Seq(5000000L, 7000000L, 4000000L))).collect()
    assert(real.length === 1 && !real(0).isNullAt(3))
  }

  // ---- 4. exact driver replays for #460-#466 ---------------------------

  test("equiv-partner histogram is the exact degree distribution of the pair set") {
    val pairs = operators.GraphOps.structEquiv(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assume(pairs.nonEmpty, "fixture must confirm struct-equiv pairs")
    val partners = (pairs.map(_._1) ++ pairs.map(_._2))
      .groupBy(identity).map { case (_, xs) => xs.length.toLong }
    val expected = partners.groupBy(identity).map { case (np, xs) =>
      np -> (xs.size.toLong, np * xs.size) }
    val got = operators.GraphOps.equivPartners(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expected)
  }

  /** Day-sorted global daily revenue in exact integer cents — the shared
    * input of the #461/#466 replays (the Round16Spec periodogram replay's
    * staging: Det.money mirrored via shortest-string HALF_UP decimal).
    */
  private lazy val dailyCents: Seq[BigInt] = Tables.orders(spark, sfDir)
    .select(to_date(col("o_orderdate")).as("day"), col("o_totalprice"))
    .collect()
    .map { r =>
      val cents = new java.math.BigDecimal(
          java.lang.Double.toString(r.getAs[Number](1).doubleValue))
        .setScale(2, java.math.RoundingMode.HALF_UP)
        .movePointRight(2).toBigIntegerExact()
      (r.getDate(0).toString, BigInt(cents))
    }
    .groupBy(_._1).toSeq.sortBy(_._1)
    .map { case (_, xs) => xs.map(_._2).sum }

  test("spectral flatness matches an exact driver replay (shared libm)") {
    val nd = dailyCents.length
    val kmax = (nd - 1) / 2
    val ps: Seq[BigInt] = (1 to kmax).map { j =>
      var ck = BigInt(0); var sk = BigInt(0)
      dailyCents.zipWithIndex.foreach { case (v, t) =>
        val theta = 2 * math.Pi * j.toDouble * t.toDouble / nd.toDouble
        ck += v * BigInt(math.floor(math.cos(theta) * 1e9).toLong)
        sk += v * BigInt(math.floor(math.sin(theta) * 1e9).toLong)
      }
      val ce = ck / nd; val se = sk / nd
      (ce * ce + se * se) / BigInt("1000000000000000000")
    }
    val qs = ps.map(_ / BigInt(1000000000L)).filter(_ > 0)
    val nPos = BigInt(qs.length)
    val t = qs.sum
    val sumLn = qs.map(q =>
      BigInt(math.floor(math.log(q.toDouble) * 1e9).toLong)).sum
    val gm = sumLn / nPos
    val am = t / nPos
    val flatNano =
      gm - BigInt(math.floor(math.log(am.toDouble) * 1e9).toLong)
    val row = operators.SeriesOps.tsSpectralFlatness(spark, sfDir).collect()
    assert(row.length === 1)
    assert(row(0).getLong(0) === kmax.toLong, "n_bins")
    assert(row(0).getLong(1) === nPos.toLong, "n_pos")
    assert(row(0).getLong(2) === gm.toLong, "gm_ln_nano")
    assert(row(0).getLong(3) === am.toLong, "am_e9")
    assert(row(0).getLong(4) === flatNano.toLong, "ln_flatness_nano")
    // BigInt / truncates toward zero exactly like Spark div (flatness <= 0)
    assert(row(0).getLong(5) === (flatNano / 1000000).toLong, "ln_flatness_milli")
  }

  test("Cox-Stuart matches an exact driver replay") {
    val nd = dailyCents.length
    val h = (nd + 1) / 2
    val pairs = (0 until (nd - h)).map(t => (dailyCents(t), dailyCents(t + h)))
    val sPlus = pairs.count { case (a, b) => b > a }.toLong
    val sMinus = pairs.count { case (a, b) => b < a }.toLong
    val n = sPlus + sMinus
    val z = math.floor((2 * sPlus - n).toDouble / math.sqrt(n.toDouble) * 1000)
      .toLong
    val row = operators.SeriesOps.tsCoxStuart(spark, sfDir).collect()
    assert(row.length === 1)
    assert(row(0).getLong(0) === n, "n_pairs")
    assert(row(0).getLong(1) === sPlus, "s_plus")
    assert(row(0).getLong(2) === sMinus, "s_minus")
    assert(row(0).getLong(3) === z, "z_milli")
    assert(row(0).getBoolean(4) === (math.abs(z) > 1960L), "trend_significant_05")
  }

  /** Per-(type, day) event aggregates in exact integer micro, ts ties
    * broken by event_id — the shared input of the #462-#465 replays (the
    * Round16Spec Garman-Klass replay's staging).
    */
  private lazy val eventDays
      : Seq[(String, String, Long, Long, Long, Long, Long, Long)] = {
    val utc = java.time.ZoneOffset.UTC
    Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toInstant,
        r.getLong(2), math.floor(r.getDouble(3) * 1e6).toLong))
      .groupBy(e => (e._1, e._2.atZone(utc).toLocalDate))
      .toSeq
      .map { case ((t, d), es) =>
        val sorted = es.sortBy(e => (e._2, e._3))
        (t, d.toString, sorted.head._4, es.map(_._4).max, es.map(_._4).min,
          sorted.last._4, es.map(e => BigInt(e._4)).sum.toLong,
          es.length.toLong)
      }
      .sortBy(e => (e._1, e._2))
  }

  private def lnN(x: Long) = math.floor(math.log(x.toDouble) * 1e9).toLong

  test("Parkinson matches an exact driver replay (shared libm)") {
    val expected = eventDays
      .filter(_._5 > 0)
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (t, days) =>
        val ts2 = days.map { case (_, _, _, h, l, _, _, _) =>
          val d1 = BigInt(lnN(h) - lnN(l)); d1 * d1 }.sum
        val n = days.length.toLong
        val varM = ts2 * 1000 / (BigInt(n) * 2772588722L)
        (t, n, varM.toLong, math.floor(math.sqrt(varM.toDouble)).toLong)
      }
    val got = operators.IndicatorOps.winParkinson(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got.nonEmpty && got === expected)
  }

  test("Rogers-Satchell matches an exact driver replay (shared libm)") {
    val expected = eventDays
      .filter(_._5 > 0)
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (t, days) =>
        val ts2 = days.map { case (_, _, o, h, l, c, _, _) =>
          BigInt(lnN(h) - lnN(c)) * (lnN(h) - lnN(o)) +
            BigInt(lnN(l) - lnN(c)) * (lnN(l) - lnN(o)) }.sum
        val n = days.length.toLong
        val varM = ts2 / (BigInt(n) * 1000000L)
        (t, n, varM.toLong, math.floor(math.sqrt(varM.toDouble)).toLong)
      }
    val got = operators.IndicatorOps.winRogersSatchell(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got.nonEmpty && got === expected)
  }

  test("Amihud matches an exact driver replay (shared libm)") {
    val expected = eventDays
      .filter(_._7 > 0)
      .groupBy(_._1).toSeq.sortBy(_._1)
      .flatMap { case (t, days) =>
        val terms = days.sortBy(_._2).sliding(2).collect {
          case Seq(prev, curr) =>
            BigInt(math.abs(lnN(curr._7) - lnN(prev._7))) / curr._8
        }.toSeq
        if (terms.isEmpty) None
        else Some((t, terms.length.toLong, (terms.sum / terms.length).toLong))
      }
    val got = operators.IndicatorOps.winAmihud(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty && got === expected)
  }

  test("Sortino matches an exact driver replay (shared libm)") {
    val expected = eventDays
      .filter(_._7 > 0)
      .groupBy(_._1).toSeq.sortBy(_._1)
      .flatMap { case (t, days) =>
        val rs = days.sortBy(_._2).sliding(2).collect {
          case Seq(prev, curr) => BigInt(lnN(curr._7) - lnN(prev._7))
        }.toSeq
        if (rs.isEmpty) None
        else {
          val n = rs.length.toLong
          val mean = (rs.sum / n).toLong
          val sdd2 = rs.filter(_ < 0).map(r => r * r).sum
          val semi = math.floor(math.sqrt(
            (sdd2 / (BigInt(n) * 1000000L)).toDouble)).toLong
          val ratio: Option[Long] = if (semi > 0) Some(mean / semi) else None
          Some((t, n, mean, semi, ratio))
        }
      }
    val got = operators.IndicatorOps.winSortino(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    assert(got.nonEmpty && got === expected)
  }
}
