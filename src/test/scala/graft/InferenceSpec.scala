package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral checks for InferenceOps, independent of the DuckDB oracle:
  * each statistic is re-derived by a naive driver-side recomputation over
  * the collected sf0.001 fixture (the O(row-count) / O(n log n) textbook
  * form the distributed grouped-sums formulation replaces), plus the
  * defining range/invariance laws.
  */
class InferenceSpec extends AnyFunSuite with SparkFixture {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("welchT matches a naive driver recomputation") {
    val row = operators.InferenceOps.welchT(spark, sfDir).collect()(0)
    val d = Tables.documents(spark, sfDir)
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0) == "en", r.getLong(1).toDouble))
    val en = d.filter(_._1).map(_._2)
    val ot = d.filterNot(_._1).map(_._2)
    def meanVar(xs: Array[Double]): (Double, Double) = {
      val m = xs.sum / xs.length
      (m, xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
    }
    val (m1, v1) = meanVar(en); val (m2, v2) = meanVar(ot)
    val se = v1 / en.length + v2 / ot.length
    assert(row.getLong(0) === en.length.toLong)
    assert(row.getLong(1) === ot.length.toLong)
    assert(math.abs(row.getDouble(3) - (m1 - m2) / math.sqrt(se)) < 1e-4,
      "t statistic")
    val df = se * se /
      (math.pow(v1 / en.length, 2) / (en.length - 1) +
        math.pow(v2 / ot.length, 2) / (ot.length - 1))
    assert(math.abs(row.getDouble(4) - df) < 1e-3, "Welch-Satterthwaite df")
    // df must land between min(n1,n2)-1 and n1+n2-2
    assert(row.getDouble(4) >= math.min(en.length, ot.length) - 1.0)
    assert(row.getDouble(4) <= en.length + ot.length - 2.0)
  }

  test("anovaLang matches naive SSB/SSW and F is consistent with them") {
    val row = operators.InferenceOps.anovaLang(spark, sfDir).collect()(0)
    val d = Tables.documents(spark, sfDir)
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1).toDouble))
    val groups = d.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val all = d.map(_._2)
    val grand = all.sum / all.length
    val ssb = groups.values.map { xs =>
      val m = xs.sum / xs.length; xs.length * (m - grand) * (m - grand)
    }.sum
    val ssw = groups.values.map { xs =>
      val m = xs.sum / xs.length; xs.map(x => (x - m) * (x - m)).sum
    }.sum
    val k = groups.size; val n = all.length
    assert(row.getLong(0) === k.toLong)
    assert(row.getLong(1) === n.toLong)
    assert(math.abs(row.getDouble(2) - ssb) < 1e-2, "SSB")
    assert(math.abs(row.getDouble(3) - ssw) < 1e-2, "SSW")
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    assert(math.abs(row.getDouble(4) - f) < 1e-4, "F statistic")
  }

  test("spearman matches naive average-rank correlation and is in [-1,1]") {
    val row = operators.InferenceOps.spearman(spark, sfDir).collect()(0)
    val u = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("x"),
        sum(floor(col("value") * 1e6).cast("long")).as("y"))
      .collect().map(r => (r.getLong(1).toDouble, r.getLong(2).toDouble))
    def avgRanks(xs: Array[Double]): Array[Double] = {
      val sorted = xs.zipWithIndex.sortBy(_._1)
      val ranks = new Array[Double](xs.length)
      var i = 0
      while (i < sorted.length) {
        var j = i
        while (j + 1 < sorted.length && sorted(j + 1)._1 == sorted(i)._1) j += 1
        val avg = (i + j + 2) / 2.0 // 1-based average rank of the tie run
        (i to j).foreach(t => ranks(sorted(t)._2) = avg)
        i = j + 1
      }
      ranks
    }
    val rx = avgRanks(u.map(_._1)); val ry = avgRanks(u.map(_._2))
    val n = u.length
    val mx = rx.sum / n; val my = ry.sum / n
    val num = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
    val den = math.sqrt(rx.map(a => (a - mx) * (a - mx)).sum *
      ry.map(b => (b - my) * (b - my)).sum)
    assert(row.getLong(0) === n.toLong)
    val rho = row.getDouble(1)
    assert(rho >= -1.0 && rho <= 1.0)
    assert(math.abs(rho - num / den) < 1e-6, "rho vs naive average-rank Pearson")
  }

  test("crossCorrLag1 emits every ordered pair once, all within [-1,1]") {
    val rows = operators.InferenceOps.crossCorrLag1(spark, sfDir).collect()
    val pairs = rows.map(r => (r.getString(0), r.getString(1)))
    assert(pairs.distinct.length === pairs.length)
    assert(pairs.forall { case (a, b) => a != b })
    rows.foreach { r =>
      assert(r.getLong(2) >= 2, "at least two joined days")
      val x = r.getDouble(3)
      assert(x >= -1.0 - 1e-9 && x <= 1.0 + 1e-9, s"xcorr out of range: $x")
    }
    // lag-1 self-correlation is excluded by construction; the pair count
    // is |types| * (|types| - 1) when every series has variance
    val types = Tables.events(spark, sfDir)
      .select("event_type").distinct().count()
    assert(pairs.length === (types * (types - 1)).toInt)
  }

  test("olsMulti matches a driver-side exact integer normal-equations solve") {
    val per = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey").as("okey"))
      .agg(count(lit(1)).as("x1"), sum(col("l_quantity").cast("long")).as("x2"))
      .join(Tables.orders(spark, sfDir).select(col("o_orderkey").as("okey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("y")), Seq("okey"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = BigInt(per.length)
    val (t1, t2, ty) = (BigInt(per.map(_._1).sum), BigInt(per.map(_._2).sum),
      per.map(p => BigInt(p._3)).sum)
    val (p1, p2, py) = (t1 / n, t2 / n, ty / n)
    val c = per.map { case (x1, x2, y) => (BigInt(x1) - p1, BigInt(x2) - p2, BigInt(y) - py) }
    val (s1, s2, sy) = (c.map(_._1).sum, c.map(_._2).sum, c.map(_._3).sum)
    def mom(f: ((BigInt, BigInt, BigInt)) => BigInt): BigInt = c.map(f).sum
    val S11 = (n * mom(t => t._1 * t._1) - s1 * s1) / n
    val S12 = (n * mom(t => t._1 * t._2) - s1 * s2) / n
    val S22 = (n * mom(t => t._2 * t._2) - s2 * s2) / n
    val S1y = (n * mom(t => t._1 * t._3) - s1 * sy) / n
    val S2y = (n * mom(t => t._2 * t._3) - s2 * sy) / n
    val SyyN = n * mom(t => t._3 * t._3) - sy * sy
    val det = S11 * S22 - S12 * S12
    val b1 = (S1y * S22 - S2y * S12) * 1000000 / det
    val b2 = (S2y * S11 - S1y * S12) * 1000000 / det
    val b0 = (ty * 1000000 - b1 * t1 - b2 * t2) / n
    val r2 = (b1 * S1y + b2 * S2y) * n / SyyN
    val r = operators.InferenceOps.olsMulti(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_orders") === per.length.toLong)
    assert(r.getAs[Long]("beta1_micro") === b1.toLong)
    assert(r.getAs[Long]("beta2_micro") === b2.toLong)
    assert(r.getAs[Long]("intercept_micro") === b0.toLong)
    assert(r.getAs[Long]("r2_ppm") === r2.toLong)
    assert(r2 >= 0 && r2 <= 1000000, s"r2_ppm in range: $r2")
  }

  test("conformal interval equals a driver replay and roughly honors 1-alpha") {
    val r = operators.InferenceOps.conformalInterval(spark, sfDir).collect()(0)
    val betas = operators.InferenceOps.olsMulti(spark, sfDir).collect()(0)
    val (b1, b2, b0) = (betas.getAs[Long]("beta1_micro"),
      betas.getAs[Long]("beta2_micro"), betas.getAs[Long]("intercept_micro"))
    val per = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey").as("okey"))
      .agg(count(lit(1)).as("x1"), sum(col("l_quantity").cast("long")).as("x2"))
      .join(Tables.orders(spark, sfDir).select(col("o_orderkey").as("okey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("y")), Seq("okey"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    def md5hex2(s: String): String = {
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(1).map("%02x".format(_)).mkString
    }
    val resid = per.map { case (k, x1, x2, y) =>
      (k, md5hex2(s"conf:$k") < "40",
        math.abs(y * 1000000L - b1 * x1 - b2 * x2 - b0))
    }
    val cal = resid.filter(_._2).map(x => (x._3, x._1)).sorted
    val qIdx = (9 * (cal.length + 1) + 9) / 10
    val qHat = cal(qIdx - 1)._1
    assert(r.getAs[Long]("n_cal") === cal.length.toLong)
    assert(r.getAs[Long]("q_hat_micro") === qHat)
    val test = resid.filterNot(_._2)
    val covered = test.count(_._3 <= qHat).toLong
    assert(r.getAs[Long]("n_test") === test.length.toLong)
    assert(r.getAs[Long]("n_covered") === covered)
    assert(r.getAs[Long]("coverage_ppm") === covered * 1000000L / test.length)
    // the distribution-free guarantee is on expectation; a realized split
    // sits near 1-alpha — keep a wide band so the law, not luck, is pinned
    assert(r.getAs[Long]("coverage_ppm") >= 850000L &&
      r.getAs[Long]("coverage_ppm") <= 1000000L)
  }

  test("kendallDaily equals brute-force pair classification on the daily series") {
    val r = operators.InferenceOps.kendallDaily(spark, sfDir).collect()(0)
    val daily = Tables.orders(spark, sfDir)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("x"),
        sum(round(col("o_totalprice") * 100, 0).cast("long")).as("y"))
      .collect().map(x => (x.getTimestamp(0).getTime, x.getLong(1), x.getLong(2)))
    var c = 0L; var d = 0L; var tx = 0L; var ty = 0L; var np = 0L
    for (i <- daily.indices; j <- daily.indices; if daily(i)._1 < daily(j)._1) {
      np += 1
      val sx = (daily(j)._2 - daily(i)._2).sign
      val sy = (daily(j)._3 - daily(i)._3).sign
      if (sx * sy > 0) c += 1 else if (sx * sy < 0) d += 1
      if (sx == 0) tx += 1
      if (sy == 0) ty += 1
    }
    assert(r.getAs[Long]("n_pairs") === np)
    assert(r.getAs[Long]("n_concordant") === c)
    assert(r.getAs[Long]("n_discordant") === d)
    assert(r.getAs[Long]("n_ties_x") === tx)
    assert(r.getAs[Long]("n_ties_y") === ty)
    assert(r.getAs[Long]("tau_a_ppm") ===
      BigInt((c - d) * 1000000L)./(BigInt(np)).toLong)
    assert(math.abs(r.getAs[Long]("tau_a_ppm")) <= 1000000L)
  }

  test("propZ: counts partition events and z2 matches the closed form") {
    val r = operators.InferenceOps.propZ(spark, sfDir).collect()(0)
    val ev = Tables.events(spark, sfDir)
      .select(dayofweek(col("ts")).isin(1, 7).as("we"),
        (col("event_type") === "purchase").as("hit"))
      .collect().map(x => (x.getBoolean(0), x.getBoolean(1)))
    val nWe = ev.count(_._1).toLong; val xWe = ev.count(e => e._1 && e._2).toLong
    val nWd = ev.size - nWe; val xWd = ev.count(e => !e._1 && e._2).toLong
    assert(r.getAs[Long]("n_we") === nWe)
    assert(r.getAs[Long]("x_we") === xWe)
    assert(r.getAs[Long]("n_wd") === nWd)
    assert(r.getAs[Long]("x_wd") === xWd)
    val pWe = xWe * 1000000L / nWe; val pWd = xWd * 1000000L / nWd
    val pPool = (xWe + xWd) * 1000000L / (nWe + nWd)
    val dppm = pWe - pWd
    val z2 = BigInt(dppm) * dppm * nWe * nWd * 1000 /
      (BigInt(pPool) * (1000000L - pPool) * (nWe + nWd))
    assert(r.getAs[Long]("p_we_ppm") === pWe)
    assert(r.getAs[Long]("p_wd_ppm") === pWd)
    assert(r.getAs[Long]("z2_milli") === z2.toLong)
    assert(r.getAs[Boolean]("significant_05") === (z2.toLong > 3841L))
  }

  test("priceElasticity: slope matches a naive per-brand ln-ln regression") {
    val rows = operators.InferenceOps.priceElasticity(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brand = Tables.part(spark, sfDir).select("p_partkey", "p_brand")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val pts = li.filter(_._2 > 0).map { case (pk, qty, cents) =>
      (brand(pk),
        math.floor(math.log((cents / qty).toDouble) * 1e9).toLong,
        math.floor(math.log(qty.toDouble) * 1e9).toLong)
    }.groupBy(_._1)
    rows.foreach { r =>
      val b = r.getString(0)
      val xs = pts(b)
      val n = xs.length
      val sx = xs.map(p => BigInt(p._2)).sum; val sy = xs.map(p => BigInt(p._3)).sum
      val sxy = xs.map(p => BigInt(p._2) * p._3).sum
      val sxx = xs.map(p => BigInt(p._2) * p._2).sum
      val syy = xs.map(p => BigInt(p._3) * p._3).sum
      val Sxx = n * sxx - sx * sx; val Sxy = n * sxy - sx * sy
      val Syy = n * syy - sy * sy
      assert(r.getAs[Long]("n") === n.toLong, s"n for $b")
      val slope = (Sxy * 1000000) / Sxx
      assert(r.getAs[Long]("elasticity_micro") === slope.toLong, s"slope for $b")
      val r2 = (slope * Sxy) / Syy
      assert(r.getAs[Long]("r2_ppm") === r2.toLong, s"r2 for $b")
      assert(r2.toLong >= 0L && r2.toLong <= 1000000L, s"r2 range for $b")
    }
  }

  test("wilsonCi: interval brackets p_hat, stays in [0,1], matches closed form") {
    val rows = operators.InferenceOps.wilsonCi(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n").toDouble
      val x = r.getAs[Long]("x").toDouble
      val p = x / n
      assert(r.getAs[Double]("p_hat") === round6(p))
      val denom = 1.0 + 3.8416 / n
      val center = (p + 1.9208 / n) / denom
      val half = 1.96 * math.sqrt(p * (1.0 - p) / n + 0.9604 / (n * n)) / denom
      assert(math.abs(r.getAs[Double]("wilson_lo") - (center - half)) < 1e-5)
      assert(math.abs(r.getAs[Double]("wilson_hi") - (center + half)) < 1e-5)
      assert(r.getAs[Double]("wilson_lo") >= 0.0 - 1e-9)
      assert(r.getAs[Double]("wilson_hi") <= 1.0 + 1e-9)
      assert(r.getAs[Double]("wilson_lo") <= r.getAs[Double]("p_hat") + 1e-9)
      assert(r.getAs[Double]("wilson_hi") >= r.getAs[Double]("p_hat") - 1e-9)
    }
  }

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("cuped: theta matches naive pooled Sxy/Sxx and rho2 is in [0, 1e6]") {
    val r = operators.InferenceOps.cuped(spark, sfDir).collect()(0)
    val per = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase",
          floor(col("value") * 1e6).cast("long")).otherwise(0L)).as("y"))
      .collect()
      .map(x => (x.getLong(0), x.getLong(1).toDouble, x.getLong(2).toDouble))
    val n = per.length
    val sxy = per.map(p => p._2 * p._3).sum; val sx = per.map(_._2).sum
    val sy = per.map(_._3).sum; val sxx = per.map(p => p._2 * p._2).sum
    val syy = per.map(p => p._3 * p._3).sum
    val theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(r.getAs[Long]("n_users") === n.toLong)
    assert(math.abs(r.getAs[Long]("theta_micro") / 1e6 - theta) < 1e-5,
      "pooled theta")
    val rho2 = math.pow(n * sxy - sx * sy, 2) /
      ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(math.abs(r.getAs[Long]("var_reduction_ppm") / 1e6 - rho2) < 1e-4)
    assert(r.getAs[Long]("var_reduction_ppm") >= 0L)
    assert(r.getAs[Long]("var_reduction_ppm") <= 1000000L)
    // arms partition the users under the md5 split
    val nT = per.count(p => md5Hex(s"cuped:${p._1}").charAt(0) < '8').toLong
    assert(r.getAs[Long]("n_t") === nT)
    assert(r.getAs[Long]("n_c") === n - nT)
  }

  test("didEstimator: cell means are naive-exact and DiD is their combination") {
    val r = operators.InferenceOps.didEstimator(spark, sfDir).collect()(0)
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), dayofmonth(col("ts")).as("dom"),
        floor(col("value") * 1e6).cast("long").as("y"))
      .collect()
      .map(x => (md5Hex(s"did:${x.getLong(0)}").charAt(0) < '8',
        x.getInt(1) <= 15, x.getLong(2)))
    def cell(t: Boolean, p: Boolean): (Long, Long) = {
      val ys = ev.filter(e => e._1 == t && e._2 == p).map(_._3)
      (ys.length.toLong,
        (ys.map(BigInt(_)).sum / ys.length).toLong)
    }
    val (ntp, mtp) = cell(t = true, p = true)
    val (nto, mto) = cell(t = true, p = false)
    val (ncp, mcp) = cell(t = false, p = true)
    val (nco, mco) = cell(t = false, p = false)
    assert(r.getAs[Long]("n_t_pre") === ntp)
    assert(r.getAs[Long]("m_t_pre") === mtp)
    assert(r.getAs[Long]("n_t_post") === nto)
    assert(r.getAs[Long]("m_t_post") === mto)
    assert(r.getAs[Long]("n_c_pre") === ncp)
    assert(r.getAs[Long]("m_c_pre") === mcp)
    assert(r.getAs[Long]("n_c_post") === nco)
    assert(r.getAs[Long]("m_c_post") === mco)
    assert(r.getAs[Long]("did_micro") === (mto - mtp) - (mco - mcp))
  }

  test("dispersion: naive daily var/mean per type, chi2 = D*(n-1)") {
    val rows = operators.InferenceOps.dispersion(spark, sfDir).collect()
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(x => (x.getString(0), x.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2.toDouble)).toMap
    assert(rows.map(_.getString(0)).toSeq === daily.keys.toSeq.sorted)
    rows.foreach { r =>
      val xs = daily(r.getString(0))
      val n = xs.length; val m = xs.sum / n
      val s2 = xs.map(x => (x - m) * (x - m)).sum / (n - 1)
      assert(r.getAs[Long]("n_days") === n.toLong)
      assert(r.getAs[Long]("n_events") === xs.sum.toLong)
      assert(math.abs(r.getAs[Long]("dispersion_milli") / 1e3 - s2 / m) < 2e-3,
        s"dispersion for ${r.getString(0)}")
      assert(r.getAs[Long]("chi2_milli") ===
        r.getAs[Long]("dispersion_milli") * (n - 1))
    }
  }

  test("kendallW matches a driver half-rank concordance replay") {
    val r = operators.InferenceOps.kendallW(spark, sfDir).collect()(0)
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("x"))
      .collect().map(row => (row.getString(0), row.getTimestamp(1).getTime,
        row.getLong(2)))
    val k = daily.map(_._1).distinct.size
    val commonDays = daily.groupBy(_._2).collect {
      case (d, es) if es.size == k => d }.toSet
    val block = daily.filter(e => commonDays(e._2))
    val n = commonDays.size.toLong
    // half-ranks per type
    val r2of = block.groupBy(_._1).view.mapValues { es =>
      val xs = es.map(_._3)
      es.map(e => e._2 ->
        (2L * (xs.count(_ < e._3) + 1) + xs.count(_ == e._3) - 1)).toMap
    }.toMap
    val s2 = commonDays.toSeq.map { d =>
      val r2d = r2of.values.map(_(d)).sum
      val dev = BigInt(r2d) - k * (n + 1)
      dev * dev
    }.sum
    val tsum = block.groupBy(_._1).values.flatMap(
      _.groupBy(_._3).values.map { g =>
        val t = BigInt(g.size); t * t * t - t }).sum
    val denom = BigInt(k) * k * (BigInt(n) * n * n - n) - k * tsum
    val w = (3 * s2 * 1000000) / denom
    assert(r.getAs[Long]("k") === k.toLong)
    assert(r.getAs[Long]("n_days") === n)
    assert(r.getAs[Long]("w_ppm") === w.toLong)
    assert(w >= 0 && w <= 1000000, s"W out of [0,1]: $w")
    assert(r.getAs[Long]("chi2_milli") === (k * (n - 1) * w / 1000).toLong)
  }

  test("durbinWatson matches a staged-residual BigInt replay") {
    val rows = operators.InferenceOps.durbinWatson(spark, sfDir).collect()
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("x"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime,
        r.getLong(2))).groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getString(0)
      val xs = daily(et).sortBy(_._2).map(_._3)
      val pairs = xs.zip(xs.drop(1)).map { case (p, x) =>
        (BigInt(p), BigInt(x) - p) }
      val n = BigInt(pairs.length)
      val sz = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val szy = pairs.map(p => p._1 * p._2).sum
      val szz = pairs.map(p => p._1 * p._1).sum
      val slope = ((n * szy - sz * sy) * 1000000) / (n * szz - sz * sz)
      val c = (1000000 * sy - slope * sz) / n
      val eem = pairs.map { case (z, y) =>
        (1000000 * y - slope * z - c) / 1000 }
      val see = eem.map(e => e * e).sum
      val sdd = eem.zip(eem.drop(1)).map { case (a, b) => (b - a) * (b - a) }.sum
      assert(r.getAs[Long]("slope_micro") === slope.toLong, s"slope $et")
      assert(r.getAs[Long]("dw_milli") === ((sdd * 1000) / see).toLong,
        s"dw for $et")
      assert(r.getAs[Long]("dw_milli") >= 0 &&
        r.getAs[Long]("dw_milli") <= 4000, s"dw range for $et")
    }
  }

  test("moodMedian matches a driver doubled-median contingency replay") {
    val r = operators.InferenceOps.moodMedian(spark, sfDir).collect()(0)
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("x"))
      .collect().map(row => (row.getString(0), row.getTimestamp(1).getTime,
        row.getLong(2)))
    val sorted = daily.sortBy(d => (d._3, d._1, d._2)).map(_._3)
    val n = sorted.length
    val med2 = if (n % 2 == 1) 2 * sorted(n / 2)
      else sorted(n / 2 - 1) + sorted(n / 2)
    val byType = daily.groupBy(_._1).view.mapValues { ds =>
      val above = ds.count(_._3 * 2 > med2).toLong
      (above, ds.length - above)
    }.toMap
    val ta = byType.values.map(_._1).sum
    val tb = byType.values.map(_._2).sum
    val chi2 = byType.values.map { case (oa, ob) =>
      val ea = ((oa + ob) * ta).toDouble / (ta + tb)
      val eb = ((oa + ob) * tb).toDouble / (ta + tb)
      math.floor((oa - ea) * (oa - ea) / ea * 1e9).toLong +
        math.floor((ob - eb) * (ob - eb) / eb * 1e9).toLong
    }.sum
    assert(r.getAs[Long]("k") === byType.size.toLong)
    assert(r.getAs[Long]("n_days") === n.toLong)
    assert(r.getAs[Long]("dof") === byType.size.toLong - 1)
    assert(r.getAs[Double]("chi2") ===
      BigDecimal(chi2 / 1e9).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
  }

  test("grubbs matches a BigInt argmax-deviation replay") {
    val rows = operators.InferenceOps.grubbs(spark, sfDir).collect()
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("x"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getString(0)
      val es = daily(et)
      val n = BigInt(es.length)
      val sx = es.map(e => BigInt(e._3)).sum
      val qx = es.map(e => BigInt(e._3) * e._3).sum
      val peak = es.map(e => ((n * e._3 - sx).abs, e._2.getTime, e._3))
        .sortBy(p => (-p._1, p._2)).head
      assert(r.getAs[Long]("n") === es.length.toLong)
      assert(r.getAs[java.sql.Timestamp]("peak_day").getTime === peak._2)
      assert(r.getAs[Long]("peak_x") === peak._3)
      val g2 = (peak._1 * peak._1 * (n - 1) * 1000) / (n * (n * qx - sx * sx))
      assert(r.getAs[Long]("g2_milli") === g2.toLong, s"g2 for $et")
    }
  }

  test("tukeyHsd matches a BigInt pairwise replay and pairs are complete") {
    val rows = operators.InferenceOps.tukeyHsd(spark, sfDir).collect()
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val k = daily.size
    assert(rows.length === k * (k - 1) / 2)
    val mom = daily.view.mapValues { xs =>
      val n = BigInt(xs.length)
      val s = xs.map(BigInt(_)).sum
      val sm = xs.map(x => BigInt(x / 1000)).sum
      val qm = xs.map(x => BigInt(x / 1000) * (x / 1000)).sum
      (n, s, sm, (n * qm - sm * sm) / n)
    }.toMap
    val ssw = mom.values.map(_._4).sum
    val nTot = mom.values.map(_._1).sum
    rows.foreach { r =>
      val (na, sa, sma, _) = mom(r.getString(0))
      val (nb, sb, smb, _) = mom(r.getString(1))
      assert(r.getAs[Long]("diff_micro") ===
        ((sa * nb - sb * na) / (na * nb)).toLong)
      val q2 = ((sma * nb - smb * na) * (sma * nb - smb * na) * 2
        * (nTot - k) * 1000) / (ssw * (na + nb) * na * nb)
      assert(r.getAs[Long]("q2_obs_milli") === q2.toLong,
        s"q2 for ${r.getString(0)}/${r.getString(1)}")
      assert(r.getAs[Boolean]("significant_05") ===
        (q2.toLong > r.getAs[Long]("q2_crit_milli")))
    }
  }

  test("leveneBF matches an exact doubled-median BigInt driver replay") {
    val r = operators.InferenceOps.leveneBF(spark, sfDir).collect()(0)
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("x"))
      .collect().map(row => (row.getString(0), row.getTimestamp(1), row.getLong(2)))
      .groupBy(_._1)
    val groups = daily.values.map { es =>
      val xs = es.sortBy(e => (e._3, e._2.getTime)).map(_._3)
      val n = xs.length
      val med2 = if (n % 2 == 1) 2 * xs(n / 2)
        else xs(n / 2 - 1) + xs(n / 2)
      xs.map(x => BigInt((2 * x - med2).abs / 1000))
    }.toSeq
    val k = groups.length.toLong
    val nTot = groups.map(_.length).sum.toLong
    val sbPart = groups.map { zs => (zs.sum * zs.sum) / zs.length }.sum
    val st = groups.map(_.sum).sum
    val qt = groups.map(zs => zs.map(z => z * z).sum).sum
    val ssb = sbPart - (st * st) / nTot
    val ssw = qt - sbPart
    val f = (ssb * (nTot - k) * 1000) / (ssw * (k - 1))
    assert(r.getAs[Long]("k") === k)
    assert(r.getAs[Long]("n_total") === nTot)
    assert(r.getAs[Long]("f_milli") === f.toLong)
    assert(ssw > 0 && ssb >= 0)
  }

  test("kruskalWallis matches an exact half-rank BigInt driver replay") {
    val r = operators.InferenceOps.kruskalWallis(spark, sfDir).collect()(0)
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("x"))
      .collect().map(row => (row.getString(0), row.getLong(2)))
    val all = daily.map(_._2)
    val n = all.length.toLong
    def r2(v: Long) = 2L * all.count(_ < v) + all.count(_ == v) + 1
    val groups = daily.groupBy(_._1).values.map(_.map(_._2))
    val sMilli = groups.map { xs =>
      val r2i = xs.map(v => BigInt(r2(v))).sum
      (r2i * r2i * 1000) / xs.length
    }.sum
    val hMilli = (3 * sMilli) / (n * (n + 1)) - 3000 * (n + 1)
    val tie3 = all.groupBy(identity).values
      .map(g => { val t = BigInt(g.length); t * t * t - t }).sum
    val n3n = BigInt(n) * n * n - n
    val hcMilli = (hMilli * n3n) / (n3n - tie3)
    assert(r.getAs[Long]("n_total") === n)
    assert(r.getAs[Long]("k") === groups.size.toLong)
    assert(r.getAs[Long]("h_milli") === hMilli.toLong)
    assert(r.getAs[Long]("h_c_milli") === hcMilli.toLong)
    assert(r.getAs[Boolean]("significant_05") ===
      (hcMilli.toLong > r.getAs[Long]("chi2_crit_milli")))
  }

  test("cohensD matches the exact single-quotient BigInt closed form") {
    val rows = operators.InferenceOps.cohensD(spark, sfDir).collect()
    val evs = Tables.events(spark, sfDir)
      .select(col("event_type"),
        when(dayofweek(col("ts")).isin(1, 7), 1L).otherwise(0L).as("we"),
        floor(col("value") * 1e6).cast("long").as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getString(0)
      val (wes, wds) = evs(et).partition(_._2 == 1L)
      val n1 = BigInt(wes.length); val n2 = BigInt(wds.length)
      val s1 = wes.map(e => BigInt(e._3)).sum
      val s2 = wds.map(e => BigInt(e._3)).sum
      val q1 = wes.map(e => BigInt(e._3) * e._3).sum
      val q2 = wds.map(e => BigInt(e._3) * e._3).sum
      val num = s1 * n2 - s2 * n1
      val pooled = (n1 * q1 - s1 * s1) * n2 + (n2 * q2 - s2 * s2) * n1
      assert(r.getAs[Long]("n_we") === n1.toLong)
      assert(r.getAs[Long]("n_wd") === n2.toLong)
      assert(r.getAs[Long]("diff_micro") === (num / (n1 * n2)).toLong)
      assert(r.getAs[Long]("d_sign") === num.signum.toLong)
      val d2 = (num * num * (n1 + n2 - 2) * 1000) / (pooled * n1 * n2)
      assert(r.getAs[Long]("d2_milli") === d2.toLong, s"d2 for $et")
      assert(d2 >= 0, s"d2 must be non-negative for $et")
    }
  }

  test("runsTest matches an exact driver replay of flags, runs, and z2") {
    val rows = operators.InferenceOps.runsTest(spark, sfDir).collect()
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("x"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { rr =>
      val et = rr.getString(0)
      val xs = daily(et).sortBy(_._2.getTime).map(_._3)
      val n = xs.length.toLong
      val sx = xs.map(BigInt(_)).sum
      val flags = xs.map(x => if (BigInt(x) * n > sx) 1L else 0L)
      val n1 = flags.sum
      val runs = 1L + flags.zip(flags.drop(1)).count { case (a, b) => a != b }
      assert(rr.getAs[Long]("n") === n, s"n for $et")
      assert(rr.getAs[Long]("n1") === n1, s"n1 for $et")
      assert(rr.getAs[Long]("n2") === n - n1, s"n2 for $et")
      assert(rr.getAs[Long]("r") === runs, s"runs for $et")
      val m2 = BigInt(2) * n1 * (n - n1)
      val dev = BigInt(n) * runs - n - m2
      val z2 = (dev * dev * (n - 1) * 1000) / (m2 * (m2 - n))
      assert(rr.getAs[Long]("z2_milli") === z2.toLong, s"z2 for $et")
      assert(rr.getAs[Boolean]("nonrandom_05") === (z2 > 3841))
    }
  }
}
