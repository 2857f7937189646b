package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral checks for the EvalOps metrics, independent of the DuckDB
  * oracle: AUC and Mann-Whitney are re-derived by brute-force driver
  * loops over the collected fixture (O(N^2) pair counting — exactly the
  * computation the distributed formulation avoids), the bootstrap by
  * recomputing one replicate end to end, and the rest through their
  * defining conservation laws.
  */
class EvalSpec extends AnyFunSuite with SparkFixture {

  private def docs =
    Tables.documents(spark, sfDir)
      .select(col("n_chars"), (col("lang") === "en").cast("int"))
      .collect().map(r => (r.getLong(0), r.getInt(1) == 1))

  test("evalAuc equals brute-force pair counting on the collected fixture") {
    val row = operators.EvalOps.evalAuc(spark, sfDir).collect()(0)
    val d = docs
    val pos = d.filter(_._2).map(_._1)
    val neg = d.filterNot(_._2).map(_._1)
    var c = 0L; var t = 0L
    for (p <- pos; n <- neg) {
      if (p > n) c += 1 else if (p == n) t += 1
    }
    assert(row.getLong(0) === pos.length.toLong)
    assert(row.getLong(1) === neg.length.toLong)
    assert(row.getLong(2) === c, "concordant pairs")
    assert(row.getLong(3) === t, "tied pairs")
    val auc = row.getDouble(4)
    assert(auc >= 0.0 && auc <= 1.0)
    assert(auc === BigDecimal((2.0 * c + t) / (2.0 * pos.length * neg.length))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("evalCalibration conserves docs and keeps rates in [0, 1e6]") {
    val rows = operators.EvalOps.evalCalibration(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum === docs.length.toLong)
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 9)
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 1000000, "mean score ppm")
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 1000000, "pos rate ppm")
      assert(r.getLong(3) <= r.getLong(1), "n_pos <= n")
    }
    // bins must arrive sorted (total ORDER BY discipline)
    assert(rows.map(_.getLong(0)).toSeq === rows.map(_.getLong(0)).sorted.toSeq)
  }

  test("evalConfusion conserves the label marginals at every threshold") {
    val rows = operators.EvalOps.evalConfusion(spark, sfDir).collect()
    assert(rows.length === 3)
    val nPos = docs.count(_._2).toLong
    val n = docs.length.toLong
    rows.foreach { r =>
      val (tp, fp, fn, tn) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(tp + fn === nPos, "positive marginal")
      assert(tp + fp + fn + tn === n, "total conservation")
      // recall must fall as the threshold rises (weakly)
    }
    val recalls = rows.map(_.getLong(6))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a >= b },
      "recall monotone non-increasing in threshold")
  }

  test("mutualInfo matches a driver recomputation under the same floor-ln") {
    val row = operators.EvalOps.mutualInfo(spark, sfDir).collect()(0)
    val cells = Tables.documents(spark, sfDir)
      .groupBy("lang", "source").count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val n = cells.map(_._2).sum
    val nl = cells.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val ns = cells.groupBy(_._1._2).view.mapValues(_.map(_._2).sum).toMap
    def lnNano(x: Long): Long = math.floor(math.log(x.toDouble) * 1e9).toLong
    val miNum = cells.map { case ((l, s2), c) =>
      BigInt(c) * (lnNano(c) + lnNano(n) - lnNano(nl(l)) - lnNano(ns(s2)))
    }.sum
    val hlNum = BigInt(n) * lnNano(n) - nl.values.map(v => BigInt(v) * lnNano(v)).sum
    val hsNum = BigInt(n) * lnNano(n) - ns.values.map(v => BigInt(v) * lnNano(v)).sum
    assert(row.getLong(0) === n)
    assert(row.getLong(1) === (hlNum / n).toLong, "H(lang)")
    assert(row.getLong(2) === (hsNum / n).toLong, "H(source)")
    assert(row.getLong(3) === (miNum / n).toLong, "MI")
    assert(row.getLong(3) >= 0L, "MI non-negative")
    // MI <= min(H): information about one variable can't exceed its entropy
    assert(row.getLong(3) <= math.min(row.getLong(1), row.getLong(2)))
  }

  test("mannWhitney equals brute-force pair counting over event values") {
    val row = operators.EvalOps.mannWhitney(spark, sfDir).collect()(0)
    val vals = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("purchase", "click"))
      .select(round(col("value") * 100, 0).cast("long"),
        (col("event_type") === "purchase").cast("int"))
      .collect().map(r => (r.getLong(0), r.getInt(1) == 1))
    val a = vals.filter(_._2).map(_._1)
    val b = vals.filterNot(_._2).map(_._1)
    var wins2 = 0L // 2*wins + ties, i.e. u2 by brute force
    for (x <- a; y <- b) {
      if (x > y) wins2 += 2 else if (x == y) wins2 += 1
    }
    assert(row.getLong(0) === a.length.toLong)
    assert(row.getLong(1) === b.length.toLong)
    assert(row.getLong(2) === wins2, "2*U via pair counting")
    assert(row.getLong(3) >= 0L && row.getLong(3) <= 1000000L)
  }

  test("bootstrapCi brackets the point estimate and replicate 0 recomputes exactly") {
    val row = operators.EvalOps.bootstrapCi(spark, sfDir).collect()(0)
    val (nOrders, mean, lo, hi) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(lo <= hi)
    // fixture pin, not a theorem: a 95% CI should cover the point estimate
    // on this deterministic fixture (it does; a regeneration that breaks
    // this signals a hash/threshold drift, not sampling noise)
    assert(lo <= mean && mean <= hi)
    val cents = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), round(col("o_totalprice") * 100, 0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nOrders === cents.length.toLong)
    val exact = cents.map(c => BigInt(c._2)).sum * 1000000 / cents.length
    assert(mean === exact.toLong, "point estimate is the exact mean in micro-cents")
    // replicate b=0 end to end on the driver (same md5 ppm thresholds)
    def pois(key: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(hex, 16) % 1000000
      if (u < 367879) 0L else if (u < 735758) 1L else if (u < 919698) 2L
      else if (u < 981011) 3L else if (u < 996340) 4L else 5L
    }
    // all 64 replicates end to end on the driver: same md5, same ppm
    // thresholds, same integer micro-cent division — the CI bounds must
    // be exactly the 2nd and 63rd order statistics of these means
    val means = (0 to 63).map { b =>
      val ks = cents.map { case (k, c) => (pois(s"boot:$b:$k"), c) }
      val nK = ks.map(_._1).sum
      (ks.map { case (k, c) => BigInt(k) * c }.sum * 1000000 / nK).toLong
    }.sorted
    assert(lo === means(1), "ci_lo = 2nd order statistic")
    assert(hi === means(62), "ci_hi = 63rd order statistic")
  }

  test("NDCG@10 matches a driver-side brute-force ranking") {
    val disc = Seq(1000000000L, 630929753L, 500000000L, 430676558L,
      386852807L, 356207187L, 333333333L, 315464876L, 301029995L, 289064826L)
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val rows = operators.EvalOps.evalNdcg(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("token")).toSeq === Seq("join", "scan", "vector"))
    for (r <- rows) {
      val term = r.getAs[String]("token")
      val pool = docs.flatMap { case (id, t) =>
        val tf = t.split(" ").count(_ == term)
        if (tf > 0) Some((id, tf.toLong, (1L << (id % 4).toInt) - 1L)) else None
      }
      val sysTop = pool.sortBy { case (id, tf, _) => (-tf, id) }.take(10)
      val idealTop = pool.sortBy { case (id, _, g) => (-g, id) }.take(10)
      val dcg = sysTop.zipWithIndex.map { case ((_, _, g), i) => g * disc(i) }.sum
      val idcg = idealTop.zipWithIndex.map { case ((_, _, g), i) => g * disc(i) }.sum
      assert(r.getAs[Long]("n_ranked") === idealTop.length.toLong, term)
      assert(r.getAs[Long]("dcg_nano") === dcg, s"$term dcg")
      assert(r.getAs[Long]("idcg_nano") === idcg, s"$term idcg")
      assert(r.getAs[Double]("ndcg") > 0.0 && r.getAs[Double]("ndcg") <= 1.0)
    }
  }

  test("MAP@10 and MRR match a driver-side brute-force ranking") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val rows = operators.EvalOps.evalMapMrr(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("token")).toSeq === Seq("join", "scan", "vector"))
    for (r <- rows) {
      val term = r.getAs[String]("token")
      val pool = docs.flatMap { case (id, t) =>
        val tf = t.split(" ").count(_ == term)
        if (tf > 0) Some((id, tf.toLong, id % 4 >= 2)) else None
      }.sortBy { case (id, tf, _) => (-tf, id) }
      val nRel = pool.count(_._3).toLong
      var apNum = 0L; var relcum = 0L; var firstRel = 0L
      pool.zipWithIndex.foreach { case ((_, _, rel), i0) =>
        val rk = i0 + 1L
        if (rel) {
          relcum += 1
          if (firstRel == 0L) firstRel = rk
          if (rk <= 10) apNum += 1000000L * relcum / rk
        }
      }
      assert(r.getAs[Long]("n_candidates") === pool.length.toLong, term)
      assert(r.getAs[Long]("n_rel") === nRel, term)
      assert(r.getAs[Long]("ap_ppm") ===
        (if (nRel > 0) apNum / math.min(nRel, 10L) else 0L), s"$term ap")
      assert(r.getAs[Long]("rr_ppm") ===
        (if (firstRel > 0) 1000000L / firstRel else 0L), s"$term rr")
    }
  }

  test("Cohen's kappa matches a driver-side exact contingency computation") {
    val docs = Tables.documents(spark, sfDir)
      .select("n_chars", "lang").collect()
      .map(r => (r.getLong(0) >= 300, r.getString(1) == "en"))
    val n = BigInt(docs.length)
    val n11 = BigInt(docs.count(d => d._1 && d._2))
    val n10 = BigInt(docs.count(d => d._1 && !d._2))
    val n01 = BigInt(docs.count(d => !d._1 && d._2))
    val n00 = BigInt(docs.count(d => !d._1 && !d._2))
    val chance = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    val r = operators.EvalOps.evalKappa(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_docs") === n.toLong)
    assert(r.getAs[Long]("n11") === n11.toLong)
    assert(r.getAs[Long]("po_ppm") === (((n11 + n00) * 1000000) / n).toLong)
    assert(r.getAs[Long]("pe_ppm") === ((chance * 1000000) / (n * n)).toLong)
    assert(r.getAs[Long]("kappa_ppm") ===
      (((n * (n11 + n00) - chance) * 1000000) / (n * n - chance)).toLong)
  }

  test("ECE/MCE are consistent with the calibration query's own bins") {
    val bins = operators.EvalOps.evalCalibration(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("n"), r.getAs[Long]("mean_score_ppm"),
        r.getAs[Long]("pos_rate_ppm")))
    val n = bins.map(_._1).sum
    val gaps = bins.map { case (nb, conf, acc) => (nb, math.abs(conf - acc)) }
    val ece = gaps.map { case (nb, g) => BigInt(nb) * g }.sum / n
    val r = operators.EvalOps.evalEce(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_docs") === n)
    assert(r.getAs[Long]("ece_ppm") === ece.toLong)
    assert(r.getAs[Long]("mce_ppm") === gaps.map(_._2).max)
    assert(r.getAs[Long]("ece_ppm") <= r.getAs[Long]("mce_ppm"))
  }

  test("feature AUC sweep: each feature equals its own brute-force pair count") {
    val rows = operators.EvalOps.evalFeatureAuc(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val d = Tables.documents(spark, sfDir)
      .select(col("n_chars"), size(split(col("text"), " ")).cast("long"),
        (col("lang") === "en"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val feats = Map[String, ((Long, Long, Boolean)) => Long](
      "n_chars" -> (_._1), "n_tokens" -> (_._2),
      "mean_wordlen_x100" -> (x => x._1 * 100 / x._2))
    assert(rows.keySet === feats.keySet)
    feats.foreach { case (name, f) =>
      val pos = d.filter(_._3).map(f)
      val neg = d.filterNot(_._3).map(f)
      var c = 0L; var t = 0L
      for (p <- pos; n <- neg) { if (p > n) c += 1 else if (p == n) t += 1 }
      val r = rows(name)
      assert(r.getAs[Long]("n_pos") === pos.length.toLong)
      assert(r.getAs[Long]("n_neg") === neg.length.toLong)
      val auc = BigDecimal((2.0 * c + t) / (2.0 * pos.length * neg.length))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("auc") === auc, s"feature $name")
    }
  }

  test("Fleiss' kappa matches a driver replay of the three raters") {
    val r = operators.EvalOps.evalFleiss(spark, sfDir).collect()(0)
    val d = Tables.documents(spark, sfDir)
      .select(col("n_chars"), size(split(col("text"), " ")).cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val vs = d.map { case (chars, toks) =>
      (if (chars >= 300) 1L else 0L) + (if (toks >= 45) 1L else 0L) +
        (if (chars >= toks * 5) 1L else 0L)
    }
    val n = vs.length.toLong
    val s1 = vs.sum
    val s2 = vs.map(v => v * (v - 1) + (3 - v) * (2 - v)).sum
    val pPos = s1 * 1000000L / (3 * n)
    val pBar = s2 * 1000000L / (6 * n)
    val pE = (BigInt(pPos) * pPos + BigInt(1000000L - pPos) * (1000000L - pPos)) / 1000000
    val kappa = (BigInt(pBar) - pE) * 1000000 / (BigInt(1000000) - pE)
    assert(r.getAs[Long]("n") === n)
    assert(r.getAs[Long]("p_pos_ppm") === pPos)
    assert(r.getAs[Long]("p_bar_ppm") === pBar)
    assert(r.getAs[Long]("p_e_ppm") === pE.toLong)
    assert(r.getAs[Long]("kappa_ppm") === kappa.toLong)
    // chance-corrected agreement is bounded and P̄ ≥ P_e would make κ ≥ 0
    assert(r.getAs[Long]("kappa_ppm") <= 1000000L)
  }

  test("lift deciles match a driver replay; capture is monotone to 1e6") {
    val rows = operators.EvalOps.evalLiftDeciles(spark, sfDir).collect()
    val d = docs
    val n = d.length.toLong; val nPos = d.count(_._2).toLong
    // replay the tie-stable decile rule: all docs of one score share the
    // decile of that score's cumulative END position
    val byScore = d.groupBy(_._1).view
      .mapValues(xs => (xs.length.toLong, xs.count(_._2).toLong)).toMap
    var cum = 0L
    val perDecile = scala.collection.mutable.Map[Long, (Long, Long)]()
    byScore.toSeq.sortBy(-_._1).foreach { case (_, (cnt, np)) =>
      cum += cnt
      val dec = (cum - 1) * 10 / n + 1
      val (a, b) = perDecile.getOrElse(dec, (0L, 0L))
      perDecile(dec) = (a + cnt, b + np)
    }
    assert(rows.map(_.getLong(0)).toSet === perDecile.keySet)
    var cumPos = 0L
    rows.foreach { r =>
      val (nd, np) = perDecile(r.getLong(0))
      cumPos += np
      assert(r.getAs[Long]("n_docs") === nd)
      assert(r.getAs[Long]("n_pos") === np)
      assert(r.getAs[Long]("rate_ppm") === np * 1000000L / nd)
      assert(r.getAs[Long]("lift_ppm") ===
        (BigInt(np) * n * 1000000 / (BigInt(nd) * nPos)).toLong)
      assert(r.getAs[Long]("capture_ppm") === cumPos * 1000000L / nPos)
    }
    assert(rows.last.getAs[Long]("capture_ppm") === 1000000L)
    val caps = rows.map(_.getAs[Long]("capture_ppm")).toSeq
    assert(caps === caps.sorted, "capture is non-decreasing")
  }

  test("PR curve matches a driver-side threshold sweep and AP its step sum") {
    val d = docs
    val nPos = d.count(_._2).toLong
    val curve = operators.EvalOps.evalPrCurve(spark, sfDir).collect()
    val scores = d.map(_._1).distinct.sorted.reverse
    assert(curve.length === scores.length, "one row per distinct score")
    var apNum = BigInt(0); var rPrev = 0L
    curve.zip(scores).foreach { case (r, thr) =>
      assert(r.getLong(0) === thr)
      val tp = d.count(x => x._1 >= thr && x._2).toLong
      val fp = d.count(x => x._1 >= thr && !x._2).toLong
      assert(r.getAs[Long]("tp") === tp)
      assert(r.getAs[Long]("fp") === fp)
      val p = tp * 1000000L / (tp + fp)
      val rec = tp * 1000000L / nPos
      assert(r.getAs[Long]("precision_ppm") === p)
      assert(r.getAs[Long]("recall_ppm") === rec)
      apNum += BigInt(rec - rPrev) * p; rPrev = rec
    }
    // recall is non-decreasing as the threshold drops; last recall = 1
    assert(curve.last.getAs[Long]("recall_ppm") === 1000000L)
    val ap = operators.EvalOps.evalPrAuc(spark, sfDir).collect()(0)
    assert(ap.getAs[Long]("n_thresholds") === scores.length.toLong)
    assert(ap.getAs[Long]("n_pos") === nPos)
    assert(ap.getAs[Long]("ap_ppm") === (apNum / 1000000).toLong)
    assert(ap.getAs[Long]("ap_ppm") >= 0L && ap.getAs[Long]("ap_ppm") <= 1000000L)
  }

  test("evalBrier: naive Brier, Murphy residual is the within-bin variance") {
    val r = operators.EvalOps.evalBrier(spark, sfDir).collect()(0)
    val d = Tables.documents(spark, sfDir)
      .select(col("n_chars"), (col("lang") === "en").as("pos")).collect()
      .map(x => (math.min(1000000L, x.getLong(0) * 1000000L / 600),
        if (x.getBoolean(1)) 1000000L else 0L))
    val n = d.length.toLong
    assert(r.getAs[Long]("n_docs") === n)
    val brier = d.map(p => BigInt(p._1 - p._2) * (p._1 - p._2)).sum / n
    assert(r.getAs[Long]("brier_e12") === brier.toLong)
    val ybar = d.map(_._2 / 1000000L).sum * 1000000L / n
    assert(r.getAs[Long]("base_rate_ppm") === ybar)
    assert(r.getAs[Long]("unc_e12") === ybar * (1000000L - ybar))
    // Murphy: BS = REL - RES + UNC + within-bin-variance of p; the residual
    // must therefore be nonnegative (tolerance: ppm flooring of the bin
    // statistics, each bounded by 1 ppm of conf/acc -> ~2e6 in e12 units)
    val resid = r.getAs[Long]("brier_e12") -
      (r.getAs[Long]("rel_e12") - r.getAs[Long]("res_e12") +
        r.getAs[Long]("unc_e12"))
    assert(resid >= -4000000L, s"Murphy residual $resid must be >= 0 (mod flooring)")
    // and the within-bin variance cannot exceed the worst bin width (100k ppm)^2
    assert(resid <= 10000000000L, s"Murphy residual $resid exceeds bin-width bound")
  }

  test("mlStump picks the brute-force best Gini split") {
    val r = operators.EvalOps.mlStump(spark, sfDir).collect()(0)
    val docs = Tables.documents(spark, sfDir).select("n_chars", "lang")
      .collect().map(d => (d.getLong(0), d.getString(1) == "en"))
    val np = docs.count(_._2).toLong; val nq = docs.length - np
    val n = np + nq
    val candidates = docs.map(_._1).distinct.sorted.flatMap { thr =>
      val lp = docs.count(d => d._1 < thr && d._2).toLong
      val ln = docs.count(d => d._1 < thr && !d._2).toLong
      val (rp, rn) = (np - lp, nq - ln)
      if (lp + ln > 0 && rp + rn > 0)
        Some((thr, lp, ln, rp, rn,
          (lp * lp + ln * ln) * 1000000 / (lp + ln) +
            (rp * rp + rn * rn) * 1000000 / (rp + rn)))
      else None
    }
    val best = candidates.minBy(c => (-c._6, c._1))
    assert((r.getAs[Long]("best_thr"), r.getAs[Long]("lp"),
      r.getAs[Long]("ln"), r.getAs[Long]("rp"), r.getAs[Long]("rn")) ===
      ((best._1, best._2, best._3, best._4, best._5)))
    val parent = 1000000 - (np * np + nq * nq) * 1000000 / (n * n)
    val child = 1000000 - best._6 / n
    assert(r.getAs[Long]("parent_gini_ppm") === parent)
    assert(r.getAs[Long]("child_gini_ppm") === child)
    assert(r.getAs[Long]("gain_ppm") === parent - child)
    assert(parent - child >= 0, "best split cannot increase impurity")
  }

  test("statsMcnemar and statsCochranQ match a driver contingency replay") {
    val docs = Tables.documents(spark, sfDir).select("n_chars", "lang")
      .collect().map(d => (d.getLong(0), d.getString(1) == "en"))
    def ok(thr: Long)(d: (Long, Boolean)) = (d._1 >= thr) == d._2
    val b = docs.count(d => ok(300)(d) && !ok(450)(d)).toLong
    val c = docs.count(d => !ok(300)(d) && ok(450)(d)).toLong
    val mc = operators.EvalOps.statsMcnemar(spark, sfDir).collect()(0)
    assert((mc.getAs[Long]("b"), mc.getAs[Long]("c")) === ((b, c)))
    val chi2 = if ((b - c).abs > 1)
      ((b - c).abs - 1) * ((b - c).abs - 1) * 1000 / (b + c) else 0L
    assert(mc.getAs[Long]("chi2_milli") === chi2)
    assert(mc.getAs[Boolean]("significant_05") === (chi2 > 3841))

    val cs = Seq(200L, 300L, 450L).map(t => docs.count(ok(t)).toLong)
    val rs = docs.map(d => Seq(200L, 300L, 450L).count(t => ok(t)(d)).toLong)
    val num = 2 * (3 * cs.map(x => x * x).sum - cs.sum * cs.sum) * 1000
    val den = 3 * rs.sum - rs.map(x => x * x).sum
    val cq = operators.EvalOps.statsCochranQ(spark, sfDir).collect()(0)
    assert((cq.getAs[Long]("c1"), cq.getAs[Long]("c2"),
      cq.getAs[Long]("c3")) === ((cs(0), cs(1), cs(2))))
    assert(cq.getAs[Long]("q_milli") === num / den)
    assert(cq.getAs[Boolean]("significant_05") === (num / den > 5991))
  }

  test("evalCostCurve argmin matches a brute-force threshold sweep") {
    val rows = operators.EvalOps.evalCostCurve(spark, sfDir).collect()
      .map(r => r.getAs[Long]("cost_ratio") ->
        (r.getAs[Long]("best_thr"), r.getAs[Long]("fp"),
          r.getAs[Long]("fn"), r.getAs[Long]("cost"))).toMap
    val docs = Tables.documents(spark, sfDir).select("n_chars", "lang")
      .collect().map(d => (d.getLong(0), d.getString(1) == "en"))
    assert(rows.keySet === Set(1L, 2L, 5L))
    Seq(1L, 2L, 5L).foreach { cr =>
      val best = docs.map(_._1).distinct.sorted.map { thr =>
        val fp = docs.count(d => d._1 >= thr && !d._2).toLong
        val fn = docs.count(d => d._1 < thr && d._2).toLong
        (cr * fp + fn, thr, fp, fn)
      }.minBy(t => (t._1, t._2))
      assert(rows(cr) === ((best._2, best._3, best._4, best._1)), s"ratio $cr")
    }
  }

  test("evalKsScore matches a driver CDF sweep and brackets [0, 1e6]") {
    val r = operators.EvalOps.evalKsScore(spark, sfDir).collect()(0)
    val docs = Tables.documents(spark, sfDir).select("n_chars", "lang")
      .collect().map(d => (d.getLong(0), d.getString(1) == "en"))
    val np = docs.count(_._2).toLong; val nq = docs.length - np
    val scores = docs.map(_._1).distinct.sorted
    var best = (BigInt(-1), Long.MaxValue)
    scores.foreach { s =>
      val cp = docs.count(d => d._1 <= s && d._2).toLong
      val cq = docs.count(d => d._1 <= s && !d._2).toLong
      val dev = (BigInt(cp) * nq - BigInt(cq) * np).abs
      if (dev > best._1 || (dev == best._1 && s < best._2)) best = (dev, s)
    }
    assert(r.getAs[Long]("n_pos") === np)
    assert(r.getAs[Long]("n_neg") === nq)
    assert(r.getAs[Long]("ks_thr") === best._2)
    val ks = (best._1 * 1000000) / (BigInt(np) * nq)
    assert(r.getAs[Long]("ks_ppm") === ks.toLong)
    assert(ks >= 0 && ks <= 1000000)
  }

  test("evalLogloss matches a driver floor-ln replay and is positive") {
    val r = operators.EvalOps.evalLogloss(spark, sfDir).collect()(0)
    def lnNano(x: Long): Long = math.floor(math.log(x.toDouble) * 1e9).toLong
    val docs = Tables.documents(spark, sfDir).select("lang", "n_chars")
      .collect().map(d => (d.getString(0), d.getLong(1)))
    val terms = docs.map { case (lang, nc) =>
      val p = math.max(1L, math.min(999999L, nc * 1000000 / 600))
      val y = if (lang == "en") 1L else 0L
      y * (lnNano(p) - lnNano(1000000L)) +
        (1 - y) * (lnNano(1000000L - p) - lnNano(1000000L))
    }
    val ll = (-terms.map(BigInt(_)).sum) / (docs.length.toLong * 1000)
    assert(r.getAs[Long]("n_docs") === docs.length.toLong)
    assert(r.getAs[Long]("n_pos") === docs.count(_._1 == "en").toLong)
    assert(r.getAs[Long]("logloss_micro") === ll.toLong)
    assert(ll > 0, "log-loss must be positive")
  }

  test("evalMcc agrees with the confusion counts and the BigInt closed form") {
    val mcc = operators.EvalOps.evalMcc(spark, sfDir).collect()
    val conf = operators.EvalOps.evalConfusion(spark, sfDir).collect()
      .map(r => r.getAs[Long]("thr") -> (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
        r.getAs[Long]("fn"), r.getAs[Long]("tn"))).toMap
    assert(mcc.length === 3)
    mcc.foreach { r =>
      val (tp, fp, fn, tn) = conf(r.getAs[Long]("thr"))
      assert((r.getAs[Long]("tp"), r.getAs[Long]("fp"),
        r.getAs[Long]("fn"), r.getAs[Long]("tn")) === ((tp, fp, fn, tn)))
      val num = BigInt(tp) * tn - BigInt(fp) * fn
      val denom = BigInt(tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
      assert(r.getAs[Long]("mcc_sign") === num.signum.toLong)
      if (denom > 0) {
        val m2 = (num * num * 1000000) / denom
        assert(r.getAs[Long]("mcc2_ppm") === m2.toLong)
        assert(m2 >= 0 && m2 <= 1000000, s"MCC^2 out of [0,1]: $m2")
      } else assert(r.isNullAt(r.fieldIndex("mcc2_ppm")))
    }
  }
}
