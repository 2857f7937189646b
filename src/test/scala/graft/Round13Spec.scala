package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the round-13 operator batch (#359–#378) beyond the
  * oracle hash: structural invariants the DuckDB twin can't distinguish
  * from coincidence (conservation, monotonicity, bounds) plus exact
  * driver recomputations of the staged-transcendental composites (same
  * JVM libm → bit-equal).
  */
class Round13Spec extends AnyFunSuite with SparkFixture {

  test("kfold partitions the corpus; lang shares recompute exactly") {
    val rows = operators.TrainSplitOps.splitKfold(spark, sfDir).collect()
    val total = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getLong(2)).sum === total)
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 5))
    val byFold = rows.groupBy(_.getLong(0))
    byFold.values.foreach { fr =>
      val foldDocs = fr.map(_.getLong(2)).sum
      fr.foreach(r =>
        assert(r.getLong(4) === r.getLong(2) * 1000000L / foldDocs))
    }
  }

  test("group kfold: the leakage invariant is proven, docs conserved") {
    val rows = operators.TrainSplitOps.splitGroupKfold(spark, sfDir).collect()
    assert(rows.length === 4)
    assert(rows.forall(_.getLong(4) === 1L), "a source straddles folds")
    assert(rows.map(_.getLong(2)).sum ===
      Tables.documents(spark, sfDir).count())
  }

  test("rolling origin: 4 folds, train set strictly grows, test month advances") {
    val rows = operators.TrainSplitOps.splitRollingOrigin(spark, sfDir)
      .collect().sortBy(_.get(0).asInstanceOf[Number].longValue)
    assert(rows.length === 4)
    val trainOrders = rows.map(_.getLong(2))
    assert(trainOrders.zip(trainOrders.tail).forall { case (a, b) => a < b })
    val months = rows.map(_.getString(3))
    assert(months.distinct.length === 4 && months.sorted.sameElements(months))
  }

  test("zone maps: clustering never scans more than insertion order") {
    val rows = operators.TrainSplitOps.zonemapPrune(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val (c, i) = (rows("date_clustered"), rows("insertion"))
    assert(c.getLong(3) === i.getLong(3), "layouts disagree on total rows")
    assert(c.getLong(4) <= i.getLong(4), "clustering scanned MORE rows")
    assert(c.getLong(5) <= i.getLong(5))
  }

  test("BLEU: clip never exceeds total; composite recomputes bit-exactly") {
    operators.TextEvalOps.evalBleu(spark, sfDir).collect().foreach { r =>
      val (c, rl) = (r.getLong(2), r.getLong(3))
      val mt = (0 until 4).map(i => (r.getLong(4 + 2 * i), r.getLong(5 + 2 * i)))
      mt.foreach { case (m, t) => assert(m >= 0 && m <= t) }
      val expected =
        if (mt.forall(_._1 > 0)) {
          val bp = if (c >= rl) 1.0 else math.exp(1.0 - rl.toDouble / c)
          val gm = math.exp(mt.map { case (m, t) =>
            math.log(m.toDouble / t) }.sum / 4)
          math.floor(1e6 * bp * gm).toLong
        } else 0L
      assert(r.getLong(12) === expected, s"bleu_ppm mismatch for ${r.get(0)}")
    }
  }

  test("ROUGE: F1 sits between precision and recall; ppm recomputes") {
    operators.TextEvalOps.evalRougeN(spark, sfDir).collect().foreach { r =>
      val (m, th, tr) = (r.getLong(3), r.getLong(4), r.getLong(5))
      val (p, rc, f1) = (r.getLong(6), r.getLong(7), r.getLong(8))
      assert(p === m * 1000000L / th && rc === m * 1000000L / tr)
      assert(f1 === m * 2000000L / (th + tr))
      assert(f1 >= math.min(p, rc) - 1 && f1 <= math.max(p, rc) + 1)
    }
  }

  test("chrF: F(beta=2) sits between precision and recall; ppm recomputes") {
    operators.TextEvalOps.evalChrf(spark, sfDir).collect().foreach { r =>
      val (m, th, tr) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val (p, rc, f) = (r.getLong(5), r.getLong(6), r.getLong(7))
      assert(p === m * 1000000L / th && rc === m * 1000000L / tr)
      assert(f === m * 5000000L / (4 * tr + th))
      assert(f >= math.min(p, rc) - 1 && f <= math.max(p, rc) + 1)
    }
  }

  test("gopher rules: pass count bounded by every individual rule") {
    operators.TextEvalOps.qualityGopher(spark, sfDir).collect().foreach { r =>
      val nPass = r.getLong(7)
      (3 to 6).foreach(i => assert(nPass <= r.getLong(i)))
      assert(r.getLong(8) === nPass * 1000000L / r.getLong(2))
    }
  }

  test("permutation entropy: normalized to [0, 1e6], at most 6 patterns") {
    operators.SeriesOps.tsPermEntropy(spark, sfDir).collect().foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 6)
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 1000000L,
        s"h_norm_ppm out of range: ${r.getLong(4)}")
    }
  }

  test("periodogram recomputes exactly from the collected daily series") {
    val daily = Tables.orders(spark, sfDir)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg((sum(Det.money(col("o_totalprice"))) * 100).cast("long").as("v"))
      .orderBy("day").collect().map(_.getLong(1))
    val n = daily.length
    val got = operators.SeriesOps.tsPeriodogram(spark, sfDir).collect()
      .map(r => r.get(0).asInstanceOf[Number].longValue ->
        (r.getLong(2), r.getLong(3))).toMap
    // Spark's div truncates toward zero; BigInt / floors — adjust sign
    def tz(a: BigInt, b: Long): BigInt =
      if (a.sign < 0) -((-a) / b) else a / b
    (1 to 8).foreach { k =>
      var ck = BigInt(0); var sk = BigInt(0)
      daily.zipWithIndex.foreach { case (v, t) =>
        ck += BigInt(v) * math.floor(
          math.cos(2 * math.Pi * k * t.toDouble / n) * 1e9).toLong
        sk += BigInt(v) * math.floor(
          math.sin(2 * math.Pi * k * t.toDouble / n) * 1e9).toLong
      }
      assert(got(k)._1 === tz(ck, n).toLong, s"ck mismatch at k=$k")
      assert(got(k)._2 === tz(sk, n).toLong, s"sk mismatch at k=$k")
    }
  }

  test("MACD: histogram is exactly macd minus signal on every row") {
    operators.SeriesOps.winMacd(spark, sfDir).collect().foreach { r =>
      assert(r.getLong(4) === r.getLong(2) - r.getLong(3))
    }
  }

  test("Jarque-Bera recomputes bit-exactly from the raw power sums") {
    val rows = operators.SeriesOps.statsJarqueBera(spark, sfDir).collect()
    val raw = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag")).agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("s1"),
        sum(expr("cast(l_quantity as long) * cast(l_quantity as long)")).as("s2"),
        sum(expr("cast(l_quantity as long) * cast(l_quantity as long) * cast(l_quantity as long)")).as("s3"),
        sum(expr("cast(l_quantity as long) * cast(l_quantity as long) * cast(l_quantity as long) * cast(l_quantity as long)")).as("s4"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    rows.foreach { r =>
      val (n, s1, s2, s3, s4) = raw(r.getString(0))
      val mu = s1.toDouble / n
      val m2 = s2.toDouble / n - mu * mu
      val m3 = s3.toDouble / n - 3.0 * mu * (s2.toDouble / n) + 2.0 * mu * mu * mu
      val m4 = s4.toDouble / n - 4.0 * mu * (s3.toDouble / n) +
        6.0 * mu * mu * (s2.toDouble / n) - 3.0 * mu * mu * mu * mu
      val skew = m3 / (m2 * math.sqrt(m2))
      val kurt = m4 / (m2 * m2)
      assert(r.getLong(3) === math.floor(skew * 1e6).toLong)
      assert(r.getLong(4) === math.floor(kurt * 1e6).toLong)
      assert(r.getLong(5) === math.floor(n / 6.0 *
        (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0) * 1000).toLong)
    }
  }

  test("isotropy: mean cosine in [-1, 1], participation ratio in [1, dim]") {
    val r = operators.SeriesOps.embedIsotropy(spark, sfDir).collect().head
    val dim = r.getLong(1)
    assert(math.abs(r.getLong(2)) <= 1000000L)
    assert(r.getLong(3) >= 1000000L && r.getLong(3) <= dim * 1000000L)
  }

  test("threshold sweep: candidate counts are monotone non-increasing") {
    val rows = operators.SeriesOps.embedThresholdSweep(spark, sfDir)
      .collect().sortBy(_.getLong(0))
    assert(rows.length === 7)
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    rows.foreach(r =>
      assert(r.getLong(3) === r.getLong(1) * 1000000000L / r.getLong(2)))
  }

  test("Kneser-Ney: probabilities bounded, discount term never exceeds MLE") {
    operators.TuningOps.textKneserNey(spark, sfDir).collect().foreach { r =>
      val (c12, c1) = (r.getLong(2), r.getLong(3))
      val (disc, pkn) = (r.getLong(6), r.getLong(9))
      assert(disc <= c12 * 1000000L / c1, "discounted term exceeds MLE")
      assert(pkn >= disc && pkn <= 1000000L + 1)
    }
  }

  test("LLR collocations: top-20 all positive, contingency consistent") {
    val rows = operators.TuningOps.textCollocationLlr(spark, sfDir).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getLong(2) <= math.min(r.getLong(3), r.getLong(4)))
      assert(r.getLong(5) > 0, "a top-20 collocation has non-positive LLR")
    }
  }

  test("ANN recall audit: both methods, every probe, recall in [0, 1e6]") {
    val rows = operators.TuningOps.embedKnnRecall(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSet === Set("ivf", "lsh"))
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 5)
      assert(r.getLong(3) === r.getLong(2) * 1000000L / 5)
    }
  }

  test("temperature mixing: normalizes to 1e6 within rounding, compresses") {
    val rows = operators.TuningOps.mixTemperature(spark, sfDir).collect()
    val psum = rows.map(_.getLong(3)).sum
    assert(psum <= 1000000L && psum >= 1000000L - rows.length)
    val bySize = rows.sortBy(_.getLong(1))
    // tau < 1 up-weights small sources relative to proportional
    assert(bySize.head.getLong(4) >= bySize.last.getLong(4),
      "temperature sampling failed to boost the smallest source most")
  }

  test("alpha selection: exactly one winner per priority over 7 candidates") {
    val rows = operators.TuningOps.tsAlphaSelect(spark, sfDir).collect()
    rows.groupBy(_.getString(0)).foreach { case (pri, rs) =>
      assert(rs.length === 7, s"$pri has ${rs.length} alphas")
      assert(rs.count(_.getBoolean(4)) === 1, s"$pri has != 1 best alpha")
      val best = rs.find(_.getBoolean(4)).get.getLong(3)
      assert(rs.forall(_.getLong(3) >= best))
    }
  }

  test("Shapley: every channel scores within the 2^(n-1)-pair lattice") {
    val rows = operators.ImpactOps.eventShapley(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // the OBSERVED lattice can be partial at tiny sf — each channel sees
    // between 1 and 2^(n-1) = 8 coalition pairs, never more
    rows.foreach(r =>
      assert(r.getLong(1) >= 1 && r.getLong(1) <= 8,
        s"${r.getString(0)} saw ${r.getLong(1)} pairs"))
  }

  test("Neyman allocation: hands out exactly the budget") {
    val rows = operators.ImpactOps.sampleNeyman(spark, sfDir).collect()
    assert(rows.map(_.getLong(3)).sum === 10000L)
    rows.foreach(r => assert(r.getLong(3) >= 0))
  }

  test("Matryoshka: full width recovers itself perfectly, overlap monotone on average") {
    val rows = operators.ImpactOps.embedMatryoshka(spark, sfDir).collect()
    val byDim = rows.groupBy(_.getInt(0))
    assert(byDim(64).forall(_.getLong(2) === 5L),
      "d=64 disagrees with its own truth")
    val means = Seq(8, 16, 32, 64).map(d =>
      byDim(d).map(_.getLong(2)).sum.toDouble / byDim(d).length)
    assert(means.last === 5.0 && means.head <= means.last)
  }

  test("permutation test: p-value well-formed, extremes bounded") {
    val r = operators.ImpactOps.statsPermutation(spark, sfDir).collect().head
    assert(r.getLong(4) <= r.getLong(3), "more extremes than permutations")
    assert(r.getLong(5) >= 0 && r.getLong(5) <= 1000)
    assert(r.getLong(5) === (r.getLong(4) + 1) * 1000 / (r.getLong(3) + 1))
  }

  test("ablation: unique kills bounded by total kills, ppm recomputes") {
    val rows = operators.ImpactOps.qualityAblation(spark, sfDir).collect()
    assert(rows.length === 4)
    val total = Tables.documents(spark, sfDir).count()
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1))
      assert(r.getLong(4) === r.getLong(1) * 1000000L / total)
    }
  }

  test("dedup savings: ledger is conservative and self-consistent") {
    operators.ImpactOps.dedupSavings(spark, sfDir).collect().foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "dropped more docs than exist")
      assert(r.getLong(4) <= r.getLong(3))
      assert(r.getLong(5) === r.getLong(4) * 1000000L / r.getLong(3))
    }
  }

  test("nearest as-of join equals a brute-force driver replay") {
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts").cast("long").as("sec")).collect()
    val clicks = ev.filter(_.getString(2) == "click")
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(0)))
    val got = operators.Joins.joinAsofNearest(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3), r.getString(5))).toMap
    ev.filter(_.getString(2) == "purchase").foreach { b =>
      val (uid, bsec, bid) = (b.getLong(1), b.getLong(3), b.getLong(0))
      val cand = clicks.filter(c => c._1 == uid && math.abs(c._2 - bsec) <= 600)
      val expected =
        if (cand.isEmpty) (-1L, "none")
        else {
          // backward = lexicographically below (sec, id); prefer the
          // smaller gap, then backward, then nearest-in-order id
          val best = cand.minBy { case (_, csec, cid) =>
            val back = csec < bsec || (csec == bsec && cid < bid)
            (math.abs(csec - bsec), if (back) 0 else 1,
              if (back) -cid else cid)
          }
          val back = best._2 < bsec || (best._2 == bsec && best._3 < bid)
          (best._3, if (back) "before" else "after")
        }
      assert(got(bid) === expected, s"buy $bid mismatch")
    }
  }

  test("EW variance: non-negative everywhere, zero on each user's first event") {
    val rows = operators.TimeWindows.tsEwvar(spark, sfDir).collect()
    rows.foreach(r => assert(r.getLong(3) >= 0))
    val firsts = Tables.events(spark, sfDir)
      .groupBy("user_id").agg(min(struct(col("ts"), col("event_id"))).as("f"))
      .select(col("f.event_id")).collect().map(_.getLong(0)).toSet
    rows.filter(r => firsts(r.getLong(1)))
      .foreach(r => assert(r.getLong(3) === 0L,
        s"first event ${r.getLong(1)} has nonzero EW variance"))
  }

  test("LSH tuning: geometries agree on the pair universe, probabilities bounded") {
    val rows = operators.TuningOps.dedupLshTuning(spark, sfDir).collect()
    assert(rows.length === 4)
    assert(rows.map(_.getLong(2)).distinct.length === 1)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0 && r.getLong(3) <= r.getLong(2) * 1000L,
        "expected candidates exceed the pair count")
      assert(r.getLong(4) <= r.getLong(2))
    }
  }
}
