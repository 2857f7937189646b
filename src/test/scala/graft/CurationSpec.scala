package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the CurationOps family (#406–#409): accounting
  * identities (batch conservation, first-decile full novelty) and
  * estimator orderings the twin hash can't distinguish from chance.
  */
class CurationSpec extends AnyFunSuite with SparkFixture {

  test("code detect: codelike subset, ratios bounded, counts positive") {
    val rows = operators.CurationOps.textCodeDetect(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "codelike must be a subset")
      assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000000L)
      assert(r.getLong(5) >= 0L && r.getLong(5) <= 1000000L)
    }
  }

  test("novelty curve: decile 0 of each source is maximally novel") {
    val rows = operators.CurationOps.textNoveltyCurve(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(_.getString(0))
    bySource.values.foreach { sr =>
      val sorted = sr.sortBy(_.getLong(1))
      // the very first document of a source contributes only novel grams;
      // later deciles can only be less or equally novel than pure novelty
      assert(sorted.head.getLong(5) > 0L, "first decile has novelty")
      sorted.foreach { r =>
        assert(r.getLong(4) <= r.getLong(3), "novel <= grams")
        assert(r.getLong(5) <= 1000000L)
      }
    }
  }

  test("incremental dedup: batch partitions into the three outcomes") {
    val r = operators.CurationOps.dedupIncremental(spark, sfDir).collect().head
    val (batch, dupOld, dupNew, uniq) =
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(batch === dupOld + dupNew + uniq, "outcome partition")
    assert(batch > 0L)
    val total = Tables.documents(spark, sfDir).count()
    assert(batch < total, "the batch is a strict subset of the corpus")
  }

  test("nprobe sweep: recall and volume monotone; np=4 matches the audit") {
    val rows = operators.TuningOps.simNprobeSweep(spark, sfDir).collect()
      .sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L, 8L))
    val vols = rows.map(_.getLong(1))
    vols.zip(vols.tail).foreach { case (a, b) =>
      assert(a <= b, "candidate volume must grow with nprobe")
    }
    val recalls = rows.map(_.getLong(3))
    recalls.zip(recalls.tail).foreach { case (a, b) =>
      assert(a <= b, "recall can only improve with more probed lists")
    }
    // the np=4 sweep point IS the fixed-nprobe audit: hit counts agree
    val ivfHits = operators.TuningOps.embedKnnRecall(spark, sfDir).collect()
      .filter(_.getString(0) == "ivf").map(_.getLong(2)).sum
    assert(rows(2).getLong(2) === ivfHits,
      "sweep np=4 must reproduce q_embed_knn_recall's IVF hits")
  }

  test("length bias: rho in [-1, 1] per language, all languages present") {
    val rows = operators.CurationOps.qualityLengthBias(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rho = r.getDouble(2)
      assert(rho >= -1.0 && rho <= 1.0)
      assert(r.getLong(1) > 1L)
    }
  }

  test("epoch cap: budget conserved on the fixture; skew provably clamps") {
    val rows = operators.CurationOps.mixEpochCap(spark, sfDir).collect()
    val totalTokens = rows.map(_.getLong(1)).sum
    val allocSum = rows.map(_.getLong(5)).sum
    assert(allocSum <= 2 * totalTokens, "allocation exceeds the budget")
    rows.foreach { r =>
      assert(r.getLong(5) <= r.getLong(3), "allocation exceeds the epoch cap")
      assert(r.getLong(6) <= 4000000L, "more than max_epochs repeats")
    }
    // the clamp branch is inert on the size-uniform fixture — prove it
    // on a skewed base: one tiny source must hit its 4-epoch cap and
    // the freed budget must flow to the big sources
    import spark.implicits._
    val skewed = Seq(("tiny", 100L), ("big1", 100000L), ("big2", 100000L))
      .toDF("source", "tokens")
    val wf = operators.CurationOps.waterFill(skewed).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(wf("tiny").getBoolean(4), "tiny source must clamp")
    assert(wf("tiny").getLong(5) === 400L, "clamped exactly at 4 epochs")
    assert(!wf("big1").getBoolean(4) && !wf("big2").getBoolean(4))
    val sum = wf.values.map(_.getLong(5)).sum
    assert(sum <= 2 * 200100L && sum >= 2 * 200100L - 10L,
      "freed budget redistributes (up to truncation)")
  }

  test("multiclass eval: confusion mass conserved, macro-F1 recomputes") {
    val rows = operators.TextEvalOps.evalMulticlass(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val supp = rows.map(_.getLong(1)).sum
    val pred = rows.map(_.getLong(2)).sum
    assert(supp === pred, "every doc gets exactly one prediction")
    rows.foreach { r =>
      assert(r.getLong(3) <= math.min(r.getLong(1), r.getLong(2)),
        "tp bounded by support and predicted")
    }
    val macroExpect = rows.map(_.getLong(6)).sum / rows.length
    assert(rows.forall(_.getLong(7) === macroExpect), "macro-F1 recompute")
  }

  test("Krippendorff: alpha complements Do/De exactly, both in range") {
    val r = operators.TextEvalOps.evalKrippendorff(spark, sfDir).collect().head
    assert(r.getLong(4) + r.getLong(5) === 1000000L)
    assert(r.getLong(5) <= 1000000L)
    assert(r.getLong(1) === r.getLong(0) * 3L, "three raters per item")
    assert(r.getLong(3) >= 0L)
  }

  test("Krippendorff: hand-computed alphas on tiny vote tables") {
    import spark.implicits._
    def alpha(vs: Long*): Long =
      operators.TextEvalOps.krippendorffFromVotes(vs.toDF("v"))
        .collect().head.getLong(5)
    // One unit split (1,0,0): all disagreement is within-unit → Do/De=1.
    assert(alpha(1L) === 0L, "chance-level agreement must read alpha=0")
    // Two unanimous units, one of each value: Do=0 → alpha=1.
    assert(alpha(3L, 0L) === 1000000L)
    // Units v=3,0,1: do_num=2, t=9, p1=4, p0=5, de_num=40;
    // Do/De = do_num*(t-1)/de_num = 16/40 = 0.4 → alpha = 0.6.
    assert(alpha(3L, 0L, 1L) === 600000L)
    // Fixture-side cross-check: recompute alpha from raw documents
    // with an independent BigInt path and compare to the operator.
    val docs = Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("n_chars"),
        org.apache.spark.sql.functions.col("text")).collect()
    val votes = docs.map { row =>
      val toks = row.getString(1).split(" ", -1)
      var v = 0L
      if (row.getLong(0) >= 300L) v += 1
      if (toks.length >= 55) v += 1
      if (toks.distinct.length * 10 >= toks.length * 6) v += 1
      v
    }
    val n = BigInt(votes.length); val t = n * 3
    val p1 = BigInt(votes.sum); val p0 = t - p1
    val doNum = votes.map(v => BigInt(v) * (3 - v)).sum
    val deNum = p1 * (t - p1) + p0 * (t - p0)
    val expect = 1000000L -
      ((doNum * t * (t - 1) * 1000000) / (3 * n * deNum)).toLong
    val got = operators.TextEvalOps.evalKrippendorff(spark, sfDir)
      .collect().head.getLong(5)
    assert(got === expect, "operator alpha must match independent BigInt path")
  }

  test("trimmed mean: lies within the winsorized band, keeps ~80%") {
    val rows = operators.CurationOps.statsTrimmedMean(spark, sfDir).collect()
    assert(rows.length === 5)
    val totals = Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val kept = r.getLong(1)
      val all = totals(r.getString(0))
      assert(kept <= all && kept * 10 >= all * 7,
        s"trim should keep roughly 80% (kept $kept of $all)")
      assert(r.getDouble(2) > 0.0)
    }
  }
}
