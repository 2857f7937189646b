package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 pins: the degree-oriented [[operators.GraphOps.wedgeCandidates]]
  * kernel behind q_graph_jaccard / q_graph_adamic_adar — exact-once wedge
  * enumeration, block structure (arboricity-bounded oo/io, output-optimal
  * ii), and the counterexample showing why the triangle kernel's
  * out-out-only opening cannot transfer verbatim (the r14 verdict's watch
  * item, resolved with the strongest bound available).
  */
class Round15Spec extends AnyFunSuite with SparkFixture {

  private def edgesDf(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("doc_a", "doc_b")
  }

  private def degreesOf(e: org.apache.spark.sql.DataFrame) =
    e.select(col("doc_a").as("node"))
      .unionAll(e.select(col("doc_b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))

  private def candidates(pairs: Seq[(Long, Long)]) = {
    val e = edgesDf(pairs)
    operators.GraphOps.wedgeCandidates(e, degreesOf(e)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
  }

  test("wedgeCandidates: pure star emits exactly the C(n,2) true pairs, all in-in") {
    // hub 0 with 12 leaves: every leaf pair IS a genuine candidate
    // (common neighbor = hub), so C(12,2) = 66 rows is the output lower
    // bound — and the kernel emits exactly that, with zero rows from the
    // arboricity-bounded oo/io blocks (the hub has out-degree 0 under
    // degree orientation: it never OPENS a wedge, it only witnesses).
    val cand = candidates((1L to 12L).map(l => (0L, l)))
    assert(cand.length === 66, s"expected 66 candidates, got ${cand.length}")
    assert(cand.forall(_._4 == "ii"), "star wedges must all come from the in-in block")
    assert(cand.forall(c => c._3 == 0L && c._1 < c._2), "all witnessed by the hub, id-ordered")
    assert(cand.map(c => (c._1, c._2)).distinct.length === 66, "each pair exactly once")
  }

  test("wedgeCandidates: 2-path counterexample — out-out-only would lose the wedge") {
    // path 1-2-3: the ONLY wedge {1,3} is centered at 2, the wedge's
    // MAX-rank vertex (deg 2 > deg 1). A verbatim transfer of the
    // triangle kernel (open at min-rank vertex only = wedgesOf) returns
    // EMPTY here — losing a true candidate — which is why link
    // prediction keeps all three blocks and triangles may drop two.
    val pairs = Seq((1L, 2L), (2L, 3L))
    val e = edgesDf(pairs)
    assert(operators.GraphOps.wedgesOf(
      operators.GraphOps.orientEdges(e, degreesOf(e))).isEmpty,
      "triangle-style out-out opening must miss the max-rank-centered wedge")
    val cand = candidates(pairs)
    assert(cand.toSeq === Seq((1L, 3L, 2L, "ii")))
  }

  test("wedgeCandidates: 3-path exercises the in-out block") {
    // path 1-2-3-4 (deg 2,3 = 2; deg 1,4 = 1): wedge {1,3}@2 has legs
    // 1->2 (in) and 2->3 (out) -> io; wedge {2,4}@3 has legs 2->3 and
    // 4->3 (both in) -> ii.
    val cand = candidates(Seq((1L, 2L), (2L, 3L), (3L, 4L))).sortBy(c => (c._1, c._2))
    assert(cand.toSeq === Seq((1L, 3L, 2L, "io"), (2L, 4L, 3L, "ii")))
  }

  test("wedgeCandidates: (pair, mid) multiset equals the symmetric self-join's") {
    // K4 plus pendant 9 on node 0 plus chord (1,5)-(5,2): enough shape
    // to hit every block. Reference enumeration = the pre-r15 symmetric
    // wedge self-join, computed inline.
    val pairs = (for (a <- 0L until 4L; b <- (a + 1) until 4L) yield (a, b)) ++
      Seq((0L, 9L), (1L, 5L), (5L, 2L))
    val e = edgesDf(pairs)
    val sym = e.select(col("doc_a").as("x"), col("doc_b").as("z"))
      .unionByName(e.select(col("doc_b").as("x"), col("doc_a").as("z")))
    val ref = sym.select(col("x").as("a"), col("z").as("mid"))
      .join(sym.select(col("z").as("b"), col("x").as("mid")), Seq("mid"))
      .filter(col("a") < col("b"))
      .select("a", "b", "mid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val got = candidates(pairs).map(c => (c._1, c._2, c._3)).sorted.toSeq
    assert(got === ref)
  }

  test("SampEn matches an exact driver replay of the canonical convention") {
    // canonical Richman-Moorman template range (r15): BOTH the m=2 and
    // m=3 counts run over template starts in [1, N-2] (x3 exists), so
    // A/B is a true conditional probability. The replay recomputes the
    // daily series and the O(n^2) counts in plain Scala -- the
    // Krippendorff-class guard against a both-engines-wrong constant.
    val daily = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority").as("pri"),
        date_trunc("day", col("o_orderdate")).as("day"))
      .agg((sum(Det.money(col("o_totalprice"))) * 100).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
    val byPri = daily.groupBy(_._1).map { case (pri, rows) =>
      pri -> rows.sortBy(_._2.getTime).map(_._3)
    }
    val expected = byPri.map { case (pri, xs) =>
      val n = xs.length
      val rTol = (xs.max - xs.min) / 20
      var bCnt = 0L; var aCnt = 0L
      for (i <- 0 until n - 2; j <- (i + 1) until n - 2) {
        val m2 = math.abs(xs(i) - xs(j)) <= rTol &&
          math.abs(xs(i + 1) - xs(j + 1)) <= rTol
        if (m2) {
          bCnt += 1
          if (math.abs(xs(i + 2) - xs(j + 2)) <= rTol) aCnt += 1
        }
      }
      val sampen: Option[Long] =
        if (aCnt > 0 && bCnt > 0)
          Some(math.floor(math.log(bCnt.toDouble) * 1e9).toLong -
            math.floor(math.log(aCnt.toDouble) * 1e9).toLong)
        else None
      pri -> ((n.toLong, rTol, bCnt, aCnt, sampen))
    }
    val got = operators.SeriesOps.tsSampen(spark, sfDir).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    }.toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (pri, exp) =>
      assert(got(pri) === exp, s"SampEn replay mismatch for $pri")
    }
  }

  // raw events collected once for the rank-test replays: everything
  // downstream (day/week-of-month slicing, integer mass, ranking, the
  // statistic algebra) is recomputed in plain Scala/BigInt, independent
  // of the Spark pipeline under test -- the Krippendorff-class guard
  // the r14 verdict asked for on the new rank-test wave.
  private lazy val rawEvents: Array[(String, java.time.Instant, Double)] =
    Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts"), col("value")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toInstant, r.getDouble(2)))

  test("Cramer-von Mises matches an exact BigInt driver replay") {
    val utc = java.time.ZoneOffset.UTC
    val daily = rawEvents
      .filter(e => e._1 == "click" || e._1 == "purchase")
      .groupBy(e => (e._1, e._2.atZone(utc).toLocalDate))
      .map { case ((t, d), es) =>
        (t, d, es.map(e => math.floor(e._3 * 1e6).toLong).sum)
      }.toArray
    val sorted = daily.sortBy { case (t, d, v) => (v, d.toString, t) }
    var iClick = 0L; var iPur = 0L
    var ssn = BigInt(0); var ssm = BigInt(0)
    sorted.zipWithIndex.foreach { case ((t, _, _), idx) =>
      val r = idx + 1L
      if (t == "click") { iClick += 1; ssn += BigInt(r - iClick).pow(2) }
      else { iPur += 1; ssm += BigInt(r - iPur).pow(2) }
    }
    val n = BigInt(iClick); val m = BigInt(iPur)
    val u = n * ssn + m * ssm
    val tNano = (6 * u - n * m * (4 * n * m - 1)) * 1000000000L /
      (6 * (n + m) * n * m)
    val row = operators.InferenceOps.cvmTwoSample(spark, sfDir).collect()
    assert(row.length === 1)
    assert(row(0).getLong(0) === n.toLong, "n")
    assert(row(0).getLong(1) === m.toLong, "m")
    assert(row(0).getLong(2) === u.toLong, "u")
    assert(row(0).getLong(3) === tNano.toLong, "t_nano")
  }

  test("Quade matches an exact BigInt driver replay on the zero-filled grid") {
    val utc = java.time.ZoneOffset.UTC
    val weekly = rawEvents
      .groupBy(e => (e._1,
        math.min((e._2.atZone(utc).getDayOfMonth - 1) / 7, 4) + 1L))
      .map { case ((t, w), es) =>
        ((t, w), es.map(e => math.floor(e._3 * 1e6).toLong).sum)
      }
    val types = weekly.keys.map(_._1).toSeq.distinct.sorted
    val kMax = weekly.keys.map(_._2).max
    val filled: Map[(String, Long), Long] = (for {
      t <- types; w <- 1L to kMax
    } yield (t, w) -> weekly.getOrElse((t, w), 0L)).toMap
    // within-block treatment ranks by (v, wk); block range ranks by (rng, type)
    val rk: Map[(String, Long), Long] = types.flatMap { t =>
      (1L to kMax).map(w => (w, filled((t, w)))).sortBy { case (w, v) => (v, w) }
        .zipWithIndex.map { case ((w, _), i) => (t, w) -> (i + 1L) }
    }.toMap
    val q: Map[String, Long] = types
      .map(t => t -> ((1L to kMax).map(w => filled((t, w))).max -
        (1L to kMax).map(w => filled((t, w))).min))
      .sortBy { case (t, rng) => (rng, t) }
      .zipWithIndex.map { case ((t, _), i) => t -> (i + 1L) }.toMap
    val s2: Map[(String, Long), BigInt] = filled.keys.map { case (t, w) =>
      (t, w) -> BigInt(q(t)) * (2 * rk((t, w)) - (kMax + 1))
    }.toMap
    val a4 = s2.values.map(x => x * x).sum
    val sb2 = (1L to kMax).map { w =>
      val s2j = types.map(t => s2((t, w))).sum; s2j * s2j
    }.sum
    val nB = BigInt(types.length)
    val denom = nB * a4 - sb2
    val fMilli: Option[Long] =
      if (denom > 0) Some(((nB - 1) * sb2 * 1000 / denom).toLong) else None
    val row = operators.InferenceOps.quadeTest(spark, sfDir).collect()
    assert(row.length === 1)
    assert(row(0).getLong(0) === nB.toLong, "n_blocks")
    assert(row(0).getLong(1) === kMax, "k_treatments")
    assert(row(0).getLong(2) === a4.toLong, "a4")
    assert(row(0).getLong(3) === sb2.toLong, "sb2")
    assert((if (row(0).isNullAt(4)) None else Some(row(0).getLong(4))) === fMilli,
      "f_milli")
  }

  test("structural equivalence: LSH output equals brute-force neighbor-jaccard") {
    // recall = 1 at the 0.5 threshold on the fixture (deterministic
    // xxhash64 signatures, 32x2 banding) -- the oracle-ability argument;
    // the driver's DuckDB twin re-proves this at sf0.01.
    val e = operators.DedupOps.materializedEdges(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nbrs: Map[Long, Set[Long]] =
      (e ++ e.map { case (a, b) => (b, a) })
        .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    val nodes = nbrs.keys.toSeq.sorted
    val expected = for {
      i <- nodes.indices; j <- (i + 1) until nodes.length
      a = nodes(i); b = nodes(j)
      common = (nbrs(a) & nbrs(b)).size.toLong
      union = nbrs(a).size + nbrs(b).size - common
      ppm = common * 1000000L / union
      if ppm >= 500000L
    } yield (a, b, common, nbrs(a).size.toLong, nbrs(b).size.toLong, ppm)
    assert(expected.nonEmpty, "fixture must exercise the >= 0.5 tail")
    val got = operators.GraphOps.structEquiv(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === expected.toSeq)
  }

  test("jaccard/adamic-adar graded queries still produce their top-20 shape") {
    val j = operators.GraphOps.jaccardSim(spark, sfDir).collect()
    assert(j.nonEmpty && j.length <= 20)
    assert(j.forall(_.getLong(3) > 0L), "jaccard_ppm must be positive")
    val aa = operators.GraphOps.adamicAdar(spark, sfDir).collect()
    assert(aa.nonEmpty && aa.length <= 20)
    assert(aa.forall(_.getLong(2) > 0L), "aa_nano must be positive")
  }
}
