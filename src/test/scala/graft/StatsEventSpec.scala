package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral bounds for the round-7-registered stats/event operators,
  * independent of the DuckDB oracle: the funnel is re-derived through a
  * typed per-user fold (different execution path than the conditional-min
  * aggregate), ntile through Spark's own built-in window function, and
  * winsorize/zorder through their defining invariants.
  */
class StatsEventSpec extends AnyFunSuite with SparkFixture {

  test("funnel matches an independent typed per-user fold (incl. null/order semantics)") {
    import spark.implicits._
    val got = operators.EventOps.funnel(spark, sfDir).collect()(0)
    val folded = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts").cast("long").as("t"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .mapGroups { (_, it) =>
        val evs = it.toSeq
        def first(k: String): Option[Long] = {
          val ts = evs.collect { case (_, `k`, t) => t }
          if (ts.isEmpty) None else Some(ts.min)
        }
        val v = first("view"); val c = first("click"); val b = first("purchase")
        val sv = v.isDefined
        val sc = sv && c.exists(_ > v.get)
        val sb = sc && b.exists(_ > c.get)
        (1L, if (sv) 1L else 0L, if (sc) 1L else 0L, if (sb) 1L else 0L)
      }
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4))
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3)) === folded)
    // monotone by construction; nonzero top-of-funnel proves the fixture exercises it
    assert(got.getLong(0) >= got.getLong(1) && got.getLong(1) >= got.getLong(2)
      && got.getLong(2) >= got.getLong(3) && got.getLong(1) > 0)
  }

  test("event transitions are row-stochastic and match an exact driver recomputation") {
    val rows = operators.EventOps.eventTransitions(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // row-stochastic: per from_type the counts sum to the reported total
    rows.groupBy(_._1).foreach { case (ft, rs) =>
      assert(rs.map(_._3).sum === rs.head._4, s"$ft marginal")
      val pSum = rs.map(_._5).sum
      // ppm probabilities sum to 1e6 up to the truncation of each term
      assert(pSum <= 1000000L && pSum > 1000000L - rs.length, s"$ft ppm sum")
    }
    // exact recomputation from the collected event log
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts").cast("long"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = evs.groupBy(_._1).values.flatMap { us =>
      val seq = us.sortBy(e => (e._3, e._4)).map(_._2).toSeq
      seq.zip(seq.drop(1))
    }.toSeq.groupBy(x => x).view.mapValues(_.size.toLong).toMap
    assert(rows.map(r => ((r._1, r._2), r._3)).toMap === expected)
  }

  test("RFM segments conserve customers and each quintile marginal is balanced") {
    val rows = operators.ExtraFuncs.rfmSegments(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val c = Tables.orders(spark, sfDir).select("o_custkey").distinct().count()
    assert(rows.map(_._4).sum === c, "every ordering customer lands in one segment")
    rows.foreach { case (r, f, m, _, _) =>
      assert(r >= 1 && r <= 5 && f >= 1 && f <= 5 && m >= 1 && m <= 5)
    }
    // each dimension's quintile sizes differ from C/5 by at most 1
    Seq[((Long, Long, Long, Long, Long)) => Long](_._1, _._2, _._3).foreach { dim =>
      rows.groupBy(dim).foreach { case (label, seg) =>
        val size = seg.map(_._4).sum
        assert(math.abs(size - c / 5) <= 1, s"quintile $label size $size vs ${c / 5}")
      }
    }
  }

  test("survival curve: shrinking risk set, conservation, non-increasing log-survival") {
    val rows = operators.EventOps.survival(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // duration-sorted, risk set strictly decreasing (each day removes d+c > 0 users)
    assert(rows.map(_._1).toSeq === rows.map(_._1).sorted.toSeq)
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(b._2 === a._2 - a._3 - a._4, "risk set drains by exactly d+c")
    }
    val nSignup = Tables.events(spark, sfDir)
      .filter(col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(rows.head._2 === nSignup, "initial risk set = signup cohort")
    assert(rows.map(r => r._3 + r._4).sum === nSignup, "everyone converts or censors once")
    // log-survival only falls, and recomputes exactly from the (n, d) pairs
    var ln = 0L
    rows.foreach { case (_, n, d, _, got) =>
      if (n - d > 0)
        ln += math.floor(math.log((n - d).toDouble) * 1e9).toLong -
          math.floor(math.log(n.toDouble) * 1e9).toLong
      assert(got === ln, "cumulative log-survival")
      assert(ln <= 0L)
    }
  }

  test("retention cohort 0-offset equals its cohort size and offsets are non-negative") {
    val rows = operators.EventOps.retention(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) >= 0L), "negative week offset")
    // every cohort has an offset-0 row (the week of first activity itself)
    val byCohort = rows.groupBy(_.get(0))
    assert(byCohort.values.forall(_.exists(_.getLong(1) == 0L)))
    // offset-0 count is the cohort max: retention can only shrink or rejoin, never exceed
    byCohort.values.foreach { rs =>
      val at0 = rs.find(_.getLong(1) == 0L).get.getLong(2)
      assert(rs.forall(_.getLong(2) <= at0), s"cohort bigger at later offset than at 0")
    }
  }

  test("partitioned ntile equals Spark's built-in ntile(8) global window") {
    val mine = operators.StatsOps.ntileBuckets(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ref = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        ntile(8).over(Window.orderBy("o_totalprice", "o_orderkey")).cast("long").as("bucket"))
      .orderBy("o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(mine.length === ref.length)
    assert(mine.sameElements(ref))
  }

  test("winsorize clips are sided correctly and idempotent at the row level") {
    val rows = operators.StatsOps.winsorize(spark, sfDir).collect()
    var low = 0; var high = 0
    rows.foreach { r =>
      val (orig, w, clip) = (r.getDouble(1), r.getDouble(2), r.getString(3))
      clip match {
        case "in"   => assert(w === orig)
        case "low"  => assert(w > orig); low += 1
        case "high" => assert(w < orig); high += 1
      }
    }
    // the fixture has mass in both tails (5% each side, modulo segment ties)
    assert(low > 0 && high > 0, s"degenerate clip: low=$low high=$high")
    assert(low + high < rows.length / 2, "clipped more than half the rows")
  }

  test("zorder buckets partition the morton range and cover every lineitem row") {
    val rows = operators.StatsOps.zorderKey(spark, sfDir).collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total === Tables.lineitem(spark, sfDir).count())
    rows.foreach { r =>
      val (zb, minZ, maxZ) = (r.getLong(0), r.getLong(2), r.getLong(3))
      // bucket = zkey >> 10: all member keys live in [zb*1024, (zb+1)*1024)
      assert(minZ >= zb * 1024 && maxZ < (zb + 1) * 1024 && minZ <= maxZ,
        s"bucket $zb range [$minZ,$maxZ] escapes its 1024-wide cell")
    }
    // 16-bit morton keys: buckets confined to [0, 64)
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 64))
  }

  test("IVF centroid count is a fixed build parameter, not corpus-proportional") {
    // the scale contract from the scaladoc: C is bounded regardless of N
    val got = operators.SimilarityOps.simIvfBucketed(spark, sfDir)
    assert(got.collect().length <= 10 * 5) // 10 probes × top-5
  }

  test("funnel latency cohort equals the funnel's step-3 count and percentiles are ordered") {
    val f = operators.EventOps.funnel(spark, sfDir).collect()(0)
    val l = operators.EventOps.funnelLatency(spark, sfDir).collect()(0)
    assert(l.getLong(0) === f.getLong(3), "latency cohort != funnel step_buy count")
    if (l.getLong(0) > 0) {
      assert(l.getDouble(1) <= l.getDouble(2), "p50 > p90")
      assert(l.getDouble(2) <= l.getLong(3).toDouble, "p90 > max")
      assert(l.getDouble(1) > 0, "nonpositive latency for a strictly-ordered funnel")
    }
  }

  test("gap histogram buckets bound their gaps and conserve the gap count") {
    val rows = operators.EventOps.gapHistogram(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, bucket, n, lo, hi) =>
      assert(n > 0 && lo <= hi)
      val floor = if (bucket == 0) 0L else 1L << bucket
      assert(lo >= floor, s"bucket $bucket holds gap $lo below ${floor}")
      assert(hi < (1L << (bucket + 1)), s"bucket $bucket holds gap $hi past ${1L << (bucket + 1)}")
    }
    val ev = Tables.events(spark, sfDir)
    val expectedGaps = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_._3).sum === expectedGaps, "per-user gap count not conserved")
  }

  test("week-over-week change matches an exact driver recomputation") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("x"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val expected = daily.groupBy(_._1).flatMap { case (tpe, ds) =>
      val ordered = ds.sortBy(_._2)
      ordered.indices.drop(7).flatMap { i =>
        val prev = ordered(i - 7)._3
        if (prev == 0) None
        else Some((tpe, ordered(i)._2) -> BigDecimal((ordered(i)._3 - prev).toDouble / prev)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.toMap
    val got = operators.TimeWindows.tsPctChange(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime) -> r.getDouble(3)).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, v) => assert(math.abs(got(k) - v) < 1e-9, s"WoW mismatch at $k") }
  }

  test("daily z-scores match an exact driver recomputation and flag only |z| > 2") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("x"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val rows = operators.StatsOps.statsZscoreDaily(spark, sfDir).collect()
    assert(rows.nonEmpty)
    daily.groupBy(_._1).foreach { case (tpe, ds) =>
      val n = ds.length
      val sx = ds.map(e => BigInt(e._3)).sum
      val sxx = ds.map(e => BigInt(e._3) * BigInt(e._3)).sum
      val mean = sx.toDouble / n
      val sd = math.sqrt((BigInt(n) * sxx - sx * sx).toDouble) / n
      if (sd > 0) ds.foreach { case (_, day, x) =>
        val exp = BigDecimal((x - mean) / sd).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val got = rows.find(r => r.getString(0) == tpe && r.getTimestamp(1).getTime == day).get
        assert(math.abs(got.getDouble(3) - exp) < 1e-9, s"z mismatch ($tpe, $day)")
        assert(got.getBoolean(4) === (math.abs(got.getDouble(3)) > 2.0))
      }
    }
  }

  test("SCD2 point-in-time lookup partitions exactly the users active before T") {
    val asOf = java.sql.Timestamp.valueOf("2024-01-15 12:00:00")
    val expected = Tables.events(spark, sfDir)
      .filter(col("ts") <= lit(asOf))
      .select("user_id").distinct().count()
    val rows = operators.QualityOps.scd2Pit(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum === expected,
      "every user with history at T must hold exactly one status interval")
    // spot-verify one user's status against a direct latest-event-before-T pick
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
    val direct = Tables.events(spark, sfDir)
      .filter(col("ts") <= lit(asOf))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy(col("event_type").as("status")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val pit = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pit === direct, "PIT status distribution != latest-event-before-T distribution")
  }

  test("attribution conserves purchases and value, and matches a driver-side recompute") {
    val events = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").cast("long").as("sec"), floor(col("value") * 1e6).cast("long").as("vmicro"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    val buys = events.filter(_._3 == "purchase")
    val expected = buys.map { case (u, _, _, bSec, bV) =>
      val cand = events.filter(e => e._1 == u && e._3 != "purchase"
        && e._4 <= bSec && e._4 > bSec - 86400L)
      val ch = if (cand.isEmpty) "organic"
        else cand.maxBy(e => (e._4, e._2))._3
      ch -> bV
    }.groupBy(_._1).map { case (ch, vs) => ch -> (vs.length.toLong, vs.map(_._2).sum) }
    val got = operators.EventOps.attribution(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expected)
    assert(got.values.map(_._1).sum === buys.length.toLong, "purchases not conserved")
  }

  test("tsSeasonal matches a naive driver decomposition") {
    val rows = operators.TimeWindows.tsSeasonal(spark, sfDir).collect()
    val daily = Tables.events(spark, sfDir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("m"))
      .orderBy("day").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1)))
    val n = daily.length
    val trend: Array[Option[Long]] = daily.indices.map { i =>
      if (i < 3 || i >= n - 3) None
      else Some((i - 3 to i + 3).map(j => daily(j)._2).sum / 7)
    }.toArray
    val dow = daily.map { case (d, _) =>
      val c = java.util.Calendar.getInstance(java.util.TimeZone.getTimeZone("UTC"))
      c.setTime(d); c.get(java.util.Calendar.DAY_OF_WEEK) - 1
    }
    val seas: Map[Int, (Long, Long)] = daily.indices
      .filter(trend(_).isDefined)
      .groupBy(dow(_)).view
      .mapValues(ix => (ix.map(i => daily(i)._2 - trend(i).get).sum, ix.length.toLong))
      .toMap
    assert(rows.length === n)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getTimestamp(0) === daily(i)._1)
      assert(r.getLong(1) === daily(i)._2, s"mass at $i")
      assert(Option(if (r.isNullAt(2)) null else r.getLong(2)).map(_.asInstanceOf[Long])
        === trend(i), s"trend at $i")
      val (ds, nv) = seas(dow(i))
      val expSeasonal = BigDecimal(ds.toDouble / nv)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - expSeasonal) < 1e-9, s"seasonal at $i")
      trend(i) match {
        case Some(t) =>
          val expRem = BigDecimal((daily(i)._2 - t).toDouble - ds.toDouble / nv)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(math.abs(r.getDouble(4) - expRem) < 1e-9, s"remainder at $i")
        case None => assert(r.isNullAt(4), s"edge day $i must have null remainder")
      }
    }
  }

  test("bfsHops matches a naive driver BFS and hops are contiguous from 0") {
    val edges = operators.DedupOps.materializedEdges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val seed = edges.map(_._1).min
    var dist = Map(seed -> 0L)
    var frontier = Set(seed)
    for (h <- 1 to 6) {
      val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- dist.keySet
      dist = dist ++ next.map(_ -> h.toLong)
      frontier = next
    }
    val got = operators.GraphOps.bfsHops(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === dist)
    val hops = got.values.toSet
    assert((0L to hops.max).forall(hops.contains), "hop levels are contiguous")
  }

  test("labelProp matches a driver-side synchronous LPA") {
    val edges = operators.DedupOps.materializedEdges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sym = edges ++ edges.map(_.swap)
    val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    var labels: Map[Long, Long] = adj.keySet.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      labels = adj.map { case (node, nbrs) =>
        val counts = nbrs.groupBy(labels).view.mapValues(_.size).toMap
        node -> counts.toSeq.sortBy { case (l, cnt) => (-cnt, l) }.head._1
      }
    }
    val got = operators.GraphOps.labelProp(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === labels)
    assert(got.values.toSet.size > 1, "more than one community at fixture scale")
  }

  test("tsHolt equals the driver-side fold of the daily series") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("x"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val got = operators.TimeWindows.tsHolt(spark, sfDir).collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val xs = daily.filter(_._1 == r.getString(0)).sortBy(_._2).map(_._3)
      var l = xs(0); var b = xs(1) - xs(0)
      for (y <- xs.drop(1)) {
        val l2 = (y + l + b) / 2 // Long / truncates toward zero = Spark div
        b = (l2 - l + b) / 2; l = l2
      }
      assert(r.getLong(1) === xs.length.toLong, "n_days")
      assert(r.getLong(2) === l, s"level ${r.getString(0)}")
      assert(r.getLong(3) === b, s"trend ${r.getString(0)}")
      assert(r.getLong(4) === l + 3 * b, s"forecast ${r.getString(0)}")
    }
  }

  test("peakConcurrency matches a driver-side sweep line") {
    val evs = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts").cast("long").as("sec"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = operators.EventOps.peakConcurrency(spark, sfDir).collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val secs = evs.filter(_._1 == r.getString(0)).map(_._2)
      val deltas = (secs.map((_, 1L)) ++ secs.map(s => (s + 1800L, -1L)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
      var conc = 0L; var peak = Long.MinValue; var peakT = 0L
      for ((t, d) <- deltas) {
        conc += d
        if (conc > peak) { peak = conc; peakT = t }
      }
      assert(r.getLong(1) === peak, s"peak ${r.getString(0)}")
      assert(r.getLong(2) === peakT, s"peak_start ${r.getString(0)}")
    }
  }

  test("modularity is consistent with a driver-side recompute over LPA labels") {
    val edges = operators.DedupOps.materializedEdges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val labels = operators.GraphOps.labelProp(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = BigInt(edges.length)
    val deg = (edges.map(_._1) ++ edges.map(_._2)).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val dC = deg.groupBy { case (nd, _) => labels(nd) }
      .view.mapValues(_.values.map(BigInt(_)).sum).toMap
    val eC = edges.filter { case (a, b) => labels(a) == labels(b) }
      .groupBy { case (a, _) => labels(a) }.view.mapValues(x => BigInt(x.length)).toMap
    val qnum = dC.keysIterator.map { c =>
      4 * m * eC.getOrElse(c, BigInt(0)) - dC(c) * dC(c)
    }.sum
    val r = operators.GraphOps.modularity(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_communities") === dC.size.toLong)
    assert(r.getAs[Long]("n_edges") === edges.length.toLong)
    assert(r.getAs[Long]("q_ppm") === ((qnum * 1000000) / (4 * m * m)).toLong)
    assert(r.getAs[Long]("q_ppm") > 0, "LPA on a similarity graph should beat chance")
  }

  test("assocRules: confidence and lift agree with a driver-side basket recount") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nTx = li.map(_._1).distinct.length.toLong
    val itemCnt = li.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairCnt = li.groupBy(_._1).values.toSeq.flatMap { basket =>
      val pks = basket.map(_._2).toSeq
      for (a <- pks; b <- pks if a != b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rows = operators.ExtraFuncs.assocRules(spark, sfDir).collect()
    assert(rows.length === 10)
    var prevLift = Long.MaxValue
    for (r <- rows) {
      val (a, b) = (r.getAs[Long]("part"), r.getAs[Long]("co_part"))
      val nAb = pairCnt((a, b))
      assert(r.getAs[Long]("n_ab") === nAb)
      assert(r.getAs[Long]("support_ppm") === nAb * 1000000L / nTx)
      assert(r.getAs[Long]("confidence_ppm") === nAb * 1000000L / itemCnt(a))
      assert(r.getAs[Long]("lift_ppm") ===
        (BigInt(nAb) * nTx * 1000000 / (BigInt(itemCnt(a)) * itemCnt(b))).toLong)
      assert(r.getAs[Long]("lift_ppm") <= prevLift, "sorted by lift desc")
      prevLift = r.getAs[Long]("lift_ppm")
    }
  }

  test("conductance: cut = vol - 2*e_c, volumes sum to 2m, phi in [0, 1e6]") {
    val edges = operators.DedupOps.materializedEdges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val m = edges.length.toLong
    val rows = operators.GraphOps.conductance(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("vol")).sum === 2 * m)
    val labels = operators.GraphOps.labelProp(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val deg = (edges.map(_._1) ++ edges.map(_._2)).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    for (r <- rows) {
      val c = r.getAs[Long]("community")
      val vol = deg.collect { case (nd, d) if labels(nd) == c => d }.sum
      val eIn = edges.count { case (a, b) => labels(a) == c && labels(b) == c }.toLong
      assert(r.getAs[Long]("vol") === vol, s"vol $c")
      assert(r.getAs[Long]("cut") === vol - 2 * eIn, s"cut $c")
      val denom = math.min(vol, 2 * m - vol)
      if (denom > 0) {
        assert(r.getAs[Long]("conductance_ppm") === (vol - 2 * eIn) * 1000000L / denom)
        assert(r.getAs[Long]("conductance_ppm") >= 0L)
        assert(r.getAs[Long]("conductance_ppm") <= 1000000L)
      } else assert(r.isNullAt(r.fieldIndex("conductance_ppm")), s"phi $c")
    }
  }

  test("tsAnomaly median/MAD equal the driver-side sorted-pair medians") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    def medPair(l: Seq[Long]): Long = {
      val n = l.length
      (l((n + 1) / 2 - 1) + l((n + 2) / 2 - 1)) / 2
    }
    for (r <- operators.TimeWindows.tsAnomaly(spark, sfDir).collect()) {
      val xs = daily.filter(_._1 == r.getString(0)).map(_._2).sorted.toSeq
      val med = medPair(xs)
      val mad = medPair(xs.map(v => math.abs(v - med)).sorted)
      assert(r.getLong(1) === xs.length.toLong)
      assert(r.getLong(2) === med, s"median ${r.getString(0)}")
      assert(r.getLong(3) === mad, s"mad ${r.getString(0)}")
      assert(r.getLong(4) === xs.count(v => math.abs(v - med) > 3 * mad).toLong)
    }
  }

  test("skyline equals brute-force dominance over the daily peaks") {
    val rows = operators.StatsOps.skylineDaily(spark, sfDir).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1)))
    val daily = Tables.orders(spark, sfDir)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(max(round(col("o_totalprice") * 100, 0).cast("long")).as("peak"))
      .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1)))
    // brute force: a day survives iff no other day dominates it
    val expected = daily.filter { case (d, p) =>
      !daily.exists { case (d2, p2) =>
        (d2 >= d && p2 >= p) && (d2 > d || p2 > p)
      }
    }.sortBy(_._1)
    assert(rows.toSeq === expected.toSeq)
    // frontier law: sorted by day, peaks strictly decrease
    assert(rows.map(_._2).toSeq === rows.map(_._2).sortBy(-_).toSeq)
    assert(rows.map(_._2).distinct.length === rows.length)
  }

  test("Markov stationary matches a 10-round driver replay and conserves mass") {
    val rows = operators.EventOps.markovStationary(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val seq = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getLong(2), r.getString(3)))
      .groupBy(_._1).values.flatMap { es =>
        val sorted = es.sortBy(e => (e._2, e._3)).map(_._4)
        sorted.zip(sorted.tail)
      }.toSeq
    val counts = seq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rts = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val states = rts.keySet.toSeq.sorted
    var pi = states.map(_ -> 1000000L / states.size).toMap
    for (_ <- 1 to 10) {
      pi = states.map { to =>
        to -> states.map { from =>
          counts.get((from, to)).map(n => pi(from) * n / rts(from)).getOrElse(0L)
        }.sum
      }.toMap
    }
    pi.foreach { case (k, v) => assert(rows.getOrElse(k, 0L) === v, s"pi($k)") }
    assert(rows.keySet.subsetOf(states.toSet))
    // each round floors one term per (from, to) cell: drift ≤ rounds·|S|²
    val mass = rows.values.sum
    assert(mass <= 1000000L && mass >= 1000000L - 10L * states.size * states.size,
      s"floor drift bounded: $mass")
  }

  test("event dwell equals a driver lag replay and dwells are non-negative") {
    val rows = operators.EventOps.eventDwell(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val byUser = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts").cast("long"), col("event_id"),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    val dwells = byUser.values.flatMap { es =>
      val sorted = es.sortBy(e => (e._2, e._3))
      sorted.zip(sorted.tail).map { case (a, b) => ((a._4, b._4), b._2 - a._2) }
    }.toSeq
    val expected = dwells.groupBy(_._1).view.mapValues { xs =>
      val ds = xs.map(_._2)
      (ds.length.toLong, ds.map(BigInt(_)).sum / ds.length, ds.max)
    }.toMap
    assert(rows.keySet === expected.keySet)
    expected.foreach { case (k, (n, mean, mx)) =>
      assert(rows(k)._1 === n, s"$k n")
      assert(rows(k)._2 === mean.toLong, s"$k mean")
      assert(rows(k)._3 === mx, s"$k max")
      assert(rows(k)._2 >= 0L && rows(k)._3 >= rows(k)._2)
    }
  }

  test("STL strength equals a driver replay of the tsSeasonal decomposition") {
    val r = operators.TimeWindows.tsStlStrength(spark, sfDir).collect()(0)
    val daily = Tables.events(spark, sfDir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("m"))
      .collect().map(x => (x.getTimestamp(0).getTime, x.getLong(1)))
      .sortBy(_._1)
    val valid = daily.indices.filter(i => i >= 3 && i < daily.length - 3).map { i =>
      val trend = (i - 3 to i + 3).map(j => BigInt(daily(j)._2)).sum / 7
      val dow = ((daily(i)._1 / 86400000 + 4) % 7).toInt // epoch day 0 = Thursday
      (daily(i)._2 - trend.toLong, dow)
    }
    val seas = valid.groupBy(_._2).view.mapValues { xs =>
      (xs.map(x => BigInt(x._1)).sum / xs.length).toLong
    }.toMap
    val full = daily.indices.filter(i => i >= 3 && i < daily.length - 3).map { i =>
      val trend = ((i - 3 to i + 3).map(j => BigInt(daily(j)._2)).sum / 7).toLong
      val dow = ((daily(i)._1 / 86400000 + 4) % 7).toInt
      val m = daily(i)._2
      (m - trend - seas(dow), m - trend, m - seas(dow))
    }
    def varNum(xs: Seq[Long]): BigInt = {
      val n = BigInt(xs.length)
      n * xs.map(x => BigInt(x) * x).sum - xs.map(BigInt(_)).sum * xs.map(BigInt(_)).sum
    }
    val vr = varNum(full.map(_._1))
    val fSeas = (BigInt(1000000) - vr * 1000000 / varNum(full.map(_._2))).max(0)
    val fTrend = (BigInt(1000000) - vr * 1000000 / varNum(full.map(_._3))).max(0)
    assert(r.getAs[Long]("n_valid_days") === full.length.toLong)
    assert(r.getAs[Long]("f_seasonal_ppm") === fSeas.toLong)
    assert(r.getAs[Long]("f_trend_ppm") === fTrend.toLong)
    assert(fSeas >= 0 && fSeas <= 1000000 && fTrend >= 0 && fTrend <= 1000000)
  }

  test("changepoint equals a brute-force split sweep per event type") {
    val rows = operators.TimeWindows.tsChangepoint(spark, sfDir).collect()
      .map(r => (r.getString(0), (r.getTimestamp(1).getTime, r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("m"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(x => (x._2, x._3)).toVector)
      .toMap
    assert(rows.keySet === daily.keySet)
    daily.foreach { case (tpe, series) =>
      val n = series.length
      val st = series.map(x => BigInt(x._2)).sum
      var best = (BigInt(-1), 0) // (gain, k)
      var cs = BigInt(0)
      for (k <- 1 until n) {
        cs += series(k - 1)._2
        val gain = (cs * cs * (n - k) + (st - cs) * (st - cs) * k) /
          (BigInt(k) * (n - k))
        if (gain > best._1) best = (gain, k)
      }
      val (day, nl, nr, ml, mr) = rows(tpe)
      assert(nl === best._2.toLong, s"$tpe split index")
      assert(day === series(best._2 - 1)._1, s"$tpe split day")
      assert(nr === (n - best._2).toLong)
      val csb = series.take(best._2).map(x => BigInt(x._2)).sum
      assert(ml === (csb * 1000 / best._2).toLong)
      assert(mr === ((st - csb) * 1000 / (n - best._2)).toLong)
    }
  }

  test("degree distribution conserves nodes/edge-endpoints and ln-coords are exact") {
    val rows = operators.GraphOps.degreeDist(spark, sfDir).collect()
    val edges = operators.DedupOps.materializedEdges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = deg.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rows.map(_.getLong(0)).toSet === expected.keySet)
    rows.foreach { r =>
      assert(r.getLong(1) === expected(r.getLong(0)), s"deg ${r.getLong(0)}")
      assert(r.getLong(2) === math.floor(math.log(r.getLong(0).toDouble) * 1e9).toLong)
      assert(r.getLong(3) === math.floor(math.log(r.getLong(1).toDouble) * 1e9).toLong)
    }
    // Σ deg·n_nodes = 2·|edges| (handshake), Σ n_nodes = |nodes|
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum === 2L * edges.length)
    assert(rows.map(_.getLong(1)).sum === deg.size.toLong)
  }

  test("partAbc matches a driver Pareto sweep and conserves parts/revenue") {
    val rows = operators.StatsOps.partAbc(spark, sfDir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val rev = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100, 0)
        .cast("long")).as("rev"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (k, v) => (-v, k) }
    val total = rev.map(x => BigInt(x._2)).sum
    var cum = BigInt(0)
    val expected = rev.map { case (_, v) =>
      val cls = if (cum * 100 < total * 80) "A"
        else if (cum * 100 < total * 95) "B" else "C"
      cum += v
      (cls, v)
    }.groupBy(_._1).view.mapValues { xs =>
      (xs.length.toLong, xs.map(x => BigInt(x._2)).sum)
    }.toMap
    assert(rows.keySet === expected.keySet)
    expected.foreach { case (cls, (n, r)) =>
      assert(rows(cls)._1 === n, s"class $cls count")
      assert(rows(cls)._2 === r.toLong, s"class $cls revenue")
      assert(rows(cls)._3 === (r * 1000000 / total).toLong, s"class $cls share")
    }
    assert(rows.values.map(_._1).sum === rev.length.toLong)
    // A captures at least as much revenue as its population share implies
    if (rows.contains("A") && rows.contains("C"))
      assert(rows("A")._2 / rows("A")._1 >= rows("C")._2 / rows("C")._1)
  }

  test("cohortLtv: offset-0 activity equals cohort size; cum is monotone") {
    val rows = operators.ExtraFuncs.cohortLtv(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getDate(0).toString)
    byCohort.values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(1))
      // every cohort customer orders in their first month
      assert(sorted.head.getLong(1) === 0L)
      assert(sorted.head.getAs[Long]("n_active") === sorted.head.getAs[Long]("n_cohort"))
      // cumulative revenue reconciles with the per-period column
      var cum = 0L
      sorted.foreach { r =>
        cum += r.getAs[Long]("revenue_cents")
        assert(r.getAs[Long]("cum_cents") === cum)
        assert(r.getAs[Long]("n_active") <= r.getAs[Long]("n_cohort"))
        assert(r.getAs[Long]("ltv_micro") ===
          (BigInt(cum) * 10000 / r.getAs[Long]("n_cohort")).toLong)
      }
    }
    // cohort sizes sum to the distinct customer count
    val nCust = Tables.orders(spark, sfDir)
      .select(countDistinct(col("o_custkey"))).collect()(0).getLong(0)
    assert(byCohort.values.map(_.head.getAs[Long]("n_cohort")).sum === nCust)
  }

  test("statsQq deciles equal a driver-side sort-and-index computation") {
    val rows = operators.StatsOps.statsQq(spark, sfDir).collect()
    val vals = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_type"), round(col("value") * 100, 0).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def deciles(grp: String): Map[Long, Long] = {
      val xs = vals.filter(_._1 == grp).map(_._2).sorted
      (1L to 9L).map { d =>
        // smallest value whose cumulative count reaches ceil(d*N/10)
        val thr = (d * xs.length + 9) / 10
        d -> xs(thr.toInt - 1)
      }.toMap
    }
    val p = deciles("purchase"); val c = deciles("click")
    assert(rows.length === 9)
    rows.foreach { r =>
      val d = r.getLong(0)
      assert(r.getLong(1) === p(d), s"purchase decile $d")
      assert(r.getLong(2) === c(d), s"click decile $d")
      assert(r.getLong(3) === p(d) - c(d))
    }
    // quantiles are non-decreasing in d
    assert(rows.map(_.getLong(1)).toSeq === rows.map(_.getLong(1)).sorted.toSeq)
    assert(rows.map(_.getLong(2)).toSeq === rows.map(_.getLong(2)).sorted.toSeq)
  }

  test("tsBurstiness matches driver moments and is Poisson-consistent in scale") {
    val rows = operators.TimeWindows.tsBurstiness(spark, sfDir).collect()
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(rows.length === daily.size)
    rows.foreach { r =>
      val cs = daily(r.getString(0))
      val n = BigInt(cs.length); val s1 = cs.map(BigInt(_)).sum
      val s2 = cs.map(c => BigInt(c) * c).sum
      assert(r.getLong(1) === cs.length.toLong)
      assert(r.getLong(2) === ((s1 * 1000) / n).toLong, "mean_milli")
      assert(r.getLong(3) === (((n * s2 - s1 * s1) * 1000) / (n * n)).toLong, "var_milli")
      assert(r.getLong(4) === (((n * s2 - s1 * s1) * 1000) / (n * s1)).toLong, "fano_milli")
      assert(r.getLong(4) >= 0L)
    }
  }

  test("winStreaks equals a driver-side consecutive-day fold per user") {
    val rows = operators.EventOps.winStreaks(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val byUser = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("cast(ts as long) div 86400").as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap
    assert(rows.size === byUser.size)
    byUser.foreach { case (u, days) =>
      val runs = scala.collection.mutable.ArrayBuffer[Long]()
      var len = 1L
      for (i <- 1 until days.length) {
        if (days(i) == days(i - 1) + 1) len += 1
        else { runs += len; len = 1L }
      }
      runs += len
      val (active, longest, nStreaks) = rows(u)
      assert(active === days.length.toLong, s"user $u active days")
      assert(longest === runs.max, s"user $u longest streak")
      assert(nStreaks === runs.length.toLong, s"user $u streak count")
    }
  }

  test("tsDrawdown: peak is the exact running max, drawdown non-negative") {
    val rows = operators.TimeWindows.tsDrawdown(spark, sfDir).collect()
    assert(rows.nonEmpty)
    var peak = Long.MinValue
    rows.foreach { r =>
      val rev = r.getAs[Long]("rev_cents")
      peak = math.max(peak, rev)
      assert(r.getAs[Long]("peak_cents") === peak)
      assert(r.getAs[Long]("dd_cents") === peak - rev)
      assert(r.getAs[Long]("dd_ppm") === BigInt(peak - rev).*(1000000)./(BigInt(peak)).toLong)
      assert(r.getAs[Long]("dd_cents") >= 0L)
      assert(r.getAs[Long]("dd_ppm") <= 1000000L)
    }
    // the series must actually draw down somewhere (fixture has quiet days)
    assert(rows.exists(_.getAs[Long]("dd_cents") > 0L))
  }

  test("tsMannKendall matches a naive pair sweep with tie-corrected variance") {
    val rows = operators.TimeWindows.tsMannKendall(spark, sfDir).collect()
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("x"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val et = r.getString(0)
      val xs = daily(et).sortBy(_._2.getTime).map(_._3)
      val n = xs.length
      var sStat = 0L
      for (i <- xs.indices; j <- i + 1 until n)
        sStat += java.lang.Long.signum(xs(j) - xs(i)).toLong
      val tieTerm = xs.groupBy(identity).values
        .map(g => { val t = g.length.toLong; t * (t - 1) * (2 * t + 5) }).sum
      val var18 = n.toLong * (n - 1) * (2L * n + 5) - tieTerm
      assert(r.getAs[Long]("n_days") === n.toLong, s"n for $et")
      assert(r.getAs[Long]("s_stat") === sStat, s"S for $et")
      assert(r.getAs[Long]("var18") === var18, s"var18 for $et")
      val z2 = if (sStat == 0) 0L
        else (BigInt(math.abs(sStat) - 1) * (math.abs(sStat) - 1) * 18000 /
          var18).toLong
      assert(r.getAs[Long]("z2_milli") === z2, s"z2 for $et")
      assert(r.getAs[Boolean]("significant_05") === (z2 > 3841L))
    }
  }

  test("linkBlocking: naive block sizes, pair formula, cap flag") {
    val rows = operators.DedupOps.linkBlocking(spark, sfDir).collect()
    val naive = Tables.part(spark, sfDir).select("p_name", "p_brand").collect()
      .map(r => r.getString(0).split(" ")(0) + ":" + r.getString(1))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = naive.toSeq.map { case (k, n) => (k, n) }
      .sortBy { case (k, n) => (-n, k) }.take(30)
    assert(rows.map(r => (r.getString(0), r.getAs[Long]("n_records"))).toSeq
      === expected)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_records")
      assert(r.getAs[Long]("n_pairs") === n * (n - 1) / 2)
      assert(r.getAs[Boolean]("over_cap") === (n > 4096L))
    }
  }

  test("tsAdf matches an exact BigInt lag-1 regression replay") {
    val rows = operators.TimeWindows.tsAdf(spark, sfDir).collect()
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("x"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getString(0)
      val xs = daily(et).sortBy(_._2.getTime).map(_._3)
      val pairs = xs.zip(xs.drop(1)).map { case (a, b) => (BigInt(a), BigInt(b) - a) }
      val n = BigInt(pairs.length)
      val sz = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val szy = pairs.map(p => p._1 * p._2).sum
      val szz = pairs.map(p => p._1 * p._1).sum
      val sy2 = pairs.map(p => p._2 * p._2).sum
      val sxx = n * szz - sz * sz; val sxy = n * szy - sz * sy
      val syy = n * sy2 - sy * sy
      // BigInt '/' truncates toward zero, exactly like Spark's div
      val slope = (sxy * 1000000) / sxx
      val r2 = (slope * sxy) / syy
      val t2 = ((n - 2) * r2 * 1000) / (1000000 - r2)
      assert(r.getAs[Long]("n") === pairs.length.toLong, s"n for $et")
      assert(r.getAs[Long]("slope_micro") === slope.toLong, s"slope for $et")
      assert(r.getAs[Long]("r2_ppm") === r2.toLong, s"r2 for $et")
      assert(r2 >= 0 && r2 < 1000000, s"r2 range for $et")
      assert(r.getAs[Long]("t2_milli") === t2.toLong, s"t2 for $et")
      assert(r.getAs[Boolean]("stationary_05") === (slope < 0 && t2 > 8180))
    }
  }

  test("funnelWindowed matches a driver replay and is within the plain funnel") {
    val r = operators.EventOps.funnelWindowed(spark, sfDir).collect()(0)
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts").cast("long"))
      .collect().map(e => (e.getLong(0), e.getString(1), e.getLong(2)))
      .groupBy(_._1)
    var nView = 0L; var nClick = 0L; var nBuy = 0L
    evs.values.foreach { us =>
      val views = us.collect { case (_, "view", t) => t }
      if (views.nonEmpty) {
        nView += 1
        val tv = views.min
        val clicks = us.collect { case (_, "click", t)
          if t > tv && t <= tv + 259200 => t }
        if (clicks.nonEmpty) {
          nClick += 1
          val tc = clicks.min
          if (us.exists { case (_, et, t) =>
            et == "purchase" && t > tc && t <= tc + 604800 }) nBuy += 1
        }
      }
    }
    assert(r.getAs[Long]("n_users") === evs.size.toLong)
    assert(r.getAs[Long]("n_view") === nView)
    assert(r.getAs[Long]("n_click_3d") === nClick)
    assert(r.getAs[Long]("n_buy_7d") === nBuy)
    assert(nView >= nClick && nClick >= nBuy)
  }

  test("tsGranger matches a BigInt Cramer-cofactor replay") {
    val r = operators.TimeWindows.tsGranger(spark, sfDir).collect()(0)
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("x"))
      .collect().map(row => (row.getString(0), row.getTimestamp(1).getTime,
        row.getLong(2)))
    val totals = daily.groupBy(_._1).view
      .mapValues(_.map(e => BigInt(e._3)).sum).toMap
    val sorted = totals.toSeq.sortBy { case (t, v) => (-v, t) }
    val (typeA, typeB) = (sorted(0)._1, sorted(1)._1)
    assert(r.getString(0) === typeA && r.getString(1) === typeB)
    val byDay = daily.groupBy(_._2)
    val pair = byDay.collect { case (d, es)
      if es.exists(_._1 == typeA) && es.exists(_._1 == typeB) =>
        (d, es.find(_._1 == typeA).get._3 / 10000000,
          es.find(_._1 == typeB).get._3 / 10000000)
    }.toSeq.sortBy(_._1)
    val rows = pair.zip(pair.drop(1)).map { case ((_, al, bl), (_, a, _)) =>
      (BigInt(a), BigInt(al), BigInt(bl)) }
    val n = BigInt(rows.length)
    def s(f: ((BigInt, BigInt, BigInt)) => BigInt) = rows.map(f).sum
    val (sy, s1, s2) = (s(_._1), s(_._2), s(_._3))
    val Syy = n * s(t => t._1 * t._1) - sy * sy
    val S1y = n * s(t => t._2 * t._1) - s1 * sy
    val S2y = n * s(t => t._3 * t._1) - s2 * sy
    val S11 = n * s(t => t._2 * t._2) - s1 * s1
    val S22 = n * s(t => t._3 * t._3) - s2 * s2
    val S12 = n * s(t => t._2 * t._3) - s1 * s2
    val d = S11 * S22 - S12 * S12
    val rssR = (Syy * S11 - S1y * S1y) / S11
    val rssU = (Syy * d - S1y * (S1y * S22 - S2y * S12)
      - S2y * (S2y * S11 - S1y * S12)) / d
    val f = ((rssR - rssU) * (n - 3) * 1000) / rssU
    assert(r.getAs[Long]("n") === rows.length.toLong)
    assert(r.getAs[Long]("f_milli") === f.toLong)
    // exact RSS_u <= RSS_r; the staged de-scale can perturb by 1 unit
    assert(rssU <= rssR + 1, "adding a regressor can only reduce RSS")
    assert(r.getAs[Boolean]("b_granger_causes_a_05") === (f > 3960))
  }

  test("tsEngleGranger picks the two largest streams and replays exactly") {
    val r = operators.TimeWindows.tsEngleGranger(spark, sfDir).collect()(0)
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("x"))
      .collect().map(row => (row.getString(0), row.getTimestamp(1).getTime,
        row.getLong(2)))
    val totals = daily.groupBy(_._1).view
      .mapValues(_.map(e => BigInt(e._3)).sum).toMap
    val sorted = totals.toSeq.sortBy { case (t, v) => (-v, t) }
    val (typeA, typeB) = (sorted(0)._1, sorted(1)._1)
    assert(r.getString(0) === typeA && r.getString(1) === typeB)
    val byDay = daily.groupBy(_._2)
    val pair = byDay.collect { case (d, es)
      if es.exists(_._1 == typeA) && es.exists(_._1 == typeB) =>
        (d, BigInt(es.find(_._1 == typeA).get._3),
          BigInt(es.find(_._1 == typeB).get._3))
    }.toSeq.sortBy(_._1)
    val n = BigInt(pair.length)
    val sy = pair.map(_._2).sum; val sz = pair.map(_._3).sum
    val szy = pair.map(p => p._3 * p._2).sum
    val szz = pair.map(p => p._3 * p._3).sum
    val slope = ((n * szy - sz * sy) * 1000000) / (n * szz - sz * sz)
    assert(r.getAs[Long]("slope_micro") === slope.toLong)
    val c = (1000000 * sy - slope * sz) / n
    val eem = pair.map { case (_, ya, yb) =>
      (1000000 * ya - slope * yb - c) / 1000 }
    val ps = eem.zip(eem.drop(1)).map { case (a, b) => (a, b - a) }
    val n2 = BigInt(ps.length)
    val sz2 = ps.map(_._1).sum; val sy2 = ps.map(_._2).sum
    val szy2 = ps.map(p => p._1 * p._2).sum
    val szz2 = ps.map(p => p._1 * p._1).sum
    val syy2 = ps.map(p => p._2 * p._2).sum
    val sxx = n2 * szz2 - sz2 * sz2; val sxy = n2 * szy2 - sz2 * sy2
    val syy = n2 * syy2 - sy2 * sy2
    val aSlope = (sxy * 1000000) / sxx
    val r2 = (aSlope * sxy) / syy
    val t2 = ((n2 - 2) * r2 * 1000) / (1000000 - r2)
    assert(r.getAs[Long]("adf_slope_micro") === aSlope.toLong)
    assert(r.getAs[Long]("adf_t2_milli") === t2.toLong)
    assert(r.getAs[Boolean]("cointegrated_05") ===
      (aSlope < 0 && t2 > 11156))
  }

  test("tsPageHinkley matches a driver sequential fold") {
    val rows = operators.TimeWindows.tsPageHinkley(spark, sfDir).collect()
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("x"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime,
        r.getLong(2))).groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getString(0)
      val xs = daily(et).sortBy(_._2).map(_._3)
      var c = 0L; var ph = 0L; var phMin = Long.MaxValue
      var gapMax = Long.MinValue; var mean = 0L
      xs.zipWithIndex.foreach { case (x, i) =>
        c += x; mean = c / (i + 1)
        ph += x - mean
        phMin = math.min(phMin, ph)
        gapMax = math.max(gapMax, ph - phMin)
      }
      assert(r.getAs[Long]("n_days") === xs.length.toLong)
      assert(r.getAs[Long]("ph_max") === gapMax, s"ph for $et")
      assert(r.getAs[Long]("mean_daily") === mean, s"mean for $et")
      assert(r.getAs[Boolean]("drift_flag") === (gapMax > mean))
    }
  }

  test("tsFulfillment percentiles are exact order statistics per month") {
    val rows = operators.TimeWindows.tsFulfillment(spark, sfDir).collect()
    val lat = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .select(date_trunc("month", col("o_orderdate")).as("m"),
        col("l_orderkey"), col("l_linenumber").cast("long"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long"))
      .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1),
        r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getTimestamp(0).getTime
      val ds = lat(m).sortBy(e => (e._4, e._2, e._3)).map(_._4)
      val n = ds.length
      assert(r.getAs[Long]("n") === n.toLong)
      assert(r.getAs[Long]("mean_days_milli") === ds.sum * 1000 / n)
      assert(r.getAs[Long]("p50_days") === ds((n + 1) / 2 - 1))
      assert(r.getAs[Long]("p90_days") === ds((9 * n + 9) / 10 - 1))
    }
  }

  test("tsBacklog conserves placed/shipped mass and matches a driver fold") {
    val rows = operators.TimeWindows.tsBacklog(spark, sfDir).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2)))
    val placedDays = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .select(date_trunc("day", col("o_orderdate")).as("d")).collect()
      .map(_.getTimestamp(0).getTime)
    val shippedDays = Tables.lineitem(spark, sfDir)
      .select(date_trunc("day", col("l_shipdate")).as("d")).collect()
      .map(_.getTimestamp(0).getTime)
    val net = (placedDays.map((_, 1L)) ++ shippedDays.map((_, -1L)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(rows.map(_._1).toSeq === net.keys.toSeq.sorted)
    var run = 0L
    rows.foreach { case (day, n, backlog) =>
      assert(n === net(day), s"net at $day")
      run += n
      assert(backlog === run, s"backlog at $day")
    }
    assert(run === 0L, "every placed item eventually ships in the fixture")
  }

  test("winObv matches a driver close/volume fold") {
    val rows = operators.TimeWindows.winObv(spark, sfDir).collect()
    val evs = Tables.events(spark, sfDir)
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
        col("ts").cast("long"), col("event_id"),
        floor(col("value") * 1e6).cast("long"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime,
        r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getString(0)
      val daily = evs(et).groupBy(_._2).toSeq.sortBy(_._1).map {
        case (day, ds) =>
          (day, ds.maxBy(e => (e._3, e._4))._5, ds.length.toLong)
      }
      var obv = 0L; var mx = Long.MinValue; var mn = Long.MaxValue
      daily.zipWithIndex.foreach { case ((_, c, vol), i) =>
        if (i > 0) obv += java.lang.Long.signum(c - daily(i - 1)._2) * vol
        mx = math.max(mx, obv); mn = math.min(mn, obv)
      }
      assert(r.getAs[Long]("n_days") === daily.length.toLong)
      assert(r.getAs[Long]("obv_max") === mx, s"max for $et")
      assert(r.getAs[Long]("obv_min") === mn, s"min for $et")
      assert(r.getAs[Long]("obv_final") === obv, s"final for $et")
    }
  }

  test("tsSeasonalIndex conserves mass and indexes average to ~1e6") {
    val rows = operators.TimeWindows.tsSeasonalIndex(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val orders = Tables.orders(spark, sfDir)
      .select(month(col("o_orderdate")),
        round(col("o_totalprice") * 100, 0).cast("long"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val byMonth = orders.groupBy(_._1).view
      .mapValues(es => (es.length.toLong, es.map(e => BigInt(e._2)).sum))
      .toMap
    val tot = byMonth.values.map(_._2).sum
    val nm = byMonth.size
    assert(rows.map(_._1).toSeq === byMonth.keys.toSeq.sorted)
    rows.foreach { case (m, n, rev, idx) =>
      assert((n, BigInt(rev)) === byMonth(m), s"month $m")
      assert(idx === (BigInt(rev) * nm * 1000000 / tot).toLong, s"idx $m")
    }
    // indices average to 1e6 up to per-month truncation
    val mean = rows.map(_._4).sum / nm
    assert(mean <= 1000000L && mean > 1000000L - nm, s"index mean $mean")
  }

  test("winStochastic matches a driver rolling-range replay") {
    val got = operators.TimeWindows.winStochastic(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getTimestamp(1).getTime),
        (r.getAs[Long]("k_ppm"), r.getAs[Boolean]("overbought"),
          r.getAs[Boolean]("oversold")))).toMap
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("x"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime,
        r.getLong(2))).groupBy(_._1)
    var checked = 0
    daily.foreach { case (et, es) =>
      val series = es.sortBy(_._2)
      series.zipWithIndex.filter(_._2 >= 13).foreach { case ((_, day, x), i) =>
        val win = series.slice(i - 13, i + 1).map(_._3)
        val (l, h) = (win.min, win.max)
        if (h > l) {
          val k = (x - l) * 1000000 / (h - l)
          assert(got((et, day)) === ((k, k > 800000, k < 200000)),
            s"$et $day")
          assert(k >= 0 && k <= 1000000)
          checked += 1
        }
      }
    }
    assert(checked === got.size && checked > 0)
  }

  test("winRsi matches a driver gain/loss replay and stays in [0, 100k]") {
    val got = operators.TimeWindows.winRsi(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getTimestamp(1).getTime),
        (r.getAs[Long]("rsi_milli"), r.getAs[Boolean]("overbought"),
          r.getAs[Boolean]("oversold")))).toMap
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("x"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime,
        r.getLong(2))).groupBy(_._1)
    assert(got.nonEmpty)
    var checked = 0
    daily.foreach { case (et, es) =>
      val series = es.sortBy(_._2)
      val deltas = series.zip(series.drop(1))
        .map { case (a, b) => (b._2, b._3 - a._3) }
      deltas.zipWithIndex.filter(_._2 >= 13).foreach { case ((day, _), i) =>
        val win = deltas.slice(i - 13, i + 1).map(_._2)
        val g = win.filter(_ > 0).sum
        val l = -win.filter(_ < 0).sum
        if (g + l > 0) {
          val rsi = g * 100000 / (g + l)
          assert(got((et, day)) === ((rsi, rsi > 70000, rsi < 30000)),
            s"$et $day")
          assert(rsi >= 0 && rsi <= 100000)
          checked += 1
        }
      }
    }
    assert(checked === got.size)
  }

  test("tsPacf matches a BigInt autocovariance-ratio replay") {
    val rows = operators.TimeWindows.tsPacf(spark, sfDir).collect()
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("x"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime,
        r.getLong(2))).groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getString(0)
      val xs = daily(et).sortBy(_._2).map(_._3)
      val n = BigInt(xs.length); val sx = xs.map(BigInt(_)).sum
      val ct = xs.map(x => n * x - sx)
      val g0 = ct.map(c => c * c).sum
      def gk(k: Int) = ct.drop(k).zip(ct).map { case (a, b) => a * b }.sum
      val rho1 = (gk(1) * 1000000) / g0
      val rho2 = (gk(2) * 1000000) / g0
      assert(r.getAs[Long]("rho1_ppm") === rho1.toLong, s"rho1 $et")
      assert(r.getAs[Long]("rho2_ppm") === rho2.toLong, s"rho2 $et")
      val den = BigInt("1000000000000") - rho1 * rho1
      if (den > 0) {
        val pacf2 = ((rho2 * 1000000 - rho1 * rho1) * 1000000) / den
        assert(r.getAs[Long]("pacf2_ppm") === pacf2.toLong, s"pacf2 $et")
      }
      assert(rho1.abs <= 1000000 && rho2.abs <= 1000000)
    }
  }

  test("evalForecastErr matches a driver lag-1 baseline replay") {
    val rows = operators.TimeWindows.evalForecastErr(spark, sfDir).collect()
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("x"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime,
        r.getLong(2))).groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getString(0)
      val xs = daily(et).sortBy(_._2).map(_._3)
      val pairs = xs.zip(xs.drop(1)).filter(_._1 > 0)
      val n = pairs.length.toLong
      val mae = pairs.map { case (p, x) => BigInt((x - p).abs) }.sum / n
      val mse = pairs.map { case (p, x) =>
        val em = BigInt((x - p).abs / 1000); em * em }.sum / n
      val mape = pairs.map { case (p, x) =>
        BigInt((x - p).abs) * 1000000 / p }.sum / n
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Long]("mae_micro") === mae.toLong, s"mae $et")
      assert(r.getAs[Long]("mse_milli2") === mse.toLong, s"mse $et")
      assert(r.getAs[Long]("mape_ppm") === mape.toLong, s"mape $et")
    }
  }

  test("tsAtr matches a driver OHLC/true-range replay on full windows") {
    val rows = operators.TimeWindows.tsAtr(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getTimestamp(1).getTime),
        (r.getAs[Long]("tr_micro"), r.getAs[Long]("atr_micro")))).toMap
    val evs = Tables.events(spark, sfDir)
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
        col("ts").cast("long").as("t"), col("event_id"),
        floor(col("value") * 1e6).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime,
        r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    evs.groupBy(_._1).foreach { case (et, es) =>
      val daily = es.groupBy(_._2).toSeq.sortBy(_._1).map { case (day, ds) =>
        val close = ds.maxBy(e => (e._3, e._4))._5
        (day, ds.map(_._5).max, ds.map(_._5).min, close)
      }
      val trs = daily.zipWithIndex.map { case ((day, h, l, c), i) =>
        val tr = if (i == 0) h - l else {
          val cp = daily(i - 1)._4
          math.max(h - l, math.max((h - cp).abs, (l - cp).abs))
        }
        (day, tr)
      }
      trs.zipWithIndex.filter(_._2 >= 13).foreach { case ((day, tr), i) =>
        val atr = trs.slice(i - 13, i + 1).map(_._2).sum / 14
        assert(rows((et, day)) === ((tr, atr)), s"$et $day")
      }
      assert(trs.count(_._2 >= 0) === trs.length)
    }
  }

  test("winBollinger breakout counts match a driver sqrt replay") {
    val rows = operators.TimeWindows.winBollinger(spark, sfDir).collect()
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("x"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime,
        r.getLong(2) / 1000))
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getString(0)
      val xs = daily(et).sortBy(_._2).map(_._3)
      var nUp = 0L; var nDn = 0L; var nW = 0L; var maxZ2 = Long.MinValue
      xs.sliding(14).foreach { win =>
        if (win.length == 14) {
          val x = BigInt(win.last)
          val s = win.map(BigInt(_)).sum
          val q = win.map(v => BigInt(v) * v).sum
          val dev = 14 * x - s; val varn = 14 * q - s * s
          if (varn > 0) {
            nW += 1
            if (dev > 0 && dev * dev > 4 * varn) nUp += 1
            if (dev < 0 && dev * dev > 4 * varn) nDn += 1
            maxZ2 = math.max(maxZ2, ((dev * dev * 1000) / varn).toLong)
          }
        }
      }
      assert(r.getAs[Long]("n_windows") === nW, s"windows for $et")
      assert(r.getAs[Long]("n_upper") === nUp, s"upper for $et")
      assert(r.getAs[Long]("n_lower") === nDn, s"lower for $et")
      assert(r.getAs[Long]("max_z2_milli") === maxZ2, s"maxz2 for $et")
    }
  }

  test("tsHurst matches a BigInt scaled-R/S replay and sits in a sane band") {
    val rows = operators.TimeWindows.tsHurst(spark, sfDir).collect()
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("x"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
      .groupBy(_._1)
    def lnN(x: BigInt): Long =
      math.floor(math.log(x.toDouble) * 1e9).toLong
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getString(0)
      val xs = daily(et).sortBy(_._2.getTime).map(_._3)
      var nChunks = 0L
      val pts = Seq(8, 16, 32).flatMap { w =>
        val lns = xs.grouped(w).filter(_.length == w).toSeq.flatMap { c =>
          val s = c.map(BigInt(_)).sum
          val q = c.map(v => BigInt(v) * v).sum
          val devs = c.scanLeft(BigInt(0))(_ + _).drop(1).zipWithIndex
            .map { case (pref, i) => BigInt(w) * pref - BigInt(i + 1) * s }
          val r2w = devs.max - devs.min
          val s2 = BigInt(w) * q - s * s
          if (r2w > 0 && s2 > 0)
            Some(lnN((r2w * r2w * 1000000) / s2) - lnN(1000000))
          else None
        }
        if (lns.isEmpty) None else {
          nChunks += lns.length
          Some((lnN(w), lns.map(BigInt(_)).sum / lns.length))
        }
      }
      val np = BigInt(pts.length)
      val sx = pts.map(p => BigInt(p._1)).sum
      val sy = pts.map(_._2).sum
      val sxy = pts.map(p => BigInt(p._1) * p._2).sum
      val sxx = pts.map(p => BigInt(p._1) * p._1).sum
      val hurst = ((np * sxy - sx * sy) * 1000000) / (2 * (np * sxx - sx * sx))
      assert(r.getAs[Long]("n_chunks") === nChunks, s"chunks for $et")
      assert(r.getAs[Long]("hurst_micro") === hurst.toLong, s"hurst for $et")
      assert(hurst > -500000 && hurst < 1500000, s"hurst band for $et")
    }
  }

  test("tsSax matches a driver replay of PAA segments and ntile symbols") {
    val rows = operators.TimeWindows.tsSax(spark, sfDir).collect()
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("x"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getString(0)
      val series = daily(et).sortBy(_._2.getTime)
      val d0 = series.head._2.getTime
      val segs = series.groupBy(e =>
          ((e._2.getTime - d0) / 86400000L) / 7).toSeq
        .map { case (seg, es) =>
          (seg, (es.map(e => BigInt(e._3)).sum * 1000) / es.length)
        }
      val n = segs.length
      // ntile(4): first (n mod 4) buckets get ceil(n/4) rows
      val sorted = segs.sortBy { case (seg, paa) => (paa, seg) }
      val base = n / 4; val extra = n % 4
      val bucketOf = (0 until 4).flatMap(b =>
        Seq.fill(base + (if (b < extra) 1 else 0))(b))
      val sym = sorted.zipWithIndex.map { case ((seg, _), idx) =>
        seg -> ('a' + bucketOf(idx)).toChar
      }.toMap
      val sax = segs.map(_._1).sorted.map(sym).mkString
      assert(r.getAs[Long]("n_segments") === n.toLong, s"segments for $et")
      assert(r.getAs[String]("sax") === sax, s"sax for $et")
    }
  }

  test("cramersV: v2 is the chi2 quotient, bounded, dof agrees with chisq") {
    val r = operators.StatsOps.cramersV(spark, sfDir).collect()(0)
    val chis = operators.StatsOps.statsChisq(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("dof") === chis.getAs[Long]("dof"))
    val v2 = r.getAs[Long]("v2_nano")
    assert(v2 === r.getAs[Long]("chi2_nano") /
      (r.getAs[Long]("n") * r.getAs[Long]("mindim")))
    assert(v2 >= 0L && v2 <= 1000000000L, s"V^2 out of [0,1]: $v2")
    // same per-cell floor discipline => nano sum agrees with chisq's 6dp value
    assert(math.abs(r.getAs[Long]("chi2_nano") / 1e9 -
      chis.getAs[Double]("chi2")) < 1e-3)
  }
}
