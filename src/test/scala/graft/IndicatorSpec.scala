package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the IndicatorOps family (#394–#397): channel
  * containment, bars-since bounds, Aroon complementarity at extremes,
  * and a brute-force CCI mean-deviation replay on one partition.
  */
class IndicatorSpec extends AnyFunSuite with SparkFixture {

  test("VWAP: cumulative quantity is non-decreasing per flag") {
    val rows = operators.IndicatorOps.winVwap(spark, sfDir).collect()
    rows.groupBy(_.getString(0)).values.foreach { fr =>
      val qs = fr.sortBy(_.getString(1)).map(_.getLong(2))
      qs.zip(qs.tail).foreach { case (a, b) => assert(a <= b) }
    }
    assert(rows.forall(_.getLong(3) > 0L), "VWAP must be positive")
  }

  test("Donchian: value sits inside the channel; pos in [0, 1e6]") {
    operators.IndicatorOps.winDonchian(spark, sfDir).collect().foreach { r =>
      val (v, hi, lo) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(lo <= v && v <= hi, "value escapes its own channel")
      assert(r.getLong(5) === hi - lo)
      if (!r.isNullAt(6)) {
        val p = r.getLong(6)
        assert(p >= 0L && p <= 1000000L)
      } else assert(hi === lo, "NULL pos only for flat windows")
    }
  }

  test("Aroon: bars-since in [0,8]; a fresh high pins aroon_up at 1e6") {
    operators.IndicatorOps.winAroon(spark, sfDir).collect().foreach { r =>
      val (dsHi, dsLo) = (r.getLong(3), r.getLong(4))
      assert(dsHi >= 0L && dsHi <= 8L)
      assert(dsLo >= 0L && dsLo <= 8L)
      assert(r.getLong(5) === (8L - dsHi) * 125000L)
      assert(r.getLong(6) === (8L - dsLo) * 125000L)
      if (dsHi == 0L) assert(r.getLong(5) === 1000000L)
    }
  }

  test("CCI: mean deviation replays brute-force for one priority") {
    val rows = operators.IndicatorOps.winCci(spark, sfDir).collect()
      .filter(_.getString(0) == "1-URGENT").sortBy(_.getString(1))
    assert(rows.nonEmpty)
    val vs = rows.map(_.getLong(2))
    rows.zipWithIndex.foreach { case (r, i) =>
      val frame = vs.slice(math.max(0, i - 7), i + 1)
      val (s, m) = (frame.sum, frame.length.toLong)
      val mdNum = frame.map(x => math.abs(x * m - s)).sum
      assert(r.getLong(3) === s * 1000L / m, "sma_milli replay")
      assert(r.getLong(4) === mdNum / m, "md_raw replay")
      if (mdNum > 0) {
        val expect = ((BigInt(vs(i)) * m - s) * m * 1000000L) / (15L * mdNum)
        assert(r.getLong(5) === expect.toLong, "cci_milli replay")
      } else assert(r.isNullAt(5))
    }
  }
}
