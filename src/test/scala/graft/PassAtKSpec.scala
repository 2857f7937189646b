package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for #398 pass@k and #399 TwoNN intrinsic dimension:
  * estimator boundaries, k-monotonicity, and exact brute-force driver
  * replays at the sf0.001 fixture.
  */
class PassAtKSpec extends AnyFunSuite with SparkFixture {

  test("pass@k: monotone in k, exact at the c=0 and n-c<k boundaries") {
    val rows = operators.TextEvalOps.evalPassAtK(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, c) = (r.getLong(1), r.getLong(2))
      val ps = Seq(r.getLong(3), r.getLong(4), r.getLong(5))
      ps.zip(ps.tail).foreach { case (a, b) =>
        assert(a <= b, "pass@k must be non-decreasing in k")
      }
      ps.foreach(p => assert(p >= 0L && p <= 1000000L))
      if (c == 0L) assert(ps.forall(_ == 0L), "no successes => pass@k = 0")
      // exact replay via BigInt falling factorials
      Seq(1, 5, 10).zip(ps).foreach { case (k, got) =>
        val num = (0 until k).map(i => BigInt((n - c - i).max(0L))).product
        val den = (0 until k).map(i => BigInt(n - i)).product
        assert(BigInt(got) === BigInt(1000000) - (num * 1000000) / den,
          s"pass@$k replay for user ${r.getLong(0)}")
      }
      if (n - c < 10L) assert(r.getLong(5) === 1000000L,
        "n-c < k forces a success in every k-sample")
    }
  }

  test("TwoNN intrinsic dim: brute-force replay per label at sf0.001") {
    val rows = operators.SeriesOps.embedIntrinsicDim(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val vecs = Tables.embeddings(spark, sfDir)
      .collect()
      .map { r =>
        val e = r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6).toLong)
        (r.getLong(0), r.getInt(2), e)
      }
    // the r18 anchor rule: per label, estimator terms come from the
    // 128 points first in md5("twonn:"||id) order (a no-op at sf0.001
    // where blocks are < 128 — asserted so the replay stays exact)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    rows.foreach { row =>
      val label = row.getInt(0)
      val pts = vecs.filter(_._2 == label)
      val anchors = pts.map(_._1)
        .sortBy(id => (md5hex(s"twonn:$id"), id)).take(128).toSet
      assert(anchors.size == pts.length,
        "sf0.001 blocks must be under the 128-anchor cap")
      val terms = pts.filter(p => anchors(p._1)).flatMap { case (id, _, u) =>
        val ds = pts.filter(_._1 != id).map { case (oid, _, v) =>
          (u.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum, oid)
        }.sorted
        val (d1, d2) = (ds(0)._1, ds(1)._1)
        if (d1 > 0L)
          Some(math.floor(math.log(d2.toDouble) * 1e9).toLong -
            math.floor(math.log(d1.toDouble) * 1e9).toLong)
        else None
      }
      assert(row.getLong(1) === terms.length.toLong, s"n_pts label $label")
      assert(row.getLong(2) === terms.sum, s"sum_nano label $label")
      assert(row.getLong(3) === terms.length.toLong * 2000000000000L / terms.sum,
        s"id_milli label $label")
      assert(row.getLong(3) > 0L)
    }
  }
}
