package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-18 pins for this round's hardening changes:
  *
  *  1. the fixed-size anchor draws (embedHubness 64 global, TwoNN 128
  *     per label) — exact driver replays of the md5 hash-order draw,
  *     plus a synthetic >128 block proving the TwoNN cap ENGAGES;
  *  2. the zero-variance NULL contracts added to Welch ANOVA,
  *     Jonckheere-Terpstra and the length-lognormality screen
  *     (constant-data fixtures must yield NULL readouts, never the
  *     non-ANSI NaN→0 cast the r17 ADVICE flagged);
  *  3. the splitUniformity/AD empty-corpus zero-row contract.
  */
class Round18Spec extends AnyFunSuite with SparkFixture {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def tmpFixture(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  // ---- 1. fixed-size anchor draws ------------------------------------

  test("embedHubness matches an exact 64-anchor driver replay at sf0.001") {
    val vecs = Tables.embeddings(spark, sfDir).collect()
      .map { r =>
        (r.getLong(0),
          r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6).toLong))
      }
    assert(vecs.length > 64, "draw must be a strict subset at sf0.001")
    val anchors = vecs.map(_._1)
      .sortBy(id => (md5hex(s"hub:$id"), id)).take(64)
    val hits = scala.collection.mutable.Map.empty[Long, Long]
    anchors.foreach { aid =>
      val aq = vecs.find(_._1 == aid).get._2
      vecs.filter(_._1 != aid)
        .map { case (id, q) =>
          (q.zip(aq).map { case (a, b) => (a - b) * (a - b) }.sum, id)
        }
        .sorted.take(5)
        .foreach { case (_, id) => hits(id) = hits.getOrElse(id, 0L) + 1L }
    }
    val expect = hits.toSeq.sortBy { case (id, n) => (-n, id) }.take(15)
    val got = operators.ClusterOps.embedHubness(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expect)
  }

  test("TwoNN anchors every point when a label block is under the cap") {
    // sf0.001 blocks are all < 128, so n_pts must equal the full block
    // minus the d1=0 duplicate exclusions — i.e. the r17 unanchored
    // semantics exactly (the PassAtKSpec replay pins the values; here
    // we pin the CARDINALITY so a draw bug can't hide in the sum)
    val blocks = Tables.embeddings(spark, sfDir)
      .groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(blocks.values.forall(_ < 128))
    val got = operators.SeriesOps.embedIntrinsicDim(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // the fixture has no exact-duplicate vectors, so no exclusions
    assert(got === blocks.map { case (k, v) => k -> v })
  }

  test("TwoNN 128-anchor cap engages on a >128 label block (synthetic)") {
    import spark.implicits._
    // 150 distinct points in label 0, 20 in label 1 — distinct 4-dim
    // integer lattice vectors so no d1=0 exclusions fire
    val vecs = ((0 until 150).map { i =>
      (i.toLong, Array.tabulate(4)(d => ((i * (d + 2) + d) % 193).toFloat), 0)
    } ++ (0 until 20).map { i =>
      (1000L + i, Array.tabulate(4)(d => ((i * (d + 3) + 7 * d) % 53).toFloat), 1)
    }).toDF("vec_id", "embedding", "label")
    val tmp = tmpFixture("graft_twonn_cap")
    vecs.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val rows = operators.SeriesOps.embedIntrinsicDim(spark, tmp).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val byLabel = rows.map(t => t._1 -> t).toMap
    assert(byLabel(0)._2 === 128L, "big block must anchor exactly 128 points")
    assert(byLabel(1)._2 === 20L, "small block anchors every point")
    // exact replay of the capped estimator for the big block
    val pts = (0 until 150).map { i =>
      (i.toLong,
        Array.tabulate(4)(d => math.floor(
          ((i * (d + 2) + d) % 193).toFloat.toDouble * 1e6).toLong))
    }
    val anchorIds = pts.map(_._1)
      .sortBy(id => (md5hex(s"twonn:$id"), id)).take(128).toSet
    val terms = pts.filter(p => anchorIds(p._1)).map { case (id, u) =>
      val ds = pts.filter(_._1 != id).map { case (oid, v) =>
        (u.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum, oid)
      }.sorted
      assert(ds.head._1 > 0L, "fixture must have no duplicate points")
      math.floor(math.log(ds(1)._1.toDouble) * 1e9).toLong -
        math.floor(math.log(ds.head._1.toDouble) * 1e9).toLong
    }
    assert(byLabel(0)._3 === terms.sum)
    assert(byLabel(0)._4 === 128L * 2000000000000L / terms.sum)
  }

  // ---- 2. zero-variance NULL contracts --------------------------------

  test("Welch ANOVA yields NULL readouts on zero-variance groups") {
    import spark.implicits._
    val ts = new java.sql.Timestamp(1700000000000L)
    // constant quantity inside every flag group -> every s²_j = 0
    val li = Seq(
      (1L, 5.0, "A", ts), (2L, 5.0, "A", ts),
      (3L, 7.0, "N", ts), (4L, 7.0, "N", ts),
      (5L, 9.0, "R", ts), (6L, 9.0, "R", ts))
      .toDF("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
    val tmp = tmpFixture("graft_welch_zv")
    li.write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val r = operators.NonparamOps.welchAnova(spark, tmp).collect()
    assert(r.length === 1)
    assert(r(0).isNullAt(r(0).fieldIndex("f_milli")))
    assert(r(0).isNullAt(r(0).fieldIndex("df2_milli")))
    assert(r(0).isNullAt(r(0).fieldIndex("variance_unequal_means_differ_05")))
  }

  test("Jonckheere yields a NULL z on all-tied data") {
    import spark.implicits._
    val ts = new java.sql.Timestamp(1700000000000L)
    val orders = Seq((1L, "1-URGENT", ts), (2L, "2-HIGH", ts))
      .toDF("o_orderkey", "o_orderpriority", "o_orderdate")
    // every quantity identical -> tie-corrected null variance is 0
    val li = Seq((1L, 5.0), (1L, 5.0), (2L, 5.0), (2L, 5.0))
      .toDF("l_orderkey", "l_quantity")
    val tmp = tmpFixture("graft_jt_zv")
    orders.write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    li.write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val r = operators.NonparamOps.jonckheere(spark, tmp).collect()
    assert(r.length === 1)
    assert(r(0).isNullAt(r(0).fieldIndex("z_milli")))
    assert(r(0).isNullAt(r(0).fieldIndex("trend_significant_05")))
  }

  test("lognormality screen yields NULL moments on constant-length sources") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaa", "en", "const", 300L), (2L, "bbb", "en", "const", 300L),
      (3L, "ccc", "en", "varied", 100L), (4L, "dddd", "en", "varied", 900L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = tmpFixture("graft_lognorm_zv")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = operators.CorpusOps.textLengthLognormality(spark, tmp)
      .collect().map(r => r.getString(0) -> r).toMap
    val c = rows("const")
    assert(c.isNullAt(c.fieldIndex("skew_micro")))
    assert(c.isNullAt(c.fieldIndex("kurt_micro")))
    assert(c.isNullAt(c.fieldIndex("jb_milli")))
    assert(c.isNullAt(c.fieldIndex("lognormal_rejected_05")))
    assert(!c.isNullAt(c.fieldIndex("mean_ln_micro")),
      "the mean stays defined on constant data")
    val v = rows("varied")
    assert(!v.isNullAt(v.fieldIndex("jb_milli")),
      "non-degenerate sources keep their readouts")
  }

  // ---- 3. empty-corpus zero-row contracts ------------------------------

  test("splitUniformity and AD audit emit zero rows on an empty corpus") {
    import spark.implicits._
    val docs = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = tmpFixture("graft_split_empty")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    assert(operators.PipelineOps.splitUniformity(spark, tmp).count() === 0L)
    assert(operators.PipelineOps.splitUniformityAd(spark, tmp).count() === 0L)
  }
}
