package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck-generator properties (SURVEY.md §5.2.3) — algebraic laws the
  * operators must satisfy regardless of data. Samples are drawn with fixed
  * seeds (no scalatestplus bridge in the offline cache), so failures are
  * reproducible.
  */
class PropertySpec extends AnyFunSuite with SparkFixture {

  private def samples[A](g: Gen[A], n: Int = 100): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 1.0
    else a.intersect(b).size.toDouble / a.union(b).size

  test("jaccard is symmetric, bounded, and 1 on self") {
    val pairs = samples(Gen.zip(Gen.listOf(Gen.alphaStr), Gen.listOf(Gen.alphaStr)))
    pairs.foreach { case (xs, ys) =>
      val (a, b) = (xs.toSet, ys.toSet)
      assert(jaccard(a, b) === jaccard(b, a))
      assert(jaccard(a, b) >= 0.0 && jaccard(a, b) <= 1.0)
      assert(jaccard(a, a) === 1.0)
    }
  }

  test("15-minute binning lands at or before the timestamp, within 900s") {
    samples(Gen.choose(0L, 4102444800L)).foreach { epoch =>
      val bin = math.floorDiv(epoch, 900L) * 900L
      assert(bin <= epoch && epoch - bin < 900)
      assert(bin % 900 === 0L)
    }
  }

  test("cosine(v, v) ≈ 1 for non-zero vectors") {
    val vec = Gen.listOfN(16, Gen.choose(-10.0, 10.0)).suchThat(_.exists(math.abs(_) > 1e-3))
    samples(vec, 50).foreach { v =>
      val dot = v.zip(v).map { case (a, b) => a * b }.sum
      val norm = math.sqrt(dot)
      assert(math.abs(dot / (norm * norm) - 1.0) < 1e-9)
    }
  }

  test("rolling hash kernel is injective-ish on distinct short strings") {
    val strs = samples(Gen.alphaStr.suchThat(_.nonEmpty), 200).distinct
    val hashes = strs.map(s => graft.functions.RollingHashExpr.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    assert(hashes.distinct.size === strs.size)
  }

  test("splitmix-derived LSH planes have fixed shape and range") {
    val p = operators.SimilarityOps.planes
    assert(p.length === 32 && p.forall(_.length === 64))
    assert(p.flatten.forall(x => x >= -0.5 && x < 0.5))
    // not degenerate: planes differ from each other
    assert(p.distinct.length === p.length)
  }

  test("dedup is idempotent on a DataFrame") {
    import spark.implicits._
    val df = Seq(1, 2, 2, 3, 3, 3).toDF("x")
    val once = df.dropDuplicates("x")
    val twice = once.dropDuplicates("x")
    assert(once.collect().map(_.getInt(0)).sorted.toSeq === twice.collect().map(_.getInt(0)).sorted.toSeq)
    assert(once.count() === 3)
  }

  test("union-all count additivity + semi-join containment on fixtures") {
    val o = Tables.orders(spark, sfDir)
    val f = o.filter(col("o_orderstatus") === "F")
    val u = o.filter(col("o_orderpriority") === "1-URGENT")
    assert(f.unionByName(u).count() === f.count() + u.count())

    val c = Tables.customer(spark, sfDir)
    val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi").count()
    val innerDistinct = c.join(o, col("c_custkey") === col("o_custkey"))
      .select("c_custkey").distinct().count()
    assert(semi === innerDistinct)
  }

  test("window running sum final value equals group sum") {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, sfDir)
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val running = o.withColumn("rt", sum(col("o_totalprice").cast("decimal(18,4)")).over(w))
      .groupBy("o_custkey").agg(max("rt").as("final_rt"))
    val grouped = o.groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,4)")).as("total"))
    val joined = running.join(grouped, "o_custkey")
      .filter(col("final_rt") =!= col("total"))
    assert(joined.count() === 0)
  }

  test("minhash signature similarity tracks jaccard on crafted near-dups") {
    import spark.implicits._
    // two near-identical docs + one unrelated: the near pair must collide
    // in at least one band, the unrelated one must not reach 0.5 jaccard
    val docs = Seq(
      (1L, ("alpha beta gamma delta epsilon zeta eta theta " * 6).trim, "en", "s0", 0L),
      (2L, ("alpha beta gamma delta epsilon zeta eta theta " * 6).trim + " iota", "en", "s0", 0L),
      (3L, "completely different words entirely unrelated content here now", "en", "s0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_mh").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = operators.DedupOps.dedupNearMinhash(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("LSH hot bucket is capped: mass-duplicate docs yield bounded pairs") {
    import spark.implicits._
    // 600 byte-identical docs all land in ONE bucket of every band — the
    // boilerplate-duplication worst case. Uncapped this is C(600,2) pairs
    // in a single aggregation row; the row_number cap must bound it to
    // C(MaxBucket,2) and the overflow monitor must account for the rest.
    val n = 600
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val docs = (1 to n).map(i => (i.toLong, text, "en", "s0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_hot").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val k = operators.DedupOps.MaxBucket.toLong
    // identical docs → every surviving candidate pair confirms at jaccard 1
    assert(operators.DedupOps.dedupNearMinhash(spark, tmp).count() === k * (k - 1) / 2)
    val overflow = operators.DedupOps.bucketOverflow(spark, tmp).collect()
    assert(overflow.length === 16) // one oversized bucket per band
    assert(overflow.forall(_.getAs[Long]("dropped") === n - k))
  }
}
