package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the round-3 pipeline-governance operators — the
  * properties the DuckDB oracle can't see (plan shape, invariants that
  * must hold for ANY corpus, not just hash equality on the fixture).
  */
class PipelineSpec extends AnyFunSuite with SparkFixture {
  import operators.PipelineOps

  test("contamination: benchmark docs are excluded and rates are in [0,1]") {
    val df = PipelineOps.contamination(spark, sfDir).collect()
    assert(df.nonEmpty)
    assert(df.forall(r => r.getLong(0) % 29 != 0), "benchmark doc leaked into the report")
    assert(df.forall { r =>
      val c = r.getDouble(3); c >= 0.0 && c <= 1.0 && r.getLong(2) <= r.getLong(1)
    })
  }

  test("contamination plan broadcasts the benchmark gram set") {
    val plan = PipelineOps.contamination(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("split assignment is exhaustive, deterministic, and ~80/10/10") {
    val df = PipelineOps.splitAssign(spark, sfDir)
    val counts = df.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    assert(counts.keySet === Set("train", "val", "test"))
    assert(total === Tables.documents(spark, sfDir).count())
    // md5 is uniform: train ≈ 204/256 ≈ 79.7%; the sf0.001 fixture has
    // 500 docs (binomial spread ~±5%), so 0.6 is a comfortable bound
    assert(counts("train").toDouble / total > 0.6)
    // stable across runs (content-addressed, not rand())
    val a = df.collect().toSeq
    val b = PipelineOps.splitAssign(spark, sfDir).collect().toSeq
    assert(a === b)
  }

  test("repetition: a templated doc scores higher than unique text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "the cat sat on the mat and then the dog sat on the mat", 55),
      (2L, "en", "one two three four five six seven eight nine ten eleven twelve", 62))
      .toDF("doc_id", "lang", "text", "n_chars")
    docs.write.mode("overwrite").parquet("/tmp/graft_test_rep/documents.parquet")
    val out = PipelineOps.textRepetition(spark, "/tmp/graft_test_rep").collect()
    val byId = out.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(byId(1L) > byId(2L), s"templated doc should out-score unique text: $byId")
    assert(byId(2L) === 0.0)
  }

  test("pack sequences: bins partition each language's docs and conserve tokens") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("lang"), size(split(col("text"), " ")).as("n"))
      .groupBy("lang").agg(sum("n").as("tokens"), count(lit(1)).as("docs"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val bins = PipelineOps.packSequences(spark, sfDir).collect()
    val byLang = bins.groupBy(_.getString(0))
    assert(byLang.keySet === docs.keySet)
    byLang.foreach { case (lang, rows) =>
      assert(rows.map(_.getLong(3)).sum === docs(lang)._1, s"$lang token count not conserved")
      assert(rows.map(_.getLong(2)).sum === docs(lang)._2, s"$lang doc count not conserved")
      // contiguous packing: bin ids are dense from 0
      val ids = rows.map(_.getLong(1)).sorted.toSeq
      assert(ids === (0L until ids.length.toLong).toSeq, s"$lang bins not dense from 0")
    }
  }

  test("gram builders equal Scala sliding windows on random token lists") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val tokenGen = Gen.listOf(Gen.oneOf("a", "bb", "ccc", "dd", "e"))
    val lists = (0 until 60).map(i =>
      tokenGen.pureApply(Gen.Parameters.default, Seed(7L + i)))
    val df = lists.zipWithIndex
      .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
      .toDF("doc_id", "text")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n", size(col("toks")))
      .select(col("doc_id"),
        operators.PipelineOps.biGrams(col("toks"), col("n")).as("g2"),
        operators.PipelineOps.triGrams(col("toks"), col("n")).as("g3"))
    val got = df.collect().map(r =>
      r.getLong(0) -> (r.getSeq[String](1), r.getSeq[String](2))).toMap
    lists.zipWithIndex.foreach { case (ts, i) =>
      // split("") yields [""], so the empty-text row tokenizes to one
      // empty token — mirror that in the expectation
      val toks = if (ts.isEmpty) Seq("") else ts
      val exp2 = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val exp3 = toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
      assert(got(i.toLong)._1 === exp2, s"bigrams for $toks")
      assert(got(i.toLong)._2 === exp3, s"trigrams for $toks")
    }
  }

  test("canonical selection keeps exactly one doc per component, the longest") {
    val rows = PipelineOps.dedupCanonical(spark, sfDir).collect()
    assert(rows.length === Tables.documents(spark, sfDir).count())
    val byComp = rows.groupBy(_.getLong(1))
    byComp.foreach { case (comp, members) =>
      val kept = members.filter(_.getInt(3) == 1)
      assert(kept.length === 1, s"component $comp kept ${kept.length} docs")
      val best = members.maxBy(r => (r.getLong(2), -r.getLong(0)))
      assert(kept.head.getLong(0) === best.getLong(0),
        s"component $comp kept a non-canonical member")
    }
  }
}
