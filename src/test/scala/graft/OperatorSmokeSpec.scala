package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must build a plan and execute on sf0.001; spot
  * checks pin semantics the oracle can't see (plan determinism across two
  * runs of the same query).
  */
class OperatorSmokeSpec extends AnyFunSuite with SparkFixture {

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name executes on sf0.001") {
      val n = fn(spark, sfDir).count()
      assert(n >= 0)
    }
  }

  test("entry flagship returns the 6 (returnflag, linestatus) groups") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length === 6)
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length === 6)
  }

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("deterministic across runs: flagship + a window + a dedup query") {
    for (key <- Seq("q_agg_pricing_summary", "q_win_running", "q_dedup_near_minhash")) {
      val a = SparkEntry.queries(key)(spark, sfDir).collect().toSeq
      val b = SparkEntry.queries(key)(spark, sfDir).collect().toSeq
      assert(a === b, s"$key not run-deterministic")
    }
  }
}
