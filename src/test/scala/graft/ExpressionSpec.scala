package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GraftFunctions, HaversineExpr, RollingHashExpr}

/** Native Catalyst expression kernels + registration + codegen path. */
class ExpressionSpec extends AnyFunSuite with SparkFixture {

  test("haversine kernel: Austin→SF ≈ 2420 km") {
    val d = HaversineExpr.compute(30.2672, -97.7431, 37.7749, -122.4194)
    assert(math.abs(d - 2420.0) < 15.0, s"got $d")
  }

  test("haversine kernel: zero distance to self") {
    assert(HaversineExpr.compute(45.0, 7.0, 45.0, 7.0) === 0.0)
  }

  test("native haversine equals the pure-column formulation") {
    val native = operators.NativeExprs.haversineNative(spark, sfDir)
      .select("c_custkey", "km_to_austin").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val column = operators.ScalarFuncs.haversine(spark, sfDir)
      .select("c_custkey", "km_to_austin").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(native === column)
  }

  test("rolling hash: deterministic, order-sensitive") {
    val h1 = RollingHashExpr.compute(UTF8String.fromString("alpha beta"))
    val h2 = RollingHashExpr.compute(UTF8String.fromString("alpha beta"))
    val h3 = RollingHashExpr.compute(UTF8String.fromString("beta alpha"))
    assert(h1 === h2)
    assert(h1 !== h3)
  }

  test("registered SQL functions evaluate through codegen") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      "SELECT graft_haversine(0.0, 0.0, 0.0, 90.0) AS q, graft_rolling_hash('abc') AS h")
      .collect().head
    // quarter of the equator ≈ 10007.5 km
    assert(math.abs(row.getDouble(0) - 10007.5) < 5.0)
    assert(row.getLong(1) === RollingHashExpr.compute(UTF8String.fromString("abc")))
  }

  test("null propagation through the native expressions") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      "SELECT graft_haversine(CAST(NULL AS DOUBLE), 0.0, 0.0, 0.0) AS q, " +
        "graft_rolling_hash(CAST(NULL AS STRING)) AS h").collect().head
    assert(row.isNullAt(0) && row.isNullAt(1))
  }
}
