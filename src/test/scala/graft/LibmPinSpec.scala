package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bit-level pins for the shared-libm surface (SCALE.md "The shared-libm
  * surface"): every floored-fixed-point transcendental the exact-integer
  * operators lean on — `floor(f(x)·1e9)` over `ln / sqrt / cos / sin /
  * exp / asin / atan2 / pow` — evaluated at representative points and
  * compared against CONSTANTS pinned at round 19 on this host (JDK 17,
  * Linux x86-64).
  *
  * Why constants and not `Math.f` recomputation alone: the cross-engine
  * bit-identity of these calls is an EMPIRICAL invariant (the JDK spec
  * allows 1–2.5 ulp on exp/pow/asin/atan2), gated until now only by the
  * full sf0.1 parity sweep — expensive to localize when it breaks on a
  * JDK or platform bump. This table localizes any future divergence to
  * the exact function and point, in two layers per point:
  *
  *   1. `java.lang.Math.f(x)` floors to the pinned constant — catches a
  *      JDK/libm change (the driver-replay side of every RoundN spec);
  *   2. the Spark SQL expression floors to the same constant — catches a
  *      Catalyst mapping change (codegen routes these to the same
  *      java.lang.Math via scala.math, so 1↔2 divergence means Spark
  *      changed its expression implementation).
  *
  * The DuckDB third leg stays where it was — the sf0.01/sf0.1 parity
  * runs — but with 1+2 green a parity break isolates to DuckDB's libm.
  * tsLombScargle (SeriesOps) is the canary to re-sweep FIRST on any
  * platform change: it composes atan2 → cos/sin → exact integer sums,
  * so a single-ulp theta flip moves its readouts discretely (PARITY.md).
  */
class LibmPinSpec extends AnyFunSuite with SparkFixture {

  private val unary: Seq[(String, Double, Long)] = Seq(
    ("ln", 0.5, -693147181L),
    ("ln", 2.0, 693147180L),
    ("ln", 2.5, 916290731L),
    ("ln", 3.0, 1098612288L),
    ("ln", 7.0, 1945910149L),
    ("ln", 10.0, 2302585092L),
    ("ln", 100.0, 4605170185L),
    ("ln", 1000.0, 6907755278L),
    ("ln", 123456.0, 11723640096L),
    ("sqrt", 2.0, 1414213562L),
    ("sqrt", 3.0, 1732050807L),
    ("sqrt", 5.0, 2236067977L),
    ("sqrt", 10.0, 3162277660L),
    ("sqrt", 123456.0, 351363060095L),
    ("cos", 0.5, 877582561L),
    ("cos", 1.0, 540302305L),
    ("cos", 2.0, -416146837L),
    ("cos", -1.5, 70737201L),
    ("cos", 3.141592653589793, -1000000000L),
    ("cos", 0.7853981633974483, 707106781L),
    ("sin", 0.5, 479425538L),
    ("sin", 1.0, 841470984L),
    ("sin", 2.0, 909297426L),
    ("sin", -1.5, -997494987L),
    ("sin", 3.141592653589793, 0L),
    ("sin", 0.7853981633974483, 707106781L),
    ("exp", -2.0, 135335283L),
    ("exp", -1.0, 367879441L),
    ("exp", -0.5, 606530659L),
    ("exp", -0.1, 904837418L),
    ("exp", 1.0, 2718281828L),
    ("asin", -0.5, -523598776L),
    ("asin", 0.1, 100167421L),
    ("asin", 0.25, 252680255L),
    ("asin", 0.5, 523598775L),
    ("asin", 0.9, 1119769514L),
    ("asin", 1.0, 1570796326L))

  // (y, x, floor(atan2(y, x)·1e9)) — argument order is atan2(y, x)
  private val atan2Pins: Seq[(Double, Double, Long)] = Seq(
    (1.0, 2.0, 463647609L),
    (3.0, -4.0, 2498091544L),
    (-5.0, 12.0, -394791120L),
    (7.0, 24.0, 283794109L),
    (1.0, 1.0, 785398163L),
    (0.0, 1.0, 0L))

  // (base, exponent, floor(pow(b, e)·1e9)) — the RBO/Haar/decay grids
  private val powPins: Seq[(Double, Double, Long)] = Seq(
    (0.9, 1.0, 900000000L),
    (0.9, 3.0, 729000000L),
    (0.9, 5.0, 590490000L),
    (0.9, 10.0, 348678440L),
    (0.9, 20.0, 121576654L),
    (2.0, 10.0, 1024000000000L),
    (0.5, 7.0, 7812500L),
    (1.5, 4.0, 5062500000L))

  private def jvm(fn: String, x: Double): Double = fn match {
    case "ln"   => math.log(x)
    case "sqrt" => math.sqrt(x)
    case "cos"  => math.cos(x)
    case "sin"  => math.sin(x)
    case "exp"  => math.exp(x)
    case "asin" => math.asin(x)
  }

  test("java.lang.Math floors to the pinned constants (JDK libm layer)") {
    unary.foreach { case (fn, x, pin) =>
      assert(math.floor(jvm(fn, x) * 1e9).toLong === pin, s"$fn($x)")
    }
    atan2Pins.foreach { case (y, x, pin) =>
      assert(math.floor(math.atan2(y, x) * 1e9).toLong === pin,
        s"atan2($y, $x)")
    }
    powPins.foreach { case (b, e, pin) =>
      assert(math.floor(math.pow(b, e) * 1e9).toLong === pin, s"pow($b, $e)")
    }
  }

  test("Spark SQL expressions floor to the same constants (Catalyst layer)") {
    import spark.implicits._
    val gotU = unary.toDF("fn", "x", "pin")
      .select(col("fn"), col("x"), col("pin"),
        expr("cast(floor(CASE fn WHEN 'ln' THEN ln(x) " +
          "WHEN 'sqrt' THEN sqrt(x) WHEN 'cos' THEN cos(x) " +
          "WHEN 'sin' THEN sin(x) WHEN 'exp' THEN exp(x) " +
          "WHEN 'asin' THEN asin(x) END * 1e9) as long)").as("got"))
      .collect()
    gotU.foreach { r =>
      assert(r.getAs[Long]("got") === r.getAs[Long]("pin"),
        s"${r.getString(0)}(${r.getDouble(1)})")
    }
    val gotA = atan2Pins.toDF("y", "x", "pin")
      .select(col("pin"),
        expr("cast(floor(atan2(y, x) * 1e9) as long)").as("got"))
      .collect()
    gotA.foreach(r => assert(r.getLong(1) === r.getLong(0)))
    val gotP = powPins.toDF("b", "e", "pin")
      .select(col("pin"),
        expr("cast(floor(power(b, e) * 1e9) as long)").as("got"))
      .collect()
    gotP.foreach(r => assert(r.getLong(1) === r.getLong(0)))
  }
}
