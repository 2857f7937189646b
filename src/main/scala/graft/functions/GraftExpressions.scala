package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (SURVEY.md §4.3): scalar kernels that stay
  * inside whole-stage codegen instead of breaking it the way a Scala UDF
  * would. Each generates a single static call into a compute kernel, so
  * the JIT sees one monomorphic call site per expression.
  */

/** Haversine great-circle distance in km, as a quaternary expression with
  * real doGenCode. Semantically identical to the pure-column formulation
  * in ScalarFuncs.haversineKm (same op order → same doubles).
  */
case class HaversineExpr(first: Expression, second: Expression,
                         third: Expression, fourth: Expression)
  extends QuaternaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType == DoubleType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires 4 double arguments, got ${children.map(_.dataType.simpleString)}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_haversine"

  override protected def nullSafeEval(lat1: Any, lon1: Any, lat2: Any, lon2: Any): Any =
    HaversineExpr.compute(lat1.asInstanceOf[Double], lon1.asInstanceOf[Double],
      lat2.asInstanceOf[Double], lon2.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.functions.HaversineExpr.compute($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): HaversineExpr =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object HaversineExpr {
  /** Mirrors ScalarFuncs.haversineKm op-for-op. */
  def compute(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    2 * 6371.0 * math.atan2(math.sqrt(a), math.sqrt(1.0 - a))
  }
}

/** 64-bit polynomial rolling hash of a string (base-31 over UTF-8 bytes) —
  * the document-fingerprinting kernel. Unary, codegen'd.
  */
case class RollingHashExpr(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHashExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHashExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)
}

object RollingHashExpr {
  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 1125899906842597L // large prime seed
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    h
  }
}

/** Registration: makes the native expressions available to SQL / expr()
  * as graft_haversine(lat1, lon1, lat2, lon2) and graft_rolling_hash(s).
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("graft_haversine",
      exprs => HaversineExpr(Cast(exprs(0), DoubleType), Cast(exprs(1), DoubleType),
        Cast(exprs(2), DoubleType), Cast(exprs(3), DoubleType)), "scala_udf")
    registry.createOrReplaceTempFunction("graft_rolling_hash",
      exprs => RollingHashExpr(exprs.head), "scala_udf")
  }
}
