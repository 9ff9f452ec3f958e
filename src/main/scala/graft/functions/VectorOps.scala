package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over array columns (float32 or float64
  * elements), with codegen.
  *
  * Why not `aggregate(zip_with(...))`: Spark's higher-order functions
  * evaluate interpreted lambdas per element and allocate an
  * intermediate array per row — they also break the surrounding
  * whole-stage-codegen span. This expression compiles to a tight
  * primitive loop inside WSCG, which is the difference between the
  * embedding queries being scan-bound vs lambda-bound at 100 TB.
  *
  * Summation is sequential in double precision — bit-identical to the
  * left-fold the higher-order form computed, so DuckDB oracle parity
  * is unchanged.
  */
object VectorOpsUtil {
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }
}

/** dot(left, right): Double. Inputs must be ArrayType(FloatType|
  * DoubleType) with non-null elements (embedding columns). */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOpsUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorOpsUtil.dot($a, $b, ${isFloat(left)}, ${isFloat(right)})")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)

  override def prettyName: String = "vec_dot"
}

object VectorOps {
  def vec_dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(VecDot(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
