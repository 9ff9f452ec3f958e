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

/** Product-quantization encode: per block b, the id of the codebook
  * centroid minimizing ‖c‖² − 2·x_b·c over the block's positional
  * subvector x_b, packed into byte b of one BIGINT.
  *
  * Why an expression and not the literal `least(struct...)` chain
  * ([[graft.ops.Similarity.ivfAssign]]'s form): the generated code for
  * a literal chain grows as blocks × K × dsub literals — fine at
  * K = 16, a guaranteed codegen blowup at the composed path's K = 256
  * (16k literals in one projection). Here the codebooks ride along as
  * one REFERENCE OBJECT (bound once per task, not inlined into
  * source), and the argmin is a tight primitive loop — the same
  * VecDot rationale.
  *
  * ARITHMETIC PARITY: the distance is the identical operand tree as
  * ivfAssign — cnorm2 (left-to-right driver fold) minus 2.0 · (a
  * sequential double dot), ties broken toward the LOWER centroid id
  * (least()'s lexicographic (d, cid) order) — so codes are
  * bit-identical to the literal form on any input, and the stored
  * q31e index is unaffected by the swap. Subvectors are positional
  * and their offsets derive from the TRAINED dim carried on the
  * expression (block b reads elements [b·dsub, b·dsub+len) with
  * dsub = dim/m) — NOT from the incoming vector's own length, which
  * would silently misalign any wrong-width vector against the
  * codebooks (ADVICE r11). Reads past the end of a short vector
  * contribute 0, exactly like the literal slice+VecDot form's
  * min-length clamp. */
object PqEncodeUtil {
  def encode(v: ArrayData, vFloat: Boolean, books: Array[Array[Array[Double]]],
             norms: Array[Array[Double]], dim: Int): Long = {
    val m = books.length
    val n = v.numElements()
    val dsub = math.max(1, dim / m)
    var code = 0L
    var b = 0
    while (b < m) {
      val book = books(b)
      val cn = norms(b)
      val off = b * dsub
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var dot = 0.0
        var i = 0
        val len = math.min(cent.length, math.max(0, n - off))
        while (i < len) {
          val x = if (vFloat) v.getFloat(off + i).toDouble else v.getDouble(off + i)
          dot += x * cent(i)
          i += 1
        }
        val d = cn(c) - 2.0 * dot
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      code += best.toLong << (8 * b)
      b += 1
    }
    code
  }
}

case class PqEncode(child: Expression, books: Array[Array[Array[Double]]], dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // ‖c‖² folded driver-side left-to-right — the exact literal
  // ivfScores feeds the subtraction
  @transient private lazy val norms: Array[Array[Double]] =
    books.map(_.map(_.map(x => x * x).sum))

  override def nullSafeEval(v: Any): Any =
    PqEncodeUtil.encode(v.asInstanceOf[ArrayData], isFloat, books, norms, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books,
      "double[][][]")
    val normsRef = ctx.addReferenceObj("pqNorms", norms,
      "double[][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.PqEncodeUtil.encode($v, $isFloat, $booksRef, $normsRef, $dim)")
  }

  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)

  override def prettyName: String = "pq_encode"
}

object VectorOps {
  def vec_dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(VecDot(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def pq_encode(v: Column, books: Array[Array[Array[Double]]], dim: Int): Column =
    GraftSqlBridge.column(PqEncode(GraftSqlBridge.expression(v), books, dim))
}
