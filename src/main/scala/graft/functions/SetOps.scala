package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native set-intersection cardinality over SORTED long arrays, with
  * codegen — the near-dup verification kernel.
  *
  * Why not `size(array_intersect(a, b))`: ArrayIntersect builds a
  * hash set of one side and an output array PER ROW — for a pair-
  * verification stage that evaluates millions of candidate pairs over
  * the same document sketches, that is two heap allocations and a
  * hashing pass per pair for a result that only ever feeds a
  * cardinality compare. The two-pointer merge below does zero
  * allocation and runs branch-predictably over primitive longs inside
  * the surrounding whole-stage-codegen span. Union cardinality then
  * falls out arithmetically (|A| + |B| − |A∩B|) — no array_union.
  *
  * Contract: both inputs must be SORTED ASCENDING with DISTINCT
  * elements (array_sort over an array_distinct'd sketch — sorted ONCE
  * per document at index build, amortized over every pair it joins).
  * The count equals size(array_intersect) on those inputs exactly, so
  * swapping it into an oracle-checked tier changes no output.
  */
object SetOpsUtil {
  def interCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** String-element variant: same merge over UTF8String binary order —
    * the ordering array_sort applies to string arrays, so a
    * sort-then-merge pipeline is consistent end to end. */
  def interCountStr(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }
}

/** sorted_inter_count(left, right): Int. Inputs must be
  * ArrayType(LongType) or ArrayType(StringType), sorted ascending
  * (array_sort order) with distinct, non-null elements (sketch /
  * shingle columns). */
case class SortedInterCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType

  // Both sides must agree on the element type, and it must be one the
  // merge kernels actually read (LongType via getLong, StringType via
  // getUTF8String) — anything else would produce plausible-looking
  // garbage at runtime, so reject it at analysis instead.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires both arguments to be array<bigint> or both " +
            s"array<string>, got ${l.catalogString} and ${r.catalogString}")
    }

  private def isString: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == StringType

  override def nullSafeEval(a: Any, b: Any): Any =
    if (isString)
      SetOpsUtil.interCountStr(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      SetOpsUtil.interCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isString) "interCountStr" else "interCount"
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SetOpsUtil.$fn($a, $b)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedInterCount =
    copy(left = l, right = r)

  override def prettyName: String = "sorted_inter_count"
}

object SetOps {
  def sorted_inter_count(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedInterCount(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
