package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Python `str.title()` semantics (used by the reference's string
  * standardization via pandas `.str.title()`, transformation.py:58):
  * a letter that follows a non-letter is uppercased, any other letter
  * is lowercased — so `"us-bangla air"` becomes `"Us-Bangla Air"`,
  * where Spark's `initcap` (whitespace-delimited words only) would
  * produce `"Us-bangla Air"`.
  *
  * Implemented as a native Catalyst expression with codegen (a static
  * call inside whole-stage codegen) rather than a Scala UDF, so the
  * cleaning pipeline stays inside one WholeStageCodegen span.
  */
object TitleCaseUtil {
  def titleCase(s: UTF8String): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    var prevLetter = false
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val isLetter = Character.isLetter(cp)
      val out =
        if (!isLetter) cp
        else if (prevLetter) Character.toLowerCase(cp)
        else Character.toTitleCase(cp)
      sb.appendCodePoint(out)
      prevLetter = isLetter
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Input must already be StringType (callers cast; see
  * [[graft.flights.Cleaning.standardize]]). */
case class PandasTitleCase(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    TitleCaseUtil.titleCase(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TitleCaseUtil.titleCase($c)")
  override protected def withNewChildInternal(newChild: Expression): PandasTitleCase =
    copy(child = newChild)
  override def prettyName: String = "pandas_title_case"
}

object PandasTitleCase {
  /** Column-API entry point: `title_case(col("airline"))`. */
  def title_case(c: Column): Column =
    GraftSqlBridge.column(PandasTitleCase(GraftSqlBridge.expression(c)))
}
