package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd single-pass BPE bracketing + merge kernel (r16, VERDICT
  * r15 #8; guide §1.2 "per-task work"). The [[graft.ops.Bpe.encode]]
  * rewrite chain spelled the encoding as `regexp_replace("(\S)" ->
  * "⟨$1⟩")` followed by one literal `replace` per learned merge —
  * each step codegen'd but each materializing a full fresh UTF8String
  * copy of the document, i.e. 48 string rebuilds per row plus a regex
  * engine pass. This kernel produces the byte-identical encoding in
  * ONE pass: split into codepoint units per non-whitespace run,
  * simulate the merges in rank order on the unit sequence (an
  * adjacent-pair merge in unit space IS the `⟨a⟩⟨b⟩ -> ⟨ab⟩` literal
  * replace — brackets delimit exactly the units, matches can never
  * start mid-unit or span the un-bracketed whitespace, and the
  * left-to-right non-overlapping cursor of UTF8String.replace maps to
  * "the merged unit cannot re-match within the same rank"), then
  * assemble the output once. Value-equality with the replace-chain
  * spelling is spec-pinned (BpeSpec), including whitespace classes
  * (Java regex \S = not [ \t\n\x0B\f\r] — NOT Unicode whitespace),
  * supplementary-plane codepoints, and null/empty inputs.
  *
  * The input must already be cleaned of the reserved bracket
  * codepoints (the caller strips them, exactly as the old chain did
  * before its regexp_replace).
  */
object BpeOpsUtil {
  /** Java-regex \s members — the complement of what "(\S)" brackets. */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Encode `cleaned` under `merges` (rows of [left, right, merged]).
    * One pass, no intermediate strings beyond the unit run buffer. */
  def encode(cleaned: UTF8String, merges: Array[Array[String]]): UTF8String = {
    val str = cleaned.toString
    val n = str.length
    val sb = new java.lang.StringBuilder(n * 3)
    val units = new java.util.ArrayList[String]()
    def flushRun(): Unit = {
      if (!units.isEmpty) {
        var m = 0
        while (m < merges.length) {
          val a = merges(m)(0); val b = merges(m)(1); val ab = merges(m)(2)
          // left-to-right, non-overlapping: after a merge at j the
          // cursor moves past the merged unit (replace() semantics)
          var j = 0
          while (j + 1 < units.size()) {
            if (units.get(j) == a && units.get(j + 1) == b) {
              units.set(j, ab)
              units.remove(j + 1)
            }
            j += 1
          }
          m += 1
        }
        var k = 0
        while (k < units.size()) {
          sb.append('⟨').append(units.get(k)).append('⟩')
          k += 1
        }
        units.clear()
      }
    }
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (isWs(c)) { flushRun(); sb.append(c); i += 1 }
      else {
        val cp = str.codePointAt(i)
        units.add(new String(Character.toChars(cp)))
        i += Character.charCount(cp)
      }
    }
    flushRun()
    UTF8String.fromString(sb.toString)
  }
}

/** bpe_merge_encode(cleanedText) -> the bracketed-unit BPE encoding. */
case class BpeMergeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }
  @transient private lazy val table: Array[Array[String]] =
    merges.map { case (a, b) => Array(a, b, a + b) }.toArray
  override def nullSafeEval(s: Any): Any =
    BpeOpsUtil.encode(s.asInstanceOf[UTF8String], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", table, "java.lang.String[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeOpsUtil.encode($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): BpeMergeEncode =
    copy(child = c)
  override def prettyName: String = "bpe_merge_encode"
}

object BpeOps {
  def bpe_merge_encode(cleaned: Column, merges: Seq[(String, String)]): Column =
    GraftSqlBridge.column(BpeMergeEncode(GraftSqlBridge.expression(cleaned), merges))
}
