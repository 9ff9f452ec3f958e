package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd array-hash kernels for the dedup tiers (r15, guide §1.2
  * "per-task work" / §4 "eliminate non-codegen expressions").
  *
  * The sketch pipeline used to spell its per-document array passes
  * with higher-order functions — `transform(tokens, xxhash64)` for
  * token hashes, a `transform` per affine family member inside
  * [[graft.ops.Dedup.minhashSignature]] (48 walks per document!), and
  * a `transform` over an index sequence for the n-gram shingles.
  * Higher-order functions are CodegenFallback: every element pays an
  * interpreted-eval dispatch plus a boxed lambda variable bind, and
  * the minhash spelling multiplied that by the family size. Each
  * kernel below computes the IDENTICAL values (same xxhash64 seed and
  * fold order as the builtin — they call the same `XXH64` statics the
  * builtin expression compiles to; same two's-complement affine
  * arithmetic; same sorted-distinct emission) in one tight JIT'd loop
  * per document, inside the surrounding whole-stage-codegen span.
  * Value-equality with the HOF forms is spec-pinned (HashOpsSpec).
  */
object HashOpsUtil {
  /** Spark's default hash seed — xxhash64(x) == xxhash64(x, 42). */
  final val Seed = 42L

  /** The q34 affine family (moved verbatim from Dedup so the kernel
    * and the reference HOF spelling share one table): h_i(x) =
    * a_i * x + b_i over Z/2^64, a_i odd. */
  val affine: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(1234567L)
    Array.fill(48)((rnd.nextLong() | 1L, rnd.nextLong()))
  }
  private val affineA: Array[Long] = affine.map(_._1)
  private val affineB: Array[Long] = affine.map(_._2)

  /** xxhash64 of every string element; a null element hashes to the
    * seed (exactly `xxhash64(NULL)` = 42). */
  def hashElements(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (a.isNullAt(i)) Seed
        else XXH64.hashUTF8String(a.getUTF8String(i), Seed)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** All 48 affine minima in ONE pass over the base-hash array —
    * value-identical to `array(array_min(transform(h, _*a_i+b_i)) …)`.
    * Null elements are skipped (array_min ignores them); an array
    * with no non-null elements yields all-null minima, as array_min
    * of an empty/all-null array does. */
  def minhashSig(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val k = affineA.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        any = true
        val h = a.getLong(i)
        var j = 0
        while (j < k) {
          val v = h * affineA(j) + affineB(j)
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(new Array[Any](k)) // k nulls
    else UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Sorted-distinct n-gram hashes over a token-hash array —
    * value-identical to the HOF spelling in
    * [[graft.ops.Dedup.shinglesFromTokenHashes]]: shingle i (1-based,
    * i in 1..max(len-(n-1),1)) is the xxhash64 fold of elements
    * i..i+n-1 with out-of-range (and null) positions contributing 0L
    * (the coalesce), then array_distinct + array_sort. */
  def shingleHashes(a: ArrayData, n: Int): ArrayData = {
    val len = a.numElements()
    val m = math.max(len - (n - 1), 1)
    val buf = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = Seed
      var o = 0
      while (o < n) {
        val p = i + o
        val v = if (p < len && !a.isNullAt(p)) a.getLong(p) else 0L
        h = XXH64.hashLong(v, h)
        o += 1
      }
      buf(i) = h
      i += 1
    }
    java.util.Arrays.sort(buf)
    var w = 0
    var r = 0
    while (r < m) {
      if (r == 0 || buf(r) != buf(r - 1)) { buf(w) = buf(r); w += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(buf, w))
  }

  /** POSITIONAL n-gram hashes (no dedup, no sort): window i (0-based)
    * hashes elements i..i+n-1 — value-identical to
    * `transform(sequence(1, len-(n-1)), i => xxhash64(e_i..e_{i+n-1}))`
    * on arrays with len >= n and non-null elements (q82's gate).
    * Returns an empty array when len < n; call sites must filter
    * shorter arrays out first (the HOF spelling's backward `sequence`
    * would be ill-defined there anyway). */
  def gramHashes(a: ArrayData, n: Int): ArrayData = {
    val len = a.numElements()
    val m = len - (n - 1)
    if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val buf = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = Seed
      var o = 0
      while (o < n) { h = XXH64.hashLong(a.getLong(i + o), h); o += 1 }
      buf(i) = h
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(buf)
  }
}

private[functions] trait ArrayLongResult { self: UnaryExpression =>
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
}

/** xxhash64_elements(array<string>) -> array<long>. */
case class XxHash64Elements(child: Expression)
    extends UnaryExpression with ArrayLongResult {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }
  override def nullSafeEval(a: Any): Any =
    HashOpsUtil.hashElements(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOpsUtil.hashElements($c)")
  override protected def withNewChildInternal(c: Expression): XxHash64Elements =
    copy(child = c)
  override def prettyName: String = "xxhash64_elements"
}

/** minhash_sig(array<long>) -> array<long> (the 48 affine minima). */
case class MinhashSig(child: Expression)
    extends UnaryExpression with ArrayLongResult {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }
  override def nullSafeEval(a: Any): Any =
    HashOpsUtil.minhashSig(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOpsUtil.minhashSig($c)")
  override protected def withNewChildInternal(c: Expression): MinhashSig =
    copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** shingle_hashes(array<long>, n) -> sorted distinct array<long>. */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with ArrayLongResult {
  require(n >= 1, "shingle width must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }
  override def nullSafeEval(a: Any): Any =
    HashOpsUtil.shingleHashes(a.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOpsUtil.shingleHashes($c, $n)")
  override protected def withNewChildInternal(c: Expression): ShingleHashes =
    copy(child = c)
  override def prettyName: String = "shingle_hashes"
}

/** gram_hashes(array<long>, n) -> positional window hashes (no dedup). */
case class GramHashes(child: Expression, n: Int)
    extends UnaryExpression with ArrayLongResult {
  require(n >= 1, "gram width must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }
  override def nullSafeEval(a: Any): Any =
    HashOpsUtil.gramHashes(a.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOpsUtil.gramHashes($c, $n)")
  override protected def withNewChildInternal(c: Expression): GramHashes =
    copy(child = c)
  override def prettyName: String = "gram_hashes"
}

object HashOps {
  def xxhash64_elements(a: Column): Column =
    GraftSqlBridge.column(XxHash64Elements(GraftSqlBridge.expression(a)))
  def minhash_sig(a: Column): Column =
    GraftSqlBridge.column(MinhashSig(GraftSqlBridge.expression(a)))
  def shingle_hashes(a: Column, n: Int): Column =
    GraftSqlBridge.column(ShingleHashes(GraftSqlBridge.expression(a), n))
  def gram_hashes(a: Column, n: Int): Column =
    GraftSqlBridge.column(GramHashes(GraftSqlBridge.expression(a), n))
}
