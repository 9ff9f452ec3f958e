package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Oracle-parity helpers shared by every registered query.
  *
  * The driver hash-compares our parquet output against DuckDB running
  * `SparkEntry.oracleSql` on the same tables. Floating-point SUMs are
  * NOT reproducible across engines (partial-aggregation order differs),
  * so every monetary/quantity aggregate goes through exact decimal
  * arithmetic: cast inputs to DECIMAL(18,6) (source data has <= 2 dp, so
  * the quantization is lossless), sum exactly, and emit DECIMAL(18,6).
  * Both engines then produce bit-identical values regardless of
  * partitioning. Averages divide the exact decimal sum (as double) by
  * the exact count — one deterministic double op — then quantize.
  *
  * The final decimal->double conversion must happen from a decimal
  * whose SCALED integer fits in float64's exact range (<2^53): DuckDB
  * converts via (double)int / 10^scale (two roundings for wide
  * decimals), Spark via BigDecimal (one correct rounding). Rescaling
  * the sum to DECIMAL(18,6) first (lossless: inputs have <=6 real dp)
  * keeps both engines on a single correctly-rounded conversion —
  * found by the sf0.1 probe, where the scale-12 product sums exceeded
  * int64 and diverged by 1 ulp.
  *
  * The rescale target must be LOSSLESS for the data family (rounding
  * at the rescale would reintroduce tie ambiguity) and its scaled
  * integer must stay under 2^53. The scale ladder: 2-dp money sums ->
  * scale 2 (exact to 9e13 totals, SF100-safe); 4-dp product sums ->
  * scale 4 (9e11); 6-dp quantized values (events) -> scale 6 (9e9,
  * values are small). Beyond the bound, Spark's non-ANSI cast yields
  * NULL while DuckDB errors — loud on the oracle side, silent on
  * Spark's; a transactional overflow check is a next-round item.
  */
object Qx {
  val D6: DecimalType = DecimalType(18, 6)

  /** The scaled-integer exactness bound: a decimal whose scaled
    * integer exceeds 2^53 no longer converts to DOUBLE exactly, and
    * the cross-engine bit-identity contract breaks. As BigDecimal per
    * rescale: 2^53 / 10^rescale. */
  private def exactBound(rescale: Int): java.math.BigDecimal =
    new java.math.BigDecimal(1L << 53).movePointLeft(rescale)

  /** Overflow guard (transactional, not advisory): Spark's non-ANSI
    * decimal downcast yields NULL on overflow while DuckDB ERRORS — a
    * silent/loud asymmetry where past the scale ladder's bound our
    * side would quietly emit NULL and the oracle side would fail the
    * round. raise_error makes the failure loud on BOTH engines; the
    * 2^53 check additionally catches totals that still fit the decimal
    * but no longer round-trip through DOUBLE exactly. */
  private def guarded(total: Column, rescaled: Column, rescale: Int): Column = {
    val bad = (total.isNotNull && rescaled.isNull) ||
      abs(rescaled) >= lit(exactBound(rescale))
    when(bad, raise_error(concat(
      lit(s"graft.Qx: exact-sum overflow past DECIMAL(18,$rescale)/2^53 bound; total="),
      total.cast(StringType))).cast(DecimalType(18, rescale)))
      .otherwise(rescaled)
  }

  /** Exact, order-independent sum: DECIMAL(18,6) internally, emitted as
    * DOUBLE (one correctly-rounded conversion of the exact total, so
    * both engines produce identical bits; DuckDB's client also surfaces
    * decimals as float64, so DOUBLE is the stable interchange type).
    * Throws past the exactness bound instead of silently nulling — see
    * [[guarded]].
    * DuckDB twin: CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) */
  def dsum(c: Column, rescale: Int = 6): Column = {
    val total = sum(c.cast(D6))
    guarded(total, total.cast(DecimalType(18, rescale)), rescale).cast(DoubleType)
  }

  /** Deterministic average via exact sum / exact count. `rescale`
    * follows the scale ladder (class doc): pass the data family's
    * real decimal places (2 for money, 0 for integer counts) to buy
    * sum headroom — the sf1 probe overflowed a global money average
    * at the default scale 6.
    * DuckDB twin: CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE)/count(*) */
  def davg(c: Column, rescale: Int = 6): Column = {
    val total = sum(c.cast(D6))
    guarded(total, total.cast(DecimalType(18, rescale)), rescale)
      .cast(DoubleType) / count(lit(1))
  }

  /** l_extendedprice * (1 - l_discount) in exact decimal (<= 4 real dp). */
  def discPrice(price: Column, discount: Column): Column =
    (price.cast(D6) * (lit(1).cast(D6) - discount.cast(D6))).cast(D6)

  /** SQL-side twins kept next to the Scala ones so the two stay in sync. */
  def sqlDsum(x: String, rescale: Int = 6): String =
    s"CAST(CAST(sum(CAST($x AS DECIMAL(18,6))) AS DECIMAL(18,$rescale)) AS DOUBLE)"
  def sqlDavg(x: String, rescale: Int = 6): String =
    s"CAST(CAST(sum(CAST($x AS DECIMAL(18,6))) AS DECIMAL(18,$rescale)) AS DOUBLE)/count(*)"
  def sqlDiscPrice: String =
    "CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6))"
}
