package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The decimal exact-sum ladder must fail LOUDLY past its bound:
  * DuckDB errors on decimal overflow, and before this guard Spark's
  * non-ANSI downcast silently emitted NULL — the asymmetry VERDICT r1
  * flagged. Both engines now fail the same constructed overflow. */
class QxSpec extends SparkTestBase {
  import spark.implicits._

  test("dsum of in-range values matches plain arithmetic") {
    val got = Seq(1.25, 2.50, 3.25).toDF("v")
      .agg(Qx.dsum(col("v")).as("s")).as[Double].head()
    assert(got == 7.0)
  }

  test("davg stays exact and null-safe on empty input") {
    val got = Seq.empty[Double].toDF("v")
      .agg(Qx.dsum(col("v")).as("s")).as[Option[Double]].head()
    assert(got.isEmpty) // empty sum is NULL, not an error
  }

  test("decimal-downcast overflow raises instead of silently nulling") {
    // 2000 * 9e11 = 1.8e15 overflows DECIMAL(18,6) (max ~1e12)
    val df = spark.range(2000).select(lit(9e11).as("v"))
    val e = intercept[Exception] {
      df.agg(Qx.dsum(col("v"))).collect()
    }
    assert(e.getMessage.contains("exact-sum overflow"),
      s"expected loud overflow, got: ${e.getMessage}")
  }

  test("totals past the 2^53 double-exactness bound raise too") {
    // 1000 * 1e11 = 1e14 fits DECIMAL(18,2) but its scaled integer
    // 1e16 > 2^53, so the double conversion would no longer be exact
    val df = spark.range(1000).select(lit(1e11).as("v"))
    val e = intercept[Exception] {
      df.agg(Qx.dsum(col("v"), rescale = 2)).collect()
    }
    assert(e.getMessage.contains("exact-sum overflow"))
    // the same magnitude under rescale=2 stays fine below the bound
    val ok = spark.range(10).select(lit(1e11).as("v"))
      .agg(Qx.dsum(col("v"), rescale = 2).as("s")).as[Double].head()
    assert(ok == 1e12)
  }
}
