package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AggregatorsSpec extends SparkTestBase {
  import spark.implicits._
  import Aggregators._

  test("WeightedAvg aggregates exactly on the typed Dataset path") {
    val result = Seq(
      WeightedValue(10.0, 1.0), WeightedValue(20.0, 3.0), WeightedValue(5.0, 2.0))
      .toDS().groupByKey(_ => 0).agg(WeightedAvg.toColumn).collect()
    assert(math.abs(result.head._2 - (10.0 * 1 + 20.0 * 3 + 5.0 * 2) / 6.0) < 1e-12)
  }

  test("WeightedAvg works as an untyped DataFrame udaf") {
    val wavg = udaf(WeightedAvg)
    val byKey = Seq(("a", 10.0, 1.0), ("a", 20.0, 3.0), ("b", 5.0, 2.0))
      .toDF("k", "value", "weight")
      .groupBy("k")
      .agg(wavg(col("value"), col("weight")).as("wavg"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(byKey("a") - 70.0 / 4.0) < 1e-12)
    assert(math.abs(byKey("b") - 5.0) < 1e-12)
  }

  test("WeightedAvg: zero total weight yields NaN, not a crash") {
    val result = Seq(WeightedValue(1.0, 0.0)).toDS()
      .groupByKey(_ => 0).agg(Aggregators.WeightedAvg.toColumn).collect()
    assert(result.head._2.isNaN)
  }

  test("WeightedAvgExact is partition-layout-invariant (exact long sums)") {
    // same rows, two layouts: the double-buffer WeightedAvg may differ
    // in the last ulp between these; the exact form must be IDENTICAL
    // bits — that is the property that buys q46 its DuckDB oracle.
    val wavg = udaf(new WeightedAvgExact(2))
    def run(parts: Int): Double = {
      val rows = (1 to 1000).map(i => ("k", (i * 137 % 9973).toLong, (i % 50 + 1).toLong))
      rows.toDF("k", "cents", "w").repartition(parts)
        .groupBy("k").agg(wavg(col("cents"), col("w")).as("v"))
        .collect().head.getDouble(1)
    }
    assert(java.lang.Double.doubleToLongBits(run(1)) ==
      java.lang.Double.doubleToLongBits(run(7)))
  }

  test("WeightedAvgExact: zero weight yields NaN; 2^53 overflow fails loudly") {
    val agg = new WeightedAvgExact(2)
    assert(agg.finish((0L, 0L)).isNaN)
    assert(agg.finish((12345L, 10L)) == (12345L.toDouble / 100.0) / 10.0)
    intercept[IllegalArgumentException](agg.finish(((1L << 53) + 1, 10L)))
  }

  test("CountMinSketch rejects index arrays whose arity drifts from its depth (ADVICE r5)") {
    // a short row would throw IndexOutOfBounds per row; a long one
    // would silently drop hash functions — both must fail loudly
    val cms = new CountMinSketch(depth = 4, width = 16)
    val ok = cms.reduce(cms.zero, Seq(1, 2, 3, 4))
    assert(ok.sum == 4L)
    intercept[IllegalArgumentException](cms.reduce(cms.zero, Seq(1, 2, 3)))
    intercept[IllegalArgumentException](cms.reduce(cms.zero, Seq(1, 2, 3, 4, 5)))
  }
}
