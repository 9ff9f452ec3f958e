package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("salted two-phase aggregation equals the direct groupBy") {
    // one hot key (90% of rows) + a long tail
    val rows = (1 to 9000).map(i => ("hot", i.toDouble)) ++
      (1 to 1000).map(i => (s"k${i % 50}", i.toDouble))
    val df = rows.toDF("key", "value")
    val direct = df.groupBy("key")
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    val salted = Skew.saltedCountSum(df, "key", "value", col("value"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(salted.keySet == direct.keySet)
    direct.foreach { case (k, (n, s)) =>
      assert(salted(k)._1 == n)
      assert(math.abs(salted(k)._2 - s) < 1e-6)
    }
  }

  test("sketch aggregates stay within HLL error bounds") {
    val out = graft.queries.Core.queries("q19_sketches")(spark, "/root/testdata/sf0.001")
      .collect()
    out.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact < 0.1,
        s"HLL estimate $approx vs exact $exact drifts >10%")
    }
  }
}
