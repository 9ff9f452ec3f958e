package graft.ops

import graft.SparkTestBase

class BucketingSpec extends SparkTestBase {
  test("bucketed join runs with no shuffle exchange on either side") {
    val joined = Bucketing.colocatedOrderJoin(spark, "/root/testdata/sf0.001")
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must be exchange-free; the only exchange allowed
    // is the final single-partition one for the tiny grouped result
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a co-located join, plan:\n$plan")
    // no Exchange hashpartitioning on the join keys
    val badExchange = plan.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning") &&
        (l.contains("l_orderkey") || l.contains("o_orderkey")))
    assert(!badExchange, s"join key exchange present — bucketing not used:\n$plan")
    // and the result is correct vs the unbucketed plan
    val expected = {
      val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      val o = graft.Tables.orders(spark, "/root/testdata/sf0.001")
      li.join(o, li("l_orderkey") === o("o_orderkey")).count()
    }
    val total = joined.agg(org.apache.spark.sql.functions.sum("n_items")).head().getLong(0)
    assert(total == expected)
  }

  test("bucketed aggregation: no exchange feeds the order-key rollup") {
    import org.apache.spark.sql.functions._
    val agg = Bucketing.bucketedOrderAgg(spark, "/root/testdata/sf0.001")
    val plan = agg.queryExecution.executedPlan.toString
    // the per-order aggregate must consume the bucketed scan directly;
    // the only exchange allowed is the one on the tiny n_items domain
    val badExchange = plan.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning") && l.contains("l_orderkey"))
    assert(!badExchange, s"order-key exchange present — bucketing not used:\n$plan")
    // and the values match the flat-table spelling exactly
    val flat = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 0)))
          .cast("long").as("qty"))
      .groupBy(col("n_items"))
      .agg(count(lit(1)).as("n_orders"), sum(col("qty")).as("total_qty"))
      .orderBy(col("n_items"))
      .collect().map(_.toSeq).toSeq
    assert(agg.collect().map(_.toSeq).toSeq == flat)
  }
}
