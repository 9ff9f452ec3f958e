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
}
