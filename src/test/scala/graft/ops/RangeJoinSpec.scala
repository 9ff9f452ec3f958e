package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The bucketized range join: correctness is pinned against the naive
  * theta join (crossJoin + filter) on data that exercises every
  * geometry hazard — negative values across the zero boundary,
  * intervals spanning many buckets, points exactly on lo/hi, empty
  * matches — and the plan is pinned to the hash-join family (the
  * operator exists to avoid the nested-loop/cartesian plan). */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("floorDiv floors (not truncates) across the zero boundary") {
    val got = Seq(-7L, -5L, -1L, 0L, 1L, 4L, 5L).toDF("v")
      .select(RangeJoin.floorDiv(col("v"), 5L).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(-2L, -1L, -1L, 0L, 0L, 0L, 1L))
  }

  test("floorDiv is exact past 2^53 and at the Long extremes (ADVICE r8)") {
    // the r8 spelling divided via Column./ (double division): above
    // 2^53 the rounding shifted bucket ids, and the pmod subtraction
    // underflowed within a partial grain of Long.MinValue
    val vals = Seq(Long.MaxValue, Long.MaxValue - 1L, (1L << 60) + 3L,
      Long.MinValue, Long.MinValue + 5L, -(1L << 60) - 3L)
    val got = vals.toDF("v")
      .select(col("v"), RangeJoin.floorDiv(col("v"), 1000L).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vals.foreach { v =>
      assert(got(v) == Math.floorDiv(v, 1000L), s"floorDiv($v, 1000)")
    }
  }

  test("a pre-existing bucket-name column fails fast instead of being clobbered") {
    val points = Seq((1L, 5L)).toDF("__graft_rj_bucket", "p")
    val intervals = Seq((1L, 0L, 10L)).toDF("iid", "lo", "hi")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 10L)
    }
    assert(e.getMessage.contains("__graft_rj_bucket"))
  }

  test("bucketized join equals the naive theta join, including boundary points") {
    val points = Seq(-100L, -50L, -1L, 0L, 1L, 7L, 49L, 50L, 51L, 200L, 999L)
      .zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
    // intervals: negative-straddling, multi-bucket-wide (grain 10),
    // single-point, disjoint/empty, and duplicated ends
    val intervals = Seq(
      (1L, -60L, -1L), (2L, -5L, 5L), (3L, 0L, 0L), (4L, 1L, 200L),
      (5L, 48L, 52L), (6L, 500L, 600L), (7L, 999L, 999L))
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", grain = 10L)
      .select(col("pid"), col("iid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = points.crossJoin(intervals)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select(col("pid"), col("iid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && want.nonEmpty)
    // each matched pair appears exactly once (a point lives in ONE bucket)
    val rows = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", grain = 10L)
      .select(col("pid"), col("iid")).collect()
    assert(rows.length == rows.toSet.size)
  }

  test("bucketized parity holds across grain choices") {
    val points = (-50L to 150L by 7L).zipWithIndex
      .map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
    val intervals = Seq((1L, -30L, -10L), (2L, -10L, 90L), (3L, 80L, 85L))
      .toDF("iid", "lo", "hi")
    val want = points.crossJoin(intervals)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select(col("pid"), col("iid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (grain <- Seq(1L, 3L, 10L, 100L, 10000L)) {
      val got = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", grain)
        .select(col("pid"), col("iid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"grain=$grain")
    }
  }

  test("the plan is a hash equi-join on the bucket — no nested loop, no cartesian") {
    val pts = graft.Tables.customer(spark, sf)
      .select(col("c_custkey"), (col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("long").as("p"))
    val iv = graft.Tables.supplier(spark, sf)
      .groupBy(col("s_nationkey"))
      .agg(min((col("s_acctbal").cast("decimal(18,2)") * 100).cast("long")).as("lo"),
        max((col("s_acctbal").cast("decimal(18,2)") * 100).cast("long")).as("hi"))
    val plan = RangeJoin.pointInInterval(pts, iv, "p", "lo", "hi", grain = 10000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested-loop plan:\n$plan")
    assert(plan.contains("HashJoin"), s"expected a hash join on the bucket key:\n$plan")
  }

  test("q138 equals the naive BETWEEN join over the region spans") {
    val rows = graft.SparkEntry.queries("q138_balance_band_lookup")(spark, sf).collect()
    assert(rows.nonEmpty)
    val cents = (c: org.apache.spark.sql.Column) =>
      (c.cast("decimal(18,2)") * 100).cast("long")
    val spans = graft.Tables.supplier(spark, sf)
      .join(graft.Tables.nation(spark, sf),
        col("s_nationkey") === col("n_nationkey"))
      .join(graft.Tables.region(spark, sf),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(min(cents(col("s_acctbal"))).as("lo"), max(cents(col("s_acctbal"))).as("hi"))
    val want = graft.Tables.customer(spark, sf)
      .select(cents(col("c_acctbal")).as("bal"))
      .crossJoin(spans)
      .filter(col("bal") >= col("lo") && col("bal") <= col("hi"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n"), min(col("bal")).as("mn"), max(col("bal")).as("mx"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.map(_.getAs[String]("region")).toSet == want.keySet)
    rows.foreach { r =>
      val (n, mn, mx) = want(r.getAs[String]("region"))
      assert(r.getAs[Long]("n_customers") == n)
      assert(r.getAs[Long]("min_match_cents") == mn)
      assert(r.getAs[Long]("max_match_cents") == mx)
    }
  }
}
