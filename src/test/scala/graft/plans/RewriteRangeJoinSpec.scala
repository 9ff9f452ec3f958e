package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The automatic range-join rewrite. Every test compares the
  * rewritten join's ROWS against the nested-loop result of the same
  * predicate (ground truth by construction), and pins the PLAN shape
  * the rule exists to produce — plus, just as load-bearing, the
  * cases where it must NOT fire. */
class RewriteRangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  // points spanning negatives, zero, bucket boundaries; interval set
  // with multi-bucket widths, an inverted pair, and a point interval
  private def pts: DataFrame =
    (-3000L to 3000L by 37L).zipWithIndex
      .map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
  private def ivs: DataFrame = Seq(
    (1L, -2500L, -1000L), (2L, -1100L, 500L), (3L, 0L, 0L),
    (4L, 100L, 2900L), (5L, 2048L, 2049L), (6L, 900L, 100L) /* inverted */)
    .toDF("iid", "lo", "hi")

  private def groundTruth: Set[(Long, Long)] =
    pts.crossJoin(ivs)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Run `f` with broadcasting disabled so the size gate always
    * passes and a non-rewritten plan would be a CartesianProduct. */
  private def noBroadcast[T](f: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try f finally spark.conf.set(key, old)
  }

  test("pure range join rewrites to a hash join and matches the nested-loop rows") {
    noBroadcast {
      val joined = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"rewrite did not fire:\n$plan")
      assert(plan.contains("Generate") && plan.contains("Join"), plan)
      val got = joined.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSet == groundTruth && got.length == got.toSet.size,
        "rows must match the theta join exactly, with no bucket duplicates")
    }
  }

  test("strict and reversed comparison spellings rewrite and stay exact") {
    noBroadcast {
      // lo < p AND hi > p — strict, both written bound-first
      val joined = pts.join(ivs, col("lo") < col("p") && col("hi") > col("p"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"rewrite did not fire on strict bounds:\n$plan")
      val want = pts.crossJoin(ivs)
        .filter(col("lo") < col("p") && col("hi") > col("p"))
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = joined.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want)
    }
  }

  test("extra residual conjuncts ride along unchanged") {
    noBroadcast {
      val joined = pts.join(ivs,
        col("p") >= col("lo") && col("p") <= col("hi") && col("iid") =!= 3L &&
          col("pid") % 2 === 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"residual conjuncts blocked the rewrite:\n$plan")
      val want = pts.crossJoin(ivs)
        .filter(col("p") >= col("lo") && col("p") <= col("hi") && col("iid") =!= 3L &&
          col("pid") % 2 === 0)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = joined.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want)
    }
  }

  test("a join that already has an equi key is left alone") {
    noBroadcast {
      val ivk = ivs.withColumn("k", col("iid") % 5)
      val ptk = pts.withColumn("k", col("pid") % 5)
      val joined = ptk.join(ivk,
        ptk("k") === ivk("k") && col("p") >= col("lo") && col("p") <= col("hi"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(!plan.contains("__rj_"),
        s"must not rewrite an equi+range join:\n$plan")
      // and it still answers correctly through the stock hash join
      val want = ptk.crossJoin(ivk.withColumnRenamed("k", "k2"))
        .filter(col("k") === col("k2") &&
          col("p") >= col("lo") && col("p") <= col("hi"))
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = joined.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want)
    }
  }

  test("below the broadcast threshold the rule stands down (BNLJ is the better plan)") {
    // default threshold (10 MB) dwarfs these toy frames
    val joined = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
    val plan = joined.queryExecution.optimizedPlan.toString
    assert(!plan.contains("__rj_"),
      s"must not rewrite when a side broadcasts:\n$plan")
    assert(joined.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == groundTruth)
  }

  test("the rewrite can be disabled by conf") {
    noBroadcast {
      spark.conf.set("spark.graft.rangeJoin.enabled", "false")
      try {
        val plan = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
          .queryExecution.optimizedPlan.toString
        assert(!plan.contains("__rj_"))
      } finally spark.conf.unset("spark.graft.rangeJoin.enabled")
    }
  }

  test("timestamp band joins rewrite (r8 left them as nested loops)") {
    noBroadcast {
      val evs = (0L to 500L).map(i => (i, new java.sql.Timestamp(1700000000000L + i * 977000L)))
        .toDF("eid", "ts")
      val bands = Seq(
        (1L, new java.sql.Timestamp(1700000100000L), new java.sql.Timestamp(1700090000000L)),
        (2L, new java.sql.Timestamp(1700200000000L), new java.sql.Timestamp(1700200000000L)),
        (3L, new java.sql.Timestamp(1700350000123L), new java.sql.Timestamp(1700400000456L)))
        .toDF("bid", "t_lo", "t_hi")
      val joined = evs.join(bands, col("ts") >= col("t_lo") && col("ts") <= col("t_hi"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"timestamp band did not rewrite:\n$plan")
      val want = evs.crossJoin(bands)
        .filter(col("ts") >= col("t_lo") && col("ts") <= col("t_hi"))
        .select("eid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = joined.select("eid", "bid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want && want.nonEmpty)
    }
  }

  test("date band joins rewrite with the day grain") {
    noBroadcast {
      val days = (0 to 400).map(i => (i.toLong, java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong)))).toDF("did", "d")
      val spans = Seq(
        (1L, java.sql.Date.valueOf("2024-02-10"), java.sql.Date.valueOf("2024-03-05")),
        (2L, java.sql.Date.valueOf("2024-06-01"), java.sql.Date.valueOf("2024-06-01")),
        (3L, java.sql.Date.valueOf("2024-11-20"), java.sql.Date.valueOf("2025-01-15")))
        .toDF("sid", "d_lo", "d_hi")
      val joined = days.join(spans, col("d") >= col("d_lo") && col("d") <= col("d_hi"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"date band did not rewrite:\n$plan")
      val want = days.crossJoin(spans)
        .filter(col("d") >= col("d_lo") && col("d") <= col("d_hi"))
        .select("did", "sid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = joined.select("did", "sid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want && want.nonEmpty)
    }
  }

  test("oversized intervals take the sentinel arm — bounded fan-out, rows exact") {
    noBroadcast {
      // cap fan-out at 2 buckets: with grain 1024, iv 4 (width 2800)
      // and iv 2 (width 1600) overflow the cap and must fall back to
      // the salted sentinel ring instead of exploding real buckets
      spark.conf.set("spark.graft.rangeJoin.maxFanout", "2")
      spark.conf.set("spark.graft.rangeJoin.wideSalt", "4")
      try {
        val joined = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
          s"wide fallback must stay a hash join:\n$plan")
        val got = joined.select("pid", "iid").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        assert(got.toSet == groundTruth && got.length == got.toSet.size,
          "mixed narrow/wide intervals must still match exactly once per pair")
      } finally {
        spark.conf.unset("spark.graft.rangeJoin.maxFanout")
        spark.conf.unset("spark.graft.rangeJoin.wideSalt")
      }
    }
  }

  test("maxFanout <= 0 opts out of the sentinel arm (single probe row, unguarded explode)") {
    noBroadcast {
      spark.conf.set("spark.graft.rangeJoin.maxFanout", "-1")
      try {
        val joined = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
          s"opt-out must still rewrite:\n$plan")
        val got = joined.select("pid", "iid").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        assert(got.toSet == groundTruth && got.length == got.toSet.size)
      } finally spark.conf.unset("spark.graft.rangeJoin.maxFanout")
    }
  }

  test("floor division survives the Long extremes (no pmod-subtraction underflow)") {
    noBroadcast {
      // points within a partial grain of Long.MinValue: the r8 spelling
      // (c - pmod(c, g)) wrapped here and bucketed them wrongly
      val extremePts = Seq((1L, Long.MinValue + 5L), (2L, Long.MinValue + 2000L),
        (3L, Long.MaxValue - 3L), (4L, -1L), (5L, 0L)).toDF("pid", "p")
      val extremeIvs = Seq(
        (10L, Long.MinValue, Long.MinValue + 1500L),
        (11L, Long.MaxValue - 100L, Long.MaxValue),
        (12L, -5L, 5L)).toDF("iid", "lo", "hi")
      val joined = extremePts.join(extremeIvs,
        col("p") >= col("lo") && col("p") <= col("hi"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"rewrite did not fire:\n$plan")
      val got = joined.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 10L), (3L, 11L), (4L, 12L), (5L, 12L)))
    }
  }

  test("SQL spelling with BETWEEN rewrites too") {
    noBroadcast {
      pts.createOrReplaceTempView("rj_pts")
      ivs.createOrReplaceTempView("rj_ivs")
      val joined = spark.sql(
        "SELECT pid, iid FROM rj_pts JOIN rj_ivs ON p BETWEEN lo AND hi")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"BETWEEN did not rewrite:\n$plan")
      assert(joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == groundTruth)
    }
  }
}
