package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming as-of-with-tolerance contract, mirroring
  * StreamingWalletSpec's discipline: (1) watermark-bounded emission —
  * nothing may surface while a fresher view could still arrive;
  * (2) full-corpus batch parity — the sf0.001 events replayed through
  * the join→agg chain in two time-split micro-batches land on exactly
  * the batch q89 row set. */
class StreamingAsofSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("emission is watermark-bounded and picks the LATEST fresh view") {
    implicit val sqlCtx = spark.sqlContext
    val viewsIn = MemoryStream[(Timestamp, Long)]
    val purchasesIn = MemoryStream[(Timestamp, Long, Long)]
    val views = viewsIn.toDF().toDF("ts", "user_id")
    val purchases = purchasesIn.toDF().toDF("ts", "user_id", "event_id")
    val q = StreamingAsof.asofViewBeforePurchase(views, purchases,
      toleranceMinutes = 30L, watermark = "30 minutes")
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    try {
      // user 1: views at 09:40 and 09:50, purchase at 10:00 — the
      // 09:50 view must win. user 2: purchase at 10:00 with only a
      // STALE 09:00 view — outside the 30-min tolerance, NULL row.
      viewsIn.addData(
        (ts("2024-01-01 09:40:00"), 1L),
        (ts("2024-01-01 09:50:00"), 1L),
        (ts("2024-01-01 09:00:00"), 2L))
      purchasesIn.addData(
        (ts("2024-01-01 10:00:00"), 1L, 100L),
        (ts("2024-01-01 10:00:00"), 2L, 200L))
      q.processAllAvailable()
      // nothing finalizes yet: a fresher view (or first fresh view for
      // user 2) could still arrive until the watermark passes
      assert(spark.table("asof_out").count() == 0L,
        "rows emitted while their windows were still open")

      // advance both watermarks far past the purchases
      viewsIn.addData((ts("2024-01-01 15:00:00"), 9L))
      purchasesIn.addData((ts("2024-01-01 15:00:00"), 9L, 999L))
      q.processAllAvailable()
      val out = spark.table("asof_out")
        .filter(col("purchase_id") < 999L)
        .collect().map(r => (r.getAs[Long]("user_id"),
          r.getAs[Long]("purchase_id"), r.getAs[String]("view_ts"),
          r.getAs[java.lang.Double]("staleness_min"))).toSet
      assert(out == Set(
        (1L, 100L, "2024-01-01 09:50:00", java.lang.Double.valueOf(10.0)),
        (2L, 200L, null, null)), s"got $out")
    } finally q.stop()
  }

  test("two-batch replay of sf0.001 equals batch q89") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val mid = ev.map(_._2.getTime).sorted.apply(ev.length / 2)
    val sentinelTs = new Timestamp(ev.map(_._2.getTime).max + 30L * 86400000L)

    val viewsIn = MemoryStream[(Timestamp, Long)]
    val purchasesIn = MemoryStream[(Timestamp, Long, Long)]
    val views = viewsIn.toDF().toDF("ts", "user_id")
    val purchases = purchasesIn.toDF().toDF("ts", "user_id", "event_id")
    val q = StreamingAsof.asofViewBeforePurchase(views, purchases)
      .writeStream.format("memory").queryName("asof_parity")
      .outputMode("append").start()
    try {
      def feed(pred: ((Long, Timestamp, Long, String)) => Boolean): Unit = {
        val slice = ev.filter(pred)
        val vs = slice.filter(_._4 == "view").map(e => (e._2, e._1))
        val ps = slice.filter(_._4 == "purchase").map(e => (e._2, e._1, e._3))
        if (vs.nonEmpty) viewsIn.addData(vs.toSeq: _*)
        if (ps.nonEmpty) purchasesIn.addData(ps.toSeq: _*)
        q.processAllAvailable()
      }
      feed(e => e._2.getTime <= mid)
      feed(e => e._2.getTime > mid)
      // sentinels push both watermarks past every real event so all
      // outstanding groups finalize
      viewsIn.addData((sentinelTs, -1L))
      purchasesIn.addData((sentinelTs, -1L, -1L))
      q.processAllAvailable()

      val got = spark.table("asof_parity")
        .filter(col("user_id") =!= -1L)
        .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
          col("view_ts"), col("staleness_min"))
        .collect().map(_.toSeq).toSet
      val want = graft.ops.EventTime.asofWithTolerance(spark, sf)
        .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
          col("view_ts"), col("staleness_min"))
        .collect().map(_.toSeq).toSet
      assert(want.nonEmpty)
      assert(got == want,
        s"stream/batch divergence: missing=${(want -- got).take(3)} " +
          s"extra=${(got -- want).take(3)}")
    } finally q.stop()
  }
}
