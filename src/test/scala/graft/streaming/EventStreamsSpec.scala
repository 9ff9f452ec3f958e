package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class EventStreamsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermark finalizes hourly windows and drops very-late events") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.hourlyCounts(events, watermark = "1 hour")
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("append").start()

    // batch 1: events in hour 10 and 11 -> watermark moves to 10:30
    input.addData((ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 10:20:00"), "click", 2.0),
      (ts("2024-01-01 11:30:00"), "view", 1.0))
    q.processAllAvailable()
    // batch 2: advance to 13:00 -> hours 10,11 finalize
    input.addData((ts("2024-01-01 13:00:00"), "click", 1.0))
    q.processAllAvailable()
    // batch 3: an event far behind the watermark (hour 10) is dropped
    input.addData((ts("2024-01-01 10:59:00"), "click", 99.0))
    q.processAllAvailable()
    input.addData((ts("2024-01-01 15:00:00"), "click", 1.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("hourly_out").collect()
      .map(r => (r.getAs[Timestamp]("window_start"), r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
    // hour 10 clicks finalized with the ON-TIME events only (sum 3.0, not 102)
    val h10 = out.filter(o => o._1 == ts("2024-01-01 10:00:00") && o._2 == "click")
    assert(h10.length == 1)
    assert(h10.head._3 == 2L && h10.head._4 == 3.0)
  }

  test("stream-stream interval join matches views inside the window only") {
    implicit val sqlCtx = spark.sqlContext
    val viewsIn = MemoryStream[(Timestamp, Long)]
    val purchasesIn = MemoryStream[(Timestamp, Long, Long)]
    val views = viewsIn.toDF().toDF("ts", "user_id")
    val purchases = purchasesIn.toDF().toDF("ts", "user_id", "event_id")
    val q = EventStreams.purchaseAttributionJoin(views, purchases,
      window = "2 hours", watermark = "1 hour")
      .writeStream.format("memory").queryName("attrib_out")
      .outputMode("append").start()

    viewsIn.addData(
      (ts("2024-01-01 08:30:00"), 1L), // inside the 2h window
      (ts("2024-01-01 09:59:00"), 1L), // inside
      (ts("2024-01-01 07:00:00"), 1L), // too old: 3h before
      (ts("2024-01-01 10:30:00"), 1L), // after the purchase
      (ts("2024-01-01 09:00:00"), 2L)) // other user
    purchasesIn.addData((ts("2024-01-01 10:00:00"), 1L, 100L))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("attrib_out")
      .select(col("user_id"), col("purchase_id"), col("view_ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2))).toSet
    assert(out == Set(
      (1L, 100L, ts("2024-01-01 08:30:00")),
      (1L, 100L, ts("2024-01-01 09:59:00"))),
      s"got $out")
  }

  test("interval-join state is retired behind the watermark (late view never joins)") {
    implicit val sqlCtx = spark.sqlContext
    val viewsIn = MemoryStream[(Timestamp, Long)]
    val purchasesIn = MemoryStream[(Timestamp, Long, Long)]
    val views = viewsIn.toDF().toDF("ts", "user_id")
    val purchases = purchasesIn.toDF().toDF("ts", "user_id", "event_id")
    val q = EventStreams.purchaseAttributionJoin(views, purchases,
      window = "1 hours", watermark = "30 minutes")
      .writeStream.format("memory").queryName("attrib_late_out")
      .outputMode("append").start()

    // advance both watermarks far past hour 10
    viewsIn.addData((ts("2024-01-01 15:00:00"), 9L))
    purchasesIn.addData((ts("2024-01-01 15:00:00"), 9L, 1L))
    q.processAllAvailable()
    // a view and purchase pair hours behind the watermark: the join
    // must not emit it (the state that could match it is retired)
    viewsIn.addData((ts("2024-01-01 09:50:00"), 1L))
    purchasesIn.addData((ts("2024-01-01 10:00:00"), 1L, 100L))
    q.processAllAvailable()
    q.stop()

    val late = spark.table("attrib_late_out")
      .filter(col("purchase_id") === 100L).count()
    assert(late == 0L, "behind-watermark rows must be dropped, not joined")
  }

  test("streaming sessionization merges events within the gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val events = input.toDF().toDF("ts", "user_id", "value")
    val q = EventStreams.sessionize(events, gap = "30 minutes", watermark = "1 hour")
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()

    input.addData(
      (ts("2024-01-01 09:00:00"), 1L, 1.0),
      (ts("2024-01-01 09:10:00"), 1L, 1.0), // same session
      (ts("2024-01-01 09:50:00"), 1L, 1.0), // 40-min gap -> new session
      (ts("2024-01-01 09:00:00"), 2L, 5.0))
    q.processAllAvailable()
    input.addData((ts("2024-01-01 12:00:00"), 9L, 0.0)) // advance watermark
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sessions_out")
      .select(col("user_id"), col("session_start"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(out.contains((1L, ts("2024-01-01 09:00:00"), 2L)))
    assert(out.contains((1L, ts("2024-01-01 09:50:00"), 1L)))
    assert(out.contains((2L, ts("2024-01-01 09:00:00"), 1L)))
  }

  test("left-outer join emits an unattributed purchase only after the " +
      "view watermark closes its window") {
    implicit val sqlCtx = spark.sqlContext
    val viewsIn = MemoryStream[(Timestamp, Long)]
    val purchasesIn = MemoryStream[(Timestamp, Long, Long)]
    val views = viewsIn.toDF().toDF("ts", "user_id")
    val purchases = purchasesIn.toDF().toDF("ts", "user_id", "event_id")
    val q = EventStreams.unattributedPurchases(views, purchases,
      window = "1 hours", watermark = "30 minutes")
      .writeStream.format("memory").queryName("organic_out")
      .outputMode("append").start()

    // batch 1: purchase 100 has a view inside its window (attributed);
    // purchase 200 has none — but it must NOT emit yet: a qualifying
    // view could still arrive until the view watermark passes 10:30
    viewsIn.addData((ts("2024-01-01 10:00:00"), 1L))
    purchasesIn.addData(
      (ts("2024-01-01 10:15:00"), 1L, 100L),
      (ts("2024-01-01 10:30:00"), 2L, 200L))
    q.processAllAvailable()
    val early = spark.table("organic_out").count()
    assert(early == 0L,
      s"nothing may emit while the window is still open (got $early rows)")

    // batch 2: advance BOTH watermarks far past the windows — the
    // unmatched purchase's null-extended row is now provably final
    viewsIn.addData((ts("2024-01-01 15:00:00"), 9L))
    purchasesIn.addData((ts("2024-01-01 15:00:00"), 9L, 999L))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("organic_out")
      .select(col("user_id"), col("purchase_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((2L, 200L)), s"unmatched purchase must surface: $out")
    assert(!out.exists(_._2 == 100L), "attributed purchase must never surface")
  }
}
