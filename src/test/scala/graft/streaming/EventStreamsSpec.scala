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
}
