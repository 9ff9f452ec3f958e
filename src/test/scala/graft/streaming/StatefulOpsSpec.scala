package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class StatefulOpsSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  private def ts(s: String) = Timestamp.valueOf(s)

  test("StreamAudit records state size and bounded watermark lag over a 3-batch replay") {
    val root = tmpDir("aud")
    val eventsDir = s"$root/events"
    val auditPath = s"$root/audit.jsonl"
    // three parquet files, one event-hour apart; maxFilesPerTrigger=1
    // makes each file its own micro-batch (a 3-batch replay)
    for (h <- Seq(9, 10, 11))
      Seq((h.toLong, ts(f"2024-01-01 $h%02d:10:00"), "click", 1.0),
        (h.toLong, ts(f"2024-01-01 $h%02d:40:00"), "view", 2.0))
        .toDF("user_id", "ts", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(eventsDir)
    val audit = StreamAudit.attach(spark, auditPath)
    try {
      val stream = spark.readStream
        .schema("user_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE")
        .option("maxFilesPerTrigger", "1").parquet(eventsDir)
      EventStreams.hourlyCounts(stream, watermark = "2 hours")
        .writeStream.format("memory").queryName("audited_hourly")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
      assert(StreamAudit.awaitLines(auditPath, "audited_hourly", 3),
        "expected 3 audited batches")
      val m = StreamAudit.metrics(spark, auditPath)
        .filter(col("query") === "audited_hourly")
        .orderBy("batch_id").collect()
      assert(m.length >= 3, s"batches recorded: ${m.length}")
      // the windowed agg holds open-window state between batches
      assert(m.exists(_.getAs[Long]("state_rows") > 0),
        "state-store rows never observed")
      assert(m.exists(_.getAs[Long]("state_bytes") > 0),
        "state-store bytes never observed")
      // watermark advances monotonically across the replay
      val wms = m.flatMap(r =>
        Option(r.getAs[java.lang.Long]("watermark_ms")).map(_.longValue))
      assert(wms.sameElements(wms.sorted), s"watermark retreated: ${wms.toSeq}")
      // and its lag vs max event time is bounded: 2 h delay + 1 h
      // inter-batch advance (first batches, epoch watermark, excluded)
      val lags = m
        .filter(r => Option(r.getAs[java.lang.Long]("watermark_ms")).exists(_ > 0L))
        .flatMap(r =>
          Option(r.getAs[java.lang.Long]("watermark_lag_ms")).map(_.longValue))
      assert(lags.nonEmpty, "no post-warmup watermark lag measurements")
      assert(lags.forall(l => l >= 0L && l <= 3L * 3600 * 1000 + 1000),
        s"watermark lag unbounded: ${lags.toSeq}")
    } finally audit.detach()
  }

  test("flatMapGroupsWithState emits a user profile after idle timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StatefulOps.Event]
    // NOTE: with ProcessingTimeTimeout the engine always schedules
    // another batch (timeouts may fire), so processAllAvailable()
    // would block forever — poll the sink instead.
    val q = StatefulOps.userProfiles(input.toDS(), idleMs = 1000L)
      .writeStream.format("memory").queryName("profiles_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()

    input.addData(
      StatefulOps.Event(1L, ts("2024-01-01 09:00:00"), "click", 1.0),
      StatefulOps.Event(1L, ts("2024-01-01 09:01:00"), "view", 2.0),
      StatefulOps.Event(1L, ts("2024-01-01 09:02:00"), "click", 3.0))

    val deadline = System.currentTimeMillis() + 60000L
    def emitted() = spark.table("profiles_out")
      .as[StatefulOps.UserProfile].collect().filter(_.user_id == 1L)
    var profiles = emitted()
    while (profiles.isEmpty && System.currentTimeMillis() < deadline) {
      Thread.sleep(250L)
      profiles = emitted()
    }
    q.stop()

    assert(profiles.length == 1, "profile should emit once after idle timeout")
    val p = profiles.head
    assert(p.n_events == 3 && p.sum_value == 6.0 && p.n_types == 2)
    assert(p.first_ts == ts("2024-01-01 09:00:00"))
    assert(p.last_ts == ts("2024-01-01 09:02:00"))
  }
}
