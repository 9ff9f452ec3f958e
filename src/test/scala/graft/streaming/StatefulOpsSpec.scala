package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class StatefulOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

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
