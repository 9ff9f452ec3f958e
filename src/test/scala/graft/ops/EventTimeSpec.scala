package graft.ops

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class EventTimeSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel credits only in-order view -> click -> purchase progressions") {
    val events = Seq(
      // user 1: full ordered funnel
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "purchase"),
      // user 2: purchase BEFORE the view — must not count as stage 3
      (2L, ts("2024-01-01 09:00:00"), "purchase"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 10:05:00"), "click"),
      // user 3: click before view — stage stops at view
      (3L, ts("2024-01-01 09:00:00"), "click"),
      (3L, ts("2024-01-01 10:00:00"), "view"),
      // user 4: never viewed
      (4L, ts("2024-01-01 10:00:00"), "signup")
    ).toDF("user_id", "ts", "event_type")
    val out = EventTime.funnelOf(events).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("funnel_stage")).toMap
    assert(out == Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 0))
  }

  test("cohort retention counts a user once per week from their signup week on") {
    val events = Seq(
      // user 1 signs up Mon Jan 1 week, active weeks 0 and 2
      (1L, ts("2024-01-02 10:00:00"), "signup"),
      (1L, ts("2024-01-03 10:00:00"), "click"),
      (1L, ts("2024-01-16 10:00:00"), "view"),
      // user 2 same cohort, only week 0 (signup itself counts as activity)
      (2L, ts("2024-01-04 10:00:00"), "signup"),
      // user 3 later cohort, active week 1; pre-signup activity ignored
      (3L, ts("2024-01-01 10:00:00"), "click"),
      (3L, ts("2024-01-10 10:00:00"), "signup"),
      (3L, ts("2024-01-17 10:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val out = EventTime.cohortRetentionOf(events).collect()
      .map(r => (r.getAs[String]("cohort_week"), r.getAs[Int]("week_offset")) ->
        r.getAs[Long]("n_users")).toMap
    // weeks: 2024-01-01 and 2024-01-08 are Mondays
    assert(out == Map(
      ("2024-01-01 00:00:00", 0) -> 2L, // users 1+2 active in signup week
      ("2024-01-01 00:00:00", 2) -> 1L, // user 1 returns in week 2
      ("2024-01-08 00:00:00", 0) -> 1L, // user 3 signup week
      ("2024-01-08 00:00:00", 1) -> 1L  // user 3 returns next week
    ))
  }
}
