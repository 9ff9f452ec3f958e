package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state via flatMapGroupsWithState — the piece of the
  * streaming surface that windows can't express: arbitrary per-key
  * accumulators with explicit timeout-driven emission.
  *
  * The demo operator is a per-user activity profile (event count, value
  * sum, distinct event types, first/last seen) that EMITS when the
  * user goes quiet for the timeout — the streaming analog of "flush
  * the user's session summary after inactivity". State lives
  * partitioned by key across executors; at 100 TB of events the state
  * store scales horizontally and the timeout bounds its lifetime.
  */
object StatefulOps {
  case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)

  case class UserProfile(user_id: Long, n_events: Long, sum_value: Double,
                         n_types: Int, first_ts: Timestamp, last_ts: Timestamp)

  /** State buffer (public: the state-store encoder is codegen'd). */
  case class Acc(n: Long, sum: Double, types: Set[String],
                 first: Timestamp, last: Timestamp)

  /** Accumulate per-user; emit the profile on processing-time timeout
    * (user idle), then clear state. */
  def userProfiles(events: Dataset[Event], idleMs: Long = 5000L): Dataset[UserProfile] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Acc, UserProfile](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[Acc]) =>
          if (state.hasTimedOut) {
            val acc = state.get
            state.remove()
            Iterator.single(UserProfile(userId, acc.n, acc.sum, acc.types.size,
              acc.first, acc.last))
          } else {
            val prev = state.getOption.getOrElse(
              Acc(0L, 0.0, Set.empty, null, null))
            val acc = rows.foldLeft(prev) { (a, e) =>
              Acc(a.n + 1, a.sum + e.value, a.types + e.event_type,
                if (a.first == null || e.ts.before(a.first)) e.ts else a.first,
                if (a.last == null || e.ts.after(a.last)) e.ts else a.last)
            }
            state.update(acc)
            state.setTimeoutDuration(idleMs)
            Iterator.empty
          }
      }
  }
}
