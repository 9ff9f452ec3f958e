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

  test("session transitions count adjacent pairs within sessions only") {
    val events = Seq(
      // user 1, session A: view -> click -> purchase
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, 2L, ts("2024-01-01 10:05:00"), "click"),
      (1L, 3L, ts("2024-01-01 10:10:00"), "purchase"),
      // 40-minute gap: new session — purchase->view must NOT count
      (1L, 4L, ts("2024-01-01 10:50:00"), "view"),
      (1L, 5L, ts("2024-01-01 10:55:00"), "click"),
      // exactly 30 minutes of silence also opens a new session
      (1L, 6L, ts("2024-01-01 11:25:00"), "view"),
      // user 2: single-event session contributes no transition
      (2L, 7L, ts("2024-01-01 09:00:00"), "view")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = EventTime.sessionTransitionsOf(events).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_transitions"))
      .toMap
    assert(got == Map(
      ("view", "click") -> 2L,
      ("click", "purchase") -> 1L))
  }

  test("error bursts flag dense-error sessions only, per session window") {
    val events = Seq(
      // user 1, session A: 4 events, 3 errors -> burst
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, 2L, ts("2024-01-01 10:01:00"), "error"),
      (1L, 3L, ts("2024-01-01 10:02:00"), "error"),
      (1L, 4L, ts("2024-01-01 10:03:00"), "error"),
      // user 1, session B (after the 30-min gap): 1 error in 3 -> no burst
      (1L, 5L, ts("2024-01-01 12:00:00"), "error"),
      (1L, 6L, ts("2024-01-01 12:01:00"), "view"),
      (1L, 7L, ts("2024-01-01 12:02:00"), "click"),
      // user 2: error-free session -> absent from the report
      (2L, 8L, ts("2024-01-01 10:00:00"), "view")
    ).map { case (u, e, t, ty) => (e, t, u, ty, 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    import org.apache.spark.sql.functions.{col, session_window, count, lit, sum, when, date_format}
    // replay the registered query's expression chain on the synthetic frame
    val out = events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"))
      .filter(col("n_errors") >= 1)
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), col("n_errors"),
        (col("n_errors") >= 3 && col("n_errors") * 2 >= col("n_events")).as("is_burst"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("session_start")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_errors"), r.getAs[Boolean]("is_burst")))
      .toMap
    assert(out.size == 2, s"expected two error sessions, got $out")
    assert(out((1L, "2024-01-01 10:00:00")) == ((4L, 3L, true)))
    assert(out((1L, "2024-01-01 12:00:00")) == ((3L, 1L, false)))
  }

  test("session concurrency: sweep counts overlaps, not touches, across days") {
    val events = Seq(
      // user 1: one session [10:00, 10:40) (two events, 10-min gap)
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:10:00")),
      // user 2: [10:20, 10:50) — overlaps user 1 => concurrency 2
      (2L, ts("2024-01-01 10:20:00")),
      // user 3: [11:00, 11:30); user 4 starts at 11:30 EXACTLY —
      // touching sessions must not overlap (end sorts before start)
      (3L, ts("2024-01-01 11:00:00")),
      (4L, ts("2024-01-01 11:30:00")),
      // user 5: [23:50, 00:20 next day) — day-boundary carry-in;
      // user 6 starts 00:10 while 5 is still open => concurrency 2
      (5L, ts("2024-01-01 23:50:00")),
      (6L, ts("2024-01-02 00:10:00"))
    ).toDF("user_id", "ts")
    val out = EventTime.sessionConcurrencyOf(events).collect()
      .map(r => r.getAs[String]("hour") ->
        (r.getAs[Long]("max_concurrent"), r.getAs[Long]("n_starts"),
          r.getAs[Long]("n_ends"))).toMap
    assert(out("2024-01-01 10:00:00") == (2L, 2L, 2L)) // 1+2 overlap; both end in-hour
    assert(out("2024-01-01 11:00:00") == (1L, 2L, 1L)) // touch at 11:30 stays 1
    assert(out("2024-01-01 12:00:00") == (0L, 0L, 1L)) // user 4 ends at 12:00
    assert(out("2024-01-01 23:00:00") == (1L, 1L, 0L))
    assert(out("2024-01-02 00:00:00") == (2L, 1L, 2L)) // carry-in + user 6
    // conservation: every started session ends
    val (starts, ends) = (out.values.map(_._2).sum, out.values.map(_._3).sum)
    assert(starts == 6L && ends == 6L)
  }

  test("purchase attribution counts views/clicks in [-2h, purchase) per user") {
    val events = Seq(
      // user 1: views at exactly -2h (in), -1s (in), and AT purchase (out)
      (1L, 10L, ts("2024-01-01 08:00:00"), "view"),
      (1L, 11L, ts("2024-01-01 09:59:59"), "view"),
      (1L, 12L, ts("2024-01-01 10:00:00"), "view"),
      (1L, 13L, ts("2024-01-01 09:30:00"), "click"),
      (1L, 14L, ts("2024-01-01 10:00:00"), "purchase"),
      // view just OUTSIDE the window (2h + 1s before)
      (1L, 15L, ts("2024-01-01 07:59:59"), "view"),
      // user 2's activity must not leak into user 1's window
      (2L, 20L, ts("2024-01-01 09:45:00"), "view"),
      (2L, 21L, ts("2024-01-01 11:00:00"), "purchase"),
      // purchase with no prior activity => zero counts
      (3L, 30L, ts("2024-01-01 12:00:00"), "purchase")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = EventTime.purchaseAttributionOf(events).collect()
      .map(r => r.getAs[Long]("purchase_id") ->
        (r.getAs[Long]("n_views_2h"), r.getAs[Long]("n_clicks_2h"))).toMap
    assert(out == Map(14L -> (2L, 1L), 21L -> (1L, 0L), 30L -> (0L, 0L)))
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

  test("gap fill emits a dense per-user hourly spine with forward-filled values") {
    val events = Seq(
      // user 1, hour 10: two events (sum 5.0); hours 11-12 silent;
      // hour 13 observed again — the fill must carry 5.0 across the gap
      (1L, ts("2024-01-01 10:15:00"), 2.0),
      (1L, ts("2024-01-01 10:45:00"), 3.0),
      (1L, ts("2024-01-01 13:05:00"), 7.0),
      // user 2: a single hour — spine of exactly one row, no fill rows
      (2L, ts("2024-01-02 00:30:00"), 1.0)
    ).toDF("user_id", "ts", "value")
    val out = EventTime.hourlyGapFillOf(events).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("hour_start")) ->
        ((r.getAs[Int]("observed"), r.getAs[Long]("n_events"),
          r.getAs[Double]("filled_value"))))
      .toMap
    assert(out.size == 5, s"spine must be dense min..max per user: $out")
    assert(out((1L, "2024-01-01 10:00:00")) == ((1, 2L, 5.0)))
    assert(out((1L, "2024-01-01 11:00:00")) == ((0, 0L, 5.0)))
    assert(out((1L, "2024-01-01 12:00:00")) == ((0, 0L, 5.0)))
    assert(out((1L, "2024-01-01 13:00:00")) == ((1, 1L, 7.0)))
    assert(out((2L, "2024-01-02 00:00:00")) == ((1, 1L, 1.0)))
  }

  test("activity streaks: islands split on missing days; earliest start wins length ties") {
    val events = Seq(
      // user 1: days 1-3 (streak of 3), day 6 (streak of 1),
      // days 8-10 (streak of 3 again — the TIE; day 1 must win as start).
      // Day 2 has two events: distinct-day dedup must count it once.
      (1L, ts("2024-01-01 09:00:00"), 1.0),
      (1L, ts("2024-01-02 09:00:00"), 1.0),
      (1L, ts("2024-01-02 18:00:00"), 1.0),
      (1L, ts("2024-01-03 09:00:00"), 1.0),
      (1L, ts("2024-01-06 09:00:00"), 1.0),
      (1L, ts("2024-01-08 09:00:00"), 1.0),
      (1L, ts("2024-01-09 09:00:00"), 1.0),
      (1L, ts("2024-01-10 09:00:00"), 1.0),
      // user 2: one active day
      (2L, ts("2024-03-05 12:00:00"), 1.0)
    ).toDF("user_id", "ts", "value")
    val out = EventTime.activityStreaksOf(events).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_active_days"), r.getAs[Long]("n_streaks"),
          r.getAs[Long]("longest_streak"), r.getAs[String]("longest_start"))))
      .toMap
    assert(out(1L) == ((7L, 3L, 3L, "2024-01-01")))
    assert(out(2L) == ((1L, 1L, 1L, "2024-03-05")))
  }

  test("rolling 7-day active users: contribution explode equals the naive window count") {
    val events = Seq(
      // user 1 active on days 1 and 5; user 2 on day 3; user 3 on days 1,2
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-05 10:00:00"), 1.0),
      (1L, ts("2024-01-05 11:00:00"), 1.0), // same day twice: counts once
      (2L, ts("2024-01-03 10:00:00"), 1.0),
      (3L, ts("2024-01-01 10:00:00"), 1.0),
      (3L, ts("2024-01-02 10:00:00"), 1.0)
    ).toDF("user_id", "ts", "value")
    val out = EventTime.rollingActiveUsersOf(events).collect()
      .map(r => r.getAs[String]("win_end") -> r.getAs[Long]("active_7d")).toMap
    // naive oracle: for each day in [min, max], distinct users active
    // in [day-6, day]
    val active = Map(1L -> Set(1, 5), 2L -> Set(3), 3L -> Set(1, 2))
    val want = (1 to 5).map { day =>
      f"2024-01-0$day" -> active.count { case (_, ds) =>
        ds.exists(a => a <= day && a >= day - 6) }.toLong
    }.toMap
    assert(out == want, s"got $out want $want")
    // spot values: day 1 sees users 1+3; day 5 sees all three (1 active
    // day 5, 2 active day 3, 3 active days 1-2 — all within 7 days)
    assert(out("2024-01-01") == 2L && out("2024-01-05") == 3L)
  }

  test("recency weights: exact power-of-two half-life algebra, capped at 2^20") {
    val events = Seq(
      // anchor day is the corpus max: 2024-06-01 (user 9's event)
      (1L, ts("2024-06-01 10:00:00"), 1.0), // age 0 days  -> wk 0  -> 1000000
      (1L, ts("2024-05-31 10:00:00"), 1.0), // age 1 day   -> wk 0  -> 1000000
      (1L, ts("2024-05-25 10:00:00"), 1.0), // age 7 days  -> wk 1  -> 500000
      (2L, ts("2024-05-18 10:00:00"), 1.0), // age 14 days -> wk 2  -> 250000
      (2L, ts("2024-04-20 10:00:00"), 1.0), // age 42 days -> wk 6  -> 15625
      (3L, ts("2014-06-01 10:00:00"), 1.0), // ~10 years   -> wk 20 -> 0 (div 2^20)
      (9L, ts("2024-06-01 23:00:00"), 1.0)  // the anchor-setting event
    ).toDF("user_id", "ts", "value")
    val out = EventTime.recencyWeightsOf(events).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("score_ppm"),
          r.getAs[String]("last_day")))).toMap
    assert(out(1L) == ((3L, 2500000L, "2024-06-01")))
    assert(out(2L) == ((2L, 265625L, "2024-05-18")))
    assert(out(3L) == ((1L, 0L, "2014-06-01")),
      "the cap must round decade-old mass to exactly zero ppm")
    assert(out(9L) == ((1L, 1000000L, "2024-06-01")))
    // ranked by score desc, user_id asc
    val order = EventTime.recencyWeightsOf(events).collect()
      .map(_.getAs[Long]("user_id")).toSeq
    assert(order == Seq(1L, 9L, 2L, 3L))
  }

  test("gap fill and streaks ride ONE shuffle of the events scan") {
    // the scale claim in both scaladocs: hash(user_id) from the explicit
    // repartition satisfies every downstream clustering (aggs, windows,
    // spine join), so exactly one ShuffleExchange appears in the plan —
    // a second one would mean a full re-exchange of the fact table.
    // Broadcast joins are disabled for the check: at test scale Spark
    // happily broadcasts the observation side of q119's spine join
    // (recomputing its lineage on the build side), but 100 TB is the
    // regime under audit and there the join must co-locate on the one
    // existing exchange, which is exactly what this pins.
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(thresholdKey)
    spark.conf.set(thresholdKey, "-1")
    try {
      for (name <- Seq("q119_hourly_gap_fill", "q121_activity_streaks")) {
        val plan = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
          .queryExecution.executedPlan.toString
        val exchanges = plan.linesIterator.count(l =>
          l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
        assert(exchanges == 1, s"$name: want 1 hash exchange, got $exchanges:\n$plan")
      }
    } finally spark.conf.set(thresholdKey, saved)
  }

  test("r16 fold kernels == the r15 HOF spellings (wallet, debounce), per user") {
    import org.apache.spark.sql.types.{DecimalType, LongType}
    val sf = "/root/testdata/sf0.001"
    val evs = graft.Tables.events(spark, sf)
    val cents = (col("value").cast(DecimalType(18, 2)) * 100)
      .cast(DecimalType(18, 0)).cast(LongType)
    val delta = when(col("event_type").isin("purchase", "signup"), cents)
      .otherwise(-cents)
    // wallet: kernel over the UNSORTED collect vs the verbatim r15
    // aggregate-over-array_sort spelling
    val base = evs
      .select(col("user_id"), col("ts"), col("event_id"), delta.as("delta"))
      .groupBy(col("user_id"))
      .agg(collect_list(struct(col("ts"), col("event_id"), col("delta"))).as("raw"))
      .withColumn("sorted", array_sort(col("raw")))
    val hof = expr("""aggregate(sorted,
        named_struct('bal', CAST(0 AS BIGINT), 'floors', CAST(0 AS BIGINT)),
        (st, e) -> named_struct(
          'bal', greatest(st.bal + e.delta, CAST(0 AS BIGINT)),
          'floors', st.floors + CASE WHEN st.bal + e.delta < 0
                                     THEN CAST(1 AS BIGINT)
                                     ELSE CAST(0 AS BIGINT) END))""")
    val bad = base.select(
        graft.functions.FoldOps.wallet_fold(col("raw")).as("k"), hof.as("h"))
      .filter(!(col("k.bal") <=> col("h.bal") &&
        col("k.floors") <=> col("h.floors"))).count()
    assert(bad == 0L, "wallet_fold diverged from the HOF spelling")
    // debounce: same comparison for the refractory chain
    val dbase = evs
      .select(col("user_id"), unix_micros(col("ts")).as("tsm"), col("event_id"))
      .groupBy(col("user_id"))
      .agg(collect_list(struct(col("tsm"), col("event_id"))).as("raw"))
      .withColumn("sorted", array_sort(col("raw")))
    val dhof = expr(s"""aggregate(sorted,
        named_struct('last_kept', CAST(0 AS BIGINT),
                     'n_kept', CAST(0 AS BIGINT),
                     'first_kept', CAST(0 AS BIGINT)),
        (st, e) -> CASE
          WHEN st.n_kept = 0 OR e.tsm - st.last_kept >= ${EventTime.debounceGapUs}L
          THEN named_struct('last_kept', e.tsm,
            'n_kept', st.n_kept + 1L,
            'first_kept', CASE WHEN st.n_kept = 0 THEN e.tsm
                               ELSE st.first_kept END)
          ELSE st END)""")
    val dbad = dbase.select(
        graft.functions.FoldOps.debounce_fold(col("raw"),
          EventTime.debounceGapUs).as("k"), dhof.as("h"))
      .filter(!(col("k.last_kept") <=> col("h.last_kept") &&
        col("k.n_kept") <=> col("h.n_kept") &&
        col("k.first_kept") <=> col("h.first_kept"))).count()
    assert(dbad == 0L, "debounce_fold diverged from the HOF spelling")
  }

  test("q147 capped wallet equals a driver-side sequential replay") {
    import org.apache.spark.sql.functions._
    val sfd = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q147_capped_wallet")(spark, sfd).collect()
    assert(rows.nonEmpty)
    val raw = graft.Tables.events(spark, sfd)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("ts"),
        r.getAs[Long]("event_id"),
        if (Set("purchase", "signup")(r.getAs[String]("event_type")))
          r.getAs[Long]("cents") else -r.getAs[Long]("cents")))
    val want = raw.groupBy(_._1).map { case (u, evs) =>
      // full-precision timestamp key: getTime truncates to millis and
      // would mis-order micro-separated events
      def tsKey(t: java.sql.Timestamp): Long =
        math.floorDiv(t.getTime, 1000L) * 1000000000L + t.getNanos
      val ordered = evs.sortBy(e => (tsKey(e._2), e._3)).map(_._4)
      var bal = 0L; var floors = 0L
      ordered.foreach { d =>
        if (bal + d < 0) { floors += 1; bal = 0 } else bal += d
      }
      u -> ((bal, floors, ordered.length))
    }
    assert(rows.length == want.size)
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val got = (r.getAs[Long]("final_balance_cents"), r.getAs[Long]("n_floor_hits"),
        r.getAs[Int]("n_events"))
      assert(got == want(u), s"user $u: got $got want ${want(u)}")
    }
    // the fold genuinely clips somewhere on this corpus — otherwise
    // the capped semantics are untested
    assert(rows.map(_.getAs[Long]("n_floor_hits")).sum > 0)
  }

  test("q173 debounce equals a driver-side replay of the refractory chain") {
    val sf = "/root/testdata/sf0.001"
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("tsm"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = evs.groupBy(_._1).map { case (u, es) =>
      val sorted = es.map(e => (e._2, e._3)).sorted
      var (lastKept, nKept, firstKept) = (0L, 0L, 0L)
      sorted.foreach { case (tsm, _) =>
        if (nKept == 0 || tsm - lastKept >= EventTime.debounceGapUs) {
          if (nKept == 0) firstKept = tsm
          lastKept = tsm; nKept += 1
        }
      }
      u -> (es.length, nKept, firstKept, lastKept)
    }
    val rows = graft.SparkEntry.queries("q173_event_debounce")(spark, sf).collect()
    assert(rows.length == want.size)
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val got = (r.getAs[Int]("n_events"), r.getAs[Long]("n_kept"),
        r.getAs[Long]("first_kept_us"), r.getAs[Long]("last_kept_us"))
      assert(got == want(u), s"user $u: got $got want ${want(u)}")
    }
    // the refractory gap genuinely suppresses something on this corpus
    assert(rows.map(r => r.getAs[Int]("n_events").toLong - r.getAs[Long]("n_kept")).sum > 0)
  }

  test("q186 absorption probabilities equal a driver-side matrix iteration") {
    val sf = "/root/testdata/sf0.001"
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("tsm"), col("event_id"),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = evs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val tys = es.map(e => (e._2, e._3, e._4)).sortBy(t => (t._1, t._2)).map(_._3)
      tys.sliding(2).filter(_.length == 2).map(p => (p(0), p(1)))
    }.groupBy(identity).map { case (p, ps) => p -> ps.size.toLong }
    val types = (trans.keys.map(_._1) ++ trans.keys.map(_._2)).toSeq.distinct.sorted
    val tot = trans.groupBy(_._1._1).map { case (s2, m) => s2 -> m.values.sum }
    var p = types.map(t => t -> (if (t == "purchase") 1000000L else 0L)).toMap
    for (_ <- 1 to EventTime.absorptionSteps) {
      p = types.map { t =>
        t -> (if (t == "purchase") 1000000L
        else {
          val np = types.map(n => trans.getOrElse((t, n), 0L) * p(n)).sum
          tot.get(t).map(np / _).getOrElse(0L)
        })
      }.toMap
    }
    val got = graft.SparkEntry.queries("q186_conversion_absorption")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("p5_micro"))
      .toMap
    assert(got == p, s"got $got want $p")
    // absorbing state fixed; every transient state has nonzero 5-step
    // conversion probability on this corpus
    assert(got("purchase") == 1000000L)
    assert(got.filterNot(_._1 == "purchase").values.forall(v => v > 0 && v < 1000000L))
  }

  test("q180 time-weighted balance equals a driver-side replay") {
    val sf = "/root/testdata/sf0.001"
    val cents = (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
      .cast(org.apache.spark.sql.types.DecimalType(18, 0)).cast("long")
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("tsm"), col("event_id"),
        when(col("event_type").isin("purchase", "signup"), cents)
          .otherwise(-cents).as("delta"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = evs.groupBy(_._1).map { case (u, es) =>
      var (bal, area, last, span, n) = (0L, 0L, 0L, 0L, 0L)
      es.map(e => (e._2, e._3, e._4)).sorted.foreach { case (tsm, _, d) =>
        if (n > 0) { val g = (tsm - last) / 1000L; area += bal * g; span += g }
        bal = math.max(bal + d, 0L); last = tsm; n += 1
      }
      u -> (n, bal, span, area, if (span > 0) area / span else bal)
    }
    val rows = graft.SparkEntry.queries("q180_time_weighted_balance")(spark, sf)
      .collect()
    assert(rows.length == want.size)
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val got = (r.getAs[Int]("n_events").toLong,
        r.getAs[Long]("final_balance_cents"), r.getAs[Long]("span_ms"),
        r.getAs[Long]("area_cent_ms"), r.getAs[Long]("twab_cents"))
      assert(got == want(u), s"user $u: got $got want ${want(u)}")
    }
    // non-vacuous: some user's TWAB differs from both the final
    // balance and the per-event mean (holding time genuinely weights)
    assert(want.values.exists { case (_, bal, span, _, twab) =>
      span > 0 && twab != bal })
  }

  test("q177 multi-touch attribution equals a driver-side replay") {
    val sf = "/root/testdata/sf0.001"
    val cents = (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
      .cast(org.apache.spark.sql.types.DecimalType(18, 0)).cast("long")
    val evs = graft.Tables.events(spark, sf)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), unix_micros(col("ts")).as("tsm"), col("event_id"),
        col("event_type"), cents.as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    val byUser = evs.groupBy(_._1)
    val agg = scala.collection.mutable.Map[String, (Long, Set[Long], Long, Long, Long)]()
      .withDefaultValue((0L, Set.empty, 0L, 0L, 0L))
    var (noneN, noneV) = (0L, 0L)
    for ((u, es) <- byUser; (_, ptsm, pid, ptype, v) <- es if ptype == "purchase") {
      val touches = es.filter(e => e._4 != "purchase" &&
          e._2 >= ptsm - 7200000000L && e._2 < ptsm)
        .sortBy(e => (e._2, e._3))
      val k = touches.length.toLong
      if (k == 0) { noneN += 1; noneV += v }
      else touches.zipWithIndex.foreach { case (t, i) =>
        val idx = i + 1
        val credit = v / k + (if (idx <= v % k) 1L else 0L)
        val (n, ps, lin, fst, lst) = agg(t._4)
        agg(t._4) = (n + 1, ps + pid, lin + credit,
          fst + (if (idx == 1) v else 0L), lst + (if (idx == k) v else 0L))
      }
    }
    val rows = graft.SparkEntry.queries("q177_multitouch_attribution")(spark, sf)
      .collect()
    val got = rows.map(r => r.getAs[String]("touch_type") ->
      (r.getAs[Long]("n_attributions"), r.getAs[Long]("n_purchases"),
        r.getAs[Long]("linear_cents"), r.getAs[Long]("first_cents"),
        r.getAs[Long]("last_cents"))).toMap
    assert(got("(none)") == ((0L, noneN, noneV, noneV, noneV)))
    agg.foreach { case (ty, (n, ps, lin, fst, lst)) =>
      assert(got(ty) == ((n, ps.size.toLong, lin, fst, lst)), s"type $ty")
    }
    assert(got.size == agg.size + 1)
    // linear credits reconcile to attributed purchase value exactly
    // (the largest-remainder split loses no cents)
    val attributedV = byUser.values.flatten.filter(_._4 == "purchase")
      .map(_._5).sum - noneV
    assert(agg.values.map(_._3).sum == attributedV)
  }

  test("q175 FIFO lots equal a driver-side literal queue replay") {
    val sf = "/root/testdata/sf0.001"
    val cents = (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
      .cast(org.apache.spark.sql.types.DecimalType(18, 0)).cast("long")
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("tsm"), col("event_id"),
        when(col("event_type").isin("purchase", "signup"), cents)
          .otherwise(-cents).as("delta"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // the algorithm the Spark side avoids: a literal FIFO lot queue
    val want = evs.groupBy(_._1).map { case (u, es) =>
      var lots = Vector[(Long, Long)]() // (tsm, rem)
      var (short, nLots, granted) = (0L, 0L, 0L)
      es.map(e => (e._2, e._3, e._4)).sorted.foreach { case (tsm, _, delta) =>
        if (delta > 0) { lots :+= (tsm, delta); nLots += 1; granted += delta }
        else if (delta < 0) {
          var need = -delta
          val avail = lots.map(_._2).sum
          if (need > avail) short += 1
          while (need > 0 && lots.nonEmpty) {
            val (t, rem) = lots.head
            if (rem <= need) { need -= rem; lots = lots.tail }
            else { lots = (t, rem - need) +: lots.tail; need = 0 }
          }
        }
      }
      val remaining = lots.map(_._2).sum
      u -> (nLots, granted, granted - remaining, nLots - lots.length,
        lots.length.toLong, lots.headOption.map(_._1), remaining, short)
    }

    val rows = graft.SparkEntry.queries("q175_fifo_lots")(spark, sf).collect()
    assert(rows.length == want.size)
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val got = (r.getAs[Long]("n_lots"), r.getAs[Long]("granted_cents"),
        r.getAs[Long]("consumed_cents"), r.getAs[Long]("n_exhausted"),
        r.getAs[Long]("n_open"),
        Option(r.getAs[java.lang.Long]("fifo_frontier_us")).map(_.toLong),
        r.getAs[Long]("remaining_cents"), r.getAs[Long]("n_shortfalls"))
      assert(got == want(u), s"user $u: got $got want ${want(u)}")
    }
    // the corpus genuinely exercises the queue: lots are exhausted,
    // lots stay open, and some consumption is lost to shortfalls
    assert(want.values.exists(_._4 > 0))
    assert(want.values.exists(_._5 > 0))
    assert(want.values.exists(_._8 > 0))
  }

  test("q174 event paths equal a driver-side consecutive-triple count") {
    val sf = "/root/testdata/sf0.001"
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("tsm"), col("event_id"),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = evs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val types = es.map(e => (e._2, e._3, e._4)).sortBy(t => (t._1, t._2)).map(_._3)
      types.sliding(3).filter(_.length == 3).map(t => (t(0), t(1), t(2)))
    }.groupBy(identity).map { case (p, ps) => p -> ps.size.toLong }
      .toSeq.sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(20)
    val got = graft.SparkEntry.queries("q174_event_paths")(spark, sf).collect()
      .map(r => ((r.getAs[String]("step1"), r.getAs[String]("step2"),
        r.getAs[String]("step3")), r.getAs[Long]("n_paths"))).toSeq
    assert(got == want, s"got $got\nwant $want")
    assert(got.nonEmpty)
  }
}
