package graft.ops

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ScdSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val snapshots = Seq(
    // user 1: A -> A -> B -> B -> A  => versions A, B, A
    (1L, ts("2024-01-01 00:00:00"), 1L, "A"),
    (1L, ts("2024-01-02 00:00:00"), 2L, "A"),
    (1L, ts("2024-01-03 00:00:00"), 3L, "B"),
    (1L, ts("2024-01-04 00:00:00"), 4L, "B"),
    (1L, ts("2024-01-05 00:00:00"), 5L, "A"),
    // user 2: constant => one open version
    (2L, ts("2024-01-02 00:00:00"), 6L, "X"),
    (2L, ts("2024-01-09 00:00:00"), 7L, "X")
  ).toDF("user_id", "ts", "event_id", "attr")

  test("fromSnapshots change-point compresses into half-open, non-overlapping versions") {
    val h = Scd.fromSnapshots(snapshots, Seq("user_id"), Seq("attr"), "ts", Seq("event_id"))
      .orderBy(col("user_id"), col("valid_from")).collect()
    val u1 = h.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.map(_.getAs[String]("attr")).toSeq == Seq("A", "B", "A"))
    assert(u1.map(r => Option(r.getAs[Timestamp]("valid_to"))).toSeq ==
      Seq(Some(ts("2024-01-03 00:00:00")), Some(ts("2024-01-05 00:00:00")), None))
    assert(u1.map(_.getAs[Boolean]("is_current")).toSeq == Seq(false, false, true))
    // each version's valid_to equals the next valid_from (no gaps/overlap)
    u1.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Timestamp]("valid_to") == b.getAs[Timestamp]("valid_from"))
    }
    val u2 = h.filter(_.getAs[Long]("user_id") == 2L)
    assert(u2.length == 1 && u2.head.getAs[Boolean]("is_current"))
  }

  test("merge: new key opens, changed attrs close+open, unchanged is a no-op") {
    val history = Scd.fromSnapshots(snapshots, Seq("user_id"), Seq("attr"), "ts", Seq("event_id"))
    val batch = Seq(
      (1L, "C", ts("2024-02-01 00:00:00")),  // change: close A, open C
      (2L, "X", ts("2024-02-01 00:00:00")),  // unchanged: no-op
      (3L, "Z", ts("2024-02-01 00:00:00"))   // new key: open Z
    ).toDF("user_id", "attr", "ts")
    val merged = Scd.merge(history, batch, Seq("user_id"), Seq("attr"), "ts")
    val cur = merged.filter(col("is_current")).orderBy(col("user_id")).collect()
    assert(cur.map(r => (r.getAs[Long]("user_id"), r.getAs[String]("attr"))).toSeq ==
      Seq((1L, "C"), (2L, "X"), (3L, "Z")))
    // user 1's former current A is now closed at the batch ts
    val closedA = merged.filter(col("user_id") === 1L && col("attr") === "A" &&
      col("valid_from") === ts("2024-01-05 00:00:00")).collect().head
    assert(!closedA.getAs[Boolean]("is_current") &&
      closedA.getAs[Timestamp]("valid_to") == ts("2024-02-01 00:00:00"))
    // user 2 still has exactly one version (idempotent no-op)
    assert(merged.filter(col("user_id") === 2L).count() == 1)
    // total: 3 closed u1 history rows? u1 had A,B,A(open) = 3; after
    // close+open = 4; u2 1; u3 1
    assert(merged.count() == 6)
  }

  test("merge equals rebuild: applying the batch matches fromSnapshots on the union") {
    val batch = Seq(
      (1L, ts("2024-02-01 00:00:00"), 100L, "C"),
      (2L, ts("2024-02-01 00:00:00"), 101L, "X"),
      (3L, ts("2024-02-01 00:00:00"), 102L, "Z")
    ).toDF("user_id", "ts", "event_id", "attr")
    val history = Scd.fromSnapshots(snapshots, Seq("user_id"), Seq("attr"), "ts", Seq("event_id"))
    val merged = Scd.merge(history, batch.drop("event_id"),
      Seq("user_id"), Seq("attr"), "ts")
    val rebuilt = Scd.fromSnapshots(snapshots.unionByName(batch),
      Seq("user_id"), Seq("attr"), "ts", Seq("event_id"))
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .select("user_id", "attr", "valid_from", "valid_to", "is_current")
      .collect().map(_.toSeq).toSet
    assert(key(merged) == key(rebuilt))
  }

  test("merge is idempotent: re-applying the same batch changes nothing") {
    val history = Scd.fromSnapshots(snapshots, Seq("user_id"), Seq("attr"), "ts", Seq("event_id"))
    val batch = Seq((1L, "C", ts("2024-02-01 00:00:00"))).toDF("user_id", "attr", "ts")
    val once = Scd.merge(history, batch, Seq("user_id"), Seq("attr"), "ts")
    val twice = Scd.merge(once, batch, Seq("user_id"), Seq("attr"), "ts")
    assert(once.collect().map(_.toSeq).toSet == twice.collect().map(_.toSeq).toSet)
  }

  test("asOf returns the version valid at the probe instant") {
    val history = Scd.fromSnapshots(snapshots, Seq("user_id"), Seq("attr"), "ts", Seq("event_id"))
    val at = Scd.asOf(history, lit(ts("2024-01-04 12:00:00")))
      .filter(col("user_id") === 1L).collect()
    assert(at.length == 1 && at.head.getAs[String]("attr") == "B")
    // boundary: at exactly a version's valid_from, the NEW version wins
    val boundary = Scd.asOf(history, lit(ts("2024-01-05 00:00:00")))
      .filter(col("user_id") === 1L).collect()
    assert(boundary.length == 1 && boundary.head.getAs[String]("attr") == "A" &&
      boundary.head.getAs[Boolean]("is_current"))
  }

  test("pitJoin: each fact sees the version live at its own (ts, seq), never a later one") {
    val versions = Seq(
      (1L, ts("2024-01-02 00:00:00"), 10L, "A"),
      (1L, ts("2024-01-04 00:00:00"), 20L, "B"),
      // same-ts pair for the tie rules below
      (2L, ts("2024-01-03 00:00:00"), 30L, "X"),
      (2L, ts("2024-01-03 00:00:00"), 34L, "Y")
    ).toDF("user_id", "ts", "event_id", "attr")
    val facts = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 5L),   // before any version -> null
      (1L, ts("2024-01-03 00:00:00"), 2L, 6L),   // between A and B -> A
      (1L, ts("2024-01-04 00:00:00"), 19L, 7L),  // same ts as B, lower seq -> still A
      (1L, ts("2024-01-04 00:00:00"), 21L, 8L),  // same ts as B, higher seq -> B
      (1L, ts("2024-01-09 00:00:00"), 99L, 9L),  // after everything -> B
      (2L, ts("2024-01-03 00:00:00"), 32L, 1L),  // between the same-ts pair -> X
      (2L, ts("2024-01-05 00:00:00"), 40L, 2L)   // latest same-ts version wins -> Y
    ).toDF("user_id", "ts", "event_id", "amount")
    val out = Scd.pitJoin(versions, facts, Seq("user_id"), Seq("attr"), "ts", "event_id")
    assert(out.columns.toSet == Set("user_id", "ts", "event_id", "attr", "amount"))
    val byId = out.collect().map(r =>
      r.getAs[Long]("event_id") -> Option(r.getAs[String]("attr"))).toMap
    assert(byId == Map(1L -> None, 2L -> Some("A"), 19L -> Some("A"),
      21L -> Some("B"), 99L -> Some("B"), 32L -> Some("X"), 40L -> Some("Y")))
    // and only fact rows come back, payload intact
    assert(out.count() == 7)
    assert(out.filter(col("event_id") === 2L).head.getAs[Long]("amount") == 6L)
  }

  private def withoutAqe[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("pitJoin plan is join-free: one key-partitioned window, no fan-out (100 TB shape)") {
    withoutAqe {
      val versions = Seq((1L, ts("2024-01-02 00:00:00"), 10L, "A"))
        .toDF("user_id", "ts", "event_id", "attr")
      val facts = Seq((1L, ts("2024-01-03 00:00:00"), 2L, 6L))
        .toDF("user_id", "ts", "event_id", "amount")
      val plan = Scd.pitJoin(versions, facts, Seq("user_id"), Seq("attr"), "ts", "event_id")
        .queryExecution.executedPlan
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec}
      import org.apache.spark.sql.execution.window.WindowExec
      var joins = 0; var windows = List.empty[WindowExec]
      def walk(p: SparkPlan): Unit = {
        p match {
          case _: BaseJoinExec | _: BroadcastNestedLoopJoinExec => joins += 1
          case w: WindowExec => windows ::= w
          case _ =>
        }
        p.children.foreach(walk)
      }
      walk(plan)
      assert(joins == 0, s"pitJoin lowered to a join:\n$plan")
      assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
        s"window missing or unpartitioned:\n$plan")
    }
  }

  test("pitBackfillDiff: two epochs from one window pass, tie rules inherited") {
    val versions = Seq(
      //                 ts                      seq   attr  late
      (1L, ts("2024-01-02 00:00:00"), 10L, "A", false),
      (1L, ts("2024-01-04 00:00:00"), 20L, "B", true),  // late: after-epoch only
      (1L, ts("2024-01-06 00:00:00"), 25L, "C", false),
      (2L, ts("2024-01-03 00:00:00"), 30L, "X", true)   // user 2's ONLY version is late
    ).toDF("user_id", "ts", "event_id", "attr", "late")
    val facts = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L),  // before everything: (null, null)
      (1L, ts("2024-01-03 00:00:00"), 2L),  // after A only: (A, A)
      (1L, ts("2024-01-05 00:00:00"), 3L),  // after late B: (A, B) — the churn row
      (1L, ts("2024-01-04 00:00:00"), 19L), // same ts as B, lower seq: (A, A)
      (1L, ts("2024-01-07 00:00:00"), 4L),  // after C: (C, C) — repaired by a later early version
      (2L, ts("2024-01-04 00:00:00"), 5L)   // only a late version: (null, X)
    ).toDF("user_id", "ts", "event_id")
    val out = Scd.pitBackfillDiff(versions.drop("late"),
      // late flag recomputed from the seq so the column set matches prod use
      (col("event_id") === 20L) || (col("event_id") === 30L),
      facts, Seq("user_id"), "attr", "ts", "event_id")
    val byId = out.collect().map(r => r.getAs[Long]("event_id") ->
      (Option(r.getAs[String]("attr_before")), Option(r.getAs[String]("attr_after")))).toMap
    assert(byId == Map(
      1L -> (None, None), 2L -> (Some("A"), Some("A")),
      3L -> (Some("A"), Some("B")), 19L -> (Some("A"), Some("A")),
      4L -> (Some("C"), Some("C")), 5L -> (None, Some("X"))))
  }

  test("pitBackfillDiff equals two independent pitJoins diffed (cross-algorithm, real events)") {
    val d = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, d)
    val cents = (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
      .cast("long")
    val versions = ev.filter(col("event_type").isin("signup", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"), cents.as("cents"))
      .withColumn("band", expr("cents div 10000")).drop("cents")
    val facts = ev.filter(col("event_type").isin("view", "click", "error"))
      .select(col("user_id"), col("ts"), col("event_id"))
    val late = col("event_id") % 5 === 0
    val fused = Scd.pitBackfillDiff(versions, late, facts,
        Seq("user_id"), "band", "ts", "event_id")
      .select(col("event_id"), col("band_before"), col("band_after"))
    val after = Scd.pitJoin(versions, facts, Seq("user_id"), Seq("band"), "ts", "event_id")
      .select(col("event_id"), col("band").as("band_after"))
    val before = Scd.pitJoin(versions.filter(!late), facts,
        Seq("user_id"), Seq("band"), "ts", "event_id")
      .select(col("event_id"), col("band").as("band_before"))
    val naive = before.join(after, Seq("event_id"))
      .select(col("event_id"), col("band_before"), col("band_after"))
    assert(fused.exceptAll(naive).isEmpty && naive.exceptAll(fused).isEmpty,
      "fused two-epoch diff diverged from the two-pass reference")
    // and the fixture actually exercises churn (the q208 report is non-degenerate)
    assert(fused.filter(!(col("band_before") <=> col("band_after"))).count() > 0,
      "no enrichment churn in the fixture — q208 would be vacuous")
  }

  test("pitBackfillDiff plan is join-free: the audit costs one enrichment pass") {
    withoutAqe {
      val versions = Seq((1L, ts("2024-01-02 00:00:00"), 10L, "A"))
        .toDF("user_id", "ts", "event_id", "attr")
      val facts = Seq((1L, ts("2024-01-03 00:00:00"), 2L))
        .toDF("user_id", "ts", "event_id")
      val plan = Scd.pitBackfillDiff(versions, col("event_id") % 5 === 0, facts,
          Seq("user_id"), "attr", "ts", "event_id")
        .queryExecution.executedPlan
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec}
      import org.apache.spark.sql.execution.window.WindowExec
      var joins = 0; var windows = List.empty[WindowExec]
      def walk(p: SparkPlan): Unit = {
        p match {
          case _: BaseJoinExec | _: BroadcastNestedLoopJoinExec => joins += 1
          case w: WindowExec => windows ::= w
          case _ =>
        }
        p.children.foreach(walk)
      }
      walk(plan)
      assert(joins == 0, s"pitBackfillDiff lowered to a join:\n$plan")
      assert(windows.size == 1 && windows.forall(_.partitionSpec.nonEmpty),
        s"expected exactly one partitioned window:\n$plan")
    }
  }
}
