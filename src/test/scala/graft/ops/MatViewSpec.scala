package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q205 exact materialized-view maintenance: the merged incremental
  * state equals a full recompute, rounds replay idempotently,
  * compaction is read-equivalent, and the steady-state plan scans only
  * the delta + the tiny state store. */
class MatViewSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def stateSet(df: DataFrame): Set[(String, String, Long, Long, Long, Long)] =
    df.select(col("source"), col("lang"), col("n_docs"), col("sum_chars"),
        col("min_chars"), col("max_chars"))
      .as[(String, String, Long, Long, Long, Long)].collect().toSet

  test("incrementally merged state equals the full recompute (exact, incl. extremes)") {
    val docs = graft.Tables.documents(spark, sf)
    val full = stateSet(MatView.aggState(docs))
    // a store built by thirds (deliberately unequal, id-interleaved)
    val path = tmpDir("mv") + "/state"
    val st = new MatViewStore(spark, path)
    st.appendRound(docs.filter(col("doc_id") % 3 === 0), round = 0L)
    st.appendRound(docs.filter(col("doc_id") % 3 === 1), round = 1L)
    assert(stateSet(st.mergedWith(docs.filter(col("doc_id") % 3 === 2))) == full,
      "store + delta diverged from the recompute")
    // replaying a round replaces it (idempotent dynamic overwrite)
    st.appendRound(docs.filter(col("doc_id") % 3 === 1), round = 1L)
    assert(stateSet(st.mergedWith(docs.filter(col("doc_id") % 3 === 2))) == full,
      "round replay changed the state")
  }

  test("auto-compaction folds rounds read-equivalently (the merge is a monoid)") {
    val docs = graft.Tables.documents(spark, sf)
    val path = tmpDir("mv-compact") + "/state"
    val st = new MatViewStore(spark, path) {
      override protected def autoCompactThreshold: Int = 2
    }
    (0L to 5L).foreach(r => st.appendRound(docs.filter(col("doc_id") % 6 === r), r))
    assert(stateSet(st.state()) == stateSet(MatView.aggState(docs)),
      "compacted state diverged from the recompute")
  }

  private def viewSet(df: DataFrame): Set[(String, Long, Long)] =
    df.select(col("event_type"), col("n_users"), col("n_events"))
      .as[(String, Long, Long)].collect().toSet

  test("q209 distinct store + delta equals the exact recompute; rounds replay idempotently") {
    val ev = graft.Tables.events(spark, sf)
    val full = viewSet(ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events")))
    val path = tmpDir("dv") + "/state"
    val st = new DistinctViewStore(spark, path)
    st.appendRound(ev.filter(col("event_id") % 3 === 0), round = 0L)
    st.appendRound(ev.filter(col("event_id") % 3 === 1), round = 1L)
    val got = viewSet(MatView.distinctView(
      st.mergedWith(ev.filter(col("event_id") % 3 === 2))))
    assert(got == full, "decomposed distinct state diverged from countDistinct")
    st.appendRound(ev.filter(col("event_id") % 3 === 1), round = 1L) // replay
    assert(viewSet(MatView.distinctView(
      st.mergedWith(ev.filter(col("event_id") % 3 === 2)))) == full,
      "round replay changed the distinct state")
  }

  test("q209 retraction: a negated round annihilates its wave exactly (incl. state rows)") {
    val ev = graft.Tables.events(spark, sf)
    val base = ev.filter(col("event_id") % 2 === 0)
    val wave = ev.filter(col("event_id") % 2 === 1)
    val path = tmpDir("dv-retract") + "/state"
    val st = new DistinctViewStore(spark, path)
    st.appendRound(base, round = 0L)
    val before = viewSet(MatView.distinctView(st.state()))
    val rowsBefore = st.state().count()
    st.appendRound(wave, round = 1L)
    assert(viewSet(MatView.distinctView(st.state())) ==
      viewSet(ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))),
      "append wave diverged")
    st.appendRound(wave, round = 2L, negate = true)
    assert(viewSet(MatView.distinctView(st.state())) == before,
      "retraction did not restore the pre-wave view")
    // exact-zero rows annihilate in the merge, so the read-side state
    // is back to the base cardinality (no tombstone accretion)
    assert(st.state().count() == rowsBefore,
      "retraction left tombstone rows in the merged state")
  }

  test("q209 auto-compaction folds append AND retraction rounds read-equivalently") {
    val ev = graft.Tables.events(spark, sf)
    val path = tmpDir("dv-compact") + "/state"
    val st = new DistinctViewStore(spark, path) {
      override protected def autoCompactThreshold: Int = 2
    }
    (0L to 3L).foreach(r => st.appendRound(ev.filter(col("event_id") % 4 === r), r))
    val wave = ev.filter(col("event_id") % 4 === 2)
    st.appendRound(wave, round = 4L, negate = true) // retract one slice
    val expect = viewSet(ev.filter(col("event_id") % 4 =!= 2)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events")))
    assert(viewSet(MatView.distinctView(st.state())) == expect,
      "compacted state with a retraction round diverged from the recompute")
  }

  private def qSet(df: DataFrame): Set[(String, Long, Long, Long)] =
    df.select(col("event_type"), col("n_events"), col("p50_band"), col("p90_band"))
      .as[(String, Long, Long, Long)].collect().toSet

  test("q212 banded-percentile store + delta equals the recompute; retraction restores it") {
    val ev = graft.Tables.events(spark, sf)
    def recompute(e: DataFrame) =
      qSet(MatView.bandQuantileView(MatView.bandState(e)))
    val path = tmpDir("bv") + "/state"
    val st = new BandViewStore(spark, path)
    st.appendRound(ev.filter(col("event_id") % 3 === 0), round = 0L)
    st.appendRound(ev.filter(col("event_id") % 3 === 1), round = 1L)
    val got = qSet(MatView.bandQuantileView(
      st.mergedWith(ev.filter(col("event_id") % 3 === 2))))
    assert(got == recompute(ev), "histogram state diverged from the recompute")
    got.foreach { case (t, n, p50, p90) =>
      assert(p50 <= p90 && n > 0L, s"inverse-CDF order violated for $t")
    }
    // retraction: drop round 1's wave, view returns to rounds {0}
    st.appendRound(ev.filter(col("event_id") % 3 === 1), round = 2L, negate = true)
    assert(qSet(MatView.bandQuantileView(st.state())) ==
      recompute(ev.filter(col("event_id") % 3 === 0)),
      "retraction did not restore the pre-wave percentiles")
  }

  test("q215 extremes are retract-safe on the banded domain: deleting the max wave promotes the next band") {
    val ev = graft.Tables.events(spark, sf).filter(col("value").isNotNull)
    def extremes(e: DataFrame) =
      MatView.bandExtremesView(MatView.bandState(e))
        .select(col("event_type"), col("n_events"), col("min_band"), col("max_band"))
        .as[(String, Long, Long, Long)].collect().toSet
    val path = tmpDir("bx") + "/state"
    val st = new BandViewStore(spark, path)
    st.appendRound(ev, round = 0L)
    // retract the TOP-value wave — the exact case raw-domain max
    // cannot handle without a rescan
    val topBand = ev.select(expr(
      "max(cast(cast(value as decimal(18,2)) * 100 as bigint) div 1000)"))
      .as[Long].head()
    val wave = ev.filter(
      expr("cast(cast(value as decimal(18,2)) * 100 as bigint) div 1000") === topBand)
    assert(wave.count() > 0L)
    st.appendRound(wave, round = 1L, negate = true)
    val rest = ev.join(wave.select("event_id"), Seq("event_id"), "left_anti")
    assert(extremes(rest.limit(0)).isEmpty) // sanity: helper handles empty
    assert(MatView.bandExtremesView(st.state())
      .select(col("event_type"), col("n_events"), col("min_band"), col("max_band"))
      .as[(String, Long, Long, Long)].collect().toSet == extremes(rest),
      "retracted extremes diverged from the redacted recompute")
    // append→retract→identity: putting the wave back restores the full view
    st.appendRound(wave, round = 2L)
    assert(MatView.bandExtremesView(st.state())
      .select(col("event_type"), col("n_events"), col("min_band"), col("max_band"))
      .as[(String, Long, Long, Long)].collect().toSet == extremes(ev),
      "re-appending the wave did not restore the extremes")
  }

  private val centsExpr =
    "cast(cast(value as decimal(18,2)) * 100 as bigint)"

  private def rawExtremes(df: DataFrame): Set[(String, Long, Long)] =
    df.filter(col("value").isNotNull)
      .groupBy(col("event_type"))
      .agg(expr(s"min($centsExpr)").as("min_cents"),
        expr(s"max($centsExpr)").as("max_cents"))
      .as[(String, Long, Long)].collect().toSet

  private def topWave(ev: DataFrame, depth: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = ev.filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"), expr(centsExpr).as("c"))
      .withColumn("rk", dense_rank().over(
        Window.partitionBy(col("event_type")).orderBy(col("c").desc)))
    ev.join(ranked.filter(col("rk") <= depth).select("event_id"),
      Seq("event_id"), "left_semi")
  }

  test("q220 raw-domain extremes: waves + delta equal the recompute; retracting top values promotes the EXACT next; append→retract→identity") {
    val ev = graft.Tables.events(spark, sf)
    val path = tmpDir("xb") + "/state"
    val st = new ExtremeBufferStore(spark, path)
    st.appendRound(ev.filter(col("event_id") % 3 === 0), round = 0L)
    st.appendRound(ev.filter(col("event_id") % 3 === 1), round = 1L)
    def got(df: DataFrame) = df
      .select(col("event_type"), col("min_cents"), col("max_cents"))
      .as[(String, Long, Long)].collect().toSet
    assert(got(MatView.extremesExactView(
      st.mergedWith(ev.filter(col("event_id") % 3 === 2)))) == rawExtremes(ev),
      "buffer state diverged from the raw recompute")
    st.appendRound(ev.filter(col("event_id") % 3 === 1), round = 1L) // replay
    assert(got(MatView.extremesExactView(
      st.mergedWith(ev.filter(col("event_id") % 3 === 2)))) == rawExtremes(ev),
      "round replay changed the extremes")
    // retract every event carrying a top-3 value of its group — the
    // raw-domain case q215's bands cannot answer exactly
    val full = new ExtremeBufferStore(spark, tmpDir("xb2") + "/state")
    full.appendRound(ev, round = 0L)
    val wave = topWave(ev, 3)
    assert(wave.count() > 0L)
    full.appendRound(wave, round = 1L, negate = true)
    val redacted = ev.join(wave.select("event_id"), Seq("event_id"), "left_anti")
    assert(got(MatView.extremesExactView(full.state())) == rawExtremes(redacted),
      "retracted extremes diverged from the redacted recompute — promotion is not exact")
    full.appendRound(wave, round = 2L)
    assert(got(MatView.extremesExactView(full.state())) == rawExtremes(ev),
      "re-appending the wave did not restore the extremes")
  }

  test("q220 declares a LOUD rescan when a retraction wave exhausts the buffer depth") {
    val ev = graft.Tables.events(spark, sf).filter(col("value").isNotNull)
    // the deepest group must have more distinct values than the buffer
    // holds, so retracting `extremeDepth` of them exhausts it
    val deep = ev.select(col("event_type"), expr(centsExpr).as("c")).distinct()
      .groupBy("event_type").agg(count(lit(1)).as("nv"))
      .orderBy(col("nv").desc).as[(String, Long)].head()
    assert(deep._2 > MatView.extremeDepth,
      s"fixture too small to exercise exhaustion: ${deep}")
    val grp = ev.filter(col("event_type") === deep._1)
    val st = new ExtremeBufferStore(spark, tmpDir("xb-exhaust") + "/state")
    st.appendRound(grp, round = 0L)
    st.appendRound(topWave(grp, MatView.extremeDepth), round = 1L, negate = true)
    val e = intercept[Throwable] {
      MatView.extremesExactView(st.state()).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.toString + messages(t.getCause)
    assert(messages(e).contains("extreme buffer exhausted"),
      s"expected the rescan declaration, got: ${messages(e).take(500)}")
  }

  test("q220 compaction re-truncates serving-equivalently (exact case and rescan case both preserved)") {
    val ev = graft.Tables.events(spark, sf).filter(col("value").isNotNull)
    val st = new ExtremeBufferStore(spark, tmpDir("xb-compact") + "/state") {
      override protected def autoCompactThreshold: Int = 2
    }
    (0L to 4L).foreach(r => st.appendRound(ev.filter(col("event_id") % 5 === r), r))
    val wave = topWave(ev, 3)
    st.appendRound(wave, round = 5L, negate = true)
    val redacted = ev.join(wave.select("event_id"), Seq("event_id"), "left_anti")
    assert(MatView.extremesExactView(st.state())
      .select(col("event_type"), col("min_cents"), col("max_cents"))
      .as[(String, Long, Long)].collect().toSet == rawExtremes(redacted),
      "post-compaction extremes diverged from the redacted recompute")
    // state size is bounded by the depth (positives per side ≤ k)
    val posPerSide = st.state()
      .filter(col("kind") === "v" && col("n") > 0L)
      .groupBy("event_type", "side").agg(count(lit(1)).as("c"))
      .agg(max(col("c"))).as[Long].head()
    assert(posPerSide <= 2L * MatView.extremeDepth,
      s"compaction failed to bound the buffer: $posPerSide rows on one side")
  }

  test("steady-state q205 plan scans documents ONCE (the delta) plus the state store") {
    MatView.docProfileIncremental(spark, sf).collect() // warm: store committed
    val plan = MatView.docProfileIncremental(spark, sf)
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    var scans = List.empty[String]
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec        => walk(q.plan)
      case r: ReusedExchangeExec    => walk(r.child)
      case sc: FileSourceScanExec =>
        scans ::= sc.relation.location.rootPaths.map(_.toString).mkString(",")
      case other => other.children.foreach(walk)
    }
    walk(plan.queryExecution.executedPlan)
    assert(scans.count(_.contains("documents.parquet")) == 1,
      s"history re-scanned instead of the stored state: $scans")
    assert(scans.exists(_.contains("graft-matview")),
      s"state store missing from the plan: $scans")
  }
}
