package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q203 k-anonymity semantics (class-size histogram per ladder level,
  * risky flag) and its one-scan rollup plan. */
class PrivacySpec extends SparkTestBase {
  import spark.implicits._

  test("k-anonymity histogram: planted classes land at the right (level, k) rows") {
    // 7 rows: at the full quasi, classes of sizes {2, 1, 1, 3};
    // dropping band merges the two BUILDING/0 classes into one of 3;
    // at segment-only: BUILDING=3, AUTO=4
    val rows = Seq(
      ("BUILDING", 1, 150000L), ("BUILDING", 1, 150000L),  // band 1, k=2
      ("BUILDING", 1, 250000L),                            // band 2, k=1
      ("BUILDING", 2, 150000L),                            // other nation, k=1
      ("AUTO", 3, 50000L), ("AUTO", 3, 50000L), ("AUTO", 3, 50000L) // k=3
    ).map { case (seg, nat, cents) => (seg, nat, cents / 100000L) }
      .toDF("segment", "nation", "band")
    val classes = rows.rollup(col("segment"), col("nation"), col("band"))
      .agg(count(lit(1)).as("k"), grouping_id().as("gid"))
      .filter(col("gid") =!= 7)
    val level = when(col("gid") === 0, "segment_nation_band")
      .when(col("gid") === 1, "segment_nation")
      .otherwise("segment")
    val hist = classes.groupBy(level.as("level"), col("k"))
      .agg(count(lit(1)).as("n_classes"), sum(col("k")).as("n_rows"))
      .withColumn("risky", col("k") < Privacy.kAnonThreshold)
      .collect()
      .map(r => (r.getAs[String]("level"), r.getAs[Long]("k")) ->
        (r.getAs[Long]("n_classes"), r.getAs[Long]("n_rows"), r.getAs[Boolean]("risky")))
      .toMap
    assert(hist == Map(
      ("segment_nation_band", 1L) -> (2L, 2L, true),
      ("segment_nation_band", 2L) -> (1L, 2L, true),
      ("segment_nation_band", 3L) -> (1L, 3L, true),
      ("segment_nation", 1L) -> (1L, 1L, true),
      ("segment_nation", 3L) -> (2L, 6L, true),
      ("segment", 3L) -> (1L, 3L, true),
      ("segment", 4L) -> (1L, 4L, true)), s"histogram: $hist")
    // n_rows reconciles to the input at every level
    Seq("segment_nation_band", "segment_nation", "segment").foreach { l =>
      assert(hist.collect { case ((`l`, _), (_, n, _)) => n }.sum == 7L)
    }
  }

  test("the ladder is ONE table scan (single-pass rollup, no per-level rescan)") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Privacy.kAnonymity(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      var scans = 0
      def walk(p: SparkPlan): Unit = {
        p match { case _: FileSourceScanExec => scans += 1; case _ => }
        p.children.foreach(walk)
      }
      walk(plan)
      assert(scans == 1, s"expected one customer scan, got $scans:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("q206 sweep joins are all broadcast — the fact stream never shuffles on user_id") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Privacy.erasureSweep(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastHashJoinExec}
      var joins = List.empty[BaseJoinExec]
      def walk(p: SparkPlan): Unit = {
        p match { case j: BaseJoinExec => joins ::= j; case _ => }
        p.children.foreach(walk)
      }
      walk(plan)
      assert(joins.nonEmpty, "expected the three sweep joins in the plan")
      val nonBroadcast = joins.filterNot(_.isInstanceOf[BroadcastHashJoinExec])
      assert(nonBroadcast.isEmpty,
        s"deletion list not broadcast — facts would shuffle: $nonBroadcast")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("q214 erasure composes with the matview machinery: retraction rounds equal a from-scratch build on the redacted log") {
    val sf = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, sf)
    val erased = Privacy.erasedRows(spark, sf)
    val redacted = ev.join(erased.select("event_id"), Seq("event_id"), "left_anti")
    assert(erased.count() > 0L, "fixture should erase someone")

    // the standing q209 view built on the FULL log, then the erasure
    // applied as one negate round — must equal a fresh build on the
    // redacted log, bit for bit (the no-rebuild erasure path)
    val path = tmpDir("erasure") + "/state"
    val st = new DistinctViewStore(spark, path)
    st.appendRound(ev, round = 0L)
    st.appendRound(erased, round = 1L, negate = true)
    def viewSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_type"), col("n_users"), col("n_events"))
        .as[(String, Long, Long)].collect().toSet
    val afterErasure = viewSet(MatView.distinctView(st.state()))
    assert(afterErasure ==
      viewSet(MatView.distinctView(MatView.distinctState(redacted))),
      "retraction-applied erasure diverged from a from-scratch redacted build")
    // and no erased user's state rows survive physically
    val erasedUsers = erased.select("user_id").distinct().as[Long].collect().toSet
    val surviving = st.state().select("user_id").as[Long].collect().toSet
    assert(erasedUsers.intersect(surviving).isEmpty,
      "an erased user still has state rows after the retraction round")

    // the q214 audit's after-columns equal the redacted recompute
    checkAudit(sf, redacted)
  }

  private def checkAudit(sf: String, redacted: org.apache.spark.sql.DataFrame): Unit = {
    val audit = Privacy.erasureExecute(spark, sf).collect()
    val want = redacted.filter(col("user_id").isNotNull)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("nu"), count(lit(1)).as("ne"))
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    audit.foreach { r =>
      val t = r.getAs[String]("event_type")
      val (nu, ne) = want.getOrElse(t, (0L, 0L))
      assert(r.getAs[Long]("n_users_after") == nu &&
        r.getAs[Long]("n_events_after") == ne,
        s"audit after-columns for $t diverged from the redacted recompute")
      assert(r.getAs[Long]("n_events_erased") ==
        r.getAs[Long]("n_events_before") - r.getAs[Long]("n_events_after"))
    }
  }

  test("q224/q225 trilogy views: incremental state equals the raw recompute; erasure retraction shrinks both audits exactly") {
    val sf = "/root/testdata/sf0.001"
    val cust = graft.Tables.customer(spark, sf)
    def lSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("l"), col("n_classes"), col("n_rows"), col("risky"))
        .as[(Long, Long, Long, Boolean)].collect().toSet
    def tSeq(df: org.apache.spark.sql.DataFrame) = {
      val out = df.select(col("segment"), col("nation"), col("n_rows"), col("t_micro"))
        .as[(String, Long, Long, Long)].collect().toSeq
      Dedup.releaseSketchCaches()
      out
    }
    // the registered queries equal one-shot recomputes from raw rows
    assert(lSet(Privacy.lDiversityIncremental(spark, sf)) ==
      lSet(Privacy.lDiversityView(Privacy.classState(cust))),
      "incremental l-diversity diverged from the one-shot view")
    assert(tSeq(Privacy.tClosenessIncremental(spark, sf)) ==
      tSeq(Privacy.tClosenessView(Privacy.classState(cust))),
      "incremental t-closeness diverged from the one-shot view")
    // t is a normalized distance in micro-units
    tSeq(Privacy.tClosenessView(Privacy.classState(cust))).foreach {
      case (seg, nat, _, t) =>
        assert(t >= 0L && t <= 1000000L, s"t out of [0,1e6] for ($seg,$nat): $t")
    }
    // erasure: retracting the odd wave serves the even-only audits
    val path = tmpDir("trilogy") + "/state"
    val st = new ClassCountStore(spark, path)
    st.appendRound(cust, round = 0L)
    st.appendRound(cust.filter(col("c_custkey") % 2 === 1), round = 1L, negate = true)
    val even = Privacy.classState(cust.filter(col("c_custkey") % 2 === 0))
    assert(lSet(Privacy.lDiversityView(st.state())) == lSet(Privacy.lDiversityView(even)),
      "post-retraction l-diversity diverged from the redacted recompute")
    assert(tSeq(Privacy.tClosenessView(st.state())) == tSeq(Privacy.tClosenessView(even)),
      "post-retraction t-closeness diverged from the redacted recompute")
  }

  test("q223 certificate: every surface had non-trivial erased rows BEFORE and measures exactly ZERO after") {
    val rows = Privacy.erasureCertificate(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long)].collect()
    Dedup.releaseSketchCaches()
    assert(rows.map(_._1).sorted.toSeq ==
      Seq("band_view_state", "distinct_view_state", "events_log",
        "extreme_buffer_state", "postings_index"))
    rows.foreach { case (surface, before, after) =>
      assert(before > 0L,
        s"$surface: trivial certificate — the fixture erased nothing there")
      assert(after == 0L,
        s"$surface: redacted store still retains $after erased rows/influence")
    }
  }

  test("q226/q227: erasure negate rounds on the band and extreme-buffer stores equal from-scratch builds on the redacted log") {
    val sf = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, sf)
    val erased = Privacy.erasedRows(spark, sf)
    val redacted = ev.join(erased.select("event_id"), Seq("event_id"), "left_anti")
    assert(erased.filter(col("value").isNotNull).count() > 0L,
      "fixture should erase value-carrying rows")

    // band store: full build + negate round == redacted build, both as
    // raw state and through the served quantile/extreme views
    val bPath = tmpDir("erase-band") + "/state"
    val bst = new BandViewStore(spark, bPath)
    bst.appendRound(ev, round = 0L)
    bst.appendRound(erased, round = 1L, negate = true)
    def bandSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_type"), col("band"), col("n"))
        .as[(String, Long, Long)].collect().toSet
    assert(bandSet(bst.state()) == bandSet(MatView.bandState(redacted)),
      "retraction-applied band state diverged from the redacted build")
    def qSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_type"), col("n_events"), col("p50_band"), col("p90_band"))
        .as[(String, Long, Long, Long)].collect().toSet
    assert(qSet(MatView.bandQuantileView(bst.state())) ==
      qSet(MatView.bandQuantileView(MatView.bandState(redacted))),
      "served quantiles diverged after the erasure round")

    // extreme-buffer store: the served view after the negate round
    // equals the redacted recompute EXACTLY (the erased values inside
    // the kept buffer annihilate; survivors above the bound promote)
    val xPath = tmpDir("erase-ext") + "/state"
    val xst = new ExtremeBufferStore(spark, xPath)
    xst.appendRound(ev, round = 0L)
    xst.appendRound(erased, round = 1L, negate = true)
    def xSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_type"), col("min_cents"), col("max_cents"))
        .as[(String, Long, Long)].collect().toSet
    val cents = "cast(cast(value as decimal(18,2)) * 100 as bigint)"
    assert(xSet(MatView.extremesExactView(xst.state())) ==
      xSet(redacted.filter(col("value").isNotNull)
        .groupBy(col("event_type"))
        .agg(expr(s"min($cents)").as("min_cents"),
          expr(s"max($cents)").as("max_cents"))),
      "served extremes diverged after the erasure round")

    // the honest wrinkle, driven: an erasure wave deeper than the
    // buffer (erase EVERY owner of a group's top values) raises the
    // q220 rescan declaration instead of serving the erased extreme
    val deepPath = tmpDir("erase-deep") + "/state"
    val dst = new ExtremeBufferStore(spark, deepPath)
    dst.appendRound(ev, round = 0L)
    val oneType = ev.filter(col("value").isNotNull)
      .select(col("event_type")).limit(1).as[String].head()
    val topVals = ev.filter(col("value").isNotNull && col("event_type") === oneType)
      .select(expr(cents).as("c")).orderBy(col("c").desc)
      .limit(MatView.extremeDepth + 4).as[Long].collect().toSet
    val deepWave = ev.filter(col("event_type") === oneType &&
      expr(cents).isin(topVals.toSeq: _*))
    dst.appendRound(deepWave, round = 1L, negate = true)
    val err = intercept[Exception] {
      MatView.extremesExactView(dst.state()).collect()
    }
    assert(String.valueOf(err.getMessage).contains("RESCAN") ||
      String.valueOf(String.valueOf(err.getCause)).contains("RESCAN"),
      s"deep erasure wave did not raise the rescan declaration: $err")
  }

  test("q219 incremental ladder equals the one-shot rollup; retraction equals the redacted recompute; replay idempotent") {
    val sf = "/root/testdata/sf0.001"
    val cust = graft.Tables.customer(spark, sf)
    def ladderSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("level"), col("k"), col("n_classes"), col("n_rows"), col("risky"))
        .as[(String, Long, Long, Long, Boolean)].collect().toSet

    // the incremental query equals q203's one-shot rollup
    assert(ladderSet(Privacy.kAnonymityIncremental(spark, sf)) ==
      ladderSet(Privacy.kAnonymity(spark, sf)),
      "incremental ladder diverged from the rollup")

    // store algebra on a custom path: waves, replay, retraction
    val path = tmpDir("kanon") + "/state"
    val st = new ClassCountStore(spark, path)
    st.appendRound(cust.filter(col("c_custkey") % 2 === 0), round = 0L)
    st.appendRound(cust.filter(col("c_custkey") % 2 === 1), round = 1L)
    assert(ladderSet(Privacy.ladderView(st.state())) ==
      ladderSet(Privacy.ladderView(Privacy.classState(cust))),
      "wave-built class state diverged from the recompute")
    st.appendRound(cust.filter(col("c_custkey") % 2 === 1), round = 1L) // replay
    assert(ladderSet(Privacy.ladderView(st.state())) ==
      ladderSet(Privacy.ladderView(Privacy.classState(cust))),
      "round replay changed the ladder")
    // erasure: retracting the odd wave restores the even-only audit
    st.appendRound(cust.filter(col("c_custkey") % 2 === 1), round = 2L, negate = true)
    assert(ladderSet(Privacy.ladderView(st.state())) ==
      ladderSet(Privacy.ladderView(Privacy.classState(
        cust.filter(col("c_custkey") % 2 === 0)))),
      "retraction did not restore the pre-wave ladder")
  }
}
