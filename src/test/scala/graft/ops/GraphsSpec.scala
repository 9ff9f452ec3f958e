package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The integer-PageRank contract: the distributed computation must
  * equal a from-scratch driver-side replication of the same integer
  * arithmetic (the oracle gate already pins cross-engine equality;
  * this pins the MATH against an implementation that shares no Spark
  * code with the query). */
class GraphsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("q127 pagerank equals an independent driver-side integer replication") {
    val got = graft.SparkEntry.queries("q127_trade_pagerank")(spark, sf).collect()
      .map(r => (r.getAs[String]("entity"), r.getAs[Long]("entity_id")) ->
        r.getAs[Long]("rank_u"))

    // independent edges: collect the distinct trade pairs
    val pairs = graft.Tables.lineitem(spark, sf)
      .join(graft.Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") * 2).as("s"), (col("o_custkey") * 2 + 1).as("c"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs.flatMap { case (s, c) => Seq(s -> c, c -> s) }
    val deg = edges.groupBy(_._1).map { case (k, es) => k -> es.length.toLong }
    val nodes = deg.keySet.toSeq.sorted
    val n = nodes.length.toLong
    val base = Graphs.massU / n
    val tp = base * 15L / 100L
    var rank = nodes.map(_ -> base).toMap
    for (_ <- 1 to Graphs.iterations) {
      val contrib = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      edges.foreach { case (src, dst) =>
        contrib(dst) += rank(src) / deg(src)
      }
      rank = nodes.map(v => v -> (tp + 85L * contrib(v) / 100L)).toMap
    }
    val want = rank.toSeq
      .map { case (node, r) =>
        ((if (node % 2 == 0) "supplier" else "customer", node / 2), r)
      }
      .sortBy { case ((e, id), r) => (-r, e, id) }
      .take(20)

    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
    // mass sanity: integer division only LEAKS mass, never creates it
    assert(rank.values.sum <= Graphs.massU)
    assert(rank.values.forall(_ >= tp))
  }

  test("the pagerank scatter gates its broadcast on the share vector's size") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L)).toDF("src", "dst")
    val share = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("src", "share")
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      // share vector fits: the hint is applied
      spark.conf.set(key, (10L << 20).toString)
      val hinted = Graphs.scatter(edges, share, n = 3L)
        .queryExecution.optimizedPlan.toString
      assert(hinted.contains("broadcast"), s"expected a broadcast hint:\n$hinted")
      // a graph whose node table outgrows the threshold: hint dropped,
      // no BroadcastExchange — the join rides the src partitioning
      spark.conf.set(key, "1")
      val plain = Graphs.scatter(edges, share, n = 1000000L)
      assert(!plain.queryExecution.optimizedPlan.toString.contains("broadcast"))
      assert(!plain.queryExecution.executedPlan.toString.contains("BroadcastExchange"))
      // both shapes produce identical rows
      val a = Graphs.scatter(edges, share, 3L).orderBy("src", "dst").collect().toSeq
      val b = plain.orderBy("src", "dst").collect().toSeq
      assert(a == b)
    } finally spark.conf.set(key, old)
  }

  test("q127 is unchanged when the broadcast gate forces the co-located join") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    val want = graft.SparkEntry.queries("q127_trade_pagerank")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    try {
      spark.conf.set(key, "1")
      val got = graft.SparkEntry.queries("q127_trade_pagerank")(spark, sf).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == want, "rank fixpoint must not depend on the join strategy")
    } finally spark.conf.set(key, old)
  }

  test("q143 BFS hop census equals a driver-side BFS; hops alternate sides") {
    val rows = graft.SparkEntry.queries("q143_trade_bfs")(spark, sf).collect()
    assert(rows.nonEmpty)

    // independent BFS over collected edges, sharing no Spark code
    val pairs = graft.Tables.lineitem(spark, sf)
      .join(graft.Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") * 2).as("s"), (col("o_custkey") * 2 + 1).as("c"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs.map(p => p._1 -> p._2) ++ pairs.map(p => p._2 -> p._1))
      .groupBy(_._1).map { case (k, es) => k -> es.map(_._2).toSet }
    val seeds = pairs.map(_._1).filter(s => (s / 2) % 10 == 0).toSet
    assert(seeds.nonEmpty, "seed set empty at this SF — adjust the seed rule")
    var dist = seeds.map(_ -> 0).toMap
    var frontier = seeds
    for (h <- 1 to Graphs.bfsMaxHops) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
        .diff(dist.keySet)
      dist = dist ++ next.map(_ -> h)
      frontier = next
    }
    val want = dist.groupBy { case (node, hop) =>
        (hop, if (node % 2 == 0) "supplier" else "customer")
      }
      .map { case ((hop, e), m) =>
        (hop, e) -> (m.size.toLong, m.keys.map(_ / 2).min, m.keys.map(_ / 2).max)
      }
    val got = rows.map(r => (r.getAs[Int]("hop"), r.getAs[String]("entity")) ->
      (r.getAs[Long]("n_nodes"), r.getAs[Long]("min_entity_id"),
        r.getAs[Long]("max_entity_id"))).toMap
    assert(got == want, s"got $got\nwant $want")
    // bipartite: even hops are suppliers, odd hops customers
    rows.foreach { r =>
      val e = if (r.getAs[Int]("hop") % 2 == 0) "supplier" else "customer"
      assert(r.getAs[String]("entity") == e,
        s"hop ${r.getAs[Int]("hop")} holds a ${r.getAs[String]("entity")}")
    }
  }

  test("q171 edge-broadcast gate: a tiny cap falls back to shuffle joins, values unchanged") {
    val withBcast = graft.SparkEntry.queries("q171_triangle_census")(spark, sf)
      .collect().map(_.toSeq)
    spark.conf.set("spark.graft.triangles.broadcastEdgesBytes", "1")
    try {
      val df = graft.SparkEntry.queries("q171_triangle_census")(spark, sf)
      // under the 1-byte cap the wedge/close joins must not carry the
      // explicit broadcast hint (AQE may still pick a broadcast at
      // this tiny SF — the gate controls the HINT, which is what
      // would force the failure at scale)
      val hinted = df.queryExecution.logical.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.UnresolvedHint => h
        case r: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => r
      }
      assert(hinted.isEmpty, s"gate failed to drop the broadcast hint: $hinted")
      assert(df.collect().map(_.toSeq).toSeq == withBcast.toSeq)
    } finally spark.conf.unset("spark.graft.triangles.broadcastEdgesBytes")
  }

  test("q179 component census equals a driver-side union-find") {
    val got = graft.SparkEntry.queries("q179_copurchase_components")(spark, sf)
      .collect().map(r => (r.getAs[Long]("comp_size"),
        r.getAs[Long]("n_components"), r.getAs[Long]("witness_part")))

    // independent edges recomputed from scratch (as in the q171 spec)
    val items = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keySet

    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val comps = parent.keys.toSeq.groupBy(find).map { case (_, ns) =>
      (ns.size.toLong, ns.min)
    }
    val want = comps.groupBy(_._1).toSeq.map { case (size, cs) =>
      (size, cs.size.toLong, cs.map(_._2).min)
    }.sortBy(_._1)

    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
    assert(got.nonEmpty)
    // min-label keepers coincide with each component's min node id
    assert(want.forall { case (_, _, w) => parent.contains(w) })
  }

  test("q171 triangle census equals a driver-side brute-force enumeration") {
    val got = graft.SparkEntry.queries("q171_triangle_census")(spark, sf)
      .collect().map(r => r.getAs[Long]("l_partkey") -> r.getAs[Long]("n_triangles"))

    // independent edges: support-2 co-order pairs recomputed from scratch
    val items = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // NB: keySet after filter, NOT .collect{... => e} — collect on a
    // Map producing pair values rebuilds a MAP, silently collapsing
    // edges by their first endpoint
    val edges = items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keySet

    // brute force: every vertex triple with all three edges present
    val adj = edges.groupBy(_._1).map { case (a, es) => a -> es.map(_._2).toSet }
    val triCount = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      (a, bs) <- adj.toSeq
      b <- bs
      c <- adj.getOrElse(b, Set.empty) // a < b < c by edge normalization
      if bs.contains(c)
    } { triCount(a) += 1; triCount(b) += 1; triCount(c) += 1 }
    val want = triCount.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)

    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
    // the census is non-vacuous on this corpus
    assert(got.nonEmpty)
    // total participation is 3 per triangle
    assert(triCount.values.sum % 3 == 0)
  }

  test("q211 incremental census equals the full-graph driver-side union-find") {
    val got = graft.SparkEntry.queries("q211_cc_incremental")(spark, sf)
      .collect().map(r => (r.getAs[Long]("comp_size"),
        r.getAs[Long]("n_components"), r.getAs[Long]("witness_part")))

    // independent full recompute from scratch (the q179 oracle shape) —
    // the incremental path must land exactly here
    val items = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keySet

    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val comps = parent.keys.toSeq.groupBy(find).map { case (_, ns) =>
      (ns.size.toLong, ns.min)
    }
    val want = comps.groupBy(_._1).toSeq.map { case (size, cs) =>
      (size, cs.size.toLong, cs.map(_._2).min)
    }.sortBy(_._1)

    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
    assert(got.nonEmpty)
    // and the delta actually crosses supports at this watermark — the
    // quotient path is exercised, not vacuously equal to the bootstrap
    val li = graft.Tables.lineitem(spark, sf)
    val keyed = li.select(col("l_orderkey").as("doc_id"),
      col("l_partkey").cast("string").as("text"))
    val (_, wm) = ScratchStores.corpusKey(keyed, s"$sf#coorders")
    val base = Graphs.pairCounts(li.filter(col("l_orderkey") <= wm))
      .withColumnRenamed("n_ab", "n_base")
    val crossings = Graphs.pairCounts(li.filter(col("l_orderkey") > wm))
      .join(base, Seq("part_a", "part_b"), "left")
      .filter(coalesce(col("n_base"), lit(0L)) < 2 &&
        coalesce(col("n_base"), lit(0L)) + col("n_ab") >= 2)
    assert(crossings.count() > 0,
      "no support-2 crossings in the delta — q211 would be vacuous")
  }

  test("incrementalLabels: merges touched components, labels new nodes, min composes") {
    import spark.implicits._
    // base components: {1,2,3} -> 1, {5,6} -> 5, {9} -> 9
    val base = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L), (9L, 9L))
      .toDF("doc_id", "keeper")
    // delta: merge comps 1 and 5 via (3,6); hang NEW node 20 off 6;
    // a new-new pair (30,31); and new node 0 merging into {9} — the
    // new node is SMALLER than the old label, so it must become the
    // component's label (min composes through the quotient)
    val newEdges = Seq((3L, 6L), (6L, 20L), (30L, 31L), (0L, 9L))
      .toDF("doc_a", "doc_b")
    val got = Graphs.incrementalLabels(base, newEdges)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("comp")).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L, 6L -> 1L,
      20L -> 1L, 30L -> 30L, 31L -> 30L, 0L -> 0L, 9L -> 0L),
      s"got $got")
  }

  test("steady-state q211 edge detection scans lineitem ONCE (the delta) plus the pair store") {
    graft.SparkEntry.queries("q211_cc_incremental")(spark, sf).collect() // warm: stores built
    // r16: q211 persists its delta-pair sketch; drop it like Bench/
    // Verify do between queries, so the reconstructed subplan below
    // shows its SCANS rather than an InMemoryTableScan cache hit
    graft.ops.Dedup.releaseSketchCaches()
    // reconstruct the steady-state new-edge subplan exactly as q211
    // builds it (the propagation phase runs eagerly, so the final
    // census plan cannot carry these scans — this subplan is where
    // "delta + store, never history" must hold)
    val li = graft.Tables.lineitem(spark, sf)
    val keyed = li.select(col("l_orderkey").as("doc_id"),
      col("l_partkey").cast("string").as("text"))
    val (key, wm) = ScratchStores.corpusKey(keyed, s"$sf#coorders")
    val pairPath = ScratchStores.pathFor(key, "graft-copair-support")(_ =>
      fail("store should already exist after the warm run"))
    val store = new CoPairStore(spark, pairPath)
    val newEdges = Graphs.pairCounts(li.filter(col("l_orderkey") > wm))
      .join(store.state().withColumnRenamed("n_ab", "n_base"),
        Seq("part_a", "part_b"), "left")
      .filter(coalesce(col("n_base"), lit(0L)) < 2 &&
        coalesce(col("n_base"), lit(0L)) + col("n_ab") >= 2)
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    var scans = List.empty[FileSourceScanExec]
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec        => walk(q.plan)
      case r: ReusedExchangeExec    => walk(r.child)
      case sc: FileSourceScanExec   => scans ::= sc
      case other => other.children.foreach(walk)
    }
    walk(newEdges.queryExecution.executedPlan)
    def root(sc: FileSourceScanExec) =
      sc.relation.location.rootPaths.map(_.toString).mkString(",")
    // the order-local self-join reads the DELTA from two plan legs
    // (AQE reuses the exchange at runtime); what must hold at 100 TB
    // is that EVERY lineitem scan is watermark-pruned — the history
    // rows live only in the pair store
    val liScans = scans.filter(s => root(s).contains("lineitem.parquet"))
    assert(liScans.nonEmpty && liScans.size <= 2, s"unexpected scan set: ${scans.map(root)}")
    liScans.foreach { s =>
      assert(s.dataFilters.exists(_.toString.contains(s"> $wm")),
        s"lineitem scan without the delta watermark pushdown: ${s.dataFilters}")
    }
    assert(scans.map(root).exists(_.contains("graft-copair-support")),
      s"pair-support store missing from the plan: ${scans.map(root)}")
  }
}
