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
}
