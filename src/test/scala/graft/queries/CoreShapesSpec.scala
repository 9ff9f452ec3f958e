package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Plan-shape pins for the optimizer-exercising Core queries: these
  * queries exist to prove a specific Catalyst behavior, so the spec
  * asserts the PLAN, not just the rows (the oracle gate covers rows). */
class CoreShapesSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q114: the part-only disjunction is pushed below the join to the part scan") {
    val plan = q("q114_disjunctive_bands").queryExecution.executedPlan.toString
    // the factored OR over (p_brand, p_size) must reach the parquet
    // source as a pushed filter — dim rows die at the scan, pre-join
    val pushedToPart = plan.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("Or(") && l.contains("p_brand"))
    assert(pushedToPart, s"no Or(...p_brand...) in PushedFilters:\n$plan")
    // and the quantity side reaches the lineitem scan likewise
    val pushedToFact = plan.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("l_quantity"))
    assert(pushedToFact, s"no l_quantity pushdown on the fact scan:\n$plan")
  }

  test("q115: buckets are equal-height with ntile's n mod k split, cover all rows") {
    val rows = q("q115_equidepth_histogram").collect()
    val n = graft.Tables.lineitem(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_items")).sum == n)
    val sizes = rows.sortBy(_.getAs[Int]("bucket")).map(_.getAs[Long]("n_items"))
    // ntile: first (n mod 10) buckets hold ceil(n/10), the rest floor
    val (hi, lo, cut) = (n / 10 + (if (n % 10 > 0) 1 else 0), n / 10, (n % 10).toInt)
    sizes.zipWithIndex.foreach { case (s, i) =>
      assert(s == (if (i < cut || n % 10 == 0) if (n % 10 == 0) lo else hi else lo),
        s"bucket ${i + 1} size $s, expected ${if (i < cut) hi else lo}")
    }
    // bucket ranges tile the domain in order
    val sorted = rows.sortBy(_.getAs[Int]("bucket"))
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"))
    }
  }

  test("q125: grouping sets run as ONE Expand+agg; subtotals reconcile") {
    val df = q("q125_grouping_sets")
    val plan = df.queryExecution.executedPlan.toString
    // all four sets come from one Expand fan-out over one scan — the
    // whole point vs four scans unioned
    assert(plan.linesIterator.count(_.trim.matches("[+:\\-\\s]*Expand .*")) == 1,
      s"want exactly one Expand:\n$plan")
    assert(plan.linesIterator.count(_.contains("FileScan parquet")) == 1,
      s"grouping sets must not multiply the scan:\n$plan")
    val rows = df.collect()
    def n(p: org.apache.spark.sql.Row => Boolean) =
      rows.filter(p).map(_.getAs[Long]("n_items")).sum
    val detail = n(r => r.getAs[Int]("g_flag") == 0 && r.getAs[Int]("g_status") == 0)
    val byFlag = n(r => r.getAs[Int]("g_flag") == 0 && r.getAs[Int]("g_status") == 1)
    val byStatus = n(r => r.getAs[Int]("g_flag") == 1 && r.getAs[Int]("g_status") == 0)
    val grand = n(r => r.getAs[Int]("g_flag") == 1 && r.getAs[Int]("g_status") == 1)
    // every set partitions the same input
    assert(detail == grand && byFlag == grand && byStatus == grand && grand > 0)
    // the per-STATUS subtotal is the set ROLLUP cannot produce —
    // assert it really exists with a NULL flag and non-null status
    assert(rows.exists(r => r.getAs[Int]("g_flag") == 1 &&
      r.getAs[Int]("g_status") == 0 && r.isNullAt(r.fieldIndex("l_returnflag")) &&
      !r.isNullAt(r.fieldIndex("l_linestatus"))))
  }

  test("q120: winner is the true mode with smallest-priority tie-break; exact share") {
    val df = q("q120_priority_mode")
    // the row_number()=1 selection must take the TopKPerGroup heap
    // rewrite (k=1), not the stock Window+Filter — the seg_total
    // window node below it must not block the pattern
    assert(df.queryExecution.executedPlan.toString.contains("TopKPerGroup"),
      "rank-limit rewrite did not fire on q120's row_number()=1 filter")
    val rows = df.collect()
    // independent driver-side mode from the raw counts
    val counts = graft.Tables.orders(spark, sf)
      .join(graft.Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority")).count()
      .collect()
      .map(r => (r.getAs[String]("c_mktsegment"),
        r.getAs[String]("o_orderpriority"), r.getAs[Long]("count")))
    val bySeg = counts.groupBy(_._1)
    assert(rows.length == bySeg.size, "exactly one winner per segment")
    rows.foreach { r =>
      val seg = r.getAs[String]("c_mktsegment")
      val grp = bySeg(seg)
      // mode: max count, then lexicographically smallest priority
      val want = grp.minBy(t => (-t._3, t._2))
      assert(r.getAs[String]("o_orderpriority") == want._2, s"mode($seg)")
      assert(r.getAs[Long]("n_orders") == want._3)
      val total = grp.map(_._3).sum
      assert(r.getAs[Long]("share_ppm") == want._3 * 1000000L / total)
    }
  }

  test("q134: share recomputes from its own revenue columns; facts meet in one exchange") {
    val df = q("q134_market_share")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nat, tot) = (r.getAs[Double]("nation_revenue"), r.getAs[Double]("total_revenue"))
      assert(nat >= 0 && nat <= tot && tot > 0)
      assert(r.getAs[Double]("mkt_share_pct") == 100.0 * nat / tot)
    }
    // every dim side broadcasts; the only shuffled join is li ⋈ orders
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.linesIterator.count(_.contains("SortMergeJoin")) <= 1,
      s"more than the one fact-fact exchange:\n$plan")
  }

  test("q135: semi-join counts each late order once; matches a driver-side EXISTS") {
    val rows = q("q135_late_shipment_priority").collect()
    // independent spelling: join + distinct orderkeys, then count
    val late = graft.Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
      .join(graft.Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("o_orderkey"), col("o_orderpriority")).distinct()
      .groupBy(col("o_orderpriority")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    assert(rows.map(r => r.getAs[String]("o_orderpriority") ->
      r.getAs[Long]("n_orders")).toMap == late)
  }

  test("q136: distribution covers every customer; zero bucket counts the orderless") {
    val rows = q("q136_customer_order_distribution").collect()
    val nCust = graft.Tables.customer(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == nCust)
    // cross-check the zero bucket: customers minus distinct custkeys
    // holding at least one qualifying order
    val withOrders = graft.Tables.orders(spark, sf)
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .select(col("o_custkey")).distinct().count()
    val zero = rows.find(_.getAs[Long]("c_count") == 0L)
      .map(_.getAs[Long]("n_customers")).getOrElse(0L)
    assert(zero == nCust - withOrders)
  }

  test("q144: margin matches a double cross-check; name filter prunes the part scan") {
    val df = q("q144_margin_by_nation")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // independent double spelling (tolerance-checked)
    val ref = graft.Tables.lineitem(spark, sf)
      .join(graft.Tables.part(spark, sf).filter(col("p_name").like("%widget%")),
        col("l_partkey") === col("p_partkey"))
      .join(graft.Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .join(graft.Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .join(graft.Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("y"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        - col("p_retailprice") * col("l_quantity") * 0.6).as("m"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    rows.foreach { r =>
      val k = (r.getAs[String]("nation"), r.getAs[Int]("order_year"))
      assert(math.abs(r.getAs[Double]("margin") - ref(k)) < 1e-4, s"margin($k)")
    }
    // the part-name filter reaches the part scan as a pushed predicate
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("p_name")), plan)
  }

  test("q148: local-supply revenue matches a double cross-check; one fact-fact exchange") {
    val df = q("q148_local_supplier_volume")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val ref = graft.Tables.lineitem(spark, sf)
      .join(graft.Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .join(graft.Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.supplier(spark, sf),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(graft.Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .join(graft.Tables.region(spark, sf).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("n_name"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("r"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(rows.map(_.getAs[String]("nation")).toSet == ref.keySet)
    rows.foreach { r =>
      val (rr, rn) = ref(r.getAs[String]("nation"))
      assert(math.abs(r.getAs[Double]("revenue") - rr) < 1e-4)
      assert(r.getAs[Long]("n_items") == rn)
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("SortMergeJoin")) <= 1,
      s"more than the one fact-fact exchange:\n$plan")
  }

  test("q137: top-20 plan is TakeOrdered, not a global sort; revenue order total") {
    val df = q("q137_returned_top_customers")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"LIMIT over ORDER BY should plan as TakeOrderedAndProject:\n$plan")
    val rows = df.collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val keys = rows.map(r => (-r.getAs[Double]("revenue"), r.getAs[Long]("c_custkey"))).toSeq
    assert(keys == keys.sorted, "rows must arrive in (revenue DESC, custkey) order")
    rows.foreach(r => assert(r.getAs[Double]("revenue") > 0))
  }
}
