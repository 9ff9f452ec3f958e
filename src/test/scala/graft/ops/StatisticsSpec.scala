package graft.ops

import graft.SparkTestBase

class StatisticsSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"
  private val tables = Seq("lineitem", "orders", "customer")

  private def withCbo[T](enabled: Boolean)(body: => T): T = {
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    val prevReorder = spark.conf.get("spark.sql.cbo.joinReorder.enabled")
    spark.conf.set("spark.sql.cbo.enabled", enabled)
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", enabled)
    try body
    finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", prevReorder)
    }
  }

  test("an all-NTZ table falls back to table-level stats, not a parse error") {
    // ADVICE r9: with every column TIMESTAMP_NTZ-excluded the FOR
    // COLUMNS list rendered empty and ANALYZE died parsing — the
    // fallback is the plain table-level pass
    import org.apache.spark.sql.functions._
    val dir = tmpDir("ntz-only")
    graft.Tables.orders(spark, sf)
      .select(col("o_orderdate").as("only_ntz")).limit(10)
      .write.mode("overwrite").parquet(s"$dir/ntzonly.parquet")
    assert(spark.read.parquet(s"$dir/ntzonly.parquet").schema.fields.forall(
      _.dataType.isInstanceOf[org.apache.spark.sql.types.TimestampNTZType]))
    Statistics.analyzeTables(spark, dir, Seq("ntzonly"))
    withCbo(true) {
      assert(Statistics.estimatedRows(spark, "ntzonly").contains(BigInt(10)))
    }
  }

  test("ANALYZE populates row and column statistics the optimizer can see") {
    Statistics.analyzeTables(spark, sf, tables)
    withCbo(true) {
      val li = Statistics.estimatedRows(spark, "lineitem")
      val c = Statistics.estimatedRows(spark, "customer")
      assert(li.nonEmpty && c.nonEmpty, "ANALYZE left no rowCount in the catalog")
      assert(li.get > c.get, s"lineitem ($li) should dwarf customer ($c)")
    }
  }

  test("ANALYZE covers the full testdata catalog, documents and events included") {
    Statistics.analyzeTables(spark, sf, Statistics.testdataTables)
    withCbo(true) {
      for (t <- Statistics.testdataTables) {
        val rows = Statistics.estimatedRows(spark, t)
        assert(rows.exists(_ > 0), s"ANALYZE left no rowCount for $t")
      }
      // sanity on relative magnitudes the optimizer will reason with
      val ev = Statistics.estimatedRows(spark, "events").get
      val docs = Statistics.estimatedRows(spark, "documents").get
      val nat = Statistics.estimatedRows(spark, "nation").get
      assert(ev > docs && docs > nat,
        s"events ($ev) > documents ($docs) > nation ($nat) expected")
    }
  }

  test("CBO join reorder overrides a bad syntactic order (no hints anywhere)") {
    Statistics.analyzeTables(spark, sf, tables)
    val ruleBased = withCbo(false)(Statistics.joinOrder(Statistics.threeWayJoin(spark)))
    val costBased = withCbo(true)(Statistics.joinOrder(Statistics.threeWayJoin(spark)))
    assert(ruleBased.head == "stats_lineitem",
      s"premise broken: rule-based order should keep the written order, got $ruleBased")
    assert(costBased != ruleBased,
      s"stats did not change the join order: $costBased")
    assert(costBased.head != "stats_lineitem",
      s"CBO still leads with the fact table: $costBased")

    // same rows either way — reorder is a pure cost decision
    val expected = withCbo(false)(Statistics.threeWayJoin(spark).collect().toSeq)
    val got = withCbo(true)(Statistics.threeWayJoin(spark).collect().toSeq)
    assert(got == expected)
  }

  test("catalog mode routes Tables loads through the ANALYZE'd entries, per dir") {
    try {
      Statistics.registerForQueries(spark, sf)
      // registered dir: the load is the catalog table, stats visible
      val viaCatalog = graft.Tables.lineitem(spark, sf)
      val leaves = viaCatalog.queryExecution.optimizedPlan.collectLeaves()
      assert(leaves.exists {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.catalogTable.exists(_.identifier.table == "stats_lineitem")
        case _ => false
      }, "registered dir must resolve through the catalog")
      assert(withCbo(true)(
        viaCatalog.queryExecution.optimizedPlan.stats.rowCount.exists(_ > 0)))
      // any OTHER dir keeps the raw path read (the bench pre-pass case)
      val viaPath = graft.Tables.lineitem(spark, "/root/testdata/sf0.01")
      assert(viaPath.queryExecution.optimizedPlan.collectLeaves().forall {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.catalogTable.isEmpty
        case _ => true
      }, "unregistered dirs must stay path reads")
      // a representative query answers identically in catalog mode
      val q = graft.SparkEntry.queries("q04_revenue_by_nation")
      val got = q(spark, sf).collect().toSeq
      // an NTZ-banded query must survive CBO estimation: Spark 4.1's
      // filter estimator MatchErrors on TimestampNTZType column stats,
      // which is why analyzeTables excludes NTZ columns from the
      // column-stats pass (regression: first full catalog-mode bench
      // failed five shipdate/orderdate band queries)
      val ntzBanded = withCbo(true)(
        graft.SparkEntry.queries("q126_promo_share")(spark, sf).collect().toSeq)
      spark.conf.unset(graft.Tables.catalogDirKey)
      val want = q(spark, sf).collect().toSeq
      assert(got == want)
      assert(ntzBanded ==
        graft.SparkEntry.queries("q126_promo_share")(spark, sf).collect().toSeq)
    } finally spark.conf.unset(graft.Tables.catalogDirKey)
  }
}
