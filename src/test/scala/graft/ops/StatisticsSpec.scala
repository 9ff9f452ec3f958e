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
}
