package graft.flights

import graft.SparkTestBase
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

class StarSchemaSpec extends SparkTestBase {
  import spark.implicits._

  private def stagingFromCsv(name: String): DataFrame =
    FlightSchemas.renameToStaging(
      spark.read.schema(FlightSchemas.rawCsv).option("header", true)
        .csv(resource(name)))

  test("transform builds the 13-column fact and three dims") {
    val wh = new StarWarehouse(spark, tmpDir("star"))
    val stats = wh.transform(stagingFromCsv("flights_small.csv"))
    assert(stats.rowsIn == 49)
    assert(stats.rowsDropped == 4) // the four T-5 invalid rows
    assert(wh.fact.columns.toSeq == FlightSchemas.factColumns)
    // fact loses the null-departure row too (T-12 dropna on date FK)
    assert(stats.factRows == 44)
    // dims: 4 distinct title-cased airlines, 6 airports (dedup by code)
    assert(wh.dimAirlines.count() == 4)
    assert(wh.dimAirports.count() == 6)
    val names = wh.dimAirlines.select("airline_name").as[String].collect().toSet
    assert(names == Set("Biman Bangladesh", "Us-Bangla", "Novoair", "Air Astra"))
  }

  test("dim_date: pandas dow convention, weekend flag, seasonality max-wins") {
    val wh = new StarWarehouse(spark, tmpDir("star"))
    wh.transform(stagingFromCsv("flights_small.csv"))
    val d = wh.dimDate.filter(col("date_id") === "2024-01-06").head()
    // 2024-01-06 is a Saturday: pandas dow 5, weekend
    assert(d.getAs[Int]("day_of_week") == 5)
    assert(d.getAs[Boolean]("is_weekend"))
    // 2024-01-05: conflicting labels Winter vs Eid -> max picks Winter
    val s = wh.dimDate.filter(col("date_id") === "2024-01-05").head()
    assert(s.getAs[String]("seasonality") == "Winter")
    // empty-seasonality date falls back to Normal
    val n = wh.dimDate.filter(col("date_id") === "2024-08-09").head()
    assert(n.getAs[String]("seasonality") == "Normal")
  }

  test("surrogate keys are dense, stable across incremental runs") {
    val root = tmpDir("star")
    val wh = new StarWarehouse(spark, root)
    wh.transform(stagingFromCsv("flights_small.csv"))
    val before = wh.dimAirlines.as[(Long, String)].collect().toMap.map(_.swap)
    // incremental run with extra airlines (append fixture has same 4 + none new,
    // so synthesize a new airline)
    val extra = stagingFromCsv("flights_small.csv")
      .withColumn("airline", lit("brand NEW air"))
    val combined = stagingFromCsv("flights_small.csv").unionByName(extra)
    wh.transform(combined)
    val after = wh.dimAirlines.as[(Long, String)].collect().toMap.map(_.swap)
    // old names keep their ids; the new one gets max+1
    before.foreach { case (name, id) => assert(after(name) == id) }
    assert(after("Brand New Air") == before.values.max + 1)
    assert(after.values.toSeq.sorted == (1L to after.size).toSeq)
  }

  test("transform is idempotent on the fact (overwrite, not blind append)") {
    val root = tmpDir("star")
    val wh = new StarWarehouse(spark, root)
    val s1 = wh.transform(stagingFromCsv("flights_small.csv"))
    val s2 = wh.transform(stagingFromCsv("flights_small.csv"))
    assert(s1.factRows == s2.factRows)
    assert(wh.dimAirlines.count() == 4)
    assert(wh.dimAirports.count() == 6)
  }

  test("fact FK resolution: every surviving row joins to real dim rows") {
    val wh = new StarWarehouse(spark, tmpDir("star"))
    wh.transform(stagingFromCsv("flights_small.csv"))
    val fact = wh.fact
    val orphans = fact
      .join(wh.dimAirlines, Seq("airline_id"), "left_anti")
    assert(orphans.isEmpty)
    val orphanAirports = fact.join(
      wh.dimAirports.select(col("airport_id").as("source_airport_id")),
      Seq("source_airport_id"), "left_anti")
    assert(orphanAirports.isEmpty)
  }
}
