package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.SparkTestBase
import graft.flights.{FlightSchemas, StarWarehouse}
import org.apache.spark.sql.functions._

class StreamingStarBuildSpec extends SparkTestBase {
  import spark.implicits._

  private def stage(csv: String, outDir: String): Unit =
    FlightSchemas.renameToStaging(
      spark.read.schema(FlightSchemas.rawCsv).option("header", true)
        .csv(resource(csv)))
      .write.mode("append").parquet(outDir)

  test("micro-batches accumulate facts; dims converge with stable keys") {
    val root = tmpDir("sstar")
    val stagingDir = s"$root/staging"
    val wh = new StarWarehouse(spark, s"$root/wh")

    // batch 1: the clean fixture (50 valid rows)
    stage("flights_clean.csv", stagingDir)
    StreamingStarBuild.start(spark, stagingDir, s"$root/wh", s"$root/ckpt")
      .awaitTermination()
    val facts1 = wh.fact.count()
    assert(facts1 == 50)
    val keys1 = wh.dimAirlines.as[(Long, String)].collect().toMap

    // batch 2: more files land — same airlines + new rows (the small
    // fixture shares airlines/airports; its invalid rows are dropped)
    stage("flights_small.csv", stagingDir)
    StreamingStarBuild.start(spark, stagingDir, s"$root/wh", s"$root/ckpt")
      .awaitTermination()
    val facts2 = wh.fact.count()
    assert(facts2 == facts1 + 44) // 44 = small fixture's surviving fact rows
    // dims deduped, surrogate keys unchanged for existing names
    val keys2 = wh.dimAirlines.as[(Long, String)].collect().toMap
    keys1.foreach { case (id, name) => assert(keys2(id) == name) }
    assert(wh.dimAirlines.count() == wh.dimAirlines.select("airline_name").distinct().count())
  }

  test("restart with no new staged files appends nothing (exactly-once)") {
    val root = tmpDir("sstar")
    val stagingDir = s"$root/staging"
    stage("flights_clean.csv", stagingDir)
    StreamingStarBuild.start(spark, stagingDir, s"$root/wh", s"$root/ckpt")
      .awaitTermination()
    StreamingStarBuild.start(spark, stagingDir, s"$root/wh", s"$root/ckpt")
      .awaitTermination()
    val wh = new StarWarehouse(spark, s"$root/wh")
    assert(wh.fact.count() == 50)
  }
}
