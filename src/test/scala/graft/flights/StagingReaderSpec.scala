package graft.flights

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.SparkTestBase
import graft.streaming.StreamingIngest

class StagingReaderSpec extends SparkTestBase {

  /** batch root ingests flights_small (49 rows); streaming root
    * ingests flights_append (67 rows; 3 are intra-file dupes, so 64
    * distinct: the batch side's 49 plus 15 new). */
  private def twoRoots(): (String, String) = {
    val batchRoot = tmpDir("stg-batch")
    val batchCsv = s"$batchRoot/flights.csv"
    Files.copy(Paths.get(resource("flights_small.csv")), Paths.get(batchCsv),
      StandardCopyOption.REPLACE_EXISTING)
    new FlightIngest(spark, batchRoot).ingest(batchCsv)

    val streamRoot = tmpDir("stg-stream")
    val in = s"$streamRoot/in"
    Files.createDirectories(Paths.get(in))
    Files.copy(Paths.get(resource("flights_append.csv")), Paths.get(s"$in/a.csv"))
    StreamingIngest.start(spark, in, s"$streamRoot/staging", s"$streamRoot/ckpt")
      .awaitTermination()
    (s"$batchRoot/staging", s"$streamRoot/staging")
  }

  test("unified read spans both layouts; cross-source dedup is exact") {
    val (batchStaging, streamStaging) = twoRoots()
    // layouts really differ: batch is partitioned, streaming is flat
    assert(new java.io.File(batchStaging).listFiles()
      .exists(_.getName.startsWith("ingest_batch=")))
    assert(!new java.io.File(streamStaging).listFiles()
      .exists(_.getName.startsWith("ingest_batch=")))

    val union = StagingReader.read(spark, Seq(batchStaging, streamStaging))
    assert(union.count() == 49 + 64) // raw union keeps the overlap
    assert(union.columns.length == 17 && !union.columns.contains("ingest_batch"))

    val deduped = StagingReader.read(spark, Seq(batchStaging, streamStaging),
      dedupAcrossSources = true)
    assert(deduped.count() == 64, "the 49 overlap rows must collapse")

    // the unified view feeds the warehouse directly
    val wh = new StarWarehouse(spark, tmpDir("stg-wh"))
    val stats = wh.transform(deduped)
    assert(stats.rowsIn == 64)
  }

  test("single-root read matches the writer's own view") {
    val (batchStaging, _) = twoRoots()
    assert(StagingReader.read(spark, Seq(batchStaging)).count() == 49)
  }
}
