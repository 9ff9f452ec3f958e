package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.SparkTestBase

class StreamingIngestSpec extends SparkTestBase {
  test("file-source ingest drains available files and dedups by row hash") {
    val root = tmpDir("sstream")
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    Files.copy(Paths.get(resource("flights_small.csv")),
      Paths.get(s"$in/a.csv"), StandardCopyOption.REPLACE_EXISTING)

    val q1 = StreamingIngest.start(spark, in, s"$root/staging", s"$root/ckpt")
    q1.awaitTermination()
    assert(spark.read.parquet(s"$root/staging").count() == 49)

    // a second file: 49 duplicate rows + 18 genuinely new (append fixture)
    Files.copy(Paths.get(resource("flights_append.csv")),
      Paths.get(s"$in/b.csv"), StandardCopyOption.REPLACE_EXISTING)
    val q2 = StreamingIngest.start(spark, in, s"$root/staging", s"$root/ckpt")
    q2.awaitTermination()
    // dropDuplicates state persists via the checkpoint: only the 15
    // distinct new rows land (3 of the 18 appended are dupes).
    assert(spark.read.parquet(s"$root/staging").count() == 64)
  }

  test("bounded-state ingest dedups within the watermark window") {
    val root = tmpDir("sstream")
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    Files.copy(Paths.get(resource("flights_small.csv")),
      Paths.get(s"$in/a.csv"), StandardCopyOption.REPLACE_EXISTING)

    def drain(): Unit =
      StreamingIngest.planBounded(spark, in, dedupWindow = "10 minutes")
        .writeStream.format("parquet")
        .option("path", s"$root/staging")
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()

    drain()
    assert(spark.read.parquet(s"$root/staging").count() == 49)
    // re-delivery well inside the window: the duplicate file adds nothing
    Files.copy(Paths.get(resource("flights_small.csv")),
      Paths.get(s"$in/b.csv"), StandardCopyOption.REPLACE_EXISTING)
    drain()
    assert(spark.read.parquet(s"$root/staging").count() == 49,
      "within-watermark duplicates must drop")
    // staging layout matches the unbounded path's contract
    assert(spark.read.parquet(s"$root/staging").columns.toSeq ==
      graft.flights.FlightSchemas.renameMap.map(_._2))
  }

  test("restarting with no new files emits nothing") {
    val root = tmpDir("sstream")
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    Files.copy(Paths.get(resource("flights_small.csv")),
      Paths.get(s"$in/a.csv"), StandardCopyOption.REPLACE_EXISTING)
    StreamingIngest.start(spark, in, s"$root/staging", s"$root/ckpt").awaitTermination()
    StreamingIngest.start(spark, in, s"$root/staging", s"$root/ckpt").awaitTermination()
    assert(spark.read.parquet(s"$root/staging").count() == 49)
  }
}
