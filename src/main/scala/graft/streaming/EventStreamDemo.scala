package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Streaming demo entry: drain the events table as a file-source
  * stream through the watermarked hourly aggregation and print what
  * landed — the Structured Streaming counterpart of q25.
  *
  * Usage: runMain graft.streaming.EventStreamDemo [sfDir]
  */
object EventStreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val q = EventStreams.hourlyCounts(EventStreams.eventsStream(spark, sfDir))
      .writeStream.format("memory").queryName("stream_demo")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table("stream_demo")
    println(s"[stream-demo] finalized windows: ${out.count()}")
    out.orderBy("window_start", "event_type").show(5, truncate = false)
    spark.stop()
  }
}
