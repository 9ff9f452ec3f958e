package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: run one registered query with Bench's session config and
  * the noop sink, printing the failure if any.
  * Run: sbt "Test/runMain graft.tools.ProbeQ <sfDir> <queryName>"
  */
object ProbeQ {
  def main(args: Array[String]): Unit = {
    val (dir, name) = (args(0), args(1))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (run <- 1 to 2) { // cold + steady-state, like Bench
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      graft.ops.Dedup.releaseSketchCaches()
      println(f"[probeq] $name run$run ok in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
