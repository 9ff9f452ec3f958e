package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: print q31b ANN recall + candidates-scanned at a given SF
  * (multiprobe tuning feedback). Run:
  *   sbt "Test/runMain graft.tools.ProbeRecall /root/testdata/sf0.01"
  */
object ProbeRecall {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.ops.Similarity.annRecall(spark, dir).show(50, false)
    spark.stop()
  }
}
