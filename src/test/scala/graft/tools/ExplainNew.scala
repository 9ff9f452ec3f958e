package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: formatted plans for a list of registered queries.
  * Run: sbt "Test/runMain graft.tools.ExplainNew <sfDir> <name> [name...]"
  */
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      println(s"========== $name ==========")
      graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
      graft.ops.Dedup.releaseSketchCaches()
    }
    spark.stop()
  }
}
