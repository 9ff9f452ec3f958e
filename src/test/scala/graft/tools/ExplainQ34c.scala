package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan probe: confirms q34c's truth-location join broadcasts
  * the planted side (run manually; not part of the suite). */
object ExplainQ34c {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.ops.Dedup.nearDupRecall(spark, "/root/testdata/sf0.01")
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    println("BroadcastHashJoin count: " + "BroadcastHashJoin".r.findAllIn(s).length)
    println("SortMergeJoin count: " + "SortMergeJoin".r.findAllIn(s).length)
    spark.stop()
  }
}
