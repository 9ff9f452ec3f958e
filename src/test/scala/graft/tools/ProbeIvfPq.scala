package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: pooled + per-query recall for every ANN path and the
  * per-regime PQ audit at a given SF (IVF-PQ nprobe/shortlist tuning
  * feedback). Run:
  *   sbt "Test/runMain graft.tools.ProbeIvfPq /root/testdata/sf0.1"
  */
object ProbeIvfPq {
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
    val r = graft.ops.Similarity.annRecall(spark, dir)
    r.groupBy(col("method"))
      .agg(sum(col("n_hits")).as("hits"), sum(col("n_exact")).as("exact"),
        sum(col("n_candidates")).as("cands"))
      .withColumn("pooled_recall", col("hits") / col("exact"))
      .orderBy(col("method")).show(20, false)
    r.orderBy(col("method"), col("qid")).show(40, false)
    graft.ops.Similarity.pqRegimeRecall(spark, dir).show(20, false)
    spark.stop()
  }
}
