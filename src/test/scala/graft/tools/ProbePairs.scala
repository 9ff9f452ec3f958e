package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: count LSH candidate pairs for the embedding near-dup tier
  * at a given SF dir — attributes q37's sf1 scaling to true candidate
  * density rather than plan shape.
  * Run: sbt "Test/runMain graft.tools.ProbePairs <dir>"
  */
object ProbePairs {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.embeddings(spark, dir)
    val n = emb.count()
    val pairs = graft.ops.Similarity.candidatePairs(emb, "vec_id", "embedding").count()
    println(s"[pairs] dir=$dir corpus=$n candidate_pairs=$pairs")
    spark.stop()
  }
}
