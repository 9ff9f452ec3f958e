package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: Spark-side sampled count on the skewed mixture fixture,
  * for exact cross-engine comparison with the DuckDB predicate. */
object ProbeMixture {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = ((0L until 300L).map(i => (i, "big")) ++
      (1000L until 1050L).map(i => (i, "small"))).toDF("doc_id", "source")
    val n = graft.ops.Assembly.mixtureOf(docs)
      .filter($"source" === "big" && $"sampled").count()
    println(s"[mix] big sampled=$n")
    spark.stop()
  }
}
