package graft.tools
import org.apache.spark.sql.SparkSession
/** Measures the lambda-inlining tax: HOF chains whose array inputs
  * collapse into the lambda body re-evaluate the input per element
  * (run manually; not part of the suite). */
object ProbeHofTax {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    def time[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
    }
    val docs = graft.Tables.documents(spark, dir)
    // force full array evaluation: element_at(x, -1) reads the last
    // element, which needs the whole array built (size() would be
    // optimized to skip the transform)
    val fps = {
      // replica of Dedup.fpShingleIndex (private[ops])
      val t1 = docs.select(col("doc_id"),
        md5(array_join(slice(split(lower(trim(col("text"))), "\\s+"), 1, 4), " ")).as("fp"),
        graft.ops.Dedup.tokenHashes(col("text")).as("th"))
      t1.select(col("doc_id"), col("fp"),
        graft.ops.Dedup.shinglesFromTokenHashes(col("th")).as("sh"))
    }
    for (r <- 1 to 2)
      time(s"fpShingleIndex uncached r$r") {
        fps.agg(sum(element_at(col("sh"), -1))).collect()(0)(0) }
    val p = fps.persist()
    time("fpShingleIndex persist") {
      p.agg(sum(element_at(col("sh"), -1))).collect()(0)(0) }
    p.unpersist()
    // q62 current shape
    for (r <- 1 to 2)
      time(s"q62 current r$r") {
        graft.ops.TextAnalysis.repetitionScores(spark, dir)
          .write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
