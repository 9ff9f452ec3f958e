package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeDecontam2 {
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
    println(docs.selectExpr("count(*)", "cast(avg(n_chars) as int)",
      "cast(avg(size(split(text, '\\\\s+'))) as int)").collect().mkString)
    val withTh = docs.select(col("doc_id"),
      graft.ops.Assembly.splitColumn(col("doc_id")).as("split"),
      graft.ops.Dedup.tokenHashes(col("text")).as("th"))
    time("a: tokenHashes forced (sum size th)") {
      withTh.agg(sum(size(col("th")))).collect()(0)(0) }
    val grams = withTh.select(col("doc_id"), col("split"),
      graft.ops.Dedup.shinglesFromTokenHashes(col("th"), 5).as("grams"))
    time("b: grams forced (sum size grams)") {
      grams.agg(sum(size(col("grams")))).collect()(0)(0) }
    val tr = grams.filter(col("split") === "train").select(explode(col("grams")).as("g"))
    time("c: train explode count") { tr.count() }
    time("d: train explode distinct count") { tr.distinct().count() }
    // variant: persist grams, explode from cache
    val g2 = grams.persist()
    time("e: persist grams (materialize)") { g2.count() }
    val tr2 = g2.filter(col("split") === "train").select(explode(col("grams")).as("g"))
    time("f: train explode distinct from cache") { tr2.distinct().count() }
    spark.stop()
  }
}
