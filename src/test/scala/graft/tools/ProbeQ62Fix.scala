package graft.tools
import org.apache.spark.sql.SparkSession
/** A/B for the q62 explode tax (run manually; not part of the suite). */
object ProbeQ62Fix {
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
    // variant B: toks and bigrams as attributes through two selects
    val withToks = docs.select(col("doc_id"),
      split(lower(trim(col("text"))), "\\s+").as("toks"))
    val withBg = withToks.select(col("doc_id"),
      transform(sequence(lit(1), greatest(size(col("toks")) - 1, lit(1))),
        i => xxhash64(array_join(slice(col("toks"), i, lit(2)), " "))).as("bgs"))
    val exploded = withBg.select(col("doc_id"), explode(col("bgs")).as("bg"))
    for (r <- 1 to 2)
      time(s"B attr-projection explode r$r") { exploded.count() }
    // variant C: same but persist before explode
    val p = withBg.persist()
    val expC = p.select(col("doc_id"), explode(col("bgs")).as("bg"))
    for (r <- 1 to 2)
      time(s"C persisted explode r$r") { expC.count() }
    p.unpersist()
    spark.stop()
  }
}
