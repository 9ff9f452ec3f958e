package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Stage costs of the q165 AllPairs tier at sf1 (run manually). */
object ProbeQ165 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
    }
    val docs = graft.Tables.documents(spark, dir)
    val reps = docs.select(col("doc_id"), col("text"),
      xxhash64(col("text")).as("thash"))
      .groupBy(col("thash")).agg(min(col("doc_id")).as("doc_id"),
        first(col("text")).as("text"))
    val toks = reps.select(col("thash"),
        array_sort(graft.ops.Dedup.shingles(col("text"))).as("toks"))
      .withColumn("sz", size(col("toks"))).persist()
    time("reps+toks build")(toks.count())
    val exploded = toks.select(col("thash"), col("sz"), explode(col("toks")).as("tok"))
    val dfreq = exploded.groupBy(col("tok")).agg(count(lit(1)).as("df")).persist()
    time("dfreq")(dfreq.count())
    time("df dist")(dfreq.agg(max(col("df")), expr("percentile(df, 0.99)"), count(lit(1))).collect().mkString)
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("thash")).orderBy(col("df"), col("tok"))
    val prefix = exploded.join(dfreq, Seq("tok"))
      .withColumn("pos", row_number().over(wDoc))
      .filter(col("pos") <= col("sz") - expr("(50 * sz + 99) div 100") + 1)
      .select(col("tok"), col("thash"), col("sz"), col("pos")).persist()
    time("prefix build")(prefix.count())
    time("prefix df dist")(prefix.groupBy(col("tok")).count()
      .agg(max(col("count")), expr("percentile(count, 0.999)")).collect().mkString)
    val cands = prefix.select(col("tok"), col("thash").as("thash_a"),
        col("sz").as("sz_a"), col("pos").as("pos_a"))
      .join(prefix.select(col("tok"), col("thash").as("thash_b"),
        col("sz").as("sz_b"), col("pos").as("pos_b")), Seq("tok"))
      .filter(col("thash_a") < col("thash_b"))
      .filter(least(col("sz_a"), col("sz_b")) * 100 >=
        greatest(col("sz_a"), col("sz_b")) * 50)
      .filter(least(col("sz_a") - col("pos_a"), col("sz_b") - col("pos_b")) + 1 >=
        expr("(50 * (sz_a + sz_b) + 149) div 150"))
    time("raw candidates")(cands.count())
    val dd = cands.select(col("thash_a"), col("thash_b")).distinct().persist()
    time("distinct pairs")(dd.count())
    time("verify") {
      dd.join(toks.select(col("thash").as("thash_a"), col("toks").as("toks_a"),
          col("sz").as("sz_a")), Seq("thash_a"))
        .join(toks.select(col("thash").as("thash_b"), col("toks").as("toks_b"),
          col("sz").as("sz_b")), Seq("thash_b"))
        .withColumn("n_inter",
          graft.functions.SetOps.sorted_inter_count(col("toks_a"), col("toks_b")).cast("long"))
        .filter(col("n_inter") * 100 >= (col("sz_a") + col("sz_b") - col("n_inter")) * 50)
        .count()
    }
    spark.stop()
  }
}
