package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc perf probe for q57b: stage-by-stage timing + plan shape
  * (run manually; not part of the suite). */
object ProbeDecontam {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.Tables.documents(spark, dir)
    time("corpus stats") {
      docs.selectExpr("count(*) n", "avg(n_chars) chars",
        "avg(size(split(text, '\\\\s+'))) toks").show()
    }
    val withTh = docs.select(col("doc_id"),
      graft.ops.Assembly.splitColumn(col("doc_id")).as("split"),
      graft.ops.Dedup.tokenHashes(col("text")).as("th"))
    val grams = withTh.select(col("doc_id"), col("split"),
      graft.ops.Dedup.shinglesFromTokenHashes(col("th"), 5).as("grams"))
    time("build grams (1 pass, count)") { println(grams.count()) }
    val tg = grams.filter(col("split") === "train")
      .select(explode(col("grams")).as("g")).distinct()
    time("train distinct grams") { println(tg.count()) }
    val ev = grams.filter(col("split") =!= "train")
      .select(col("doc_id"), explode(col("grams")).as("g"))
    time("eval gram rows") { println(ev.count()) }
    for (run <- 1 to 2) time(s"full q57b run$run") {
      graft.ops.Assembly.ngramDecontamination(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    val plan = graft.ops.Assembly.ngramDecontamination(spark, dir)
      .queryExecution.executedPlan.toString
    println("BroadcastHashJoin: " + "BroadcastHashJoin".r.findAllIn(plan).length)
    println("SortMergeJoin: " + "SortMergeJoin".r.findAllIn(plan).length)
    println("Exchange: " + "Exchange hashpartitioning".r.findAllIn(plan).length)
    println("FileScan: " + "FileScan".r.findAllIn(plan).length)
    spark.stop()
  }
}
