package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: phase-by-phase wall timing of q34c's constituent
  * pipelines at one SF, to see where its bench time goes.
  * Run: sbt "Test/runMain graft.tools.ProbeQ34cPhases <sfDir>"
  */
object ProbeQ34cPhases {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[phase] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // JIT warm-up at tiny SF, like Bench's pre-pass
    for (q <- Seq("q34_minhash_neardups", "q35_simhash_neardups",
        "q36_ngram_jaccard_blocked", "q34c_neardup_recall")) {
      graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      graft.ops.Dedup.releaseSketchCaches()
    }
    for (round <- 1 to 2) {
      println(s"== round $round ==")
      time("q34 minhash") {
        graft.SparkEntry.queries("q34_minhash_neardups")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      graft.ops.Dedup.releaseSketchCaches()
      time("q35 simhash") {
        graft.SparkEntry.queries("q35_simhash_neardups")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      graft.ops.Dedup.releaseSketchCaches()
      time("q36 ngram") {
        graft.SparkEntry.queries("q36_ngram_jaccard_blocked")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      graft.ops.Dedup.releaseSketchCaches()
      time("q34c full") {
        graft.SparkEntry.queries("q34c_neardup_recall")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      graft.ops.Dedup.releaseSketchCaches()
    }
    spark.stop()
  }
}
