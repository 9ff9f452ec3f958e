package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan audit for the round-5 queries: prints scan / exchange /
  * codegen-span counts per query so the shapes can be eyeballed and
  * recorded in NOTES (run manually; not part of the suite).
  * Run: sbt "Test/runMain graft.tools.ExplainR5 <sfDir>"
  */
object ExplainR5 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("q67_boilerplate_removal", "q67b_boilerplate_top",
      "q67c_boilerplate_incremental", "q68_tokenizer_fertility",
      "q69_document_chunks", "q70_token_budget_selection",
      "q71_semantic_dedup", "q72_novel_bigram_rate", "q73_length_histogram",
      "q74_stratified_sample", "q75_metadata_audit", "q76_quality_topk",
      "q77_event_funnel", "q78_cohort_retention", "q79_cms_heavy_hitters",
      "q80_error_bursts", "q81_dupgram_fraction")
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, dir)
      df.collect() // force AQE final plan
      val s = df.queryExecution.executedPlan.toString
      def c(p: String) = p.r.findAllIn(s).length
      println(f"[plan] $n%-30s scans=${c("Scan parquet")}" +
        f" exch=${c("Exchange")} reuse=${c("ReusedExchange")}" +
        f" bhj=${c("BroadcastHashJoin")} smj=${c("SortMergeJoin")}" +
        f" wsc=${c("WholeStageCodegen")}")
      graft.ops.Dedup.releaseSketchCaches()
    }
    spark.stop()
  }
}
