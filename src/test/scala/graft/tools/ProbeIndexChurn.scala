package graft.tools

import graft.ops.{CorpusStatsStore, Dedup, PostingsIndex, PostingsStore, TextAnalysis}
import graft.streaming.StreamingPostings
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured probe for VERDICT r13 #8: drive [[StreamingPostings]]
  * through enough add/retract churn that the postings store's
  * auto-compaction fires repeatedly, and record what a long-lived
  * deployment cares about — parquet file count, merged postings rows,
  * and steady-state BM25 serving time — before vs after compaction.
  * The spec suite proves "the index SHRINKS under deletes" at toy
  * scale; this makes it a measured property on the real fixture.
  *
  * Run: sbt "Test/runMain graft.tools.ProbeIndexChurn <sfDir> <waves>"
  */
object ProbeIndexChurn {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val waves = if (args.length > 1) args(1).toInt else 24
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft-churn").toString
    val idx = s"$root/index"
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))

    def files(path: String): Long = {
      val p = java.nio.file.Paths.get(path)
      if (!java.nio.file.Files.exists(p)) 0L
      else {
        val s = java.nio.file.Files.walk(p)
        try s.filter(f => java.nio.file.Files.isRegularFile(f)).count()
        finally s.close()
      }
    }
    def report(tag: String): Unit = {
      val post = new PostingsStore(spark, s"$idx/postings")
      val rows = post.state().count()
      val nFiles = files(s"$idx/postings")
      // steady-state serving-read time (the store-bound part of q210:
      // pruned postings merge + pivot + stats fold), median of 3
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val (perDoc, statsRow) = PostingsIndex.perDocFromRoot(
          spark, idx, docs.limit(0), TextAnalysis.bm25Terms)
        perDoc.collect(); statsRow.collect()
        Dedup.releaseSketchCaches()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[churn] $tag%-28s files=$nFiles%5d postings_rows=$rows%9d " +
        f"serve_med=${times(1)}%.3f s (min ${times(0)}%.3f)")
    }

    // each wave = one add batch (a third of the corpus, rotating) and,
    // every other wave, a retraction of the PREVIOUS add — sustained
    // delete churn, the auto-compaction threshold (8) crossed ~waves/8
    // times. Batch ids are the stream's rounds.
    var batchId = 0L
    def run(op: String, slice: Long): Unit = {
      StreamingPostings.processBatch(
        docs.filter(col("doc_id") % 3 === slice).withColumn("op", lit(op)),
        batchId, idx)
      batchId += 1
    }
    run("add", 0L) // standing base
    report(s"after bootstrap (1 round)")
    var w = 0
    while (w < waves) {
      val slice = (w % 2) + 1L
      run("add", slice)
      run("retract", slice)
      w += 1
      if (w % 8 == 0) report(f"after $w%2d churn waves (${batchId} rounds)")
    }
    report(f"final ($batchId rounds committed)")
    val stats = new CorpusStatsStore(spark, s"$idx/stats")
      .state().collect()(0)
    println(s"[churn] final stats row: n_docs=${stats.getLong(0)} " +
      s"total_toks=${stats.getLong(1)} (must equal the base wave alone)")
    spark.stop()
  }
}
