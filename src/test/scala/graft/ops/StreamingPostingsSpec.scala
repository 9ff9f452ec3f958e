package graft.ops

import graft.SparkTestBase
import graft.streaming.StreamingPostings
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streaming inverted-index pipeline (18th): stream-fed postings +
  * stats equal the batch build, retraction waves annihilate, replay is
  * a no-op, and the stream-maintained index SERVES the same BM25
  * scores as a corpus scan of the live documents. */
class StreamingPostingsSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def withOp(docs: DataFrame, op: String): DataFrame =
    docs.select(col("doc_id"), col("text"), col("lang"), col("source"),
      col("n_chars"), lit(op).as("op"))

  private def postingsSet(df: DataFrame): Set[(String, Long, Long, Long)] =
    df.select(col("term"), col("doc_id"), col("tf"), col("dl"))
      .as[(String, Long, Long, Long)].collect().toSet

  test("streamed index equals the batch build; a retraction wave annihilates; replay is a no-op") {
    val docs = graft.Tables.documents(spark, sf)
    val root = tmpDir("spost")
    val docsDir = s"$root/docs"
    val idx = s"$root/index"

    val base = docs.filter(col("doc_id") % 2 === 0)
    val wave = docs.filter(col("doc_id") % 2 === 1)
    withOp(base, "add").write.parquet(docsDir)
    StreamingPostings.start(spark, docsDir, idx, s"$root/ckpt").awaitTermination()
    withOp(wave, "add").write.mode("append").parquet(docsDir)
    StreamingPostings.start(spark, docsDir, idx, s"$root/ckpt").awaitTermination()

    val post = new PostingsStore(spark, s"$idx/postings")
    val stats = new CorpusStatsStore(spark, s"$idx/stats")
    assert(postingsSet(post.state()) == postingsSet(PostingsIndex.postingsOf(docs)),
      "streamed postings diverged from the batch build")
    assert(stats.state().as[(Long, Long)].head() ==
      PostingsIndex.statsOf(docs).as[(Long, Long)].head(),
      "streamed stats diverged from the batch build")

    // the stream-maintained index serves exactly the scan scores
    val served = graft.ops.TextAnalysis.bm25ScanOf(docs, TextAnalysis.bm25Terms)
      .collect().toSeq
    val (perDoc, statsRow) = PostingsIndex.perDocFromStores(
      post, stats, docs.limit(0), TextAnalysis.bm25Terms)
    val ti = TextAnalysis.bm25Terms.indices
    // score through the real q210 tail over the stream-built stores
    val viaIndex = TextAnalysis.bm25ScoreTail(perDoc, statsRow, ti)
      .collect().toSeq
    Dedup.releaseSketchCaches()
    assert(viaIndex == served, "stream-built index served different BM25 scores")

    // retraction: deleting the odd wave restores the base index exactly
    withOp(wave, "retract").write.mode("append").parquet(docsDir)
    StreamingPostings.start(spark, docsDir, idx, s"$root/ckpt").awaitTermination()
    assert(postingsSet(post.state()) == postingsSet(PostingsIndex.postingsOf(base)),
      "retraction did not restore the base postings")
    assert(stats.state().as[(Long, Long)].head() ==
      PostingsIndex.statsOf(base).as[(Long, Long)].head(),
      "retraction did not restore the base stats")

    // at-least-once: re-deliver the retraction batch by hand — both
    // rounds replace themselves, nothing double-retracts
    StreamingPostings.processBatch(withOp(wave, "retract"), 2L, idx)
    assert(postingsSet(post.state()) == postingsSet(PostingsIndex.postingsOf(base)),
      "redelivery changed the index state")
  }

  test("paired commits are ATOMIC at the read surface: a torn round (postings without stats) serves the previous consistent pair") {
    val docs = graft.Tables.documents(spark, sf)
    val root = tmpDir("spost-pair")
    val idx = s"$root/index"
    val terms = TextAnalysis.bm25Terms
    val ti = terms.indices

    val w0 = docs.filter(col("doc_id") % 3 === 0)
    val w1 = docs.filter(col("doc_id") % 3 === 1)
    val w2 = docs.filter(col("doc_id") % 3 === 2)
    StreamingPostings.processBatch(withOp(w0, "add"), 0L, idx)
    StreamingPostings.processBatch(withOp(w1, "add"), 1L, idx)

    def served: Seq[org.apache.spark.sql.Row] = {
      val (perDoc, statsRow) = PostingsIndex.perDocFromRoot(
        spark, idx, docs.limit(0), terms)
      val out = TextAnalysis.bm25ScoreTail(perDoc, statsRow, ti).collect().toSeq
      Dedup.releaseSketchCaches()
      out
    }
    val consistent01 = served
    assert(consistent01 ==
      TextAnalysis.bm25ScanOf(docs.filter(col("doc_id") % 3 < 2), terms)
        .collect().toSeq,
      "marker-bounded serving diverged from the two-wave scan")
    Dedup.releaseSketchCaches()

    // the VERDICT r13 #2 crash window, simulated: round 2's POSTINGS
    // commit lands, the stats commit (and marker) never do
    new PostingsStore(spark, s"$idx/postings").appendSignedRound(
      withOp(w2, "add").select(col("doc_id"), lit(1L).as("sign"), col("text")), 2L)
    assert(served == consistent01,
      "a torn round leaked into serving: reader saw postings without their stats")

    // the healed replay: the full pair lands, the marker advances,
    // and serving now includes round 2
    StreamingPostings.processBatch(withOp(w2, "add"), 2L, idx)
    assert(served == TextAnalysis.bm25ScanOf(docs, terms).collect().toSeq,
      "completed pair not visible after the marker advanced")
    Dedup.releaseSketchCaches()
  }

  test("the index-as-data audit is marker-bounded too: a torn round's postings never shift audit df") {
    // VERDICT r14 #3: q217/q218/q223 used to read post.state()
    // unbounded, so an audit racing StreamingPostings could count one
    // torn round of postings the paired stats commit hadn't matched.
    // auditPostings bounds at the same completion marker BM25 serving
    // uses, so audit df and serving agree under the race.
    val docs = graft.Tables.documents(spark, sf)
    val root = tmpDir("spost-audit")
    val idx = s"$root/index"
    val w0 = docs.filter(col("doc_id") % 2 === 0)
    val w1 = docs.filter(col("doc_id") % 2 === 1)
    StreamingPostings.processBatch(withOp(w0, "add"), 0L, idx)

    def auditDf: Map[String, Long] =
      PostingsIndex.auditPostings(spark, idx, docs.limit(0))
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
        .as[(String, Long)].collect().toMap
    def scanDf(of: DataFrame): Map[String, Long] =
      PostingsIndex.postingsOf(of)
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
        .as[(String, Long)].collect().toMap

    val df0 = auditDf
    assert(df0 == scanDf(w0), "marker-bounded audit df diverged from the scan")

    // the torn round: postings land, stats (and the marker) never do
    new PostingsStore(spark, s"$idx/postings").appendSignedRound(
      withOp(w1, "add").select(col("doc_id"), lit(1L).as("sign"), col("text")), 1L)
    assert(auditDf == df0,
      "audit read leaked a torn round: df counted postings without their stats")

    // healed replay: the full pair lands, the marker advances, the
    // audit sees the complete round
    StreamingPostings.processBatch(withOp(w1, "add"), 1L, idx)
    assert(auditDf == scanDf(docs),
      "completed round not visible to the audit after the marker advanced")
  }

  test("an unknown op fails the batch loudly") {
    val docs = graft.Tables.documents(spark, sf).limit(5)
    val root = tmpDir("spost-op")
    val err = intercept[Exception] {
      StreamingPostings.processBatch(withOp(docs, "upsert"), 0L, s"$root/index")
    }
    assert(err.getMessage != null && err.getMessage.contains("unknown op"),
      s"expected a loud unknown-op failure, got: $err")
  }
}
