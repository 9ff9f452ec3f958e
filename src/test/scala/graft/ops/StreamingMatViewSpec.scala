package graft.ops

import graft.SparkTestBase
import graft.streaming.StreamingMatView
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streaming materialized-view pipeline (14th): per-batch partial
  * states fold to the exact batch recompute, and redelivery is a
  * no-op. */
class StreamingMatViewSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def stateSet(df: DataFrame): Set[(String, String, Long, Long, Long, Long)] =
    df.select(col("source"), col("lang"), col("n_docs"), col("sum_chars"),
        col("min_chars"), col("max_chars"))
      .as[(String, String, Long, Long, Long, Long)].collect().toSet

  test("streamed view state equals the batch recompute; redelivery is a no-op") {
    val docs = graft.Tables.documents(spark, sf)
    val expect = stateSet(MatView.aggState(docs))

    val root = tmpDir("smv")
    val docsDir = s"$root/docs"
    val storePath = s"$root/state"
    docs.filter(col("doc_id") % 2 === 0).write.parquet(docsDir)
    StreamingMatView.start(spark, docsDir, storePath, s"$root/ckpt").awaitTermination()
    docs.filter(col("doc_id") % 2 === 1).write.mode("append").parquet(docsDir)
    StreamingMatView.start(spark, docsDir, storePath, s"$root/ckpt").awaitTermination()

    val store = new MatViewStore(spark, storePath)
    assert(stateSet(store.state()) == expect,
      "streamed view diverged from the batch recompute")

    // at-least-once: re-deliver batch 0 by hand — round replaced
    StreamingMatView.processBatch(docs.filter(col("doc_id") % 2 === 0), 0L, storePath)
    assert(stateSet(store.state()) == expect, "redelivery changed the view")
    // exactly one folded row per group
    assert(store.state().groupBy("source", "lang").count()
      .filter(col("count") > 1).isEmpty)
  }
}
