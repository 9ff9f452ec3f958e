package graft.ops

import graft.SparkTestBase
import graft.streaming.StreamingKAnonymity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streaming k-anonymity pipeline (19th): stream-fed class counts
  * serve the same ladder as a one-shot rollup, a retraction wave (the
  * erasure feed) shrinks the audit exactly, mixed batches fold to the
  * net change, and replay is a no-op. */
class StreamingKAnonymitySpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def withOp(cust: DataFrame, op: String): DataFrame =
    cust.select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"),
      col("c_acctbal").cast("double").as("c_acctbal"), lit(op).as("op"))

  private def ladderSet(df: DataFrame) =
    df.select(col("level"), col("k"), col("n_classes"), col("n_rows"), col("risky"))
      .as[(String, Long, Long, Long, Boolean)].collect().toSet

  private def recompute(cust: DataFrame) =
    ladderSet(Privacy.ladderView(Privacy.classState(cust)))

  test("streamed ladder equals the batch rollup; a retraction wave shrinks it exactly; replay is a no-op") {
    val cust = graft.Tables.customer(spark, sf)
    val root = tmpDir("skanon")
    val custDir = s"$root/cust"
    val store = s"$root/state"

    val base = cust.filter(col("c_custkey") % 2 === 0)
    val wave = cust.filter(col("c_custkey") % 2 === 1)
    withOp(base, "add").write.parquet(custDir)
    StreamingKAnonymity.start(spark, custDir, store, s"$root/ckpt").awaitTermination()
    withOp(wave, "add").write.mode("append").parquet(custDir)
    StreamingKAnonymity.start(spark, custDir, store, s"$root/ckpt").awaitTermination()

    val st = new ClassCountStore(spark, store)
    assert(ladderSet(Privacy.ladderView(st.state())) == recompute(cust),
      "streamed ladder diverged from the batch rollup")

    // erasure feed: retracting the odd wave restores the even-only audit
    withOp(wave, "retract").write.mode("append").parquet(custDir)
    StreamingKAnonymity.start(spark, custDir, store, s"$root/ckpt").awaitTermination()
    assert(ladderSet(Privacy.ladderView(st.state())) == recompute(base),
      "retraction wave did not restore the pre-wave audit")

    // at-least-once: re-deliver the retraction batch by hand
    StreamingKAnonymity.processBatch(withOp(wave, "retract"), 2L, store)
    assert(ladderSet(Privacy.ladderView(st.state())) == recompute(base),
      "redelivery changed the audit")

    // a MIXED batch (departure + arrival in one trigger) folds to the net
    val quarter = cust.filter(col("c_custkey") % 4 === 0)
    val mixed = withOp(quarter, "retract")
      .unionByName(withOp(wave, "add"))
    StreamingKAnonymity.processBatch(mixed, 3L, store)
    assert(ladderSet(Privacy.ladderView(st.state())) ==
      recompute(cust.filter(col("c_custkey") % 4 =!= 0)),
      "mixed batch did not fold to the net audit")
  }

  test("an unknown op fails the batch loudly") {
    val cust = graft.Tables.customer(spark, sf).limit(5)
    val err = intercept[Exception] {
      StreamingKAnonymity.processBatch(withOp(cust, "upsert"), 0L,
        tmpDir("skanon-op") + "/state")
    }
    assert(err.getMessage != null && err.getMessage.contains("unknown op"),
      s"expected a loud unknown-op failure, got: $err")
  }
}
