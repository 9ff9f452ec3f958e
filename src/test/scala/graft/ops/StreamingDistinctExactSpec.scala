package graft.ops

import graft.SparkTestBase
import graft.streaming.StreamingDistinctExact
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streaming exact-distinct pipeline (16th): streamed signed
  * rounds equal the batch recompute, a retraction wave annihilates
  * exactly what it cancels, redelivery is a no-op, and a malformed op
  * fails the batch loudly. */
class StreamingDistinctExactSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def viewSet(df: DataFrame): Set[(String, Long, Long)] =
    df.select(col("event_type"), col("n_users"), col("n_events"))
      .as[(String, Long, Long)].collect().toSet

  private def expectOf(ev: DataFrame): Set[(String, Long, Long)] =
    viewSet(ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events")))

  test("streamed adds equal the batch recompute; a retract wave annihilates; replay is a no-op") {
    val ev = graft.Tables.events(spark, sf)
    val root = tmpDir("sde")
    val evDir = s"$root/events"
    val storePath = s"$root/state"

    // wave 1: half the events, as adds
    ev.filter(col("event_id") % 2 === 0).withColumn("op", lit("add"))
      .write.parquet(evDir)
    StreamingDistinctExact.start(spark, evDir, storePath, s"$root/ckpt")
      .awaitTermination()
    // wave 2: the other half
    ev.filter(col("event_id") % 2 === 1).withColumn("op", lit("add"))
      .write.mode("append").parquet(evDir)
    StreamingDistinctExact.start(spark, evDir, storePath, s"$root/ckpt")
      .awaitTermination()

    val store = new DistinctViewStore(spark, storePath)
    assert(viewSet(MatView.distinctView(store.state())) == expectOf(ev),
      "streamed exact-distinct view diverged from the batch recompute")

    // wave 3: retract wave 2 — the view must return to wave 1's state,
    // with the cancelled pairs' state rows annihilated (not tombstoned)
    val rowsAfterWave1 = MatView.distinctState(
      ev.filter(col("event_id") % 2 === 0)).count()
    ev.filter(col("event_id") % 2 === 1).withColumn("op", lit("retract"))
      .write.mode("append").parquet(evDir)
    StreamingDistinctExact.start(spark, evDir, storePath, s"$root/ckpt")
      .awaitTermination()
    assert(viewSet(MatView.distinctView(store.state())) ==
      expectOf(ev.filter(col("event_id") % 2 === 0)),
      "retraction did not restore the pre-wave view")
    assert(store.state().count() == rowsAfterWave1,
      "retraction left tombstone rows in the merged state")

    // at-least-once: re-deliver batch 0 by hand — round replaced
    StreamingDistinctExact.processBatch(
      ev.filter(col("event_id") % 2 === 0).withColumn("op", lit("add")),
      0L, storePath)
    assert(viewSet(MatView.distinctView(store.state())) ==
      expectOf(ev.filter(col("event_id") % 2 === 0)),
      "redelivery changed the view")
  }

  test("an unknown op fails the batch loudly and commits nothing") {
    val root = tmpDir("sde-bad")
    val storePath = s"$root/state"
    val bad = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      7L, "view", 1.0, "{}", "upsert"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props", "op")
    val err = intercept[Exception] {
      StreamingDistinctExact.processBatch(bad, 0L, storePath)
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(err).exists(t =>
      Option(t.getMessage).exists(_.contains("unknown op"))), s"got $err")
    // nothing committed: the round partition never landed (the write
    // may leave scaffolding dirs, but no ingest_round=0 partition)
    val part = new org.apache.hadoop.fs.Path(s"$storePath/ingest_round=0")
    val fs = part.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(part), "a failed batch left a partial round behind")
  }
}
