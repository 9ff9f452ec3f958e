package graft.ops

import graft.SparkTestBase
import graft.streaming.StreamingPit
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The streaming PIT pipeline (15th): per-batch enrichment equals the
  * batch pitJoin over all facts, and redelivery is a no-op. */
class StreamingPitSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def versionsAndFacts(): (DataFrame, DataFrame) = {
    val ev = graft.Tables.events(spark, sf)
    val cents = (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType)
    val versions = ev.filter(col("event_type").isin("signup", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"), cents.as("cents"))
      .withColumn("band", expr("cents div 10000")).drop("cents")
    val facts = ev.filter(col("event_type").isin("view", "click", "error"))
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), cents.as("cents"))
    (versions, facts)
  }

  private def enrichedSet(df: DataFrame): Set[(Long, Option[Long], String, Long)] =
    df.select(col("event_id"), col("band"), col("event_type"), col("cents"))
      .collect().map(r => (r.getAs[Long]("event_id"),
        Option(r.getAs[Any]("band")).map(_.asInstanceOf[Long]),
        r.getAs[String]("event_type"), r.getAs[Long]("cents"))).toSet

  test("streamed PIT enrichment equals the batch pitJoin; redelivery replaces itself") {
    val (versions, facts) = versionsAndFacts()
    val expect = enrichedSet(Scd.pitJoin(versions, facts,
      StreamingPit.key, StreamingPit.attrs, "ts", "event_id"))

    val root = tmpDir("spit")
    val versionsPath = s"$root/versions"
    val factsDir = s"$root/facts"
    val outPath = s"$root/enriched"
    versions.write.parquet(versionsPath)
    facts.filter(col("event_id") % 2 === 0).write.parquet(factsDir)
    StreamingPit.start(spark, factsDir, versionsPath, outPath, s"$root/ckpt")
      .awaitTermination()
    facts.filter(col("event_id") % 2 === 1).write.mode("append").parquet(factsDir)
    StreamingPit.start(spark, factsDir, versionsPath, outPath, s"$root/ckpt")
      .awaitTermination()

    val streamed = spark.read.parquet(outPath).drop("ingest_round")
    assert(enrichedSet(streamed) == expect,
      "streamed enrichment diverged from the batch pitJoin")

    // at-least-once: re-deliver batch 0 — its round replaces itself
    StreamingPit.processBatch(facts.filter(col("event_id") % 2 === 0),
      batchId = 0L, versionsPath, outPath)
    val replayed = spark.read.parquet(outPath).drop("ingest_round")
    assert(enrichedSet(replayed) == expect, "redelivery changed the output")
    assert(replayed.count() == facts.count(), "redelivery duplicated rows")
  }
}
