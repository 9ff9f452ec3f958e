package graft.flights

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unified staging reader: one view over BOTH staging layouts so a
  * single warehouse build can consume batch and streaming ingest
  * side by side (SURVEY §2.6; the layout split is an artifact of the
  * two writers, not a semantic difference):
  *
  *  - batch ([[FlightIngest]]): parquet partitioned by `ingest_batch`
  *    (the idempotent-commit partition key);
  *  - streaming ([[graft.streaming.StreamingIngest]]): flat parquet
  *    appends from the file sink (exactly-once via its own manifest).
  *
  * Both carry the same 17 staging columns in the same positions, so
  * one schema-pinned read covers both: the partition column simply
  * comes back null-absent for flat layouts and is dropped either way.
  * Column pruning and predicate pushdown reach every underlying scan
  * (the union is of scans, not materialized frames).
  *
  * `dedupAcrossSources` guards the one semantic gap a union opens: the
  * ledger dedups within the batch lineage and streaming state dedups
  * within the stream, but a row ingested through BOTH pipelines would
  * appear twice in the union. The staging-level content hash is the
  * SAME value as the ledger's I-10 hash (md5 over values in column
  * order — the rename changes names, not positions), so the dedup is
  * exact. It costs a corpus-wide shuffle on the hash; leave it off
  * when the two roots ingest disjoint sources (the usual deployment),
  * turn it on when a backfill replays files the stream also saw. */
object StagingReader {
  def read(spark: SparkSession, dirs: Seq[String],
           dedupAcrossSources: Boolean = false): DataFrame = {
    require(dirs.nonEmpty, "StagingReader.read needs at least one staging dir")
    val unioned = dirs.map { d =>
      spark.read.schema(FlightSchemas.staging).parquet(d).drop("ingest_batch")
    }.reduce(_ unionByName _)
    if (!dedupAcrossSources) unioned
    else unioned
      .withColumn("row_hash",
        FlightSchemas.rowHashColumn(unioned.columns.toIndexedSeq))
      .dropDuplicates("row_hash")
      .drop("row_hash")
  }
}
