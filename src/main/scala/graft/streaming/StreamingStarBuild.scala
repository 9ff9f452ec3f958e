package graft.streaming

import graft.flights.{Cleaning, StarWarehouse}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous star-schema maintenance: the streaming counterpart of
  * the batch transform. Each micro-batch of freshly-staged rows is
  * cleaned, dims are upserted (append-stable surrogate keys — the
  * same single-writer upsert the batch path uses), and the fact
  * increment is APPENDED into the date-partitioned fact.
  *
  * foreachBatch is the right tool here (not a plain streaming sink):
  * the dim upsert is a multi-table transactional-ish step that needs
  * batch-DataFrame semantics per micro-batch, while checkpointing
  * still guarantees each staged file is processed exactly once. At
  * 100 TB this is the architecture that replaces the reference's
  * daily full-table transform: dims converge incrementally and only
  * the new facts are written per batch.
  */
object StreamingStarBuild {
  /** Stream a staging directory (layout: FlightSchemas.staging parquet,
    * as produced by StreamingIngest) into the warehouse. */
  def start(spark: SparkSession, stagingDir: String, warehouseRoot: String,
            checkpointDir: String): StreamingQuery = {
    val wh = new StarWarehouse(spark, warehouseRoot)
    val staged = spark.readStream
      .schema(graft.flights.FlightSchemas.staging)
      .parquet(stagingDir)
    staged.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val cleaned = Cleaning.clean(batch).cache()
        try {
          val (airlines, airports, _) = wh.upsertDimsFor(cleaned)
          wh.appendFact(wh.factRowsFor(cleaned, airlines, airports))
        } finally cleaned.unpersist()
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
