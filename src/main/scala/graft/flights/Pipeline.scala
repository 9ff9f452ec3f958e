package graft.flights

import org.apache.spark.sql.SparkSession
import org.slf4j.LoggerFactory

/** The control plane (SURVEY.md §2.5): the reference's linear DAG
  * `[sensors] >> ingest >> transform >> validate`
  * (flight_pipeline_dag.py:68) as three Spark job stages with a
  * stage-level retry wrapper standing in for Airflow's retry policy
  * (D-3). Sensors (D-1) have no equivalent for a local filesystem —
  * availability is the read itself.
  */
class FlightPipeline(spark: SparkSession, root: String,
                     retries: Int = 3, retryDelayMs: Long = 0L) {
  private val log = LoggerFactory.getLogger(getClass)
  val ingestStage = new FlightIngest(spark, root)
  val warehouse = new StarWarehouse(spark, s"$root/analytics")

  private def withRetry[T](name: String)(body: => T): T = {
    var attempt = 0
    var last: Throwable = null
    while (attempt <= retries) {
      try return body
      catch {
        case e: Throwable =>
          last = e
          attempt += 1
          log.warn(s"stage $name failed (attempt $attempt/$retries): ${e.getMessage}")
          if (attempt <= retries && retryDelayMs > 0) Thread.sleep(retryDelayMs)
      }
    }
    throw last
  }

  /** One full DAG run. Returns the validated counts. */
  def run(csvPath: String): Validation.Counts = {
    val ing = withRetry("ingest")(ingestStage.ingest(csvPath))
    log.info(s"ingest: scanned=${ing.rowsScanned} loaded=${ing.rowsLoaded} offset=${ing.newOffset}")
    val tr = withRetry("transform")(warehouse.transform(ingestStage.staging))
    log.info(s"transform: in=${tr.rowsIn} dropped=${tr.rowsDropped} fact=${tr.factRows}")
    val c = Validation.counts(spark, csvPath, ingestStage.stagingPath, warehouse.factPath)
    Validation.validate(c)
    c
  }
}
