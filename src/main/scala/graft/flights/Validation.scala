package graft.flights

import org.apache.spark.sql.SparkSession

/** Row-count reconciliation gate (SURVEY.md §2.1/§2.3, V-1..V-4),
  * replicating validation.py:18-49 bit-for-bit:
  *   - staging must match source EXACTLY (validation.py:41-42)
  *   - fact may lose at most 1% of source rows (validation.py:44-47)
  */
object Validation {
  final case class Counts(source: Long, staging: Long, fact: Long)

  def counts(spark: SparkSession, csvPath: String, stagingPath: String,
             factPath: String): Counts = {
    // V-1: len(pd.read_csv(path)) — data rows, header excluded.
    val source = spark.read.option("header", true).csv(csvPath).count()
    // V-2: SELECT COUNT(*) on staging and fact (schema-pinned so a
    // file-less directory counts as 0 and the gate alarms properly).
    val staging = spark.read.schema(FlightSchemas.staging).parquet(stagingPath).count()
    val fact = spark.read.schema(FlightSchemas.factFlights).parquet(factPath).count()
    Counts(source, staging, fact)
  }

  /** V-3 + V-4. Throws IllegalStateException exactly where the
    * reference raises ValueError. */
  def validate(c: Counts): Unit = {
    if (c.source != c.staging)
      throw new IllegalStateException(
        s"Data Loss detected! Source: ${c.source}, Staging: ${c.staging}")
    val diff = c.source - c.fact
    if (diff > c.source * 0.01)
      throw new IllegalStateException(
        s"High Data Loss in Analytics! Source: ${c.source}, Analytics: ${c.fact}, Dropped: $diff")
  }
}
