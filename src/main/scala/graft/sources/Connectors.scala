package graft.sources

import graft.flights.FlightSchemas
import org.apache.spark.sql.{DataFrame, DataFrameReader, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface matching the reference's connector set
  * (SURVEY.md §2.1: CSV source, MySQL staging, PostgreSQL warehouse)
  * behind one writer interface, so storage swaps without touching
  * pipeline logic. Parquet is the default store; JDBC is retained as
  * the optional sink with the reference's `if_exists` semantics
  * (`replace` -> Overwrite, `append` -> Append; ingestion.py:62,
  * 117-119). JSON/CSV writers round out the standard lake formats.
  */
object Connectors {
  /** Schema-pinned CSV read (never infer in production paths —
    * SURVEY §1.2). */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header).csv(path)

  def readFlightCsv(spark: SparkSession, path: String): DataFrame =
    readCsv(spark, path, FlightSchemas.rawCsv)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** JDBC source (the read half of the staging/warehouse contract).
    * For large tables pass a partition column + bounds so the scan
    * parallelizes across executors instead of one connection. */
  def readJdbc(spark: SparkSession, url: String, table: String,
               props: java.util.Properties,
               partitionCol: Option[(String, Long, Long, Int)] = None): DataFrame =
    partitionCol match {
      case Some((colName, lower, upper, numParts)) =>
        spark.read.jdbc(url, table, colName, lower, upper, numParts, props)
      case None => spark.read.jdbc(url, table, props)
    }

  /** The reference's `if_exists` vocabulary. */
  def saveMode(ifExists: String): SaveMode = ifExists match {
    case "replace" => SaveMode.Overwrite
    case "append"  => SaveMode.Append
    case "fail"    => SaveMode.ErrorIfExists
    case other => throw new IllegalArgumentException(s"unknown if_exists: $other")
  }

  sealed trait TableSink {
    def write(df: DataFrame, table: String, ifExists: String): Unit
  }

  /** Default store: one directory per table under a root. */
  final case class ParquetSink(root: String) extends TableSink {
    def write(df: DataFrame, table: String, ifExists: String): Unit =
      df.write.mode(saveMode(ifExists)).parquet(s"$root/$table")
  }

  /** ORC read (the second columnar lake format Spark ships natively;
    * predicate pushdown and column pruning reach the ORC scan exactly
    * as they do parquet's — ConnectorsSpec pins PushedFilters on a
    * round-trip). Schema always pinned, same as CSV/JSON. */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** ORC sink — same directory-per-table layout and if_exists
    * vocabulary as the parquet store, so the two formats are
    * interchangeable behind [[TableSink]]. */
  final case class OrcSink(root: String) extends TableSink {
    def write(df: DataFrame, table: String, ifExists: String): Unit =
      df.write.mode(saveMode(ifExists)).orc(s"$root/$table")
  }

  /** JDBC sink preserving the reference's staging/warehouse contract
    * (MySQL staging / PostgreSQL warehouse via SQLAlchemy in the
    * reference; any JDBC url here). Round-trip semantics — replace /
    * append / fail — are exercised against embedded Derby in
    * ConnectorsSpec. */
  final case class JdbcSink(url: String, props: java.util.Properties) extends TableSink {
    def write(df: DataFrame, table: String, ifExists: String): Unit =
      df.write.mode(saveMode(ifExists)).jdbc(url, table, props)
  }
}
