package graft.flights

import org.apache.spark.sql.types._

/** Explicit schemas for the flight pipeline — no inference anywhere
  * (SURVEY.md §1.2: the idiomatic-Spark upgrade of the reference's
  * DDL-anchored model).
  *
  * Raw CSV headers per the reference rename map (ingestion.py:96-114);
  * staging/star column types per init_mysql.sql:6-26 and
  * init_postgres.sql:4-42, with the documented code-over-DDL choices
  * (stopovers Int, 13-column fact) from SURVEY.md §1.2.
  */
object FlightSchemas {
  /** CSV header name -> staging snake_case name, in file column order. */
  val renameMap: Seq[(String, String)] = Seq(
    "Airline" -> "airline",
    "Source" -> "source_code",
    "Source Name" -> "source_name",
    "Destination" -> "destination_code",
    "Destination Name" -> "destination_name",
    "Departure Date & Time" -> "departure_datetime",
    "Arrival Date & Time" -> "arrival_datetime",
    "Duration (hrs)" -> "duration_hours",
    "Stopovers" -> "stopovers",
    "Aircraft Type" -> "aircraft_type",
    "Class" -> "class",
    "Booking Source" -> "booking_source",
    "Base Fare (BDT)" -> "base_fare",
    "Tax & Surcharge (BDT)" -> "tax_surcharge",
    "Total Fare (BDT)" -> "total_fare",
    "Seasonality" -> "seasonality",
    "Days Before Departure" -> "days_before_departure",
  )

  /** Schema-on-read: every raw column is a string; parsing is deferred
    * to the transform stage exactly as the reference defers it to
    * transformation.py (staging stores VARCHAR timestamps/stopovers). */
  val rawCsv: StructType =
    StructType(renameMap.map { case (h, _) => StructField(h, StringType) })

  /** Staging layout after the I-13 rename (still string-typed). */
  val staging: StructType =
    StructType(renameMap.map { case (_, c) => StructField(c, StringType) })

  val dimAirlines: StructType = StructType(Seq(
    StructField("airline_id", LongType, nullable = false),
    StructField("airline_name", StringType)))

  val dimAirports: StructType = StructType(Seq(
    StructField("airport_id", LongType, nullable = false),
    StructField("airport_code", StringType),
    StructField("airport_name", StringType)))

  val dimDate: StructType = StructType(Seq(
    StructField("date_id", DateType, nullable = false),
    StructField("year", IntegerType),
    StructField("month", IntegerType),
    StructField("day", IntegerType),
    StructField("quarter", IntegerType),
    StructField("day_of_week", IntegerType), // pandas convention Mon=0..Sun=6
    StructField("is_weekend", BooleanType),
    StructField("seasonality", StringType)))

  /** 13-column fact projection per transformation.py:128-132 (the code,
    * not the README ERD — SURVEY.md §1.2 discrepancy note). */
  val factFlights: StructType = StructType(Seq(
    StructField("airline_id", LongType),
    StructField("source_airport_id", LongType),
    StructField("destination_airport_id", LongType),
    StructField("departure_date_id", DateType),
    StructField("aircraft_type", StringType),
    StructField("class", StringType),
    StructField("stopovers", IntegerType),
    StructField("booking_source", StringType),
    StructField("duration_hours", DoubleType),
    StructField("days_before_departure", IntegerType),
    StructField("base_fare", DoubleType),
    StructField("tax_surcharge", DoubleType),
    StructField("total_fare", DoubleType)))

  val factColumns: Seq[String] = factFlights.fieldNames.toIndexedSeq

  /** Hash-ledger layout (init_mysql.sql:27-30). */
  val ledger: StructType = StructType(Seq(
    StructField("row_hash", StringType, nullable = false),
    StructField("load_timestamp", TimestampType)))

  /** I-13: CSV header layout -> staging snake_case layout. One shared
    * implementation — the rename is part of the staging contract. */
  def renameToStaging(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    renameMap.foldLeft(df) { case (d, (h, c)) => d.withColumnRenamed(h, c) }

  /** I-10: the canonical row content hash — md5 over a null-sentineled,
    * separator-joined concat of every column. This IS the cross-run
    * dedup key shared by the batch ledger and streaming state; there
    * must be exactly one definition. */
  def rowHashColumn(columns: Seq[String]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val parts = columns.map(c => coalesce(col(c).cast(StringType), lit("\u0000")))
    md5(concat_ws("\u0001", parts: _*))
  }
}
