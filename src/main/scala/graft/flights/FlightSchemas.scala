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
  val factColumns: Seq[String] = Seq(
    "airline_id", "source_airport_id", "destination_airport_id",
    "departure_date_id", "aircraft_type", "class", "stopovers",
    "booking_source", "duration_hours", "days_before_departure",
    "base_fare", "tax_surcharge", "total_fare")

  /** Hash-ledger layout (init_mysql.sql:27-30). */
  val ledger: StructType = StructType(Seq(
    StructField("row_hash", StringType, nullable = false),
    StructField("load_timestamp", TimestampType)))
}
