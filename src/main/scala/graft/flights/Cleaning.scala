package graft.flights

import graft.functions.PandasTitleCase.title_case
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Row-level cleaning operators (SURVEY.md §2.2, T-2..T-7) as pure
  * `DataFrame => DataFrame` / `Column => Column` functions — every one
  * a codegen'd column expression, no UDFs (SURVEY §2.6: zero custom
  * aggregates needed; the only custom scalar is [[PandasTitleCase]]).
  */
object Cleaning {
  /** Columns standardized by T-2 (transformation.py:56). */
  val stringCols: Seq[String] = Seq(
    "airline", "source_name", "destination_name", "aircraft_type",
    "class", "booking_source", "seasonality")

  /** T-2: `astype(str).str.strip().str.title()`.
    * Pinned divergence: pandas turns NULL into the literal string
    * "Nan" (astype(str) of NaN); we keep NULL — documented in
    * SURVEY.md §7.3(1). */
  def standardize(c: Column): Column = title_case(trim(c.cast(StringType)))

  /** T-3 (transformation.py:14-24): stopover string -> int.
    * Decision table: contains 'direct'/'non-stop' -> 0; contains
    * 'stop' -> int of all digits (parse failure/overflow -> 0);
    * anything else (incl. null) -> 0. */
  def parseStopovers(c: Column): Column = {
    val s = lower(trim(c.cast(StringType)))
    when(s.isNull, lit(0))
      .when(s.contains("direct") || s.contains("non-stop"), lit(0))
      .when(s.contains("stop"),
        coalesce(regexp_replace(s, "[^0-9]", "").cast(IntegerType), lit(0)))
      .otherwise(lit(0))
  }

  /** Columns coerced by T-4 (transformation.py:65). */
  val numericCols: Seq[String] = Seq(
    "duration_hours", "base_fare", "tax_surcharge", "total_fare")

  /** T-4: `to_numeric(errors='coerce').fillna(0).round(2)`. Spark cast
    * under ansi=false is null-on-failure, matching coerce. Rounding is
    * HALF_UP (Spark/SQL convention; pandas banker's-rounds — divergence
    * pinned in SURVEY.md §7.3(1)). */
  def coerceNumeric(c: Column): Column =
    round(coalesce(c.cast(DoubleType), lit(0.0)), 2)

  /** T-7 (transformation.py:91): `pd.to_datetime(errors='coerce')` —
    * null on unparseable input. */
  def parseTimestamp(c: Column): Column = try_to_timestamp(c)

  /** Full cleaning stage over the staging layout: T-2 + T-3 + T-4 +
    * T-5 (validity filter) + T-7, one lazy plan. A column missing from
    * the input becomes a constant 0.0 (T-4 fallback,
    * transformation.py:70-72). */
  def clean(staging: DataFrame): DataFrame = {
    val afterStrings = stringCols.foldLeft(staging) { (df, c) =>
      if (df.columns.contains(c)) df.withColumn(c, standardize(col(c))) else df
    }
    val afterStop = afterStrings.withColumn("stopovers", parseStopovers(col("stopovers")))
    val afterNum = numericCols.foldLeft(afterStop) { (df, c) =>
      if (df.columns.contains(c)) df.withColumn(c, coerceNumeric(col(c)))
      else df.withColumn(c, lit(0.0))
    }
    afterNum
      .filter(col("total_fare") > 0 && col("duration_hours") > 0) // T-5
      .withColumn("departure_dt", parseTimestamp(col("departure_datetime")))
  }
}
