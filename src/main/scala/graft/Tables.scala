package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided testdata tables (TESTDATA.md).
  *
  * Parquet carries its own schema, so no inference happens here; the
  * expected shapes are documented in FIXTURES.md §B. Scans stay lazy —
  * Catalyst prunes columns and pushes predicates into the parquet reader.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")

  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. The driver data is µs-precision (every
    * ns remainder is 0), so reading nanos as long and converting to a
    * µs timestamp is lossless.
    *
    * The nanosAsLong conf must be set ON THE SESSION BUILDER (Bench,
    * Verify, SparkTestBase and the demos all do). The loader used to
    * set it here as a read side effect, but that silently changed how
    * every later nanos-timestamp parquet read in the same session
    * behaves for callers sharing the session — so now it fails loudly
    * with the remedy instead of mutating shared state. */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "events.parquet stores TIMESTAMP(NANOS); set " +
        ".config(\"spark.sql.legacy.parquet.nanosAsLong\", \"true\") on the " +
        "SparkSession builder (Tables does not mutate session config)")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
