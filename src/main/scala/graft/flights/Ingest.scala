package graft.flights

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-incremental ingestion (SURVEY.md §2.1, I-1..I-13): CSV ->
  * staging parquet with a persistent content-hash dedup ledger and an
  * offset state file, replicating the reference's incremental contract
  * (ingestion.py:18-129) exactly:
  *
  *  - I-1  line count scan to detect growth
  *  - I-2/I-3  offset state read + shrink-reset detection
  *  - I-4  early exit when no new rows
  *  - I-5  resume from offset (the 10k-row chunk loop disappears —
  *         partitioned scans bound memory instead)
  *  - I-10 row content hash (md5 over a canonical concat; the ledger
  *         contract is "identical row <=> identical hash", not pandas'
  *         str(tuple(...)) formatting — SURVEY §7.3(1))
  *  - I-11 dedup probe as ONE distributed left-anti join (the
  *         reference's per-chunk IN-list round-trips collapse)
  *  - I-7/I-8  staging write (overwrite on first load, else append) +
  *         ledger append
  *  - I-9  offset state write
  *
  * The designed-for-scale path is [[graft.streaming.StreamingIngest]]
  * (file-source checkpointing subsumes this offset machinery); this
  * class exists for exact reference parity and single-file use.
  */
class FlightIngest(spark: SparkSession, root: String) {
  import FlightIngest._

  def stagingPath: String = s"$root/staging"
  def ledgerPath: String  = s"$root/ledger"
  private def statePath   = Paths.get(s"$root/state/flight_csv_offset")

  /** I-2: Airflow `Variable.get("flight_csv_offset", 0)` equivalent. */
  def offset: Long =
    if (Files.exists(statePath))
      new String(Files.readAllBytes(statePath), StandardCharsets.UTF_8).trim.toLong
    else 0L

  private def writeOffset(v: Long): Unit = {
    Files.createDirectories(statePath.getParent)
    Files.write(statePath, v.toString.getBytes(StandardCharsets.UTF_8))
  }

  def ledger: DataFrame =
    if (StarWarehouse.pathExists(spark, ledgerPath))
      spark.read.schema(FlightSchemas.ledger).parquet(ledgerPath)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], FlightSchemas.ledger)

  def staging: DataFrame =
    spark.read.schema(FlightSchemas.staging).parquet(stagingPath)

  /** I-10: canonical row hash (shared definition — see
    * FlightSchemas.rowHashColumn). */
  def rowHash(df: DataFrame): DataFrame =
    df.withColumn("row_hash", FlightSchemas.rowHashColumn(df.columns.toIndexedSeq))

  /** The batch offset contract ("resume at data row N") is defined by
    * ONE file's row order — the reference's contract too
    * (ingestion.py:16 hard-codes a single CSV path). Across multiple
    * files there is no stable global row order (Spark splits and
    * lists files in no contractual sequence), so a glob/directory
    * input would make the persisted offset silently ambiguous.
    * Reject it loudly; multi-file directories are the streaming
    * path's job ([[graft.streaming.StreamingIngest]] tracks per-FILE
    * offsets in its checkpoint, which is the correct unit). */
  private def requireSingleFile(csvPath: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(csvPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = Option(fs.globStatus(p)).getOrElse(Array.empty).flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).filter(_.isFile)
          .filterNot(s => s.getPath.getName.startsWith("_") ||
            s.getPath.getName.startsWith("."))
      else Array(st)
    }
    require(files.length == 1,
      s"FlightIngest.ingest requires exactly one CSV file; '$csvPath' resolves to " +
        s"${files.length} files. The row-offset resume contract has no defined " +
        "order across files — use graft.streaming.StreamingIngest for " +
        "directories (per-file offsets via the stream checkpoint).")
  }

  def ingest(csvPath: String): IngestResult = {
    requireSingleFile(csvPath)
    // I-1: raw line count (includes header, like the reference's rb scan)
    val lineCount = spark.read.text(csvPath).count()
    var off = offset
    // I-3: file shrank => new file, reset. PINNED REFERENCE BUG
    // (ingestion.py:41: `if total_lines < offset`): lineCount includes
    // the header while the offset counts data rows, so a file that
    // shrinks by exactly one data row gives lineCount == off — the
    // reset is skipped and the replaced file's tail is never ingested.
    // Replicated deliberately for offset-state parity; the fix would be
    // `lineCount - 1 < off`.
    if (lineCount < off) off = 0
    // I-4: early exit
    val rowsToProcess = lineCount - 1 - off
    if (rowsToProcess <= 0) return IngestResult(0, 0, off)

    // I-5: header-aware resume — skip the first `off` data rows in file
    // order. zipWithIndex preserves file order for a single CSV file
    // (the reference's contract is also a single growing file).
    val raw = spark.read.schema(FlightSchemas.rawCsv)
      .option("header", true).csv(csvPath)
    val batch: DataFrame =
      if (off == 0) raw
      else {
        val rdd = raw.rdd.zipWithIndex()
          .filter(_._2 >= off).map(_._1)
        spark.createDataFrame(rdd, FlightSchemas.rawCsv)
      }

    // I-10 + intra-batch dedup (identical rows share a hash, so
    // dropDuplicates on the hash is deterministic in effect).
    val hashed = rowHash(batch).dropDuplicates("row_hash")
    // I-11: one distributed anti-join replaces per-chunk IN-probes.
    val fresh = hashed.join(ledger.select("row_hash"), Seq("row_hash"), "left_anti")
      .cache()
    val freshCount = fresh.count()

    // I-13 rename + I-12 drop helper column, then I-7 staging write.
    // Staging is touched ONLY when the deduped batch is non-empty,
    // exactly as the reference skips to_sql for an empty chunk
    // (ingestion.py:117-119). This is also the crash-safety hinge: a
    // run that staged + ledgered but died before the offset write is
    // re-runnable — the retry re-scans, the ledger anti-join drops
    // everything, freshCount == 0, staging is left INTACT, and only
    // the offset advances. (The previous behavior overwrote staging
    // with the empty frame on off == 0, permanently losing the staged
    // rows — VERDICT r2 ADVICE.) Consequence on a shrink-reset whose
    // "new" file is all already-seen rows: stale staging rows from the
    // replaced file remain and V-3 alarms on source != staging — the
    // reference behaves identically there (global-forever ledger).
    //
    // Remaining PINNED PARITY windows (both exist in the reference):
    //  - crash between an off>0 staging append and the ledger append
    //    re-appends the batch on retry (duplicate staging rows);
    //  - off==0 + ledger non-empty + file grown while down: the
    //    overwrite rebuilds staging from the fresh rows only.
    val renamed = FlightSchemas.renameToStaging(fresh.drop("row_hash"))
    if (freshCount > 0) {
      val mode = if (off == 0) SaveMode.Overwrite else SaveMode.Append
      renamed.write.mode(mode).parquet(stagingPath)
      // I-8: ledger append with load timestamp.
      fresh.select(col("row_hash"))
        .withColumn("load_timestamp", current_timestamp())
        .write.mode(SaveMode.Append).parquet(ledgerPath)
    }
    fresh.unpersist()
    // I-9: offset advances by rows *scanned* (incl. dupes), as in the
    // reference (ingestion.py:126: offset + rows_processed).
    writeOffset(off + rowsToProcess)
    IngestResult(rowsToProcess, freshCount, off + rowsToProcess)
  }
}

object FlightIngest {
  case class IngestResult(rowsScanned: Long, rowsLoaded: Long, newOffset: Long)
}
