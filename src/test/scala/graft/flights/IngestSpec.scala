package graft.flights

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.SparkTestBase

class IngestSpec extends SparkTestBase {
  private def freshRoot(csv: String): (FlightIngest, String) = {
    val root = tmpDir("ingest")
    val live = s"$root/flights.csv"
    Files.copy(Paths.get(resource(csv)), Paths.get(live),
      StandardCopyOption.REPLACE_EXISTING)
    (new FlightIngest(spark, root), live)
  }

  test("first load: all distinct rows land in staging, offset advances") {
    val (ing, csv) = freshRoot("flights_small.csv")
    val r = ing.ingest(csv)
    assert(r.rowsScanned == 49)
    assert(r.rowsLoaded == 49) // fixture has no exact duplicate rows
    assert(r.newOffset == 49)
    assert(ing.staging.count() == 49)
    assert(ing.ledger.count() == 49)
    // staging carries the renamed snake_case layout
    assert(ing.staging.columns.toSeq == FlightSchemas.renameMap.map(_._2))
  }

  test("re-run with no new rows: early exit, nothing written") {
    val (ing, csv) = freshRoot("flights_small.csv")
    ing.ingest(csv)
    val r2 = ing.ingest(csv)
    assert(r2.rowsScanned == 0 && r2.rowsLoaded == 0)
    assert(ing.staging.count() == 49)
  }

  test("file growth: only appended rows are scanned; exact dupes are dropped by the ledger") {
    val (ing, csv) = freshRoot("flights_small.csv")
    ing.ingest(csv)
    // The file grows in place: flights_append.csv = small + 15 new + 3 dupes
    Files.copy(Paths.get(resource("flights_append.csv")), Paths.get(csv),
      StandardCopyOption.REPLACE_EXISTING)
    val r2 = ing.ingest(csv)
    assert(r2.rowsScanned == 18)
    assert(r2.rowsLoaded == 15) // 3 dupes deduped via hash ledger
    assert(ing.staging.count() == 64)
    assert(ing.ledger.count() == 64)
  }

  test("shrink reset: smaller all-seen file leaves staging intact (reference parity)") {
    val (ing, csv) = freshRoot("flights_append.csv")
    ing.ingest(csv)
    Files.copy(Paths.get(resource("flights_shrunk.csv")), Paths.get(csv),
      StandardCopyOption.REPLACE_EXISTING)
    val r2 = ing.ingest(csv)
    assert(r2.rowsScanned == 10)
    // shrunk rows are a subset of already-hashed rows => ledger drops all
    assert(r2.rowsLoaded == 0)
    assert(r2.newOffset == 10)
    // empty deduped batch => staging untouched, like the reference's
    // skipped to_sql; stale rows remain and V-3 alarms source!=staging
    assert(ing.staging.count() == 64)
  }

  test("crash retry after ledger commit but before offset write keeps staging") {
    val (ing, csv) = freshRoot("flights_small.csv")
    ing.ingest(csv)
    // Simulate the torn run: staging + ledger committed, offset LOST.
    Files.delete(Paths.get(s"${ing.stagingPath}/../state/flight_csv_offset").normalize())
    assert(ing.offset == 0)
    val r2 = ing.ingest(csv)
    // Retry re-scans from 0; every row is already in the ledger, so the
    // batch dedupes to empty — staging must survive, offset must heal.
    assert(r2.rowsScanned == 49 && r2.rowsLoaded == 0)
    assert(ing.offset == 49)
    assert(ing.staging.count() == 49)
    assert(ing.ledger.count() == 49)
  }

  test("multi-file directory input is rejected loudly (offset order undefined)") {
    val root = tmpDir("ingest")
    val dir = s"$root/csvdir"
    Files.createDirectories(Paths.get(dir))
    Files.copy(Paths.get(resource("flights_small.csv")), Paths.get(s"$dir/a.csv"))
    Files.copy(Paths.get(resource("flights_clean.csv")), Paths.get(s"$dir/b.csv"))
    val ing = new FlightIngest(spark, root)
    val e = intercept[IllegalArgumentException](ing.ingest(dir))
    assert(e.getMessage.contains("exactly one CSV file"))
    assert(e.getMessage.contains("StreamingIngest"))
    // nothing was written: state, staging, ledger all untouched
    assert(ing.offset == 0L)
    assert(!Files.exists(Paths.get(ing.stagingPath)))
    assert(!Files.exists(Paths.get(ing.ledgerPath)))

    // a single file INSIDE a directory still has a well-defined row
    // order — directory-of-one is accepted
    Files.delete(Paths.get(s"$dir/b.csv"))
    assert(ing.ingest(dir).rowsLoaded == 49)
  }

  test("intra-batch duplicates collapse to one row") {
    val root = tmpDir("ingest")
    val csv = s"$root/flights.csv"
    val lines = Files.readAllLines(Paths.get(resource("flights_small.csv")))
    val dup = new java.util.ArrayList[String](lines)
    dup.add(lines.get(1)) // duplicate first data row inside the same batch
    Files.write(Paths.get(csv), dup)
    val ing = new FlightIngest(spark, root)
    val r = ing.ingest(csv)
    assert(r.rowsScanned == 50 && r.rowsLoaded == 49)
  }
}
