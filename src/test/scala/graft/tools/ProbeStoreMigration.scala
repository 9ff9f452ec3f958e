package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (VERDICT r14 #8): measure the pre-layout-metadata
  * store ADOPTION path on a real artifact — the one-time migration a
  * standing pre-r14 deployment pays on first open under r15 code —
  * and demonstrate the guard rails around it:
  *
  *   1. build a real PostingsStore (3 rounds of sf0.001 documents);
  *   2. strip its `.layout` file (what a pre-r14 artifact looks like);
  *   3. first open under current code → logged adoption, `.layout`
  *      rewritten, read served (timed);
  *   4. second open → memoized verify, no filesystem round-trip
  *      beyond the read itself (timed);
  *   5. a RESIZED-constant binary against the adopted store → loud
  *      layout-mismatch failure on read AND on append, with the
  *      append dying BEFORE any partition lands.
  *
  * Run: sbt "Test/runMain graft.tools.ProbeStoreMigration"
  */
object ProbeStoreMigration {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](what: String)(f: => A): A = {
      val t = System.nanoTime()
      val r = f
      println(f"[probe] $what%-58s ${(System.nanoTime() - t) / 1e9}%8.3f s")
      r
    }

    val docs = graft.Tables.documents(spark, sf)
    val root = java.nio.file.Files.createTempDirectory("graft-probe-migration")
    val path = s"$root/postings"
    val store = new graft.ops.PostingsStore(spark, path)
    timed("build: 3 rounds of sf0.001 documents") {
      store.appendRound(docs.filter(col("doc_id") % 3 === 0), 0L)
      store.appendRound(docs.filter(col("doc_id") % 3 === 1), 1L)
      store.appendRound(docs.filter(col("doc_id") % 3 === 2), 2L)
    }
    val rows = store.state().count()
    println(s"[probe] store rows: $rows")

    // simulate the pre-r14 artifact: no .layout beside the data
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val layoutFile = new org.apache.hadoop.fs.Path(s"$path.layout")
    require(fs.exists(layoutFile), "build should have recorded the layout at creation")
    fs.delete(layoutFile, false)
    graft.ops.CompactableRoundStore.verifiedLayouts.clear()

    val adopted = timed("first open of the pre-metadata store (ADOPTION + read)") {
      new graft.ops.PostingsStore(spark, path).state().count()
    }
    require(adopted == rows, s"adoption changed the read: $adopted vs $rows")
    require(fs.exists(layoutFile), "adoption did not rewrite the layout record")
    val recorded = {
      val in = fs.open(layoutFile)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    }
    println(s"[probe] adopted contract: {$recorded}")

    val steady = timed("second open (memoized verify + read)") {
      new graft.ops.PostingsStore(spark, path).state().count()
    }
    require(steady == rows)

    // the resized binary against the ADOPTED store: loud on both paths
    val resized = new graft.ops.PostingsStore(spark, path) {
      override protected def layoutMeta: Map[String, String] =
        Map("term_buckets" -> "32")
    }
    def expectMismatch(what: String)(f: => Unit): Unit =
      try { f; sys.error(s"$what did NOT fail on the adopted store") }
      catch {
        case e: IllegalArgumentException if e.getMessage.contains("layout mismatch") =>
          println(s"[probe] $what failed LOUDLY as required: " +
            e.getMessage.linesIterator.next())
      }
    expectMismatch("resized read")(resized.state().count(): Unit)
    expectMismatch("resized append")(resized.appendRound(docs.limit(3), 3L))
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .count(_.getPath.getName.startsWith("ingest_round="))
    require(parts == 3, s"resized append mutated the store: $parts partitions")
    println(s"[probe] store untouched by the failed append ($parts partitions)")
    spark.stop()
  }
}
