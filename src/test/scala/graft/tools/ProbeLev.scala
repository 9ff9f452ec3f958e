package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: per-threshold cost of the banded levenshtein over the
  * q111 pair set — isolates the DP from the join.
  * Run: sbt "Test/runMain graft.tools.ProbeLev <sfDir>"
  */
object ProbeLev {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, dir)
    val idx = docs.select(col("doc_id"),
      md5(array_join(slice(split(lower(trim(col("text"))), "\\s+"), 1, 4), " ")).as("fp"),
      substring(col("text"), 1, 512).as("px"))
      .withColumn("plen", length(col("px")))
    val a = idx.select(col("fp"), col("doc_id").as("doc_a"),
      col("px").as("px_a"), col("plen").as("len_a"))
    val b = idx.select(col("fp"), col("doc_id").as("doc_b"),
      col("px").as("px_b"), col("plen").as("len_b"))
    val pairs = a.join(b, Seq("fp"))
      .filter(col("doc_a") < col("doc_b") &&
        abs(col("len_a") - col("len_b")) <= 102)
      .persist()
    val n = pairs.count()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probelev] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s (result $r, pairs $n)")
    }
    time("join-only (xxhash)") {
      pairs.select(sum(xxhash64(col("px_a"), col("px_b")))).head().getLong(0)
    }
    for (th <- Seq(4, 17, 103)) {
      time(s"lev threshold $th") {
        pairs.select(sum(levenshtein(col("px_a"), col("px_b"), th))).head().getLong(0)
      }
    }
    time("lev unbounded") {
      pairs.select(sum(levenshtein(col("px_a"), col("px_b")))).head().getLong(0)
    }
    spark.stop()
  }
}
