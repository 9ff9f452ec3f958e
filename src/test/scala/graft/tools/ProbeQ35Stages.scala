package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: stage timing inside the q35 flow at one SF.
  * Run: sbt "Test/runMain graft.tools.ProbeQ35Stages <sfDir>"
  */
object ProbeQ35Stages {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q35] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    println("[q35] docs=" + docs.count())
    val hashed = docs.withColumn("thash", xxhash64(col("text")))
    println("[q35] reps=" + hashed.select(col("thash")).distinct().count())
    for (round <- 1 to 2) {
      val reps = hashed.groupBy(col("thash"))
        .agg(min(col("doc_id")).as("doc_id"), first(col("text")).as("text"))
      val repTh = reps.select(col("thash"), col("doc_id"),
        transform(split(lower(trim(col("text"))), "\\s+"), t => xxhash64(t)).as("th"))
      time(s"r$round repTh->simhashAgg materialize") {
        // inline replica of Dedup.simhashAgg (private[ops])
        val exploded = repTh.select(col("thash"), col("doc_id"), explode(col("th")).as("h"))
        val votes = exploded.groupBy(col("thash"), col("doc_id")).agg(
          sum(when(shiftright(col("h"), 0).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as("v0"),
          (1 until 64).map(b =>
            sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L)
              .otherwise(-1L)).as(s"v$b")): _*)
        votes.select(col("thash"), col("doc_id"),
          (0 until 64).map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
            .reduce(_ + _).as("sh"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"r$round full q35") {
        graft.SparkEntry.queries("q35_simhash_neardups")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      graft.ops.Dedup.releaseSketchCaches()
    }
    spark.stop()
  }
}
