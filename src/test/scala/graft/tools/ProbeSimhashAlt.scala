package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: is q35's cost the 64-pass HOF simhash projection, and
  * does a single-pass explode + hash-agg formulation beat it?
  * Run: sbt "Test/runMain graft.tools.ProbeSimhashAlt <sfDir>"
  */
object ProbeSimhashAlt {
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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val th = docs.select(col("doc_id"),
      transform(split(lower(trim(col("text"))), "\\s+"), t => xxhash64(t)).as("th"))
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[simalt] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // current formulation: 64 aggregate() passes per row
    def hofSim = {
      val bits = (0 until 64).map { b =>
        val vote = aggregate(col("th"), lit(0L),
          (acc, h) => acc + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1L)
            .otherwise(-1L))
        when(vote > 0, lit(1L << b)).otherwise(lit(0L))
      }
      th.select(col("doc_id"), bits.reduce(_ + _).as("sh"))
    }
    // alternative: explode once, 64 conditional sums in one hash agg
    def aggSim = {
      val exploded = th.select(col("doc_id"), explode(col("th")).as("h"))
      val votes = exploded.groupBy(col("doc_id")).agg(
        sum(when(shiftright(col("h"), 0).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as("v0"),
        (1 until 64).map(b =>
          sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"v$b")): _*)
      votes.select(col("doc_id"),
        (0 until 64).map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("sh"))
    }
    // JIT warm-up on a tiny slice first
    hofSim.limit(100).write.format("noop").mode("overwrite").save()
    aggSim.limit(100).write.format("noop").mode("overwrite").save()
    for (round <- 1 to 2) {
      time(s"hof round $round") { hofSim.write.format("noop").mode("overwrite").save() }
      time(s"agg round $round") { aggSim.write.format("noop").mode("overwrite").save() }
    }
    // sanity: identical outputs
    val diff = hofSim.withColumnRenamed("sh", "a")
      .join(aggSim.withColumnRenamed("sh", "b"), Seq("doc_id"))
      .filter(col("a") =!= col("b")).count()
    println(s"[simalt] mismatches: $diff")
    spark.stop()
  }
}
