package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: N same-JVM reps of one registered query with median/min,
  * for measuring on a noisy box.
  * Run: sbt "Test/runMain graft.tools.ProbeQN <sfDir> <queryName> [reps]"
  */
object ProbeQN {
  def main(args: Array[String]): Unit = {
    val (dir, name) = (args(0), args(1))
    val reps = if (args.length > 2) args(2).toInt else 5
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.graft.rangeJoin.enabled",
        sys.env.getOrElse("GRAFT_RANGEJOIN", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ts = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      graft.ops.Dedup.releaseSketchCaches()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probeqn] $name rep$i: $s%.2f s")
      s
    }
    val warm = ts.drop(1) // rep1 pays JIT
    println(f"[probeqn] $name median=${warm.sorted.apply(warm.size / 2)}%.2f min=${warm.min}%.2f")
    spark.stop()
  }
}
