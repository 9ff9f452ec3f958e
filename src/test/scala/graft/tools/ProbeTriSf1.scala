package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: time the q171 stages at a given SF dir. */
object ProbeTriSf1 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val s0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - s0) / 1e9}%.2f s"); r
    }
    val pairs = t("coOrderPairs (store build or read)") {
      val p = graft.ops.Graphs.coOrderPairs(spark, dir); p.count(); p
    }
    println(s"edges: ${pairs.count()}")
    t("triangle census (first run)") {
      graft.SparkEntry.queries("q171_triangle_census")(spark, dir).collect()
    }
    graft.ops.Dedup.releaseSketchCaches()
    t("triangle census (second run, store warm)") {
      graft.SparkEntry.queries("q171_triangle_census")(spark, dir).collect()
    }
    spark.stop()
  }
}
