package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeCat {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.01"
    graft.ops.Statistics.registerForQueries(spark, d)
    for (q <- Seq("q40_sql_surface", "q126_promo_share", "q135_late_shipment_priority", "q137_returned_top_customers", "q148_local_supplier_volume")) {
      try {
        graft.SparkEntry.queries(q)(spark, d).write.format("noop").mode("overwrite").save()
        println(s"$q OK")
      } catch { case e: Throwable => println(s"$q FAIL"); var c: Throwable = e; while (c != null) { println("CAUSE: " + c.getClass.getName + ": " + String.valueOf(c.getMessage).take(300)); c = c.getCause } }
    }
    spark.stop()
  }
}
