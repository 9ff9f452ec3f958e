package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen, shuffle service, parquet footer reads)
    // so the first timed query isn't charged for JVM startup.
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // The timed action is a noop-sink WRITE, not count(): under
      // count(1) Catalyst's ColumnPruning deletes every unreferenced
      // per-row expression, so projection-only queries (scalar funcs,
      // text analysis, cleaned-row dumps) would time the scan and skip
      // the md5/regex/title-case work entirely. The noop sink
      // materializes every output column through the full plan with no
      // I/O cost. A failed query reports -1, not a deceptively fast
      // elapsed time.
      val elapsed =
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0 }
      graft.ops.Dedup.releaseSketchCaches()
      name -> elapsed
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val ok = results.filter(_._2 >= 0)
    val failed = results.count(_._2 < 0)
    // Fixture-driven queries are sf-constant: their time does not scale
    // with the data and would dilute the headline number, so they are
    // reported under const_total and excluded from the sf-scaled total.
    val (const, scaled) = ok.partition { case (k, _) => SparkEntry.constQueries(k) }
    val total = scaled.map(_._2).sum
    val constTotal = const.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"const_total":$constTotal,"total_all":${total + constTotal},"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
