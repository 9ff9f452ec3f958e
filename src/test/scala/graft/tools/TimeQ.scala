package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Focused per-query measurement harness for the optimization rounds:
  * times the NAMED queries under exactly Bench's session (extensions,
  * shuffle partitions = cpus, CBO + catalog stats, star warehouse
  * warm, JIT pre-pass at sf0.001) so single-query numbers line up with
  * the committed sweep, and optionally dumps `explain("formatted")`
  * for each to `$SPARK_GRAFT_PLANS_DIR/<q>_<tag>.txt` (default
  * plans/r16).
  *
  * Run: sbt "Test/runMain graft.tools.TimeQ [--plans tag] <q...>"
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32).
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val (planTag, names0) =
      if (args.length >= 2 && args(0) == "--plans") (Some(args(1)), args.drop(2).toSeq)
      else (None, args.toSeq)
    val names = if (names0.nonEmpty) names0 else Seq("q04_revenue_by_nation")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (!sys.env.get("SPARK_GRAFT_CATALOG").contains("off"))
      graft.ops.Statistics.registerForQueries(spark, sfDir)
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    graft.queries.StarQueries.warehouse(spark)
    // JIT pre-pass over just the named queries at the small SF
    val prepassDir = {
      val sib = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      if (sib.isDirectory) sib.getPath else "/root/testdata/sf0.001"
    }
    if (!sys.env.get("SPARK_GRAFT_PREPASS").contains("off"))
      names.foreach { n =>
        try SparkEntry.queries(n)(spark, prepassDir)
          .write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[timeq] prepass $n failed: ${e.getMessage}") }
        graft.ops.Dedup.releaseSketchCaches()
      }
    def once(n: String): Double = {
      spark.sparkContext.setJobDescription(n)
      val t0 = System.nanoTime()
      val el =
        try {
          SparkEntry.queries(n)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[timeq] $n failed: ${e.getMessage}"); -1.0 }
      graft.ops.Dedup.releaseSketchCaches()
      el
    }
    names.foreach { n =>
      val cold = once(n)
      val runs = Array.fill(3)(once(n))
      java.util.Arrays.sort(runs)
      println(f"[timeq] $n%-34s cold=$cold%8.3f warm=${runs(1)}%8.3f min=${runs(0)}%8.3f max=${runs(2)}%8.3f")
      planTag.foreach { tag =>
        val dir = java.nio.file.Paths.get(
          sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r16"))
        java.nio.file.Files.createDirectories(dir)
        val txt = SparkEntry.queries(n)(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(dir.resolve(s"${n}_$tag.txt"),
          txt.getBytes("UTF-8"))
        graft.ops.Dedup.releaseSketchCaches()
      }
    }
    spark.stop()
  }
}
