package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: single-query slice of the Verify dump, so tools/compare.py
  * can gate one new query without replaying the whole catalog.
  * Run: sbt "Test/runMain graft.tools.VerifyOne <sfDir> <outDir> <name> [name...]"
  * then: python3 tools/compare.py <sfDir> <outDir>
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      graft.ops.Dedup.releaseSketchCaches()
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val sqls = names.flatMap(n => graft.SparkEntry.oracleSql.get(n).map(n -> _))
    val json = sqls.map { case (n, s) => s"${q(n)}: ${q(s)}" }
      .mkString("{", ", ", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
