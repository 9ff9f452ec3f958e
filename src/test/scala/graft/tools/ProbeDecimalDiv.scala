package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: does Spark's `div` accept DECIMAL operands, and what type
  * does it return? (q131 design probe)
  * Run: sbt "Test/runMain graft.tools.ProbeDecimalDiv"
  */
object ProbeDecimalDiv {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.sql(
      """SELECT CAST(123456789012345678901234567 AS DECIMAL(38,0)) div
        |       CAST(1000003 AS DECIMAL(38,0)) AS q,
        |       CAST(-7 AS DECIMAL(38,0)) div CAST(2 AS DECIMAL(38,0)) AS neg
        |""".stripMargin)
    df.printSchema()
    df.show(false)
    println(123456789012345678901234567.0 / 1000003)
    spark.stop()
  }
}
