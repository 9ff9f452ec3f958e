package graft.plans

import graft.SparkTestBase
import graft.functions.PandasTitleCase.title_case
import org.apache.spark.sql.functions._

/** The optimizer rule is tested as a pure LogicalPlan transform (a
  * second SparkSession with different extensions can't coexist with
  * the shared test session — getOrCreate returns the active one). */
class GraftExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  test("CollapseTitleCase rewrites nested title_case to a single application") {
    val df = Seq(" us-bangla air ").toDF("s")
      .select(title_case(title_case(title_case(col("s")))).as("t"))
    val analyzed = df.queryExecution.analyzed
    assert("pandas_title_case".r.findAllIn(analyzed.toString).length == 3)
    val collapsed = CollapseTitleCase(analyzed)
    assert("pandas_title_case".r.findAllIn(collapsed.toString).length == 1,
      s"nested applications should collapse to one:\n$collapsed")
  }

  test("collapse preserves semantics (title_case is idempotent)") {
    val df = Seq(" us-bangla air ", "BIMAN bangladesh").toDF("s")
    val once = df.select(title_case(col("s")).as("t")).collect().map(_.getString(0))
    val thrice = df.select(title_case(title_case(title_case(col("s")))).as("t"))
      .collect().map(_.getString(0))
    assert(once.toSeq == thrice.toSeq)
    assert(once.head == " Us-Bangla Air ")
  }
}
