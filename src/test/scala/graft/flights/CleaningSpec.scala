package graft.flights

import graft.SparkTestBase
import graft.functions.TitleCaseUtil
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}

class CleaningSpec extends SparkTestBase {
  import spark.implicits._

  private def title(s: String): String =
    TitleCaseUtil.titleCase(UTF8String.fromString(s)).toString

  test("title_case matches Python str.title() semantics") {
    // Expectations computed with CPython's str.title().
    assert(title("us-bangla air") == "Us-Bangla Air")
    assert(title("BIMAN BANGLADESH") == "Biman Bangladesh")
    assert(title("cox's bazar") == "Cox'S Bazar") // yes, pandas does this
    assert(title("dash 8-q400") == "Dash 8-Q400")
    assert(title("3a b") == "3A B")
    assert(title("") == "")
    assert(title("  x  ") == "  X  ")
  }

  test("title_case property: idempotent and length-preserving (BMP letters)") {
    val gen = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '-', '\'', '.')))
      .map(_.mkString)
    val prop = Prop.forAll(gen) { s: String =>
      val once = title(s)
      title(once) == once && once.length == s.length
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("title_case runs inside codegen as a column expression") {
    val df = Seq(" us-bangla ", null).toDF("s")
      .select(Cleaning.standardize(col("s")).as("t"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("Us-Bangla", null))
  }

  test("parseStopovers decision table (transformation.py:14-24)") {
    val cases = Seq(
      "Direct" -> 0, "non-stop" -> 0, " NON-STOP " -> 0,
      "1 Stop" -> 1, "2 stops" -> 2, "3 STOPS" -> 3, "  10 stops " -> 10,
      "stopover" -> 0,   // 'stop' but no digits -> ValueError -> 0
      "many stops" -> 0,
      "no. 2 stop" -> 2, // digits gathered across the string
      "transit" -> 0, "5" -> 0, "" -> 0,
      "99999999999999999999 stops" -> 0) // int overflow -> 0
    val df = cases.map(_._1).toDF("s")
      .select(Cleaning.parseStopovers(col("s")).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq == cases.map(_._2))
    // null input (pandas str(nan)='nan' -> no match -> 0)
    val nullDf = Seq(Option.empty[String]).toDF("s")
      .select(Cleaning.parseStopovers(col("s")).as("n"))
    assert(nullDf.head().getInt(0) == 0)
  }

  test("coerceNumeric: to_numeric(errors='coerce').fillna(0).round(2)") {
    val df = Seq("12.345", "abc", null, "-7.1", "1e2").toDF("s")
      .select(Cleaning.coerceNumeric(col("s")).as("v"))
    assert(df.collect().map(_.getDouble(0)).toSeq ==
      Seq(12.35, 0.0, 0.0, -7.1, 100.0))
  }

  test("clean: validity filter + timestamp coercion + missing-column default") {
    val staging = Seq(
      ("al", "2024-01-05 08:30:00", "1.5", "Direct", "100.00"),
      ("al", "garbage-ts", "2.0", "1 stop", "50.00"),   // kept; null dt
      ("al", "2024-01-06 09:00:00", "0", "direct", "10.00"),   // duration<=0 drop
      ("al", "2024-01-07 10:00:00", "1.0", "direct", "-5.00"), // fare<=0 drop
    ).toDF("airline", "departure_datetime", "duration_hours", "stopovers", "total_fare")
    val out = Cleaning.clean(staging)
    assert(out.count() == 2)
    // T-4 fallback: absent base_fare/tax_surcharge become constant 0.0
    assert(out.select("base_fare", "tax_surcharge").distinct().head().toSeq == Seq(0.0, 0.0))
    val dts = out.select(date_format(col("departure_dt"), "yyyy-MM-dd").as("d"))
      .collect().map(r => Option(r.getString(0))).toSet
    assert(dts == Set(Some("2024-01-05"), None))
  }
}
