package graft.flights

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.SparkTestBase

class PipelineSpec extends SparkTestBase {
  test("end-to-end DAG run on clean data passes both validation gates") {
    val root = tmpDir("pipe")
    val csv = s"$root/flights.csv"
    Files.copy(Paths.get(resource("flights_clean.csv")), Paths.get(csv),
      StandardCopyOption.REPLACE_EXISTING)
    val p = new FlightPipeline(spark, root)
    val c = p.run(csv)
    assert(c.source == 50 && c.staging == 50 && c.fact == 50)
  }

  test("second run is a no-op and still validates (idempotency)") {
    val root = tmpDir("pipe")
    val csv = s"$root/flights.csv"
    Files.copy(Paths.get(resource("flights_clean.csv")), Paths.get(csv),
      StandardCopyOption.REPLACE_EXISTING)
    val p = new FlightPipeline(spark, root)
    p.run(csv)
    val c2 = p.run(csv)
    assert(c2.source == 50 && c2.staging == 50 && c2.fact == 50)
  }

  test("validation raises on staged-vs-source mismatch (V-3)") {
    val c = Validation.Counts(source = 100, staging = 99, fact = 99)
    val e = intercept[IllegalStateException](Validation.validate(c))
    assert(e.getMessage.contains("Data Loss detected"))
  }

  test("validation enforces the 1% fact budget (V-4)") {
    Validation.validate(Validation.Counts(1000, 1000, 990)) // exactly 1%: ok
    val e = intercept[IllegalStateException](
      Validation.validate(Validation.Counts(1000, 1000, 989)))
    assert(e.getMessage.contains("High Data Loss"))
  }
}
