package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The drift/trend family (q160-q164). The oracle gate pins
  * cross-engine bit-identity; these tests pin the MATH — each
  * statistic is re-derived independently (driver-side brute force on
  * the tiny sf0.001 frames, or a built-in double aggregate), so a
  * formula typo can't hide behind a twin that repeats the same typo. */
class DriftSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q160 KS matches a driver-side brute-force per source") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_chars"))
    val bySource = docs.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2) }
    val grid = docs.map(_._2).distinct.sorted
    val expected = bySource.map { case (s, xs) =>
      val rest = docs.filter(_._1 != s).map(_._2)
      val (ns, nr) = (xs.length.toLong, rest.length.toLong)
      val maxDev = grid.map { v =>
        val cs = xs.count(_ <= v).toLong
        val cr = rest.count(_ <= v).toLong
        (BigInt(cs) * nr - BigInt(cr) * ns).abs
      }.max
      s -> (ns, (maxDev * 1000000 / (BigInt(ns) * nr)).toLong)
    }
    val got = q("q160_ks_drift").collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("ks_ppm"))).toMap
    assert(got.keySet == expected.keySet && got.nonEmpty)
    expected.foreach { case (s, e) => assert(got(s) == e, s"source $s") }
  }

  test("q161 Benford constants sum to exactly 1e6 and margins reconcile") {
    val rows = q("q161_benford_audit").collect()
    assert(rows.map(_.getAs[Int]("digit")).toSeq == (1 to 9))
    assert(rows.map(_.getAs[Int]("expected_ppm")).sum == 1000000)
    val nOrders = graft.Tables.orders(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == nOrders)
    rows.foreach { r =>
      val obs = r.getAs[Long]("observed_ppm")
      assert(obs == r.getAs[Long]("n_orders") * 1000000L / nOrders)
      assert(r.getAs[Long]("dev_ppm") ==
        math.abs(obs - r.getAs[Int]("expected_ppm")))
    }
  }

  test("q162 autocorr matches the built-in corr over the same pairs") {
    val daily = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(18,0))"))
        .cast("long").as("cents"))
    val got = q("q162_revenue_autocorr").collect()
      .map(r => r.getAs[Int]("lag") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("autocorr"))).toMap
    assert(got.keySet == Set(1, 7, 28))
    Seq(1, 7, 28).foreach { k =>
      val pairs = daily.select(col("day"), col("cents").as("x"))
        .join(daily.select(date_sub(col("day"), k).as("day"), col("cents").as("y")),
          Seq("day"))
      val ref = pairs.agg(corr(col("x").cast("double"), col("y").cast("double")))
        .head.getDouble(0)
      val (n, ac) = got(k)
      assert(n == pairs.count(), s"lag $k pair count")
      assert(ac >= -1.0 && ac <= 1.0)
      assert(math.abs(ac - ref) < 1e-9, s"lag $k: $ac vs builtin $ref")
    }
  }

  test("q163 top-5 CUSUM days match a driver-side exact recomputation") {
    val daily = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => r.getAs[java.sql.Date]("day").toString -> r.getAs[Long]("c"))
      .sortBy(_._1)
    val t = daily.length.toLong
    val n = daily.map(_._2).sum
    var cum = 0L
    val devs = daily.zipWithIndex.map { case ((day, c), i) =>
      cum += c
      val ppm = ((BigInt(cum) * t - BigInt(i + 1) * n).abs * 1000000 /
        (BigInt(n) * t)).toLong
      (day, i + 1L, cum, ppm)
    }
    val expected = devs.sortBy { case (day, _, _, ppm) => (-ppm, day) }.take(5).toSeq
    val got = q("q163_cusum_changepoint").collect().map(r =>
      (r.getAs[String]("day"), r.getAs[Long]("day_idx"),
        r.getAs[Long]("cum_orders"), r.getAs[Long]("dev_ppm"))).toSeq
    assert(got == expected)
  }

  test("q164 on a one-day corpus returns an empty frame, like its twin") {
    // ADVICE r9: zero slope pairs — the twin's rank-0 CTE is empty and
    // its cross join collapses; the Spark side must agree, not emit a
    // single null-slope row
    val dir = tmpDir("q164-degenerate")
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val firstDay = orders.agg(min(col("o_orderdate").cast("date"))).head.get(0)
    orders.filter(col("o_orderdate").cast("date") === lit(firstDay))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    assert(spark.read.parquet(s"$dir/orders.parquet").count() > 0)
    val out = graft.queries.Drift.queries("q164_theil_sen_trend")(spark, dir)
    assert(out.count() == 0L)
    assert(out.columns.toSeq ==
      Seq("n_days", "n_pairs", "ts_slope", "ols_slope"))
  }

  test("q164 Theil-Sen slope is the nearest-rank median of all pairwise slopes") {
    val daily = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(18,0))"))
        .cast("long").as("cents"))
      .collect()
      .map(r => r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay -> r.getAs[Long]("cents"))
      .sortBy(_._1)
    val slopes = (for {
      i <- daily.indices.iterator
      j <- (i + 1) until daily.length
    } yield (daily(j)._2 - daily(i)._2).toDouble /
        (daily(j)._1 - daily(i)._1).toDouble).toArray.sorted
    val p = slopes.length.toLong
    val kRank = ((50 * p + 99) / 100).toInt
    val row = q("q164_theil_sen_trend").head
    assert(row.getAs[Long]("n_days") == daily.length.toLong)
    assert(row.getAs[Long]("n_pairs") == p)
    assert(row.getAs[Double]("ts_slope") == slopes(kRank - 1),
      s"${row.getAs[Double]("ts_slope")} vs brute ${slopes(kRank - 1)}")
    // OLS lives on the same data; both trends should at least agree in
    // being finite
    assert(!row.getAs[Double]("ols_slope").isNaN)
  }
}
