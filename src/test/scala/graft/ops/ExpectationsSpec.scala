package graft.ops

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** A micro-warehouse with one planted violation per check class. */
  private lazy val dir: String = {
    val d = tmpDir("graft-expect")
    Seq(
      // (orderkey, partkey, suppkey, linenumber, qty, price, disc, tax, rf, ls, ship)
      (1L, 1L, 1L, 1, 10.0, 100.0, 0.05, 0.0, "N", "O", ts("2024-01-01 00:00:00")),
      (1L, 1L, 1L, 1, 10.0, 100.0, 0.05, 0.0, "N", "O", ts("2024-01-01 00:00:00")), // dup PK
      (2L, 1L, 1L, 1, 99.0, 100.0, 0.05, 0.0, "N", "O", ts("2024-01-01 00:00:00")), // qty range
      (3L, 1L, 1L, 1, 10.0, -5.0, 0.2, 0.0, "Z", "O", null.asInstanceOf[Timestamp]), // price+disc+domain+null
      (9L, 1L, 1L, 1, 10.0, 100.0, 0.05, 0.0, "N", "O", ts("2024-01-01 00:00:00"))  // fk orphan
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
      "l_shipdate")
      .write.parquet(s"$d/lineitem.parquet")
    Seq(
      (1L, 1L, "O", 100.0, ts("2024-01-01 00:00:00"), "1-URGENT"),
      (2L, 1L, "O", 100.0, ts("2024-01-01 00:00:00"), "1-URGENT"),
      (3L, 7L, "Q", -1.0, ts("2024-01-01 00:00:00"), "1-URGENT")   // fk+domain+range
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.parquet(s"$d/orders.parquet")
    Seq((1L, "c1", 1, 0.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$d/customer.parquet")
    d
  }

  test("every planted violation is counted by exactly its check") {
    val got = Expectations.qualityAudit(spark, dir).collect()
      .map(r => r.getAs[String]("check") -> r.getAs[Long]("n_violations")).toMap
    assert(got == Map(
      "range_quantity" -> 1L, "range_discount" -> 1L, "range_price" -> 1L,
      "null_shipdate" -> 1L, "domain_returnflag" -> 1L,
      "pk_unique" -> 1L, "fk_orders" -> 1L,
      "range_totalprice" -> 1L, "domain_orderstatus" -> 1L, "fk_customer" -> 1L))
  }

  test("ppm is the exact integer floor of violations over rows") {
    Expectations.qualityAudit(spark, dir).collect().foreach { r =>
      assert(r.getAs[Long]("violation_ppm") ==
        1000000L * r.getAs[Long]("n_violations") / r.getAs[Long]("n_rows"))
    }
  }

  test("on the driver testdata the referential checks hold (fk orphans = 0)") {
    val got = Expectations.qualityAudit(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getAs[String]("check") -> r.getAs[Long]("n_violations")).toMap
    assert(got("fk_orders") == 0L && got("fk_customer") == 0L)
    assert(got("range_quantity") == 0L && got("null_shipdate") == 0L)
  }
}
