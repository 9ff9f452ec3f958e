package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("bloom probe has NO false negatives: every built key passes") {
    val keys = spark.range(0, 3000).select((col("id") * 7919 + 13).as("k"))
    val bloom = BloomJoin.buildBloom(keys, "k")
    val misses = keys.crossJoin(broadcast(bloom))
      .filter(!BloomJoin.mightContain(col("bits"), col("k")))
      .count()
    assert(misses == 0L, s"$misses built keys failed the probe — bloom is broken")
  }

  test("false-positive rate stays near the design point") {
    val keys = spark.range(0, 2000).select(col("id").as("k"))
    val bloom = BloomJoin.buildBloom(keys, "k")
    // disjoint probe universe
    val probes = spark.range(1000000, 1100000).select(col("id").as("k"))
    val fp = probes.crossJoin(broadcast(bloom))
      .filter(BloomJoin.mightContain(col("bits"), col("k")))
      .count()
    // design: k=5, m/n = 131 -> fp ~ 5e-8; allow generous slack
    assert(fp <= 20L, s"$fp false positives in 100k probes — sizing math is off")
  }

  test("distributed build ORs partials correctly (match a single-partition build)") {
    val keys = spark.range(0, 500).select((col("id") * 31).as("k"))
    val many = BloomJoin.buildBloom(keys.repartition(7), "k")
      .as[Array[Long]].head()
    val one = BloomJoin.buildBloom(keys.coalesce(1), "k")
      .as[Array[Long]].head()
    assert(java.util.Arrays.equals(many, one))
  }

  test("q110 equals the plain exact join (the bloom is semantics-free)") {
    val got = BloomJoin.bloomSemiJoinRevenue(spark, sf).collect()
      .map(r => r.getAs[String]("p_brand") ->
        (r.getAs[Double]("revenue"), r.getAs[Long]("n_items"))).toMap
    val part = graft.Tables.part(spark, sf)
    val Array(lo, hi) = part
      .agg(min(col("p_retailprice")), max(col("p_retailprice")))
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
    val dim = part
      .filter(col("p_retailprice") > lo + (hi - lo) * 0.95)
      .select(col("p_partkey"), col("p_brand"))
    val ref = graft.Tables.lineitem(spark, sf)
      .join(dim, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(graft.queries.Qx.discPrice(col("l_extendedprice"), col("l_discount")))
          .cast(org.apache.spark.sql.types.DecimalType(18, 4))
          .cast(org.apache.spark.sql.types.DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
      .collect()
      .map(r => r.getAs[String]("p_brand") ->
        (r.getAs[Double]("revenue"), r.getAs[Long]("n_items"))).toMap
    assert(got == ref && got.nonEmpty)
  }

  test("the bloom pre-filter sits BEFORE the join in the physical plan") {
    val plan = BloomJoin.bloomSemiJoinRevenue(spark, sf)
      .queryExecution.executedPlan.toString
    // the probe's hash family must appear in a Filter over the fact
    // scan (shiftright over the broadcast bits), not post-join
    assert(plan.contains("shiftright"), s"no bloom probe in plan:\n$plan")
  }
}
