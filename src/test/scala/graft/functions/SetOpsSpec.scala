package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
/** The native sorted-merge intersection kernel: its one contract is
  * count-equality with size(array_intersect) on sorted distinct
  * inputs — pinned on edges and by property, plus the codegen path
  * (a full DataFrame evaluation compiles the generated Java). */
class SetOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def viaSpark(a: Seq[Long], b: Seq[Long]): (Int, Int) = {
    val row = Seq((a.sorted.distinct, b.sorted.distinct)).toDF("a", "b")
      .select(SetOps.sorted_inter_count(col("a"), col("b")).as("m"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
      .head
    (row.getInt(0), row.getInt(1))
  }

  test("edges: empty, disjoint, identical, containment") {
    assert(viaSpark(Nil, Nil) == (0, 0))
    assert(viaSpark(Seq(1L, 2L, 3L), Nil) == (0, 0))
    assert(viaSpark(Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)) == (0, 0))
    assert(viaSpark(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) == (3, 3))
    assert(viaSpark(Seq(1L, 2L, 3L, 4L), Seq(2L, 3L)) == (2, 2))
    assert(viaSpark(Seq(Long.MinValue, 0L, Long.MaxValue),
      Seq(Long.MinValue, Long.MaxValue)) == (2, 2))
  }

  test("property: merge count equals array_intersect cardinality (seeded random)") {
    val rnd = new scala.util.Random(42)
    // one DataFrame pass over many random pairs keeps this fast and
    // still exercises the codegen'd path per row
    val cases = Seq.fill(200) {
      def arr() = Seq.fill(rnd.nextInt(40))(rnd.nextLong() % 50).sorted.distinct
      (arr(), arr())
    }
    val rows = cases.toDF("a", "b")
      .select(SetOps.sorted_inter_count(col("a"), col("b")).as("m"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
      .collect()
    rows.zip(cases).foreach { case (r, (a, b)) =>
      assert(r.getInt(0) == r.getInt(1), s"a=$a b=$b")
    }
  }

  test("mismatched or unsupported element types fail at analysis, not at runtime") {
    // long vs string: the kernel would read garbage; must be an
    // analysis error
    val mixed = Seq((Seq(1L, 2L), Seq("a", "b"))).toDF("a", "b")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      mixed.select(SetOps.sorted_inter_count(col("a"), col("b"))).collect()
    }
    assert(e1.getMessage.contains("sorted_inter_count"))
    // int arrays: getLong on int storage would crash at execution;
    // must also be an analysis error
    val ints = Seq((Seq(1, 2), Seq(2, 3))).toDF("a", "b")
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(SetOps.sorted_inter_count(col("a"), col("b"))).collect()
    }
    assert(e2.getMessage.contains("sorted_inter_count"))
  }

  test("string arrays: merge over UTF8 binary order matches array_intersect") {
    val cases = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq.empty[String], Seq("x")),
      (Seq("alpha b c", "b c d"), Seq("b c d", "zeta b c")),
      (Seq("é", "a"), Seq("é")),  // non-ASCII sorts after ASCII in UTF8
      (Seq("aa", "ab", "b"), Seq("ab", "b", "ba")))
    val rows = cases.map { case (a, b) => (a.sorted, b.sorted) }
      .toDF("a", "b")
      .select(SetOps.sorted_inter_count(array_sort(col("a")), array_sort(col("b"))).as("m"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
      .collect()
    rows.zip(cases).foreach { case (r, c) =>
      assert(r.getInt(0) == r.getInt(1), s"case $c")
    }
  }
}
