package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The rewrite runs for real in this suite: SparkTestBase enables
  * GraftExtensions, so every rank-limit pattern below actually
  * executes through TopKPerGroupExec. */
class TopKPerGroupSpec extends SparkTestBase {
  import spark.implicits._

  private def sample() = Seq(
    ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 40.0),
    ("b", 5L, 5.0), ("b", 6L, 1.0),
    ("c", 7L, 7.0)
  ).toDF("g", "id", "v")

  private val w = Window.partitionBy(col("g"))
    .orderBy(col("v").desc, col("id"))

  test("rank-limit pattern is rewritten to the bounded-heap operator") {
    val plan = sample().withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("Window"), s"window survived the rewrite:\n$plan")
    // rankAttr must be declared as produced, or Catalyst flags the
    // node invalid (missingInput -> the "!" marker)
    assert(!plan.contains("!TopKPerGroup"), s"plan integrity violation:\n$plan")
  }

  test("results and ranks match the window semantics exactly") {
    val got = sample().withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(3)))
      .toSet
    // expected top-2 by (v desc, id asc), ranks 1..2; c has only 1 row
    assert(got == Set(
      ("a", 4L, 1), ("a", 2L, 2),
      ("b", 5L, 1), ("b", 6L, 2),
      ("c", 7L, 1)))
  }

  test("rank == 1 form keeps exactly one row per group") {
    val got = sample().withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 4L, "b" -> 5L, "c" -> 7L))
  }

  test("k larger than every group degrades to a pass-through with ranks") {
    val got = sample().withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 100)
      .collect()
    assert(got.length == 7)
    val ranksA = got.filter(_.getString(0) == "a").map(_.getInt(3)).sorted
    assert(ranksA.toSeq == Seq(1, 2, 3, 4))
  }

  test("rank() and dense_rank() spellings are rewritten and match window semantics") {
    for (fn <- Seq(rank(), dense_rank())) {
      val q = sample().withColumn("rn", fn.over(w)).filter(col("rn") <= 2)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerGroup"), s"rewrite did not fire for $fn:\n$plan")
      assert(!plan.contains("Window"), s"window survived for $fn:\n$plan")
      // total order (id tiebreak): all three rank functions agree
      val got = q.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(3))).toSet
      assert(got == Set(
        ("a", 4L, 1), ("a", 2L, 2),
        ("b", 5L, 1), ("b", 6L, 2),
        ("c", 7L, 1)), s"$fn rows diverge: $got")
    }
  }

  test("rank()/dense_rank() emit tie-faithful rank values among the survivors") {
    // non-total order (no tiebreak) with every row inside k, so the
    // survivor set is complete and the rank VALUES are checkable:
    // v: 10, 10, 5  =>  rank: 1,1,3   dense_rank: 1,1,2
    val ties = Seq(("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 5.0))
      .toDF("g", "id", "v")
    val wv = Window.partitionBy(col("g")).orderBy(col("v").desc)
    def ranksOf(fn: org.apache.spark.sql.Column): Map[Long, Int] = {
      val q = ties.withColumn("rn", fn.over(wv)).filter(col("rn") <= 3)
      assert(q.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
      q.collect().map(r => r.getLong(1) -> r.getInt(3)).toMap
    }
    assert(ranksOf(rank()) == Map(1L -> 1, 2L -> 1, 3L -> 3))
    assert(ranksOf(dense_rank()) == Map(1L -> 1, 2L -> 1, 3L -> 2))
    assert(ranksOf(row_number()).values.toSeq.sorted == Seq(1, 2, 3))
  }

  test("rank()/dense_rank() keep tied rows past k — cardinality matches the window form") {
    // the review finding: a session-wide rewrite must never change
    // result cardinality under ties. v: 10,10,5 with k=2 —
    //   dense_rank <= 2 keeps ALL THREE rows (ranks 1,1,2);
    //   rank <= 2 keeps the two tied 10s (ranks 1,1) AND NOT the 5
    //     (its rank is 3);
    //   rank = 1 (the all-tied-winners idiom) keeps both 10s.
    val ties = Seq(("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 5.0))
      .toDF("g", "id", "v")
    val wv = Window.partitionBy(col("g")).orderBy(col("v").desc)
    def run(fn: org.apache.spark.sql.Column, bound: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
      val q = ties.withColumn("rn", fn.over(wv)).filter(bound(col("rn")))
      assert(q.queryExecution.executedPlan.toString.contains("TopKPerGroup"),
        "rewrite did not fire")
      q.collect().map(r => r.getLong(1) -> r.getInt(3)).toMap
    }
    assert(run(dense_rank(), _ <= 2) == Map(1L -> 1, 2L -> 1, 3L -> 2),
      "dense_rank dropped the untied second-rank row")
    assert(run(rank(), _ <= 2) == Map(1L -> 1, 2L -> 1),
      "rank <= 2 must keep exactly the tied winners")
    assert(run(rank(), _ === 1) == Map(1L -> 1, 2L -> 1),
      "rank = 1 must keep ALL tied winners")
    // all-ties group: rank <= 1 keeps every row
    val allTied = Seq(("a", 1L, 7.0), ("a", 2L, 7.0), ("a", 3L, 7.0), ("a", 4L, 7.0))
      .toDF("g", "id", "v")
    val got = allTied.withColumn("rn", rank().over(wv)).filter(col("rn") <= 1)
      .collect().map(_.getLong(1)).toSet
    assert(got == Set(1L, 2L, 3L, 4L), s"all-tied winners lost: $got")
  }

  test("tie survival across partitions: partial pruning keeps a superset of qualifiers") {
    // ties for the top value spread over 4 input partitions — the
    // partial phase must not cut any of them before the exchange.
    // 40 rows of v=100 (ids 0..39) + 9960 rows of v < 100
    val big = spark.range(10000)
      .select(lit("g").as("g"), col("id"),
        when(col("id") < 40, 100.0).otherwise((col("id") % 97).cast("double")).as("v"))
      .repartition(4)
    val wv = Window.partitionBy(col("g")).orderBy(col("v").desc)
    val winners = big.withColumn("rn", rank().over(wv)).filter(col("rn") <= 1)
      .collect().map(_.getLong(1)).toSet
    assert(winners == (0L until 40L).toSet,
      s"expected all 40 tied winners, got ${winners.size}")
    // dense_rank <= 2: the 40 tied 100s (rank 1) + every row of the
    // second-best key 96.0 (ids 96, 193, ... — id % 97 == 96, id >= 40)
    val secondKey = (40L until 10000L).filter(_ % 97 == 96).toSet
    val denseTop2 = big.withColumn("rn", dense_rank().over(wv)).filter(col("rn") <= 2)
      .collect().map(_.getLong(1)).toSet
    assert(denseTop2 == (0L until 40L).toSet ++ secondKey,
      s"dense_rank top-2 bucket set wrong: size ${denseTop2.size}")
  }

  test("literal-first comparison spellings rewrite too") {
    // lit(2) >= rank and lit(3) > rank and lit(1) === rank are the
    // same bounds users also write — the matcher must not be
    // orientation-sensitive
    def planOf(cond: org.apache.spark.sql.Column) =
      sample().withColumn("rn", row_number().over(w)).filter(cond)
    for ((cond, expect) <- Seq(
        (lit(2) >= col("rn"), Set(("a", 4L), ("a", 2L), ("b", 5L), ("b", 6L), ("c", 7L))),
        (lit(3) > col("rn"), Set(("a", 4L), ("a", 2L), ("b", 5L), ("b", 6L), ("c", 7L))),
        (lit(1) === col("rn"), Set(("a", 4L), ("b", 5L), ("c", 7L))))) {
      val q = planOf(cond)
      assert(q.queryExecution.executedPlan.toString.contains("TopKPerGroup"),
        s"literal-first spelling not rewritten: $cond")
      val got = q.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == expect, s"$cond: $got")
    }
  }

  test("bounds beyond maxRewriteK stay on the spill-capable window form") {
    val k = graft.plans.RewriteRankLimitToTopK.maxRewriteK + 1
    val q = sample().withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"large-k was rewritten off the spill path:\n$plan")
    assert(!plan.contains("TopKPerGroup"))
    assert(q.count() == 7)
  }

  test("compound filters are left on the window form (no unsound rewrite)") {
    val plan = sample().withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2 && col("v") > 1.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"compound filter was rewritten:\n$plan")
    // and the semantics stay correct either way
    val got = sample().withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2 && col("v") > 1.0)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 4L), ("a", 2L), ("b", 5L), ("c", 7L)))
  }

  test("partial phase flushes over the group budget and stays exact (all three styles)") {
    // 500 distinct groups through a partial phase budgeted to 4 groups
    // / 64 rows: dozens of flush generations per partition, and the
    // result must still match the window form exactly. Expected set is
    // computed independently (top-2 ids per group by v desc = id desc).
    val conf = spark.conf
    conf.set(TopKPerGroupExec.flushGroupsKey, "4")
    conf.set(TopKPerGroupExec.flushRowsKey, "64")
    try {
      val big = spark.range(10000)
        .select((col("id") % 500).cast("string").as("g"), col("id"),
          col("id").cast("double").as("v"))
        .repartition(8)
      val expected = (0L until 10000L).groupBy(_ % 500).iterator.flatMap {
        case (g, ids) => ids.sorted.takeRight(2).map(id => (g.toString, id))
      }.toSet
      for (fn <- Seq(row_number(), rank(), dense_rank())) {
        val q = big.withColumn("rn", fn.over(w)).filter(col("rn") <= 2)
        val plan = q.queryExecution.executedPlan.toString
        assert(plan.contains("TopKPerGroup"), s"rewrite did not fire for $fn:\n$plan")
        val got = q.collect().map(r => (r.getString(0), r.getLong(1))).toSet
        assert(got == expected,
          s"$fn under tiny flush budget diverged: ${got.size} rows vs ${expected.size}")
      }
    } finally {
      conf.unset(TopKPerGroupExec.flushGroupsKey)
      conf.unset(TopKPerGroupExec.flushRowsKey)
    }
  }

  test("partial phase flushes over the row budget under mass ties (rank = 1 on a constant key)") {
    // the degenerate tie case: every row qualifies, so a budget-less
    // TieKeeper would hold the whole partition. With flushRows=32 the
    // keeper flushes generation after generation and the final phase
    // still emits every row with rank 1.
    val conf = spark.conf
    conf.set(TopKPerGroupExec.flushRowsKey, "32")
    try {
      val allTied = spark.range(5000)
        .select(lit("g").as("g"), col("id"), lit(1.0).as("v"))
        .repartition(4)
      // order on v alone (no id tiebreak): every row is a tied winner
      val wv = Window.partitionBy(col("g")).orderBy(col("v").desc)
      val q = allTied.withColumn("rn", rank().over(wv)).filter(col("rn") === 1)
      assert(q.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
      val got = q.collect()
      assert(got.length == 5000, s"mass-tie rows lost under flush: ${got.length}")
      assert(got.forall(_.getInt(3) == 1))
    } finally conf.unset(TopKPerGroupExec.flushRowsKey)
  }

  test("partial phase prunes before the exchange (at most k rows per partition-group)") {
    // 4 input partitions, one group: the final phase sees <= 4*k rows,
    // proven indirectly — a 10k-row single group still returns exact
    // top-3 (the heap never holds more than k per partition)
    val big = spark.range(10000)
      .select(lit("g").as("g"), col("id"), (col("id") % 997).cast("double").as("v"))
      .repartition(4)
    val got = big.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .collect().map(r => (r.getLong(1), r.getInt(3))).sortBy(_._2)
    // v = id % 997 peaks at 996; ties break by id asc: ids 996, 1993, 2990
    assert(got.toSeq == Seq((996L, 1), (1993L, 2), (2990L, 3)))
  }
}
