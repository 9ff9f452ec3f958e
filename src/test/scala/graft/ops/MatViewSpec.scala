package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q205 exact materialized-view maintenance: the merged incremental
  * state equals a full recompute, rounds replay idempotently,
  * compaction is read-equivalent, and the steady-state plan scans only
  * the delta + the tiny state store. */
class MatViewSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def stateSet(df: DataFrame): Set[(String, String, Long, Long, Long, Long)] =
    df.select(col("source"), col("lang"), col("n_docs"), col("sum_chars"),
        col("min_chars"), col("max_chars"))
      .as[(String, String, Long, Long, Long, Long)].collect().toSet

  test("incrementally merged state equals the full recompute (exact, incl. extremes)") {
    val docs = graft.Tables.documents(spark, sf)
    val full = stateSet(MatView.aggState(docs))
    // a store built by thirds (deliberately unequal, id-interleaved)
    val path = tmpDir("mv") + "/state"
    val st = new MatViewStore(spark, path)
    st.appendRound(docs.filter(col("doc_id") % 3 === 0), round = 0L)
    st.appendRound(docs.filter(col("doc_id") % 3 === 1), round = 1L)
    assert(stateSet(st.mergedWith(docs.filter(col("doc_id") % 3 === 2))) == full,
      "store + delta diverged from the recompute")
    // replaying a round replaces it (idempotent dynamic overwrite)
    st.appendRound(docs.filter(col("doc_id") % 3 === 1), round = 1L)
    assert(stateSet(st.mergedWith(docs.filter(col("doc_id") % 3 === 2))) == full,
      "round replay changed the state")
  }

  test("auto-compaction folds rounds read-equivalently (the merge is a monoid)") {
    val docs = graft.Tables.documents(spark, sf)
    val path = tmpDir("mv-compact") + "/state"
    val st = new MatViewStore(spark, path) {
      override protected def autoCompactThreshold: Int = 2
    }
    (0L to 5L).foreach(r => st.appendRound(docs.filter(col("doc_id") % 6 === r), r))
    assert(stateSet(st.state()) == stateSet(MatView.aggState(docs)),
      "compacted state diverged from the recompute")
  }

  test("steady-state q205 plan scans documents ONCE (the delta) plus the state store") {
    MatView.docProfileIncremental(spark, sf).collect() // warm: store committed
    val plan = MatView.docProfileIncremental(spark, sf)
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    var scans = List.empty[String]
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec        => walk(q.plan)
      case r: ReusedExchangeExec    => walk(r.child)
      case sc: FileSourceScanExec =>
        scans ::= sc.relation.location.rootPaths.map(_.toString).mkString(",")
      case other => other.children.foreach(walk)
    }
    walk(plan.queryExecution.executedPlan)
    assert(scans.count(_.contains("documents.parquet")) == 1,
      s"history re-scanned instead of the stored state: $scans")
    assert(scans.exists(_.contains("graft-matview")),
      s"state store missing from the plan: $scans")
  }
}
