package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** ANALYZE / cost-based optimization: compute table + column
  * statistics over the star-schema tables and let Catalyst's
  * cost-based join reorder (`CostBasedJoinReorder`) pick the join
  * order from estimated cardinalities instead of trusting the
  * query's syntactic order.
  *
  * Everywhere else this engine steers joins explicitly — small dims
  * are `broadcast()`-hinted and AQE re-plans at runtime — which is
  * the right default for a known workload. This module is the
  * complementary path for AD-HOC queries at 100 TB: a user writes a
  * multi-join in whatever order they think of it, and with stats in
  * the catalog the optimizer derives the low-cost order (filtered
  * small sides first, the fact table last), no hints required.
  * ANALYZE itself is one scan per table (plus distinct sketches for
  * column stats), amortized across every query that follows —
  * standard warehouse hygiene, run after large loads.
  */
object Statistics {
  /** Catalog-table name for a testdata table registered for stats. */
  def statsTable(t: String): String = s"stats_$t"

  /** Every testdata table with an ANALYZE-able schema (VERDICT r7 #6):
    * the full star schema plus documents and events — all scalar
    * columns, so FOR ALL COLUMNS succeeds. embeddings is excluded
    * deliberately: its array<float> column has no column-stats
    * support, and table-level stats alone would not feed join
    * estimation anything the size-in-bytes default doesn't. */
  val testdataTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "documents", "events")

  /** Register each testdata parquet table as an external catalog
    * table (statistics need a catalog entry to hang off) and compute
    * table + column statistics. Idempotent: re-registering
    * re-analyzes.
    *
    * TIMESTAMP_NTZ columns are EXCLUDED from the column-stats pass
    * (table-level stats still cover the tables): Spark 4.1's
    * cost-based filter estimation pattern-matches the stat'd column's
    * type and has no TimestampNTZType arm, so a range predicate over
    * an NTZ column WITH column stats dies in the optimizer with
    * `scala.MatchError: TimestampNTZType` (hit by every
    * shipdate/orderdate band query the first time catalog mode ran
    * the full bench). Leaving the column un-stat'd routes the
    * estimator to its selectivity default — the same fallback arrays
    * get (see [[testdataTables]]) — and keeps row counts + every
    * other column's stats feeding join reorder. */
  def analyzeTables(spark: SparkSession, dir: String,
                    tables: Seq[String]): Unit =
    tables.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS ${statsTable(t)}")
      spark.catalog.createTable(statsTable(t), s"$dir/$t.parquet", "parquet")
      val statable = spark.table(statsTable(t)).schema.fields
        .filterNot(_.dataType.isInstanceOf[org.apache.spark.sql.types.TimestampNTZType])
        .map(f => s"`${f.name}`")
      // A table whose every column is NTZ-excluded would render an
      // empty FOR COLUMNS list — a parse error, not a fallback. Run
      // the plain table-level pass instead (row count + size still
      // feed join estimation).
      if (statable.isEmpty)
        spark.sql(s"ANALYZE TABLE ${statsTable(t)} COMPUTE STATISTICS")
      else
        spark.sql(s"ANALYZE TABLE ${statsTable(t)} COMPUTE STATISTICS " +
          s"FOR COLUMNS ${statable.mkString(", ")}")
    }

  /** Catalog mode for the whole query catalog: ANALYZE every testdata
    * table for `dir` and flip [[graft.Tables.catalogDirKey]] so
    * [[graft.Tables.table]] resolves loads for that dir through the
    * stats-bearing catalog entries. Bench's SPARK_GRAFT_CATALOG=on arm
    * calls this, making the timed plans the ones CBO actually
    * estimated (embeddings stays a path read — see [[testdataTables]]). */
  def registerForQueries(spark: SparkSession, dir: String): Unit = {
    analyzeTables(spark, dir, testdataTables)
    spark.conf.set(graft.Tables.catalogDirKey, dir)
  }

  /** A 3-way star join written in a deliberately BAD syntactic order —
    * the fact table (lineitem, the largest relation) first, the
    * heavily-filtered customer side last, and no broadcast/merge
    * hints anywhere. Rule-based optimization keeps the written order;
    * with stats + CBO the reorder should join the filtered customer
    * side onto orders BEFORE touching lineitem. */
  def threeWayJoin(spark: SparkSession): DataFrame =
    spark.sql(
      """SELECT o.o_orderpriority,
        |       count(*) AS n_items
        |FROM stats_lineitem l
        |JOIN stats_orders o ON l.l_orderkey = o.o_orderkey
        |JOIN stats_customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |GROUP BY o.o_orderpriority
        |ORDER BY o.o_orderpriority""".stripMargin)

  /** The join order the optimizer actually chose: catalog-table names
    * of the optimized plan's leaves, left to right. */
  def joinOrder(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().collect {
      case l: LogicalRelation => l.catalogTable.map(_.identifier.table)
    }.flatten

  /** Estimated row count the optimizer sees for a stats table (None
    * until ANALYZE has run — the spec asserts it is populated). */
  def estimatedRows(spark: SparkSession, t: String): Option[BigInt] =
    spark.table(statsTable(t)).queryExecution.optimizedPlan.stats.rowCount
}
