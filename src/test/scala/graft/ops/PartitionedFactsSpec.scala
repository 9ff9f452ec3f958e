package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Pins the two partition-pruning plan shapes (VERDICT r9 #1): the
  * static band prune and the DynamicPruningExpression a dim-side
  * filter injects into the fact scan — asserting not just the plan
  * text but the RUNTIME effect (files read < files in store). AQE is
  * disabled inside the plan-shape cases so FileSourceScanExec is
  * reachable by a plain collect; the registered queries run under AQE
  * in Bench/Verify, where DPP composes with it (the value parity
  * below and the q191/q192 oracle twins cover that path). */
class PartitionedFactsSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def withoutAqe[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def factScan(df: DataFrame): FileSourceScanExec = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collect {
      case f: FileSourceScanExec
        if f.output.exists(_.name == "o_month") => f
    }
    assert(scans.nonEmpty, s"no partitioned-fact scan in:\n$plan")
    scans.head
  }

  private def storeFileCount(df: DataFrame): Long =
    df.inputFiles.length.toLong

  test("store is laid out as o_month partition directories") {
    val store = PartitionedFacts.partitionedOrders(spark, sf)
    assert(store.columns.contains("o_month"))
    // partition discovery read the month back as a real DATE column
    assert(store.schema("o_month").dataType ==
      org.apache.spark.sql.types.DateType)
    val dirs = store.inputFiles.flatMap(
      _.split("/").find(_.startsWith("o_month="))).distinct
    assert(dirs.length > 12, s"expected many month dirs, got ${dirs.length}")
  }

  test("q191: dim filter injects DynamicPruningExpression and skips files") {
    withoutAqe {
      val df = PartitionedFacts.dppQuarterRevenue(spark, sf)
      df.collect()
      val scan = factScan(df)
      // structural, not textual: treeString truncates long expressions
      assert(scan.partitionFilters.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning])),
        s"no DynamicPruning filter on fact scan: ${scan.partitionFilters}")
      val total = storeFileCount(PartitionedFacts.partitionedOrders(spark, sf))
      val read = scan.metrics("numFiles").value
      assert(read > 0 && read < total,
        s"DPP did not skip partitions: read $read of $total files")
    }
  }

  test("q191 values match the flat-table spelling") {
    val pruned = PartitionedFacts.dppQuarterRevenue(spark, sf).collect()
    val flat = graft.Tables.orders(spark, sf)
      .filter(year(col("o_orderdate")) === 1995 &&
        quarter(col("o_orderdate")) === 1)
      .groupBy(date_format(date_trunc("month", col("o_orderdate")),
        "yyyy-MM-dd").as("o_month"))
      .agg(count(lit(1)).as("n_orders"),
        sum((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("decimal(18,0)")).cast("long").as("cents"))
      .orderBy(col("o_month")).collect()
    assert(pruned.length == 3)
    assert(pruned.toSeq == flat.toSeq)
  }

  test("q192: literal month band becomes a static PartitionFilter") {
    withoutAqe {
      val df = PartitionedFacts.staticPruneBacklog(spark, sf)
      df.collect()
      val scan = factScan(df)
      assert(scan.partitionFilters.exists(_.references.exists(_.name == "o_month")),
        s"no o_month partition filter on scan: ${scan.partitionFilters}")
      val total = storeFileCount(PartitionedFacts.partitionedOrders(spark, sf))
      val read = scan.metrics("numFiles").value
      assert(read > 0 && read < total,
        s"static prune did not skip partitions: read $read of $total files")
    }
  }

  test("q196 layered layout: months prune by directory, partkey band by z-files") {
    val store = PartitionedFacts.partitionedLineitem(spark, sf)
    val monthDirs = store.inputFiles.flatMap(
      _.split("/").find(_.startsWith("l_month="))).distinct
    val filesPerMonth = store.inputFiles.length.toDouble / monthDirs.length
    assert(filesPerMonth > 1.5,
      s"z range-partitioning must split each month into several files " +
        s"(got $filesPerMonth)")
    // coarse prune: the quarter band touches 3 month directories
    val band = store.filter(
      col("l_month").between("1995-06-01", "1995-08-01"))
    val bandFiles = band.select(input_file_name()).distinct().collect()
      .map(_.getString(0))
    assert(bandFiles.flatMap(_.split("/").find(_.startsWith("l_month=")))
      .distinct.length == 3)
    // fine prune: within the surviving months, the partkey band's rows
    // live in a strict subset of the z-segmented files
    val touched = band.filter(col("l_partkey").between(100, 500))
      .select(input_file_name()).distinct().count()
    assert(touched > 0 && touched < bandFiles.length,
      s"z locality missing: band touches $touched of ${bandFiles.length} " +
        "files in the surviving months")
  }

  test("empty corpus: store builds schema-bearing, queries return empty") {
    val dir = tmpDir("graft-pf-empty")
    Seq("orders").foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    assert(PartitionedFacts.dppQuarterRevenue(spark, dir).count() == 0)
    assert(PartitionedFacts.staticPruneBacklog(spark, dir).count() == 0)
  }
}
