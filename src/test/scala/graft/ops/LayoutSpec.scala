package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Z-order layout: the oracle checks the curve arithmetic; this spec
  * proves the LAYOUT CLAIM end-to-end — after zorderWrite, a
  * two-dimensional box predicate's matching rows live in a strict
  * subset of the files, while a one-dimension-sorted layout scatters
  * them across (nearly) all files. */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("zValue interleaves bits (known vectors)") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L), (65535L, 65535L))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"))).collect().map(_.getLong(0)).toSeq
    // interleave(5=101, 3=011): x bits at even positions -> 1+16=17;
    // y bits at odd -> 2+8=10; total 27
    assert(got == Seq(0L, 1L, 2L, 3L, 27L, (1L << 32) - 1))
  }

  test("clamping keeps out-of-range and negative values on the curve") {
    val got = Seq((-5L, 1L), (1L << 20, 0L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"))).collect().map(_.getLong(0)).toSeq
    val xAllOnes = (0 until Layout.zBits).map(i => 1L << (2 * i)).sum
    assert(got == Seq(2L, xAllOnes))
  }

  test("z-ordered files prune a 2-D box predicate; one-dim sort does not") {
    val days = datediff(col("l_shipdate"), lit(java.sql.Date.valueOf("1992-01-01")))
    val li = graft.Tables.lineitem(spark, sf)
      .select(days.cast("long").as("ship_day"), col("l_partkey"))
    val zPath = tmpDir("layout-z") + "/li"
    val naivePath = tmpDir("layout-naive") + "/li"
    Layout.zorderWrite(li, "ship_day", "l_partkey", zPath, 8)
    // the comparison layout: sorted by ship_day only (the common
    // "sort by date" default) into the same file count
    li.repartitionByRange(8, col("ship_day"))
      .sortWithinPartitions(col("ship_day"))
      .write.mode("overwrite").parquet(naivePath)

    // a box in both dimensions: ~1/8 of the day range x ~1/8 of parts
    def touchedFiles(path: String): Long =
      spark.read.parquet(path)
        .filter(col("ship_day").between(1500, 1800) &&
          col("l_partkey").between(10, 35))
        .select(input_file_name()).distinct().count()

    val (zFiles, nFiles) = (touchedFiles(zPath), touchedFiles(naivePath))
    assert(zFiles > 0, "box predicate must match some rows")
    assert(zFiles < nFiles,
      s"z-order must localize the box: z-layout $zFiles files vs one-dim $nFiles")
    // row counts agree, of course: layout changes placement, not data
    val zCnt = spark.read.parquet(zPath).count()
    assert(zCnt == li.count())
  }

  test("audit buckets are boxes: per-bucket spans much tighter than global") {
    val rows = Layout.zorderAudit(spark, sf).collect()
    assert(rows.length > 1)
    val gDay = rows.map(_.getAs[Long]("max_day")).max -
      rows.map(_.getAs[Long]("min_day")).min
    val gPart = rows.map(_.getAs[Long]("max_part")).max -
      rows.map(_.getAs[Long]("min_part")).min
    // weighted mean span across buckets, both dimensions: a z-curve
    // bucket covers a bounded square, so mean spans must sit well
    // under the global extents in BOTH dims (a 1-D sort would be
    // tight in one and global in the other)
    val n = rows.map(_.getAs[Long]("n_rows")).sum.toDouble
    def meanSpan(minC: String, maxC: String) = rows.map(r =>
      (r.getAs[Long](maxC) - r.getAs[Long](minC)) * r.getAs[Long]("n_rows")).sum / n
    assert(meanSpan("min_day", "max_day") < gDay * 0.6,
      s"day spans not localized")
    assert(meanSpan("min_part", "max_part") < gPart * 0.6,
      s"part spans not localized")
  }
}
