package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: persist both sides of a
  * frequently-joined pair bucketed (and sorted) on the join key, and
  * every subsequent equi-join on that key runs as a zero-exchange
  * sort-merge join — at 100 TB this converts the dominant repeated
  * shuffle of a fact⋈fact workload into local merges.
  *
  * Uses the session catalog's managed tables (`saveAsTable` is the
  * only writer that records bucketing metadata; a plain parquet path
  * loses it). `spark.sql.sources.bucketing.enabled` is on by default.
  */
object Bucketing {
  /** Persist a DataFrame as a bucketed, sorted managed table. Drops a
    * prior table AND its location (a stale location without a catalog
    * entry — e.g. after a fresh session against an old warehouse dir —
    * fails saveAsTable with LOCATION_ALREADY_EXISTS). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 8): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + "/" + table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Bucket lineitem and orders on the order key once; return the
    * co-located join (no Exchange on either side — asserted by
    * BucketingSpec against the physical plan). */
  def colocatedOrderJoin(spark: SparkSession, dir: String,
                         buckets: Int = 8): DataFrame = {
    val li = graft.Tables.lineitem(spark, dir)
    val o = graft.Tables.orders(spark, dir)
    writeBucketed(li, "b_lineitem", "l_orderkey", buckets)
    writeBucketed(o, "b_orders", "o_orderkey", buckets)
    val bl = spark.table("b_lineitem")
    val bo = spark.table("b_orders")
    // "merge" hint: at test scale AQE would broadcast the small side
    // (bypassing bucketing); at 100 TB neither side broadcasts and
    // sort-merge over co-located buckets is exactly the plan we want.
    bl.hint("merge").join(bo, bl("l_orderkey") === bo("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        graft.queries.Qx.dsum(col("l_extendedprice"), rescale = 2).as("sum_price"))
      .orderBy(col("o_orderpriority"))
  }
}
