package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers. AQE's skew-join handling covers joins; for
  * AGGREGATIONS over heavily-skewed keys (one user/key holding a large
  * fraction of rows), the classic fix is two-phase salted aggregation:
  * shuffle once on (key, salt) so the hot key spreads over `salts`
  * reducers, then combine the per-salt partials with a second (tiny)
  * shuffle on the key alone.
  *
  * Only algebraic aggregates decompose this way; the helper exposes
  * the standard ones (count/sum/min/max). Non-decomposable aggregates
  * (exact distinct, median) need sketches instead — see
  * `approx_count_distinct` in the sketches query.
  */
object Skew {
  /** Two-phase salted count+sum aggregation.
    * Equivalent to `df.groupBy(key).agg(count, sum(valueCol))` but the
    * first shuffle distributes each key over `salts` partitions. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
                     salts: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id() +
      monotonically_increasing_id(), lit(salts)))
    salted
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
      .groupBy(col(key))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("sum_value"))
  }

  /** Deterministic variant: salt derived from a hash of stable
    * columns (same result layout every run; use when the salt must be
    * reproducible, e.g. for tests or retry-idempotent jobs). */
  def saltedCountSumBy(df: DataFrame, key: String, valueCol: String,
                       saltSource: Column, salts: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(saltSource), lit(salts.toLong)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
      .groupBy(col(key))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("sum_value"))
}
