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
  /** Two-phase salted count+sum aggregation — equivalent to
    * `df.groupBy(key).agg(count, sum(valueCol))` with the first
    * shuffle distributing each key over `salts` partitions.
    *
    * The salt MUST derive deterministically from row content
    * (`saltSource`): a partition-dependent salt (spark_partition_id,
    * monotonically_increasing_id) re-salts rows differently when a
    * failed stage recomputes, silently double-counting or dropping
    * rows (the nondeterministic-shuffle-key hazard). */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
                     saltSource: Column, salts: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(saltSource), lit(salts.toLong)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
      .groupBy(col(key))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("sum_value"))

  /** How a vocabulary-sized lookup table joins onto its probe stream.
    * [[VocabJoin.Adaptive]] is the production default: it measures the
    * lookup's row count (one cheap agg over a table the query computes
    * anyway) and picks broadcast below the ceiling, salted shuffle
    * above it — so a 100 TB corpus whose vocabulary outgrows broadcast
    * routes itself, with no caller-side scale switch to forget. */
  sealed abstract class VocabJoin
  object VocabJoin {
    /** Always broadcast the lookup (vocab-bounded corpora). */
    case object Broadcast extends VocabJoin
    /** Always salt-replicate the lookup (open-vocab corpora). */
    case object Salted extends VocabJoin
    /** Count the lookup, then pick: broadcast iff it fits. */
    case object Adaptive extends VocabJoin
  }

  /** Default broadcast ceiling for [[vocabLookupJoin]], in ROWS of the
    * lookup table. 2M (token, count) rows is ~100 MB serialized — well
    * inside executor broadcast budgets while far above any fixture
    * vocabulary; row count is the stable unit here (byte sizes are not
    * observable pre-execution without AQE stats, and the lookup row
    * shape is known to its author). */
  val vocabBroadcastMaxRows = 2000000L

  /** Join `probe` against a per-key `lookup` table, picking the join
    * strategy per [[VocabJoin]]. Adaptive mode persists the lookup
    * (it is then read by the row count AND the join — the eager-
    * materialize-before-concurrent-consumers rule) via
    * [[Dedup.persistSketch]], so Bench/Verify release it at the query
    * boundary like every other sketch frame. */
  def vocabLookupJoin(probe: DataFrame, lookup: DataFrame, key: String,
                      saltSource: Column,
                      mode: VocabJoin = VocabJoin.Adaptive,
                      maxBroadcastRows: Long = vocabBroadcastMaxRows,
                      salts: Int = 16): DataFrame = mode match {
    case VocabJoin.Broadcast => probe.join(broadcast(lookup), Seq(key))
    case VocabJoin.Salted    => saltedLookupJoin(probe, lookup, key, saltSource, salts)
    case VocabJoin.Adaptive =>
      // inline persist+count, NOT Dedup.materializedSketch: this is
      // the one site where the materializing count's VALUE is data
      // (it routes broadcast-vs-salted), so the helper would cost a
      // second job just to rename the call
      val cached = Dedup.persistSketch(lookup)
      val n = cached.count()
      if (n <= maxBroadcastRows) probe.join(broadcast(cached), Seq(key))
      else saltedLookupJoin(probe, cached, key, saltSource, salts)
  }

  /** Salted replicated JOIN of a huge probe stream against a per-key
    * lookup table (one row per key) too large to broadcast — the
    * vocabulary-join fallback for rarity/tf-idf when an open corpus
    * outgrows the broadcast threshold.
    *
    * A plain shuffle join on the key is skew-doomed: every occurrence
    * of a stopword lands on one reducer. Here the lookup side is
    * replicated `salts`× (cheap — it is per-KEY sized) and the probe
    * side salts deterministically from row content, so a hot key's
    * probe rows spread over `salts` reducers while every (key, salt)
    * reducer still finds its lookup row. Same determinism rule as
    * [[saltedCountSum]]: the salt must derive from row content, never
    * from partition identity. */
  def saltedLookupJoin(probe: DataFrame, lookup: DataFrame, key: String,
                       saltSource: Column, salts: Int = 16): DataFrame = {
    val replicated = lookup.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    probe.withColumn("_salt", pmod(xxhash64(saltSource), lit(salts.toLong)))
      .join(replicated, Seq(key, "_salt"))
      .drop("_salt")
  }
}
