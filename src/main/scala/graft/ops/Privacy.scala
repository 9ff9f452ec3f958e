package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Privacy-risk auditing over quasi-identifiers — the re-identification
  * complement of [[graft.ops.Curation]]'s q58 PII scrub: scrubbing
  * removes DIRECT identifiers (emails, phones), but a release is still
  * re-identifiable through quasi-identifier COMBINATIONS (nation ×
  * segment × balance band singles most people out long after the name
  * is gone). k-anonymity is the standard measure: every row must share
  * its quasi-identifier tuple with at least k−1 others.
  *
  * The audit reports the equivalence-class size histogram at each
  * level of a GENERALIZATION LADDER (full quasi → drop the band →
  * segment only), which is exactly the decision table an anonymization
  * pass needs: how many rows are risky now, and how much does each
  * coarsening step buy.
  *
  * 100 TB shape: the ladder is ONE scan — a single rollup (Expand +
  * one hash aggregate, partial map-side) computes every level's
  * classes at once instead of one scan per level; the class-size
  * histogram then folds |classes| rows, and everything downstream of
  * the first aggregate is domain-bounded. The DuckDB twin deliberately
  * runs the rival one-subquery-per-level UNION ALL spelling. */
object Privacy {
  type Q = (SparkSession, String) => DataFrame

  /** Classes smaller than this are flagged risky (the conventional
    * k = 5 release bar). */
  val kAnonThreshold = 5

  /** q203 — k-anonymity audit of the customer table under the quasi
    * set (segment, nation, 1000-unit balance band), with the
    * generalization ladder segment+nation+band → segment+nation →
    * segment. Bands are exact integer arithmetic on cents (house
    * rule); each output row is one (level, class size k): how many
    * classes have that size, how many rows they hold, and whether the
    * size is below [[kAnonThreshold]]. */
  val kAnonymity: Q = (s, d) => {
    val quasi = Tables.customer(s, d).select(
      col("c_mktsegment").as("segment"),
      col("c_nationkey").as("nation"),
      expr("cast(cast(c_acctbal as decimal(18,2)) * 100 as bigint) div 100000")
        .as("band"))
    // rollup(segment, nation, band) yields the ladder's three levels
    // plus the grand total (gid 7), which is not a generalization
    // level — filtered. gid bit order: band = 1, nation = 2.
    val classes = quasi.rollup(col("segment"), col("nation"), col("band"))
      .agg(count(lit(1)).as("k"), grouping_id().as("gid"))
      .filter(col("gid") =!= 7)
    val level = when(col("gid") === 0, "segment_nation_band")
      .when(col("gid") === 1, "segment_nation")
      .otherwise("segment")
    classes.groupBy(level.as("level"), col("k"))
      .agg(count(lit(1)).as("n_classes"), sum(col("k")).as("n_rows"))
      .withColumn("risky", col("k") < kAnonThreshold)
      .orderBy(col("level"), col("k"))
  }

  val queries: Map[String, Q] = Map(
    "q203_k_anonymity" -> kAnonymity)

  val oracle: Map[String, String] = Map(
    // the rival spelling on purpose: one subquery per ladder level,
    // UNION ALL — cross-checks the Spark side's single-pass rollup
    "q203_k_anonymity" ->
      """WITH q AS (
        |  SELECT c_mktsegment AS segment, c_nationkey AS nation,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) // 100000 AS band
        |  FROM customer),
        |lvl AS (
        |  SELECT 'segment_nation_band' AS level, count(*) AS k
        |  FROM q GROUP BY segment, nation, band
        |  UNION ALL
        |  SELECT 'segment_nation' AS level, count(*) AS k
        |  FROM q GROUP BY segment, nation
        |  UNION ALL
        |  SELECT 'segment' AS level, count(*) AS k
        |  FROM q GROUP BY segment)
        |SELECT level, k, count(*) AS n_classes,
        |  CAST(sum(k) AS BIGINT) AS n_rows,
        |  k < 5 AS risky
        |FROM lvl GROUP BY level, k ORDER BY level, k""".stripMargin)
}
