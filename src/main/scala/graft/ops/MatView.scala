package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact incremental materialized-view maintenance — the EXACT
  * complement of q93's sketch store: a standing GROUP BY view kept
  * up to date by folding in each new batch's PARTIAL aggregate state,
  * never re-reading history. q93 accepts ~1% HLL error to make
  * COUNT DISTINCT incremental; this keeps the algebraic aggregates
  * (count / sum / min / max, and anything derivable from them —
  * averages, rates) bit-exact, because their partial states merge
  * losslessly: sums of sums, min of mins.
  *
  * This is the 100 TB dashboard pattern: the corpus profile every
  * curation report opens with (docs / chars / length extremes per
  * (source, lang)) costs one full scan ONCE, and afterwards O(delta)
  * per refresh — the standing state is |groups| rows, re-read each
  * refresh for pennies while the 100 TB of history is never touched
  * again. Append-only contract: min/max are NOT delta-maintainable
  * under deletes/updates (a retraction can expose a new minimum only
  * a rescan can find); a mutating upstream needs [[Cdc]] in front or
  * a sketch that tolerates it. The store rides
  * [[CompactableRoundStore]]: one partial-state partition per ingest
  * round, merge-on-read, auto-compaction folding old rounds —
  * read-equivalent because the merge is the aggregates' own
  * semilattice/monoid algebra. */
object MatView {
  type Q = (SparkSession, String) => DataFrame

  /** Partial aggregate state of a document batch: one row per
    * (source, lang) — count/sum/min/max over n_chars. */
  private[ops] def aggState(docs: DataFrame): DataFrame =
    docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))

  /** Merge partial states (state rows in, state rows out): the
    * losslessly-mergeable fold — counts and sums add, extremes fold.
    * Associative + commutative, so rounds merge in any order and
    * compaction is read-equivalent. */
  private[ops] def mergeState(states: DataFrame): DataFrame =
    states.groupBy(col("source"), col("lang"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("sum_chars")).as("sum_chars"),
        min(col("min_chars")).as("min_chars"),
        max(col("max_chars")).as("max_chars"))

  // Per-(JVM, documents CONTENT) store lifecycle, the q93/q61/q67c
  // ScratchStores discipline: base round 0 holds the state of doc_id
  // <= wm (the corpusKey watermark), the live query folds only the
  // delta above it.
  private def store(s: SparkSession, d: String): (MatViewStore, Long) = {
    val docs = Tables.documents(s, d)
    val (key, wm) = ScratchStores.corpusKey(docs, d)
    val path = ScratchStores.pathFor(key, "graft-matview-doc-profile") { p =>
      new MatViewStore(s, p).appendRound(
        docs.filter(col("doc_id") <= wm), round = 0L)
    }
    (new MatViewStore(s, path), wm)
  }

  /** q205 — the corpus-profile materialized view, incrementally
    * maintained: stored per-round partial states merged with the
    * delta's own state (the only documents rows the steady-state plan
    * scans — MatViewSpec pins it). The DuckDB twin recomputes the
    * whole view from scratch, so a single drifted bit in the
    * merge/store path hash-fails. avg is derived exactly from the
    * state (micro-units, integer div). */
  val docProfileIncremental: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val (st, wm) = store(s, d)
    st.mergedWith(docs.filter(col("doc_id") > wm))
      // the x1e6 rescale is the wrap point (a 9e12-char group already
      // overflows BIGINT when multiplied) — widen to DECIMAL(38,0)
      // before it, HUGEINT in the twin, land back in BIGINT
      .withColumn("avg_chars_micro",
        expr("cast(cast(sum_chars as decimal(38,0)) * 1000000 div n_docs as bigint)"))
      .orderBy(col("source"), col("lang"))
  }

  /** q207 — TIME TRAVEL over the view store: the corpus profile as of
    * the bootstrap snapshot (`state(beforeRound)` — the replay-guard
    * surface doubling as an as-of read) diffed against the live state,
    * per group. This is the audit every ingest review runs ("what did
    * this source look like before the weekend's crawl landed"), and it
    * reads NO history: both sides fold the store's |groups|-sized
    * state rows; only the live side adds the delta scan. Groups born
    * after the snapshot surface with base 0 (append-only ⇒ base ⊆
    * live, so a left join from the live side is total). The DuckDB
    * twin recomputes both epochs from the raw table — the store's
    * as-of read must match a true historical recompute bit for bit. */
  val viewTimeTravel: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val (st, wm) = store(s, d)
    val base = st.state(beforeRound = Some(1L)).select(col("source"), col("lang"),
      col("n_docs").as("nb"), col("sum_chars").as("sb"))
    val now = st.mergedWith(docs.filter(col("doc_id") > wm))
      .select(col("source"), col("lang"),
        col("n_docs").as("nn"), col("sum_chars").as("sn"))
    now.join(base, Seq("source", "lang"), "left")
      .select(col("source"), col("lang"),
        coalesce(col("nb"), lit(0L)).as("n_docs_base"),
        col("nn").as("n_docs_now"),
        (col("nn") - coalesce(col("nb"), lit(0L))).as("docs_added"),
        (col("sn") - coalesce(col("sb"), lit(0L))).as("chars_added"))
      .orderBy(col("source"), col("lang"))
  }

  val queries: Map[String, Q] = Map(
    "q205_matview_incremental" -> docProfileIncremental,
    "q207_view_time_travel" -> viewTimeTravel)

  val oracle: Map[String, String] = Map(
    // full recompute — the independent check of the incremental fold
    "q205_matview_incremental" ->
      """SELECT source, lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        |  CAST(CAST(sum(n_chars) AS HUGEINT) * 1000000 // count(*) AS BIGINT)
        |    AS avg_chars_micro
        |FROM documents GROUP BY source, lang
        |ORDER BY source, lang""".stripMargin,
    // both epochs recomputed from the raw table: the base epoch is the
    // store's bootstrap watermark (max(doc_id)*4/5 — the ScratchStores
    // convention), the live epoch is everything
    "q207_view_time_travel" ->
      """WITH wm AS (SELECT max(doc_id) * 4 // 5 AS w FROM documents),
        |base AS (
        |  SELECT source, lang, count(*) AS nb, CAST(sum(n_chars) AS BIGINT) AS sb
        |  FROM documents, wm WHERE doc_id <= w GROUP BY source, lang),
        |now AS (
        |  SELECT source, lang, count(*) AS nn, CAST(sum(n_chars) AS BIGINT) AS sn
        |  FROM documents GROUP BY source, lang)
        |SELECT n.source, n.lang,
        |  coalesce(b.nb, CAST(0 AS BIGINT)) AS n_docs_base,
        |  n.nn AS n_docs_now,
        |  n.nn - coalesce(b.nb, CAST(0 AS BIGINT)) AS docs_added,
        |  n.sn - coalesce(b.sb, CAST(0 AS BIGINT)) AS chars_added
        |FROM now n LEFT JOIN base b
        |  ON n.source = b.source AND n.lang = b.lang
        |ORDER BY n.source, n.lang""".stripMargin)
}

/** Durable partial-state store for [[MatView]]: one (source, lang)
  * state partition per ingest round; reads merge-on-read; rounds are
  * idempotent (dynamic overwrite) and auto-compaction folds old ones
  * via the same merge algebra. */
class MatViewStore(spark: SparkSession, val path: String)
    extends CompactableRoundStore {
  override protected def storeSpark: SparkSession = spark

  override protected def mergeRounds(rows: DataFrame): DataFrame =
    MatView.mergeState(rows.drop("ingest_round"))

  def exists: Boolean = graft.flights.StarWarehouse.pathExists(spark, path)

  /** The merged view state over committed rounds (`beforeRound` is the
    * streaming replay guard). */
  def state(beforeRound: Option[Long] = None): DataFrame =
    mergeRounds(
      beforeRound.foldLeft(readAll)((df, r) =>
        df.filter(col("ingest_round") < r)))

  /** Aggregate `docs` into partial state and commit as round `round`. */
  def appendRound(docs: DataFrame, round: Long): Unit = {
    RoundPartitions.commit(MatView.aggState(docs), path, round)
    maybeCompact(round)
  }

  /** Stored state merged with an uncommitted delta's own state — the
    * read path of a refresh that has scanned only the delta. */
  def mergedWith(deltaDocs: DataFrame, beforeRound: Option[Long] = None): DataFrame =
    MatView.mergeState(state(beforeRound).unionByName(MatView.aggState(deltaDocs)))
}
