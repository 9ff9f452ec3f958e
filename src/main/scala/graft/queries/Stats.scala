package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact distributed statistics: regression, outlier detection, and
  * concentration analysis under the engine's cross-engine bit-identity
  * discipline (see [[Qx]]).
  *
  * The built-in `regr_slope`/`corr`/`stddev` aggregates sum doubles in
  * partition order, so their results are not reproducible across
  * engines (or across two runs with different partitioning). Every
  * query here instead reduces the data to EXACT decimal/integer moment
  * sums (order-independent by construction), then applies the closed-
  * form formula as a fixed sequence of scalar IEEE-754 ops — both
  * engines see identical operands and identical operation trees, so
  * the doubles match bit-for-bit, the same trust q102's
  * (rank-1)/(n-1) already relies on.
  *
  * Scale posture: each query is one (or two) hash-aggregations onto a
  * handful of group keys — partial-aggregable, map-side combined, no
  * fact-table shuffle anywhere (the second pass of the outlier query
  * joins a BROADCAST stats table back onto the scan).
  */
object Stats {
  import Qx._

  type Q = (SparkSession, String) => DataFrame

  /** Exactness envelope guard for the moment sums (same contract as
    * [[Qx.guarded]]): decimal totals must round-trip through DOUBLE
    * exactly, i.e. the scaled integer stays below 2^53. A total past
    * the bound raises instead of silently losing ulps. */
  private def exactDouble(c: Column, rescale: Int): Column = {
    val r = c.cast(DecimalType(18, rescale))
    val bound = new java.math.BigDecimal(1L << 53).movePointLeft(rescale)
    when(c.isNotNull && (r.isNull || abs(r) >= lit(bound)),
      raise_error(concat(lit("graft.Stats: moment sum past the 2^53 exactness bound: "),
        c.cast(StringType))).cast(DecimalType(18, rescale)))
      .otherwise(r).cast(DoubleType)
  }

  /** q108 — per-group ordinary-least-squares regression and Pearson
    * correlation of discount on quantity ("do larger orders get
    * deeper discounts"), the exact-arithmetic form of
    * `regr_slope / regr_intercept / corr`.
    *
    * One aggregation computes the five moment sums (Sx, Sy, Sxx,
    * Sxy, Syy) in exact decimals — quantity is integral (rescale 0),
    * discount has 2 dp (2; products 4) — then the closed forms run
    * on the exact-sum doubles:
    *   slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)
    *   intercept = (Sy - slope*Sx) / n
    *   corr = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2))
    * Every operand is bit-identical across engines and the formula is
    * a fixed parenthesized tree, so the emitted doubles are too
    * (sqrt is correctly rounded per IEEE-754).
    *
    * Scale: one scan, map-side combine onto 3 group keys; sum bounds
    * hold to SF100 and [[exactDouble]] raises loudly past that. */
  private val q108: Q = (s, d) => {
    val x = col("l_quantity").cast(D6)
    val y = col("l_discount").cast(D6)
    val stats = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(x).as("sx_d"), sum(y).as("sy_d"),
        sum((x * x).cast(D6)).as("sxx_d"),
        sum((x * y).cast(D6)).as("sxy_d"),
        sum((y * y).cast(D6)).as("syy_d"))
      .select(col("l_returnflag"), col("n_items"),
        col("n_items").cast(DoubleType).as("n"),
        exactDouble(col("sx_d"), 0).as("sx"),
        exactDouble(col("sy_d"), 2).as("sy"),
        exactDouble(col("sxx_d"), 0).as("sxx"),
        exactDouble(col("sxy_d"), 2).as("sxy"),
        exactDouble(col("syy_d"), 4).as("syy"))
    val covN = col("n") * col("sxy") - col("sx") * col("sy")
    val varXN = col("n") * col("sxx") - col("sx") * col("sx")
    val varYN = col("n") * col("syy") - col("sy") * col("sy")
    val slope = covN / varXN
    stats.select(col("l_returnflag"), col("n_items"),
        slope.as("slope"),
        ((col("sy") - slope * col("sx")) / col("n")).as("intercept"),
        (covN / sqrt(varXN * varYN)).as("corr"))
      .orderBy(col("l_returnflag"))
  }

  /** q204 — GROUPED model fitting: one OLS regression + Pearson corr
    * per (order year, return flag) cell — q108's exact-moment algebra
    * fanned out over a group domain, the "thousands of models in one
    * aggregate" pattern a feature platform runs (per-cohort trend fits,
    * per-segment calibrations). There is no per-model loop and no
    * driver involvement: ONE join carries the year onto the fact, ONE
    * aggregation map-side-combines the five moment sums per cell, and
    * the closed forms run columnar over however many cells exist —
    * fitting 10^4 models costs the same scan as fitting 3. At 100 TB
    * the join is the only heavy edge (orderkey⋈orderkey sort-merge;
    * the group domain itself is bounded), and the moment sums inherit
    * q108's exactness bounds + loud [[exactDouble]] overflow guard.
    * Group cells are big enough at every shipped SF that the variance
    * never degenerates (q108 note: a zero-variance cell would NaN both
    * engines identically anyway — same IEEE tree). */
  private val q204: Q = (s, d) => {
    val x = col("l_quantity").cast(D6)
    val y = col("l_discount").cast(D6)
    val li = Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_returnflag"), col("l_quantity"), col("l_discount"))
    val ord = Tables.orders(s, d).select(
      col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    val stats = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_year"), col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(x).as("sx_d"), sum(y).as("sy_d"),
        sum((x * x).cast(D6)).as("sxx_d"),
        sum((x * y).cast(D6)).as("sxy_d"),
        sum((y * y).cast(D6)).as("syy_d"))
      .select(col("o_year"), col("l_returnflag"), col("n_items"),
        col("n_items").cast(DoubleType).as("n"),
        exactDouble(col("sx_d"), 0).as("sx"),
        exactDouble(col("sy_d"), 2).as("sy"),
        exactDouble(col("sxx_d"), 0).as("sxx"),
        exactDouble(col("sxy_d"), 2).as("sxy"),
        exactDouble(col("syy_d"), 4).as("syy"))
    val covN = col("n") * col("sxy") - col("sx") * col("sy")
    val varXN = col("n") * col("sxx") - col("sx") * col("sx")
    val varYN = col("n") * col("syy") - col("sy") * col("sy")
    val slope = covN / varXN
    stats.select(col("o_year"), col("l_returnflag"), col("n_items"),
        slope.as("slope"),
        ((col("sy") - slope * col("sx")) / col("n")).as("intercept"),
        (covN / sqrt(varXN * varYN)).as("corr"))
      .orderBy(col("o_year"), col("l_returnflag"))
  }

  /** q109 — 3-sigma outlier rates per (returnflag, linestatus), with
    * ZERO floating point anywhere: prices become exact cent integers,
    * and the classic |x - mean| > 3*stddev test is cleared of its
    * divisions and its square root:
    *   (n*x - S)^2 > 9 * (n*S2 - S^2)
    * evaluated in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB twin) —
    * both exact 128-bit-class integer arithmetic, so the flagged set
    * is bit-identical by construction, no IEEE trust needed at all.
    *
    * Two passes over the fact, NO fact shuffle: pass 1 map-side
    * combines (n, S, S2) onto a handful of keys; pass 2 re-scans with
    * the tiny stats table BROADCAST back on and counts flagged rows,
    * again map-side combined. The intermediate magnitudes fit
    * DECIMAL(38,0) through SF100 (documented per term); past that the
    * first pass should center on a coarse first-pass mean before
    * squaring (two-pass Welford), which keeps (n*x - S) small —
    * noted, not implemented.
    *
    * `outlier_ppm` is an exact integer floor division, q104's ppm
    * discipline. */
  private val q109: Q = (s, d) => {
    // exact cents: 2-dp double -> DECIMAL(18,2) (correct rounding of
    // the double's shortest decimal form on both engines) -> integer
    val cents = (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
      .cast(DecimalType(18, 0))
    val li = Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus"), cents.as("cents"))
    val stats = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).cast(DecimalType(18, 0)).as("n_d"),
        sum(col("cents")).as("s_d"),
        sum((col("cents") * col("cents")).cast(DecimalType(38, 0))).as("s2_d"))
    val lhs = (col("n_d") * col("cents") - col("s_d")).cast(DecimalType(38, 0))
    val rhs = (col("n_d") * col("s2_d") - col("s_d") * col("s_d")).cast(DecimalType(38, 0))
    // non-ANSI decimal overflow yields NULL silently; the envelope is
    // SF100-safe but a breach must be loud, not a dropped row
    val guardedFlag = when(lhs.isNull || rhs.isNull,
        raise_error(lit("graft.Stats q109: DECIMAL(38,0) overflow — center first (class doc)")))
      .otherwise(lhs * lhs > rhs * 9)
    li.join(broadcast(stats), Seq("l_returnflag", "l_linestatus"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"),
        sum(when(guardedFlag, 1L).otherwise(0L)).as("n_outliers"))
      .select(col("l_returnflag"), col("l_linestatus"), col("n_items"),
        col("n_outliers"),
        expr("1000000 * n_outliers div n_items").as("outlier_ppm"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** q112 — the TPC-H Q7 shape (volume shipping between two trade
    * partners): revenue by (supplier nation, customer nation, ship
    * year) for flows in either direction between two chosen nations.
    *
    * The 100 TB plan this spells: both nation filters push to the DIM
    * side BEFORE any fact join — the qualified suppliers broadcast
    * onto lineitem (pruning the fact to ~2/25 of its rows with no
    * shuffle), the qualified customers broadcast onto orders — and
    * only then do the two pruned facts meet in the single big
    * exchange on orderkey. Filtering after a lineitem-orders-customer
    * join (the naive spelling) would shuffle 12x the rows. The final
    * pair filter (either direction, unequal) runs on two ints. */
  private val q112: Q = (s, d) => {
    val nations = Seq("NATION_3", "NATION_7")
    val nat = Tables.nation(s, d)
      .filter(col("n_name").isin(nations: _*))
      .select(col("n_nationkey"), col("n_name"))
    val supp = Tables.supplier(s, d)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(s, d)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ord = Tables.orders(s, d)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("cust_nation"))
    Tables.lineitem(s, d)
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("ship_year"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast(DecimalType(18, 4)).cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("ship_year"))
  }

  /** q113 — Pareto concentration: the smallest head set of suppliers
    * (by revenue, ties broken by key) covering 80% of total revenue,
    * emitted per supplier with its exact cumulative share.
    *
    * All comparisons run in exact decimals: a supplier is in the head
    * while the revenue BEFORE it (cum - own) is under 0.8 * total,
    * with 0.8 an exact DECIMAL(1,1) — the threshold never touches a
    * double. Revenues rescale to DECIMAL(18,4) right after the
    * aggregation (lossless, <= 4 real dp; holds totals to 10^14, so
    * SF100-safe) — the tight width keeps every downstream decimal op
    * inside BOTH engines' 38-digit cap (DuckDB ERRORS on a multiply
    * that would widen past 38, so a DECIMAL(38,6) window sum times
    * anything is a twin-killer). The share emitted per row is one
    * double division of two exact decimals.
    *
    * Scale: the per-supplier aggregation map-side combines onto the
    * supplier key (one exchange); the cumulative revenue then runs the
    * [[rangeShards]] two-phase prefix over the AGGREGATED frame — a
    * range exchange plus per-shard windows seeded by broadcast offset
    * sums, so no reducer ever sees more than its shard even at 10^8
    * suppliers (the r8 spelling was a single-partition window over
    * the dim-sized frame; VERDICT r8 #3 retired it). */
  private val q113: Q = (s, d) => {
    val perSupp = Tables.lineitem(s, d)
      .groupBy(col("l_suppkey"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
        .cast(DecimalType(18, 4)).as("rev_d"))
    val sortExprs = Seq(col("rev_d").desc, col("l_suppkey"))
    val (ranged, shards) = rangeShards(perSupp, sortExprs,
      count(lit(1)).as("c"), sum(col("rev_d")).as("sm"))
    val (offDf, totals) = exclusiveOffsets(s, shards, Seq("_coff", "_soff"),
      Seq(0L, java.math.BigDecimal.ZERO))
    // r16 (guide §1.2 "don't compute things you already have"): the
    // grand revenue total IS the shard sums' exact-decimal fold that
    // exclusiveOffsets already returns — the r15 spelling re-ran the
    // whole lineitem scan + supplier aggregation a second time just to
    // crossJoin one scalar. Exact-decimal addition is associative, so
    // the literal equals the re-aggregated value bit for bit (q115
    // already used its totals this way; oracle re-checked).
    val totalD = totals(1).asInstanceOf[java.math.BigDecimal]
    val w = Window.partitionBy(col("_pid")).orderBy(sortExprs: _*)
    ranged.join(broadcast(offDf), Seq("_pid"))
      .withColumn("cum_d", col("_soff").cast(DecimalType(18, 4)) +
        sum(col("rev_d")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rank",
        (col("_coff") + row_number().over(w)).cast(IntegerType))
      .withColumn("total_d", lit(totalD).cast(DecimalType(18, 4)))
      .filter((col("cum_d") - col("rev_d")).cast(DecimalType(18, 4)) <
        col("total_d") * lit(new java.math.BigDecimal("0.8")))
      .select(col("rank"), col("l_suppkey"),
        col("rev_d").cast(DoubleType).as("revenue"),
        (col("cum_d").cast(DecimalType(18, 4)).cast(DoubleType) /
          col("total_d").cast(DoubleType)).as("cum_share"))
      .orderBy(col("rank"))
  }

  /** q122 — exact per-group quantile profile (p25/p50/p75/p90 of
    * price per return flag) under the NEAREST-RANK definition: the
    * quantile is the value at row ceil(p·n) of the group's total
    * order — a SELECTION, not interpolation, so the result is an
    * actual data value and cross-engine equality is exact by
    * construction (interpolated `percentile`/`quantile_cont` would
    * rest on both engines sharing one float expression tree; rank
    * indices here are pure integer arithmetic: (p·n + 99) div 100).
    *
    * The scalable exact-quantile shape: a per-group VALUE HISTOGRAM
    * first (hash agg, map-side combined — the fact table collapses
    * to distinct (group, value) pairs), then the cumulative count
    * runs over the histogram, not the raw rows. A low-cardinality
    * partitionBy window is the textbook scale hazard (3 groups = 3
    * reducers see everything); compressing to distinct values first
    * bounds each reducer at |distinct prices| rows regardless of SF,
    * which is why this spelling survives 100 TB and the naive
    * row_number-over-rows one does not. Quantile picks are
    * conditional aggs over the monotone cum column (smallest value
    * whose cumulative count reaches the rank) — no second sort, no
    * self-join. */
  private val q122: Q = (s, d) => {
    val hist = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_extendedprice").as("price"))
      .agg(count(lit(1)).as("cnt"))
    // r16 (VERDICT r15 #7): the 3-group partitionBy window made 3
    // reducers each fold |distinct prices| histogram rows; the
    // per-(group, shard) offset form below bounds every reducer at
    // its range shard regardless of group cardinality.
    val cum = groupedCumCounts(hist, "l_returnflag", "price", "cnt")
    def pick(pct: Int) =
      min(when(expr(s"cum >= ($pct * n + 99) div 100"), col("price"))).as(s"p$pct")
    cum.groupBy(col("l_returnflag"))
      .agg(max(col("n")).as("n_items"), pick(25), pick(50), pick(75), pick(90))
      .orderBy(col("l_returnflag"))
  }

  /** Per-GROUP cumulative counts over a value histogram without the
    * low-cardinality partitionBy window (r16, VERDICT r15 #7 — the
    * q113/q115/q146 rangeShards discipline extended to grouped
    * prefixes): range-exchange the histogram on (group, value),
    * collect one (shard, group, subtotal) row per pair — bounded by
    * partitions × |groups|, both cluster/domain-sized — and run each
    * shard's cumulative window LOCALLY, seeded by its group's
    * exclusive prefix offset; the group total `n` rides the same
    * driver table. Range partitioning on (group, value) puts every
    * smaller value of a group in an earlier-or-equal shard, so
    * offset + local prefix IS the group prefix — exact integer
    * arithmetic, boundary placement only moves which shard
    * contributes what (the rangeShards argument verbatim). At 100 TB
    * the reducer bound is |distinct values| / shards instead of
    * |distinct values| per group. */
  private def groupedCumCounts(hist: DataFrame, grp: String,
      value: String, cnt: String): DataFrame = {
    val spark = hist.sparkSession
    val ranged = graft.ops.Dedup.materializedSketch(
      hist.repartitionByRange(col(grp), col(value))
        .withColumn("_pid", spark_partition_id()))
    val shards = ranged.groupBy(col("_pid"), col(grp))
      .agg(sum(col(cnt)).as("_c")).collect()
    val acc = scala.collection.mutable.Map.empty[Any, Long]
    val offRows = new java.util.ArrayList[org.apache.spark.sql.Row](shards.length)
    shards.sortBy(_.getInt(0)).foreach { r =>
      val g = r.get(1)
      offRows.add(org.apache.spark.sql.Row(r.getInt(0), g, acc.getOrElse(g, 0L)))
      acc(g) = acc.getOrElse(g, 0L) + r.getLong(2)
    }
    val totRows = new java.util.ArrayList[org.apache.spark.sql.Row](acc.size)
    acc.foreach { case (g, n) => totRows.add(org.apache.spark.sql.Row(g, n)) }
    val gType = hist.schema(grp).dataType
    val offDf = spark.createDataFrame(offRows, StructType(Seq(
      StructField("_pid", IntegerType, nullable = false),
      StructField(grp, gType, nullable = true),
      StructField("_off", LongType, nullable = false))))
    val totDf = spark.createDataFrame(totRows, StructType(Seq(
      StructField(grp, gType, nullable = true),
      StructField("n", LongType, nullable = false))))
    val w = Window.partitionBy(col("_pid"), col(grp)).orderBy(col(value))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(offDf), Seq("_pid", grp))
      .withColumn("cum", col("_off") + sum(col(cnt)).over(w))
      .join(broadcast(totDf), Seq(grp))
      .drop("_pid", "_off")
  }

  /** q146 — skyline (Pareto front) of the price/quantity trade-off:
    * the lineitems no other lineitem beats on BOTH axes (cheaper-or-
    * equal AND larger-or-equal quantity, strictly better on at least
    * one) — the multi-objective "best offers" operator relational
    * engines lack as a builtin. The naive spelling is a quadratic
    * NOT EXISTS self-join (the DuckDB twin keeps it verbatim as the
    * cross-algorithm check); the scale form here runs entirely on
    * the DISTINCT-VALUE grid (q122's discipline): collapse to
    * distinct (price, qty) pairs, keep the max qty per price, and a
    * point survives iff its qty strictly exceeds the running max qty
    * over all STRICTLY cheaper prices — a RANGE-frame window
    * ([-∞, -1] over exact integer cents) whose input is bounded by
    * |distinct prices|, not row count. Exact integers end to end, so
    * the surviving set is bit-identical by construction. */
  private val q146: Q = (s, d) => {
    val cents = (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
      .cast(DecimalType(18, 0)).cast(LongType)
    val qty = col("l_quantity").cast(DecimalType(18, 0)).cast(LongType)
    val grid = Tables.lineitem(s, d)
      .select(cents.as("price_cents"), qty.as("qty"))
      .groupBy(col("price_cents"), col("qty"))
      .agg(count(lit(1)).as("n_items"))
    // per price keep the max-qty grid point WITH its multiplicity:
    // (qty, n_items) is unique per qty here, so the struct max picks
    // the max-qty pair deterministically
    val perPrice = grid.groupBy(col("price_cents"))
      .agg(max(struct(col("qty"), col("n_items"))).as("m"))
      .select(col("price_cents"), col("m.qty").as("best_qty"),
        col("m.n_items").as("n_items"))
    // running max over strictly cheaper prices, sharded (VERDICT r8
    // #3): per-shard the exclusive range frame runs locally; earlier
    // shards' contribution is the broadcast prefix max, which covers
    // only STRICTLY cheaper prices because range shards are disjoint
    // and each price is unique in perPrice
    val (ranged, shards) = rangeShards(perPrice, Seq(col("price_cents")),
      max(col("best_qty")).as("m"))
    var runMax: Option[Long] = None
    val offs = shards.map { r =>
      val o = (r.getInt(0), runMax)
      runMax = Some(math.max(runMax.getOrElse(Long.MinValue), r.getLong(1)))
      o
    }.toSeq
    import s.implicits._
    val offDf = offs.toDF("_pid", "_moff")
    val w = Window.partitionBy(col("_pid")).orderBy(col("price_cents"))
      .rangeBetween(Window.unboundedPreceding, -1)
    ranged.join(broadcast(offDf), Seq("_pid"))
      .withColumn("cheaper_best",
        greatest(max(col("best_qty")).over(w), col("_moff")))
      .filter(col("cheaper_best").isNull || col("best_qty") > col("cheaper_best"))
      .select(col("price_cents"), col("best_qty"), col("n_items"))
      .orderBy(col("price_cents"))
  }

  /** q139 — robust outliers via median absolute deviation, q109's
    * heavy-tail-safe sibling (3-sigma is itself dragged by the
    * outliers it hunts; median/MAD are breakdown-point-0.5 robust).
    * Everything is exact integer cents under the NEAREST-RANK
    * median (q122's selection definition — an actual data value, so
    * cross-engine equality is exact; no interpolation, no doubles).
    *
    * The scale trick: ONE fact scan total. The per-group value
    * histogram (hash agg, map-combined) is the only pass over
    * lineitem; the deviation histogram is then derived FROM the value
    * histogram (|x - med| re-keys distinct values, weights ride
    * along), and the outlier count (|x - med| > 3·MAD) is a
    * conditional sum over that same histogram. Both median picks run
    * the q122 cum-over-distinct-values window — reducer input is
    * bounded by |distinct prices| per group regardless of SF — and
    * the two stats frames join back BROADCAST. */
  private val q139: Q = (s, d) => {
    val cents = (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
      .cast(DecimalType(18, 0)).cast(LongType)
    val hist = graft.ops.Dedup.materializedSketch(
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), cents.as("cents"))
        .agg(count(lit(1)).as("cnt")))
    // r16 A/B (VERDICT r15 #7): the sharded grouped-prefix form
    // ([[groupedCumCounts]], kept for q122) was measured HERE at
    // sf0.1/local[32]: warm 3.02 s -> 5.40 s — q139 runs the pick
    // TWICE (value histogram, then deviation histogram), and two
    // extra range-sample + persist + collect passes cost more than
    // the 3-reducer window saves on these |distinct cents| histograms.
    // Kept the window form; at a scale where the per-flag histogram
    // no longer fits a reducer, q122's groupedCumCounts is the
    // drop-in (one-line swap, recorded here per the VERDICT's
    // "A/B recorded either way").
    val grp = Window.partitionBy(col("l_returnflag"))
    def nearestRankMedian(h: DataFrame, valueCol: String, out: String): DataFrame =
      h.withColumn("cum", sum(col("cnt")).over(grp.orderBy(col(valueCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", max(col("cum")).over(grp))
        .groupBy(col("l_returnflag"))
        .agg(max(col("n")).as("n_items"),
          min(when(expr("cum >= (50 * n + 99) div 100"), col(valueCol))).as(out))
    val med = nearestRankMedian(hist, "cents", "median_cents")
      .select(col("l_returnflag"), col("n_items"), col("median_cents"))
    val devHist = hist.join(broadcast(med), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"), abs(col("cents") - col("median_cents")).as("dev"))
      .agg(sum(col("cnt")).as("cnt"))
    val mad = nearestRankMedian(devHist, "dev", "mad_cents")
      .select(col("l_returnflag"), col("mad_cents"))
    hist.join(broadcast(med), Seq("l_returnflag"))
      .join(broadcast(mad), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(max(col("n_items")).as("n_items"),
        max(col("median_cents")).as("median_cents"),
        max(col("mad_cents")).as("mad_cents"),
        sum(when(abs(col("cents") - col("median_cents")) > col("mad_cents") * 3,
          col("cnt")).otherwise(0L)).as("n_outliers"))
      .select(col("l_returnflag"), col("n_items"), col("median_cents"),
        col("mad_cents"), col("n_outliers"),
        expr("1000000 * n_outliers div n_items").as("outlier_ppm"))
      .orderBy(col("l_returnflag"))
  }

  /** Exact GLOBAL row_number over `orderCols` without a global window:
    * the distributed-ranking shape every "assign each row its ntile /
    * percentile / rank" task needs at scale, where
    * `row_number().over(Window.orderBy(...))` is a single-partition
    * WindowExec (the q115 trap) and the distinct-value-histogram trick
    * fails on near-unique keys (the histogram IS the table).
    *
    * Two-phase prefix counting: (1) range-repartition on the order
    * columns — a distributed sort's exchange, no single reducer; (2)
    * count rows per range partition, take the P-row count table to the
    * driver, and broadcast the exclusive prefix offsets back; (3) each
    * partition ranks LOCALLY (the window partitions on the range
    * partition id, so it is partition-local by construction) and adds
    * its offset. The range boundaries come from sampling and vary run
    * to run, but the emitted rank is a pure function of the total
    * order — boundary placement only moves where the offset lands.
    * `orderCols` must be a total order (include a unique tiebreaker)
    * or ranks within ties are partition-dependent. */
  /** Range-shard `df` on a total order and collect one summary row per
    * shard — the P-row driver-side table every two-phase prefix pass
    * consumes ([[globalRank]]'s discipline, generalized so running
    * SUM / running MAX carries can seed per-shard windows; P is the
    * shuffle-partition count, so the collect is bounded by cluster
    * width, never by data). Returns the materialized ranged frame
    * (tagged `_pid`) and the per-shard agg rows sorted by _pid.
    * Closed the last `WindowExec: No Partition Defined` shapes
    * (VERDICT r8 #3): q113's cumulative revenue, q115's cumulative
    * count, q146's running max now each run a PARTITIONED window over
    * their shard plus a broadcast offset join, with values unchanged
    * (prefix arithmetic is exact; boundary placement only moves which
    * shard contributes what to the offsets). */
  private[graft] def rangeShards(df: DataFrame, sortExprs: Seq[Column],
      aggs: Column*): (DataFrame, Array[org.apache.spark.sql.Row]) = {
    val ranged = graft.ops.Dedup.materializedSketch(
      df.repartitionByRange(sortExprs: _*).withColumn("_pid", spark_partition_id()))
    val shards = ranged.groupBy(col("_pid")).agg(aggs.head, aggs.tail: _*)
      .collect().sortBy(_.getInt(0))
    (ranged, shards)
  }

  /** Exclusive-prefix offsets over [[rangeShards]]' per-shard summary:
    * aggregated column i of each shard row (positions 1..n, shard
    * order) is summed over all PRECEDING shards, producing the
    * broadcastable `(_pid, names…)` frame every two-phase prefix pass
    * joins back, plus the grand totals (sum over ALL shards, one per
    * name — the exact driver-side row/weight total several queries
    * reuse). Long columns accumulate in Long, Decimal columns in exact
    * BigDecimal; `zeros` fixes both the start value and the emitted
    * column type, so an empty shard table still yields a well-typed
    * frame. The invariants every former copy of this loop repeated —
    * shards sorted by `_pid`, offset i excluding shard i, getter
    * position matching the agg position — live here once. */
  private[graft] def exclusiveOffsets(spark: SparkSession,
      shards: Array[org.apache.spark.sql.Row], names: Seq[String],
      zeros: Seq[Any]): (DataFrame, Seq[Any]) = {
    require(names.nonEmpty && names.length == zeros.length,
      "one zero per offset column")
    val acc: Array[Any] = zeros.toArray
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row](shards.length)
    shards.foreach { r =>
      rows.add(org.apache.spark.sql.Row.fromSeq(r.getInt(0) +: acc.toSeq))
      var i = 0
      while (i < acc.length) {
        acc(i) = (acc(i), r.get(i + 1)) match {
          case (a: java.lang.Long, v: java.lang.Long) =>
            java.lang.Long.valueOf(a + v)
          case (a: java.math.BigDecimal, v: java.math.BigDecimal) => a.add(v)
          case (a, v) => throw new IllegalArgumentException(
            s"unsupported offset accumulation: ${a.getClass} + ${v.getClass}")
        }
        i += 1
      }
    }
    val fields = StructField("_pid", IntegerType, nullable = false) +:
      names.zip(zeros).map { case (n, z) =>
        StructField(n, z match {
          case _: java.lang.Long        => LongType
          case _: java.math.BigDecimal  => DecimalType(38, 18)
          case other => throw new IllegalArgumentException(
            s"unsupported offset type: ${other.getClass}")
        }, nullable = false)
      }
    (spark.createDataFrame(rows, StructType(fields)), acc.toSeq)
  }

  def globalRank(df: DataFrame, orderCols: Seq[String], rankName: String): DataFrame = {
    val (ranged, shards) = rangeShards(df, orderCols.map(col), count(lit(1)).as("c"))
    val (offDf, _) = exclusiveOffsets(df.sparkSession, shards, Seq("_off"), Seq(0L))
    val w = Window.partitionBy(col("_pid")).orderBy(orderCols.map(col): _*)
    ranged.join(broadcast(offDf), Seq("_pid"))
      .withColumn(rankName, col("_off") + row_number().over(w))
      .drop("_pid", "_off")
  }

  /** Per-KEY two-phase rank — [[globalRank]] generalized to rankings
    * WITHIN a partition key, without ever building a per-key single
    * reducer (the `Window.partitionBy(key)` spelling funnels each
    * key's entire population through one task — exactly the hazard
    * this file's discipline exists to retire, just keyed). Range-
    * partition on (key, order…) so every key occupies a contiguous
    * shard run; collect the per-(shard, key) counts — bounded by
    * shards + keys, because contiguity means at most one key straddles
    * each shard boundary — fold exclusive per-key prefixes driver-side,
    * and seed per-(shard, key) row_numbers with the broadcast offsets.
    * Order columns may carry desc()/asc() — they feed both the range
    * partitioner and the within-shard window verbatim. */
  def keyedRank(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                rankName: String): DataFrame = {
    val spark = df.sparkSession
    val ranged = graft.ops.Dedup.materializedSketch(
      df.repartitionByRange((col(keyCol) +: orderCols): _*)
        .withColumn("_pid", spark_partition_id()))
    val counts = ranged.groupBy(col("_pid"), col(keyCol))
      .agg(count(lit(1)).as("_c")).collect()
    val offRows = new java.util.ArrayList[org.apache.spark.sql.Row](counts.length)
    counts.groupBy(_.get(1)).foreach { case (_, rs) =>
      var acc = 0L
      rs.sortBy(_.getInt(0)).foreach { r =>
        offRows.add(org.apache.spark.sql.Row(r.getInt(0), r.get(1), acc))
        acc += r.getLong(2)
      }
    }
    val schema = StructType(Seq(StructField("_pid", IntegerType, nullable = false),
      df.schema(keyCol), StructField("_off", LongType, nullable = false)))
    val offDf = spark.createDataFrame(offRows, schema)
    val w = Window.partitionBy(col("_pid"), col(keyCol)).orderBy(orderCols: _*)
    ranged.join(broadcast(offDf), Seq("_pid", keyCol))
      .withColumn(rankName, col("_off") + row_number().over(w))
      .drop("_pid", "_off")
  }

  /** Closed-form ntile(k) from a global rank (same arithmetic as
    * q122/q115's nearest-rank family): first n mod k buckets take
    * n div k + 1 rows. n and k are driver-side constants, so the
    * expression is pure literals + one div. */
  def ntileOfRank(rank: Column, n: Long, k: Int): Column = {
    val r = n % k
    val big = n / k + 1
    val small = n / k
    // exact integer division: strip the remainder first so the double
    // division is of an exact multiple (Column./ is FP division, and a
    // raw long/long quotient could round across the floor boundary)
    def idiv(a: Column, b: Long): Column =
      ((a - pmod(a, lit(b))) / lit(b)).cast(LongType)
    (when(lit(r) > 0 && rank <= lit(r * big), idiv(rank - 1, big))
      .otherwise(lit(r) + idiv(rank - 1 - lit(r * big), small)) + 1)
      .cast(IntegerType)
  }

  /** q128 — RFM segmentation (recency / frequency / monetary), the
    * classic customer-value cube: per customer, ntile(5) quintiles of
    * last-order date, order count, and exact lifetime spend, rolled
    * up to (r, f, m) segment counts with exact average spend. Each
    * quintile assignment runs through [[globalRank]] + closed-form
    * [[ntileOfRank]] — three distributed rankings, zero
    * single-partition windows — while the DuckDB twin spells the same
    * thing as three literal `ntile(5)` windows over the same total
    * orders (custkey tiebreak), pinning the whole two-phase machinery
    * under the hash oracle. */
  private val q128: Q = (s, d) => {
    // materialized (two-consumer rule): the count below and the first
    // ranking both consume it, and each quintile pass re-reads its
    // predecessor from the ranking's own cache
    val cust = graft.ops.Dedup.materializedSketch(Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(max(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("last_day"),
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(D6)).cast(DecimalType(18, 2)).as("spend_d")))
    val n = cust.count()
    // r16 (guide §2.6): the three quintile rankings are INDEPENDENT
    // functions of the same cached frame — the r15 chain ran their
    // rangeShards persist/collect barriers serially (3 sequential
    // job pairs). Each ranking now builds on a 3-thread driver pool
    // (the q31g pattern) and emits a skinny (o_custkey, quintile)
    // map; the roll-up joins the maps back on the unique customer
    // key. Ranks are functions of (order cols, custkey) only, so the
    // labels — and the (r,f,m) cube — are bit-identical to the
    // chained spelling (oracle re-checked).
    def quintileLabels(orderC: Seq[String], rank: String, q: String) =
      globalRank(cust, orderC, rank)
        .withColumn(q, ntileOfRank(col(rank), n, 5))
        .select(col("o_custkey"), col(q))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    val (rq, fq, mq) =
      try {
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutorService(pool)
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration.Inf
        val rf = Future(quintileLabels(Seq("last_day", "o_custkey"), "_rr", "r_q"))
        val ff = Future(quintileLabels(Seq("n_orders", "o_custkey"), "_rf", "f_q"))
        val mf = Future(quintileLabels(Seq("spend_d", "o_custkey"), "_rm", "m_q"))
        (Await.result(rf, Inf), Await.result(ff, Inf), Await.result(mf, Inf))
      } finally pool.shutdown()
    val scored = cust.select(col("o_custkey"), col("spend_d"))
      .join(rq, Seq("o_custkey")).join(fq, Seq("o_custkey"))
      .join(mq, Seq("o_custkey"))
    scored.groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_customers"),
        (sum(col("spend_d")).cast(DecimalType(18, 2)).cast(DoubleType) /
          count(lit(1))).as("avg_spend"))
      .orderBy(col("r_q"), col("f_q"), col("m_q"))
  }

  /** q129 — market-basket association rules over order contents:
    * support / confidence / lift for part pairs that co-occur in at
    * least two orders, the classic co-purchase analysis. All three
    * metrics are integer micro-ratios — lift is computed as the
    * two-step `((n_ab·10⁶ div n_a) · N) div n_b` so every
    * intermediate stays under ~10¹⁴ even at SF100 (a single-division
    * spelling would overflow int64 in the n_ab·N·10⁶ numerator;
    * both engines evaluate the identical two-step tree, so the
    * defined metric is still bit-exact).
    *
    * Scale shape: the pair space never materializes globally — the
    * self-join is ORDER-LOCAL (items of one order pair only with each
    * other; baskets are bounded by order size, so fan-out is
    * Σ C(|basket|,2)), then a hash agg onto the pair key with
    * map-side combine. Item counts join back adaptively (parts-sized
    * dim), and the top-20-by-lift is a TakeOrderedAndProject, not a
    * global sort. */
  private val q129: Q = (s, d) => {
    val items = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nOrders = items.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val itemCnt = items.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_item"))
    // the support-2 pair table is shared with q171's triangle census
    // through the content-keyed scratch store (the trade-edge
    // discipline, VERDICT r8 #2) — the order-local self-join + count
    // that dominates this query is paid once per (JVM, corpus)
    val pairs = graft.ops.Graphs.coOrderPairs(s, d)
    pairs
      .join(itemCnt.select(col("l_partkey").as("part_a"), col("n_item").as("n_a")),
        Seq("part_a"))
      .join(itemCnt.select(col("l_partkey").as("part_b"), col("n_item").as("n_b")),
        Seq("part_b"))
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("n_ab"), col("n_a"), col("n_b"),
        expr("n_ab * 1000000L div n_orders").as("support_ppm"),
        expr("n_ab * 1000000L div n_a").as("confidence_ppm"),
        expr("((n_ab * 1000000L div n_a) * n_orders) div n_b").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("part_a"), col("part_b"))
      .limit(20)
  }

  /** q130 — quantile-sketch audit (the q31b/q34c "record quality as
    * data" pattern, for percentiles): per return flag and percentile,
    * the error of `approx_percentile` (Spark's GK-style
    * QuantileSummaries at accuracy 1000) against the in-engine exact
    * `percentile`. Rows-only by design: the sketch's merge order
    * depends on partitioning, so there is no cross-engine twin — the
    * point is that a corpus or accuracy change that degrades sketch
    * error shows up as a changed NUMBER in the correctness artifact
    * every round. The exact side here is the audit's baseline only;
    * the production-scale exact path is q122's distinct-value
    * histogram (built-in `percentile` buffers each group in memory). */
  private val q130: Q = (s, d) => {
    val ps = Seq(25, 50, 75, 90)
    val pArr = array(ps.map(p => lit(p / 100.0)): _*)
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(percentile(col("l_extendedprice"), pArr).as("exact_v"),
        approx_percentile(col("l_extendedprice"), pArr, lit(1000)).as("approx_v"))
      .select(col("l_returnflag"),
        explode(arrays_zip(
          array(ps.map(p => lit(p)): _*).as("pct"),
          col("exact_v").as("exact"), col("approx_v").as("approx"))).as("z"))
      .select(col("l_returnflag"), col("z.pct").as("pct"),
        col("z.exact").as("exact_price"), col("z.approx").as("approx_price"))
      .withColumn("rel_err_ppm",
        expr("CAST(abs(approx_price - exact_price) / exact_price * 1000000 AS BIGINT)"))
      .orderBy(col("l_returnflag"), col("pct"))
  }

  /** q131 — per-dimension embedding column profile: the vector-quality
    * audit an ANN/semantic pipeline runs before trusting a corpus of
    * embeddings (dead dimensions, unnormalized scales, constant or
    * zero-heavy axes all poison cosine metrics silently). Per
    * dimension: count, zero count, min/max/mean, and population
    * variance — every statistic EXACT in integer micro-units
    * (`floor(v * 10⁶)`: floor, not rounding, because a dyadic float
    * can land exactly on a decimal rounding tie and HALF_UP/HALF_EVEN
    * then differ across engines; floor has no ties). Variance runs
    * through DECIMAL(38,0) cross terms — n·Σx² and (Σx)² reach ~10²⁷
    * at SF100, far past int64 — with one integer division at the end
    * whose quotient is bounded by the value range (≤ 4·10¹², so the
    * long-typed `div` result cannot wrap; ProbeDecimalDiv pins that
    * both engines truncate toward zero).
    *
    * Scale shape: posexplode fans each vector into |dim| skinny rows
    * that partial-aggregate map-side onto |dim| groups before the
    * exchange — the shuffle carries (dim, moments), never vectors. */
  private val q131: Q = (s, d) => {
    Tables.embeddings(s, d)
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("dim"),
        expr("CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)").as("v_u"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n_vals"),
        sum(when(col("v_u") === 0, 1L).otherwise(0L)).as("n_zero"),
        min(col("v_u")).as("min_u"), max(col("v_u")).as("max_u"),
        sum(col("v_u")).as("s_u"),
        sum(expr("CAST(v_u AS DECIMAL(38,0)) * v_u")).as("sq_d"))
      .select(col("dim"), col("n_vals"), col("n_zero"), col("min_u"), col("max_u"),
        expr("s_u div n_vals").as("mean_u"),
        expr("CAST((CAST(n_vals AS DECIMAL(38,0)) * sq_d - " +
          "CAST(s_u AS DECIMAL(38,0)) * s_u) div " +
          "(CAST(n_vals AS DECIMAL(38,0)) * n_vals) AS BIGINT)").as("var_u2"))
      .orderBy(col("dim"))
  }

  /** q132 — per-vector norm audit, q131's row-wise sibling: the L2
    * norm² of every embedding in exact integer micro²-units (same
    * tie-free floor quantization), rolled into an equi-width norm²
    * histogram. A cosine-similarity pipeline assumes unit-ish norms;
    * this shows the actual norm distribution — zero vectors, an
    * un-normalized source, or a scale drift land in distant buckets
    * instead of silently skewing every similarity score. Entirely
    * map-side until the |buckets|-sized rollup: the norm² is one
    * in-row fold (64 dims — the per-row HOF cost the q62 probe showed
    * is only a loss when it REPLACES a codegen'd aggregation; here
    * there is nothing cross-row to aggregate), carried in
    * DECIMAL(38,0) so SF never overflows it. */
  private val q132: Q = (s, d) => {
    val vU = "CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)"
    Tables.embeddings(s, d)
      .select(expr(s"aggregate(embedding, CAST(0 AS DECIMAL(38,0)), " +
        s"(acc, v) -> acc + CAST($vU AS DECIMAL(38,0)) * $vU)").as("n2_d"))
      .groupBy(expr("CAST(n2_d div 100000000000 AS BIGINT)").as("norm_bucket"))
      .agg(count(lit(1)).as("n_vectors"),
        expr("CAST(min(n2_d) AS BIGINT)").as("min_n2_u"),
        expr("CAST(max(n2_d) AS BIGINT)").as("max_n2_u"))
      .orderBy(col("norm_bucket"))
  }

  /** q151 — supplier diversity per part profile under a NOT IN
    * exclusion, the TPC-H Q16 shape (reference surface has no
    * partsupp table, so the part-supplier pairs derive from lineitem):
    * for each surviving (brand, type, size) profile, how many DISTINCT
    * suppliers ship it, excluding "distressed" suppliers (negative
    * account balance) via NOT IN — the one decorrelation family
    * (q87/q88/q105/q135 pin EXISTS/IN/scalar forms) the catalog
    * lacked (VERDICT r8 #7).
    *
    * The DuckDB twin keeps the literal NOT IN subquery; the Spark side
    * decorrelates to a broadcast LEFT ANTI join, which is equivalent
    * here because s_suppkey is non-null by schema (a NULL in a NOT IN
    * subquery would empty the result — the classic trap — so the
    * equivalence is stated, not assumed silently). Scale shape:
    * the anti join broadcasts the tiny exclusion set, the part
    * profile broadcasts as a dim carrying its group columns, and the
    * distinct count runs as the standard two-phase partial aggregate
    * on (profile, suppkey); one fact-table exchange total. */
  private val q151: Q = (s, d) => {
    val excluded = Tables.supplier(s, d).filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    val parts = Tables.part(s, d)
      .filter(col("p_brand") =!= "Brand#4" &&
        !col("p_type").startsWith("PROMO") &&
        col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** q153 — chi-square independence audit between customer market
    * segment and order priority, the categorical-association test a
    * data-quality / drift pipeline runs over label columns (q141's
    * drift sibling, but BETWEEN two columns instead of across time).
    * Every cell carries its observed count, expected count, and
    * chi-square contribution in EXACT integer micro-units: expected =
    * R·C·10⁶ div n and contribution = ((n·O − R·C)² div (R·C))·10⁶
    * div n, all in DECIMAL(38,0) (cross terms reach ~5·10³² at SF100
    * — past int64, inside 38 digits; dividing by R·C BEFORE the 10⁶
    * rescale keeps the worst intermediate under the cap, and the
    * truncation order is part of the DEFINED statistic, replayed
    * identically by the HUGEINT twin). Consumers sum contrib_micro
    * for the statistic; dof is (|segments|−1)(|priorities|−1) by
    * inspection of the row count.
    *
    * Scale shape: one fact exchange into the |segments|x|priorities|
    * cell grid (map-side combined); every margin (R, C, n) derives
    * from the CELLS, not the fact table, and joins back broadcast. */
  private val q153: Q = (s, d) => {
    val cells = graft.ops.Dedup.materializedSketch(Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("observed")))
    val segTot = cells.groupBy(col("c_mktsegment")).agg(sum(col("observed")).as("r_tot"))
    val priTot = cells.groupBy(col("o_orderpriority")).agg(sum(col("observed")).as("c_tot"))
    val nTot = cells.agg(sum(col("observed")).as("n_tot"))
    cells.join(broadcast(segTot), Seq("c_mktsegment"))
      .join(broadcast(priTot), Seq("o_orderpriority"))
      .crossJoin(broadcast(nTot))
      .select(col("c_mktsegment"), col("o_orderpriority"), col("observed"),
        expr("CAST(CAST(r_tot AS DECIMAL(38,0)) * c_tot * 1000000 div n_tot" +
          " AS BIGINT)").as("expected_micro"),
        expr("CAST(((CAST(n_tot AS DECIMAL(38,0)) * observed" +
          " - CAST(r_tot AS DECIMAL(38,0)) * c_tot)" +
          " * (CAST(n_tot AS DECIMAL(38,0)) * observed" +
          " - CAST(r_tot AS DECIMAL(38,0)) * c_tot)" +
          " div (CAST(r_tot AS DECIMAL(38,0)) * c_tot)) * 1000000 div n_tot" +
          " AS BIGINT)").as("contrib_micro"))
      .orderBy(col("c_mktsegment"), col("o_orderpriority"))
  }

  /** q158 — QUANTITY-weighted price quantiles per return flag: the
    * weighted nearest-rank selection (value at the smallest cumulative
    * WEIGHT reaching ceil(p·W)), i.e. "the price below which p% of
    * shipped units move" — a different statistic from q122's
    * row-counted quantiles, and the weighted-selection operator
    * engines usually approximate. Same scalable spelling: collapse to
    * the per-group (price → total weight) histogram first (one
    * map-combined fact exchange), run the cumulative weight over
    * DISTINCT prices (reducer bounded by the price domain per flag),
    * pick with conditional mins over the monotone cum column. Weights
    * are exact integer units (quantities are whole in this corpus;
    * the cast defines the contract). */
  private val q158: Q = (s, d) => {
    val grp = Window.partitionBy(col("l_returnflag"))
    val hist = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_extendedprice").as("price"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 0)).cast(LongType)).as("w"))
    val cum = hist
      .withColumn("cum", sum(col("w")).over(grp.orderBy(col("price"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tw", max(col("cum")).over(grp))
    def pick(pct: Int) =
      min(when(expr(s"cum >= ($pct * tw + 99) div 100"), col("price"))).as(s"wp$pct")
    cum.groupBy(col("l_returnflag"))
      .agg(max(col("tw")).as("total_units"), pick(25), pick(50), pick(75))
      .orderBy(col("l_returnflag"))
  }

  /** q166 — fulfilment-latency profile per order priority: the
    * distribution of order-to-ship days (each lineitem's ship date
    * minus its order's date), as nearest-rank p50/p90 (q122's
    * selection discipline — actual data values, no interpolation),
    * max, and the exact mean in integer micro-days. q135 counts LATE
    * shipments; this profiles the whole latency curve — the SLA view
    * a fulfilment dashboard actually plots.
    *
    * Scale shape: ONE fact-fact exchange (lineitem joins orders on
    * the order key; the orders side carries only key+date+priority),
    * collapsed immediately to the (priority × latency-days) histogram
    * — day differences are calendar-bounded (~120 distinct values),
    * so the quantile windows are bounded by the value domain per
    * priority, and the mean is an integer division of exact sums. */
  private val q166: Q = (s, d) => {
    val days = datediff(col("l_shipdate").cast(DateType),
      col("o_orderdate").cast(DateType))
    val hist = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority")), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"), days.cast(LongType).as("lat_days"))
      .agg(count(lit(1)).as("cnt"))
    val grp = Window.partitionBy(col("o_orderpriority"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(grp.orderBy(col("lat_days"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", max(col("cum")).over(grp))
      .withColumn("s", sum(col("lat_days") * col("cnt")).over(grp))
    def pick(pct: Int) =
      min(when(expr(s"cum >= ($pct * n + 99) div 100"), col("lat_days"))).as(s"p${pct}_days")
    cum.groupBy(col("o_orderpriority"))
      .agg(max(col("n")).as("n_items"), pick(50), pick(90),
        max(col("lat_days")).as("max_days"),
        // Widen to DECIMAL(38,0) before the ×1e6: at extreme SFs the
        // Int64 product s*1e6 can exceed Long.MaxValue (the DuckDB twin
        // computes in HUGEINT); `div` on decimals still returns BIGINT.
        expr("cast(max(s) as decimal(38,0)) * 1000000 div max(n)")
          .as("mean_micro_days"))
      .orderBy(col("o_orderpriority"))
  }

  /** q182 — quarter-over-quarter RANK MOVERS: rank every supplier by
    * revenue within each ship quarter, join consecutive quarters per
    * supplier, and report the twenty biggest rank IMPROVEMENTS — the
    * "biggest movers" leaderboard, whose defining operation is a
    * ranking PER PERIOD, the shape `Window.partitionBy(period)` would
    * funnel through one reducer per quarter (each holding the whole
    * supplier population). It runs through [[keyedRank]] instead —
    * the two-phase sharded ranking, keyed. Revenue is summed from
    * exact per-row micro-units (the ≤4-decimal product is integral at
    * micro scale, so the BIGINT cast is exact on both engines); ranks
    * break ties by suppkey, so the whole leaderboard is
    * deterministic. The DuckDB twin spells the literal per-quarter
    * row_number window over the same totals. */
  private val q182: Q = (s, d) => {
    val revMicro = ((col("l_extendedprice").cast(D6) *
      (lit(1) - col("l_discount").cast(D6))).cast(D6) * lit(1000000L))
      .cast(LongType)
    val qrev = Tables.lineitem(s, d)
      .select(date_trunc("quarter", col("l_shipdate")).cast(DateType).as("qtr"),
        col("l_suppkey"), revMicro.as("rev_micro"))
      .groupBy(col("qtr"), col("l_suppkey"))
      .agg(sum(col("rev_micro")).as("rev_micro"))
    val ranked = keyedRank(qrev, "qtr",
      Seq(col("rev_micro").desc, col("l_suppkey")), "rnk")
    val prev = ranked.select(col("qtr"), col("l_suppkey"),
      col("rnk").as("rank_prev"))
    val curr = ranked.select(add_months(col("qtr"), -3).as("qtr"),
      col("l_suppkey"), col("rnk").as("rank_curr"))
    prev.join(curr, Seq("qtr", "l_suppkey"))
      .select(date_format(add_months(col("qtr"), 3), "yyyy-MM-dd").as("qtr"),
        col("l_suppkey"), col("rank_prev"), col("rank_curr"),
        (col("rank_prev") - col("rank_curr")).as("delta"))
      .orderBy(col("delta").desc, col("qtr"), col("l_suppkey"))
      .limit(20)
  }

  /** q187 — exact KENDALL tau-b rank correlation between quantity and
    * discount: the nonparametric complement of q108's Pearson OLS —
    * monotone association counted over PAIRS, immune to the outliers
    * q109/q139 hunt. Naively O(n²) pair comparisons; here both
    * variables are value-domain-bounded, so the entire pair space
    * collapses onto the JOINT HISTOGRAM (this file's
    * distinct-value-histogram discipline): concordant/discordant
    * counts are one cross join of the ~|Q|·|D|-cell frame with itself
    * (each unordered pair counted once via q2 > q1; within-cell and
    * equal-q pairs land in the tie terms), and the tie corrections
    * are marginal C(n,2) sums. All counts are exact BIGINTs; tau-b
    * itself is the one double — a fixed operand tree over exact
    * integers (convert, multiply, sqrt, divide — every op correctly
    * rounded per IEEE-754, sqrt included), so both engines land the
    * same bits, the q108 discipline. */
  private val q187: Q = (s, d) => {
    val hist = Tables.lineitem(s, d)
      .select(col("l_quantity").cast(IntegerType).as("q"),
        (col("l_discount").cast(DecimalType(18, 2)) * 100)
          .cast(IntegerType).as("dc"))
      .groupBy(col("q"), col("dc")).agg(count(lit(1)).as("cnt"))
    val a = hist.select(col("q").as("q1"), col("dc").as("d1"), col("cnt").as("n1"))
    val b = hist.select(col("q").as("q2"), col("dc").as("d2"), col("cnt").as("n2"))
    val pairs = a.join(b, col("q2") > col("q1"))
      .agg(sum(when(col("d2") > col("d1"), col("n1") * col("n2"))
        .otherwise(0L)).as("conc"),
        sum(when(col("d2") < col("d1"), col("n1") * col("n2"))
          .otherwise(0L)).as("disc"))
    val margins = hist.agg(sum(col("cnt")).as("n"))
    // the marginal tie products widen to DECIMAL(38,0) BEFORE the sum
    // (a single q or dc group past ~3e9 rows would wrap nq*(nq-1) in
    // plain BIGINT); the `div 2` results land back in BIGINT, exactly
    // like the n*(n-1) denominator below
    val tq = hist.groupBy(col("q")).agg(sum(col("cnt")).as("nq"))
      .agg(sum(col("nq").cast(DecimalType(38, 0)) * (col("nq") - 1))
        .as("tie_q2"))
    val td = hist.groupBy(col("dc")).agg(sum(col("cnt")).as("nd"))
      .agg(sum(col("nd").cast(DecimalType(38, 0)) * (col("nd") - 1))
        .as("tie_d2"))
    pairs.crossJoin(broadcast(margins)).crossJoin(broadcast(tq))
      .crossJoin(broadcast(td))
      .select(col("n"), col("conc"), col("disc"),
        expr("CAST(tie_q2 div 2 AS BIGINT)").as("ties_q"),
        expr("CAST(tie_d2 div 2 AS BIGINT)").as("ties_d"),
        // n0 = C(n,2); tau_b = (C - D) / sqrt((n0-n1)(n0-n2)) — the
        // fixed double operand tree (conversions and sqrt are
        // correctly rounded, so this is bit-identical cross-engine).
        // n*(n-1) and the tie products widen to DECIMAL(38,0) first:
        // plain BIGINT would wrap silently (ANSI off) once lineitem
        // passes ~3e9 rows (~SF500); the widened intermediates hold
        // to 10^19 rows, and the `div 2` results land back in BIGINT
        // well inside range (n0 ≤ Long.Max for n ≤ 4.3e9 — by which
        // point the double conversion dominates anyway)
        (((col("conc") - col("disc")).cast(DoubleType)) /
          sqrt((expr("CAST(CAST(n AS DECIMAL(38,0)) * (n - 1) div 2" +
            " - CAST(tie_q2 AS DECIMAL(38,0)) div 2 AS DOUBLE)")) *
            (expr("CAST(CAST(n AS DECIMAL(38,0)) * (n - 1) div 2" +
              " - CAST(tie_d2 AS DECIMAL(38,0)) div 2 AS DOUBLE)"))))
          .as("tau_b"))
  }

  /** q197 — exact MANN-WHITNEY U: does the quantity distribution of
    * RETURNED lineitems differ from kept ones? The rank-sum test is
    * O(n log n) as taught, but — the q187 discipline — the whole pair
    * space collapses onto the ~50-cell quantity value histogram split
    * by group: U's win count is one cell-pair join over the histogram
    * (wins where the returned cell's value is larger), and ties
    * contribute half a win each, kept exact by working in DOUBLED
    * units (u2 = 2·wins + ties — no 0.5 anywhere). All sums widen to
    * DECIMAL(38,0) before the products (cell counts are ~n/50, the
    * cross products ~n²/2500 — BIGINT would wrap past ~SF10⁴; the
    * final u2 lands back in BIGINT, valid to n ≈ 3e9 like q187). The
    * normalized statistic u2 / (2·n_r·n_o) is emitted in exact micro
    * by integer division — the common-language effect size (P(ret >
    * kept) + ½P(tie)), deterministic on both engines. */
  private val q197: Q = (s, d) => {
    val hist = Tables.lineitem(s, d)
      .select(col("l_quantity").cast(IntegerType).as("q"),
        when(col("l_returnflag") === "R", 1).otherwise(0).as("grp"))
      .groupBy(col("q"))
      .agg(sum(when(col("grp") === 1, 1L).otherwise(0L)).as("nr"),
        sum(when(col("grp") === 0, 1L).otherwise(0L)).as("no"))
    val a = hist.select(col("q").as("qa"), col("nr").as("nr_a"))
    val b = hist.select(col("q").as("qb"), col("no").as("no_b"))
    val wins = a.join(b, col("qa") > col("qb"))
      .agg(coalesce(sum(col("nr_a").cast(DecimalType(38, 0)) * col("no_b")), lit(0).cast(DecimalType(38, 0)))
        .as("w"))
    val ties = hist
      .agg(coalesce(sum(col("nr").cast(DecimalType(38, 0)) * col("no")), lit(0).cast(DecimalType(38, 0)))
        .as("t"),
        sum(col("nr")).as("n_r"), sum(col("no")).as("n_o"))
    wins.crossJoin(broadcast(ties))
      .select(col("n_r"), col("n_o"),
        (col("w") * 2 + col("t")).cast(LongType).as("u2"),
        expr("CAST(CAST((w * 2 + t) AS DECIMAL(38,0)) * 1000000" +
          " div (2 * n_r * n_o) AS BIGINT)").as("mw_micro"))
  }

  /** q189 — supplier-concentration HHI per nation: each nation's
    * Herfindahl–Hirschman index over its suppliers' revenue shares —
    * the antitrust-style concentration read next to q113's Pareto cut
    * (top-k mass) and q150's Gini (inequality): HHI is the metric
    * that moves when a market consolidates even if the top-k set does
    * not. Exact integers end to end: per-row revenue micro-units (the
    * q182 cast chain), shares in ppm by BIGINT `div`, HHI =
    * Σ share_ppm² div 10⁶ — deterministic on both engines, no float
    * shares. Plans: one broadcast of the supplier dim onto the fact
    * scan, a (nation, supplier)-keyed agg, and a nation-domain
    * rollup; nation totals ride a broadcast join of the 25-row total
    * frame, never a window. */
  private val q189: Q = (s, d) => {
    val revMicro = ((col("l_extendedprice").cast(D6) *
      (lit(1) - col("l_discount").cast(D6))).cast(D6) * lit(1000000L))
      .cast(LongType)
    // sum exactly in micro, then rescale the TOTAL to cents — rev in
    // micro × 10⁶ would pass 2⁶³ for a large supplier (caught by the
    // DuckDB twin's checked arithmetic; Spark with ANSI off would
    // have wrapped silently — the twin is the overflow canary here)
    val srev = Tables.lineitem(s, d)
      .join(broadcast(Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey"), col("l_suppkey"), revMicro.as("rev_micro"))
      .groupBy(col("s_nationkey"), col("l_suppkey"))
      .agg(expr("sum(rev_micro) div 10000").as("rev"))
    val totals = srev.groupBy(col("s_nationkey")).agg(sum(col("rev")).as("tot"))
    srev.join(broadcast(totals), Seq("s_nationkey"))
      .select(col("s_nationkey"),
        expr("rev * 1000000L div tot").as("share_ppm"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        max(col("share_ppm")).as("top_share_ppm"),
        expr("sum(share_ppm * share_ppm) div 1000000L").as("hhi_micro"))
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("n_suppliers"), col("top_share_ppm"),
        col("hhi_micro"))
      .orderBy(col("n_name"))
  }

  val queries: Map[String, Q] = Map(
    "q189_nation_hhi" -> q189,
    "q197_mann_whitney" -> q197,
    "q187_kendall_tau" -> q187,
    "q182_rank_movers" -> q182,
    "q166_fulfilment_latency" -> q166,
    "q153_segment_priority_chi2" -> q153,
    "q158_weighted_quantiles" -> q158,
    "q151_supplier_diversity" -> q151,
    "q132_vector_norms" -> q132,
    "q131_embedding_profile" -> q131,
    "q130_quantile_sketch_audit" -> q130,
    "q129_market_basket" -> q129,
    "q128_rfm_segments" -> q128,
    "q122_quantile_profile" -> q122,
    "q139_mad_outliers" -> q139,
    "q146_price_qty_skyline" -> q146,
    "q108_discount_qty_regression" -> q108,
    "q204_per_group_regression" -> q204,
    "q109_price_outliers" -> q109,
    "q112_trade_volume" -> q112,
    "q113_pareto_suppliers" -> q113)

  val oracle: Map[String, String] = Map(
    // identical integer share algebra — HHI is pure arithmetic, so
    // the twin's value is the independent-engine replay
    // the same doubled-units histogram collapse; HUGEINT where Spark
    // widens to DECIMAL(38,0)
    "q197_mann_whitney" ->
      """WITH hist AS (
        |  SELECT CAST(l_quantity AS INTEGER) AS q,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nr,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END)
        |      AS BIGINT) AS no
        |  FROM lineitem GROUP BY 1
        |), w AS (
        |  SELECT coalesce(sum(CAST(a.nr AS HUGEINT) * b.no), 0) AS w
        |  FROM hist a JOIN hist b ON a.q > b.q
        |), t AS (
        |  SELECT coalesce(sum(CAST(nr AS HUGEINT) * no), 0) AS t,
        |    CAST(sum(nr) AS BIGINT) AS n_r, CAST(sum(no) AS BIGINT) AS n_o
        |  FROM hist
        |)
        |SELECT n_r, n_o, CAST(w * 2 + t AS BIGINT) AS u2,
        |  CAST((w * 2 + t) * 1000000 // (2 * n_r * n_o) AS BIGINT) AS mw_micro
        |FROM w, t""".stripMargin,
    "q189_nation_hhi" ->
      """WITH srev AS (
        |  SELECT s_nationkey, l_suppkey,
        |    CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
        |      * (1 - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6))
        |      * 1000000 AS BIGINT)) AS BIGINT) // 10000 AS rev
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2
        |), tot AS (
        |  SELECT s_nationkey, CAST(sum(rev) AS BIGINT) AS t
        |  FROM srev GROUP BY 1
        |), shares AS (
        |  SELECT srev.s_nationkey, (rev * 1000000) // t AS share_ppm
        |  FROM srev JOIN tot USING (s_nationkey)
        |)
        |SELECT n_name, count(*) AS n_suppliers,
        |  CAST(max(share_ppm) AS BIGINT) AS top_share_ppm,
        |  CAST(sum(share_ppm * share_ppm) AS BIGINT) // 1000000 AS hhi_micro
        |FROM shares JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    // the same joint-histogram collapse — concordance as a cell-pair
    // cross join, tau-b over the identical fixed double operand tree
    "q187_kendall_tau" ->
      """WITH hist AS (
        |  SELECT CAST(l_quantity AS INTEGER) AS q,
        |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS INTEGER) AS dc,
        |    count(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2
        |), pr AS (
        |  SELECT
        |    CAST(sum(CASE WHEN b.dc > a.dc THEN a.cnt * b.cnt ELSE 0 END)
        |      AS BIGINT) AS conc,
        |    CAST(sum(CASE WHEN b.dc < a.dc THEN a.cnt * b.cnt ELSE 0 END)
        |      AS BIGINT) AS disc
        |  FROM hist a JOIN hist b ON b.q > a.q
        |), m AS (
        |  SELECT CAST(sum(cnt) AS BIGINT) AS n FROM hist
        |), tq AS (
        |  -- HUGEINT mirrors the Spark side's DECIMAL(38,0) tie
        |  -- widening: plain BIGINT wraps nq*(nq-1) past ~3e9 rows
        |  SELECT sum(CAST(nq AS HUGEINT) * (nq - 1)) AS tie_q2 FROM (
        |    SELECT sum(cnt) AS nq FROM hist GROUP BY q)
        |), td AS (
        |  SELECT sum(CAST(nd AS HUGEINT) * (nd - 1)) AS tie_d2 FROM (
        |    SELECT sum(cnt) AS nd FROM hist GROUP BY dc)
        |)
        |SELECT m.n, pr.conc, pr.disc,
        |  CAST(tie_q2 // 2 AS BIGINT) AS ties_q,
        |  CAST(tie_d2 // 2 AS BIGINT) AS ties_d,
        |  CAST(pr.conc - pr.disc AS DOUBLE) /
        |    sqrt(CAST(CAST(m.n AS HUGEINT) * (m.n - 1) // 2 - tie_q2 // 2
        |           AS DOUBLE) *
        |         CAST(CAST(m.n AS HUGEINT) * (m.n - 1) // 2 - tie_d2 // 2
        |           AS DOUBLE)) AS tau_b
        |FROM pr, m, tq, td""".stripMargin,
    // the literal per-quarter window — the single-reducer spelling the
    // Spark side's keyedRank exists to avoid
    "q182_rank_movers" ->
      """WITH qrev AS (
        |  SELECT CAST(date_trunc('quarter', l_shipdate) AS DATE) AS qtr,
        |    l_suppkey,
        |    CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
        |      * (1 - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,6))
        |      * 1000000 AS BIGINT)) AS BIGINT) AS rev_micro
        |  FROM lineitem GROUP BY 1, 2
        |), ranked AS (
        |  SELECT qtr, l_suppkey,
        |    row_number() OVER (PARTITION BY qtr
        |      ORDER BY rev_micro DESC, l_suppkey) AS rnk
        |  FROM qrev
        |)
        |SELECT strftime(b.qtr, '%Y-%m-%d') AS qtr, a.l_suppkey,
        |  a.rnk AS rank_prev, b.rnk AS rank_curr,
        |  a.rnk - b.rnk AS delta
        |FROM ranked a JOIN ranked b
        |  ON a.l_suppkey = b.l_suppkey
        |  AND b.qtr = a.qtr + INTERVAL 3 MONTH
        |ORDER BY delta DESC, qtr, a.l_suppkey LIMIT 20""".stripMargin,
    "q166_fulfilment_latency" ->
      """WITH hist AS (
        |  SELECT o_orderpriority,
        |    CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) AS BIGINT)
        |      AS lat_days,
        |    count(*) AS cnt
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2
        |), cum AS (
        |  SELECT *,
        |    sum(cnt) OVER (PARTITION BY o_orderpriority ORDER BY lat_days
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(cnt) OVER (PARTITION BY o_orderpriority) AS n,
        |    sum(lat_days * cnt) OVER (PARTITION BY o_orderpriority) AS s
        |  FROM hist
        |)
        |SELECT o_orderpriority, CAST(max(n) AS BIGINT) AS n_items,
        |  min(CASE WHEN cum >= (50 * n + 99) // 100 THEN lat_days END) AS p50_days,
        |  min(CASE WHEN cum >= (90 * n + 99) // 100 THEN lat_days END) AS p90_days,
        |  max(lat_days) AS max_days,
        |  CAST(max(s) * 1000000 // max(n) AS BIGINT) AS mean_micro_days
        |FROM cum GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q153_segment_priority_chi2" ->
      """WITH cells AS (
        |  SELECT c_mktsegment, o_orderpriority, count(*) AS observed
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2
        |), r AS (
        |  SELECT c_mktsegment, sum(observed) AS r_tot FROM cells GROUP BY 1
        |), c AS (
        |  SELECT o_orderpriority, sum(observed) AS c_tot FROM cells GROUP BY 1
        |), n AS (
        |  SELECT sum(observed) AS n_tot FROM cells
        |)
        |SELECT cells.c_mktsegment, cells.o_orderpriority, observed,
        |  CAST(CAST(r_tot AS HUGEINT) * c_tot * 1000000 // n_tot AS BIGINT)
        |    AS expected_micro,
        |  CAST(((CAST(n_tot AS HUGEINT) * observed - CAST(r_tot AS HUGEINT) * c_tot)
        |       * (CAST(n_tot AS HUGEINT) * observed - CAST(r_tot AS HUGEINT) * c_tot)
        |       // (CAST(r_tot AS HUGEINT) * c_tot)) * 1000000 // n_tot AS BIGINT)
        |    AS contrib_micro
        |FROM cells
        |JOIN r USING (c_mktsegment)
        |JOIN c USING (o_orderpriority)
        |CROSS JOIN n
        |ORDER BY c_mktsegment, o_orderpriority""".stripMargin,
    "q158_weighted_quantiles" ->
      """WITH hist AS (
        |  SELECT l_returnflag, l_extendedprice AS price,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,0))) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1, 2
        |), cum AS (
        |  SELECT l_returnflag, price, w,
        |    sum(w) OVER (PARTITION BY l_returnflag ORDER BY price
        |                 ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(w) OVER (PARTITION BY l_returnflag) AS tw
        |  FROM hist
        |)
        |SELECT l_returnflag, CAST(max(tw) AS BIGINT) AS total_units,
        |  min(CASE WHEN cum >= (25 * tw + 99) // 100 THEN price END) AS wp25,
        |  min(CASE WHEN cum >= (50 * tw + 99) // 100 THEN price END) AS wp50,
        |  min(CASE WHEN cum >= (75 * tw + 99) // 100 THEN price END) AS wp75
        |FROM cum GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q151_supplier_diversity" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#4'
        |  AND p_type NOT LIKE 'PROMO%'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q132_vector_norms" ->
      """WITH n2 AS (
        |  SELECT list_sum(list_transform(embedding,
        |    v -> CAST(floor(CAST(v AS DOUBLE) * 1000000) AS HUGEINT)
        |         * CAST(floor(CAST(v AS DOUBLE) * 1000000) AS HUGEINT))) AS n2_h
        |  FROM embeddings
        |)
        |SELECT CAST(n2_h // 100000000000 AS BIGINT) AS norm_bucket,
        |  count(*) AS n_vectors,
        |  CAST(min(n2_h) AS BIGINT) AS min_n2_u,
        |  CAST(max(n2_h) AS BIGINT) AS max_n2_u
        |FROM n2 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q131_embedding_profile" ->
      """WITH vals AS (
        |  SELECT CAST(t.i - 1 AS INTEGER) AS dim,
        |    CAST(floor(CAST(embedding[t.i] AS DOUBLE) * 1000000) AS BIGINT) AS v_u
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
        |)
        |SELECT dim, count(*) AS n_vals,
        |  CAST(sum(CASE WHEN v_u = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |  min(v_u) AS min_u, max(v_u) AS max_u,
        |  CAST(sum(v_u) // count(*) AS BIGINT) AS mean_u,
        |  CAST((count(*) * sum(CAST(v_u AS HUGEINT) * v_u)
        |        - CAST(sum(v_u) AS HUGEINT) * sum(v_u))
        |       // (CAST(count(*) AS HUGEINT) * count(*)) AS BIGINT) AS var_u2
        |FROM vals GROUP BY dim ORDER BY dim""".stripMargin,
    "q129_market_basket" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |), n AS (
        |  SELECT count(DISTINCT l_orderkey) AS n_orders FROM items
        |), item_cnt AS (
        |  SELECT l_partkey, count(*) AS n_item FROM items GROUP BY l_partkey
        |), pairs AS (
        |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_ab
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |)
        |SELECT part_a, part_b, n_ab, ca.n_item AS n_a, cb.n_item AS n_b,
        |  CAST(n_ab * 1000000 // n_orders AS BIGINT) AS support_ppm,
        |  CAST(n_ab * 1000000 // ca.n_item AS BIGINT) AS confidence_ppm,
        |  CAST(((n_ab * 1000000 // ca.n_item) * n_orders) // cb.n_item AS BIGINT) AS lift_ppm
        |FROM pairs
        |JOIN item_cnt ca ON part_a = ca.l_partkey
        |JOIN item_cnt cb ON part_b = cb.l_partkey
        |CROSS JOIN n
        |ORDER BY lift_ppm DESC, part_a, part_b
        |LIMIT 20""".stripMargin,
    "q128_rfm_segments" ->
      """WITH cust AS (
        |  SELECT o_custkey,
        |    max(strftime(o_orderdate, '%Y-%m-%d')) AS last_day,
        |    count(*) AS n_orders,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(18,2)) AS spend_d
        |  FROM orders GROUP BY o_custkey
        |), scored AS (
        |  SELECT *,
        |    ntile(5) OVER (ORDER BY last_day, o_custkey) AS r_q,
        |    ntile(5) OVER (ORDER BY n_orders, o_custkey) AS f_q,
        |    ntile(5) OVER (ORDER BY spend_d, o_custkey) AS m_q
        |  FROM cust
        |)
        |SELECT r_q, f_q, m_q, count(*) AS n_customers,
        |  CAST(CAST(sum(spend_d) AS DECIMAL(18,2)) AS DOUBLE) / count(*) AS avg_spend
        |FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q146_price_qty_skyline" ->
      """WITH pts AS (
        |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents,
        |    CAST(CAST(l_quantity AS DECIMAL(18,0)) AS BIGINT) AS qty
        |  FROM lineitem
        |), grid AS (
        |  SELECT price_cents, qty, count(*) AS n_items FROM pts GROUP BY 1, 2
        |)
        |SELECT g.price_cents, g.qty AS best_qty, g.n_items
        |FROM grid g
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM grid o
        |  WHERE o.price_cents <= g.price_cents AND o.qty >= g.qty
        |    AND (o.price_cents < g.price_cents OR o.qty > g.qty))
        |ORDER BY g.price_cents""".stripMargin,
    "q139_mad_outliers" ->
      """WITH hist AS (
        |  SELECT l_returnflag,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    count(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2
        |), cum1 AS (
        |  SELECT *, sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM hist
        |), t1 AS (
        |  SELECT *, max(cum) OVER (PARTITION BY l_returnflag) AS n FROM cum1
        |), med AS (
        |  SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n_items,
        |    min(CASE WHEN cum >= (50 * n + 99) // 100 THEN cents END) AS median_cents
        |  FROM t1 GROUP BY l_returnflag
        |), dev_hist AS (
        |  SELECT h.l_returnflag, abs(h.cents - m.median_cents) AS dev,
        |    sum(h.cnt) AS cnt
        |  FROM hist h JOIN med m USING (l_returnflag)
        |  GROUP BY 1, 2
        |), cum2 AS (
        |  SELECT *, sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY dev
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM dev_hist
        |), t2 AS (
        |  SELECT *, max(cum) OVER (PARTITION BY l_returnflag) AS n FROM cum2
        |), mad AS (
        |  SELECT l_returnflag,
        |    min(CASE WHEN cum >= (50 * n + 99) // 100 THEN dev END) AS mad_cents
        |  FROM t2 GROUP BY l_returnflag
        |)
        |SELECT h.l_returnflag, m.n_items, m.median_cents, a.mad_cents,
        |  CAST(sum(CASE WHEN abs(h.cents - m.median_cents) > a.mad_cents * 3
        |    THEN h.cnt ELSE 0 END) AS BIGINT) AS n_outliers,
        |  CAST(1000000 * sum(CASE WHEN abs(h.cents - m.median_cents) > a.mad_cents * 3
        |    THEN h.cnt ELSE 0 END) // m.n_items AS BIGINT) AS outlier_ppm
        |FROM hist h
        |JOIN med m USING (l_returnflag)
        |JOIN mad a USING (l_returnflag)
        |GROUP BY 1, 2, 3, 4
        |ORDER BY h.l_returnflag""".stripMargin,
    "q122_quantile_profile" ->
      """WITH hist AS (
        |  SELECT l_returnflag, l_extendedprice AS price, count(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2
        |), cum AS (
        |  SELECT l_returnflag, price,
        |    sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY price
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM hist
        |), t AS (
        |  SELECT *, max(cum) OVER (PARTITION BY l_returnflag) AS n FROM cum
        |)
        |SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n_items,
        |  min(CASE WHEN cum >= (25 * n + 99) // 100 THEN price END) AS p25,
        |  min(CASE WHEN cum >= (50 * n + 99) // 100 THEN price END) AS p50,
        |  min(CASE WHEN cum >= (75 * n + 99) // 100 THEN price END) AS p75,
        |  min(CASE WHEN cum >= (90 * n + 99) // 100 THEN price END) AS p90
        |FROM t GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q108_discount_qty_regression" ->
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n_items,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(18,0)) AS DOUBLE) AS sx,
        |    CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,2)) AS DOUBLE) AS sy,
        |    CAST(CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,6)) * CAST(l_quantity AS DECIMAL(18,6)) AS DECIMAL(18,6))) AS DECIMAL(18,0)) AS DOUBLE) AS sxx,
        |    CAST(CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6)) AS DECIMAL(18,6))) AS DECIMAL(18,2)) AS DOUBLE) AS sxy,
        |    CAST(CAST(sum(CAST(CAST(l_discount AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6)) AS DECIMAL(18,6))) AS DECIMAL(18,4)) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n_items,
        |  (n*sxy - sx*sy) / (n*sxx - sx*sx) AS slope,
        |  (sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n AS intercept,
        |  (n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)) AS corr
        |FROM m ORDER BY l_returnflag""".stripMargin,
    // q108's exact-moment algebra per (year, flag) cell — same operand
    // trees, so the per-model doubles are bit-identical too
    "q204_per_group_regression" ->
      """WITH m AS (
        |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, l_returnflag,
        |    count(*) AS n_items,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(18,0)) AS DOUBLE) AS sx,
        |    CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(18,2)) AS DOUBLE) AS sy,
        |    CAST(CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,6)) * CAST(l_quantity AS DECIMAL(18,6)) AS DECIMAL(18,6))) AS DECIMAL(18,0)) AS DOUBLE) AS sxx,
        |    CAST(CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6)) AS DECIMAL(18,6))) AS DECIMAL(18,2)) AS DOUBLE) AS sxy,
        |    CAST(CAST(sum(CAST(CAST(l_discount AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6)) AS DECIMAL(18,6))) AS DECIMAL(18,4)) AS DOUBLE) AS syy
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2)
        |SELECT o_year, l_returnflag, n_items,
        |  (n*sxy - sx*sy) / (n*sxx - sx*sx) AS slope,
        |  (sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n AS intercept,
        |  (n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)) AS corr
        |FROM m ORDER BY o_year, l_returnflag""".stripMargin,
    "q109_price_outliers" ->
      """WITH c AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS HUGEINT) AS cents
        |  FROM lineitem),
        |st AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(count(*) AS HUGEINT) AS n_h,
        |    CAST(sum(cents) AS HUGEINT) AS s_h,
        |    CAST(sum(cents * cents) AS HUGEINT) AS s2_h
        |  FROM c GROUP BY 1, 2)
        |SELECT c.l_returnflag, c.l_linestatus,
        |  count(*) AS n_items,
        |  CAST(sum(CASE WHEN (n_h*cents - s_h)*(n_h*cents - s_h) > 9*(n_h*s2_h - s_h*s_h)
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  CAST((1000000 * sum(CASE WHEN (n_h*cents - s_h)*(n_h*cents - s_h) > 9*(n_h*s2_h - s_h*s_h)
        |                      THEN 1 ELSE 0 END)) // count(*) AS BIGINT) AS outlier_ppm
        |FROM c JOIN st USING (l_returnflag, l_linestatus)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q112_trade_volume" ->
      s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         |  year(CAST(l_shipdate AS DATE)) AS ship_year,
         |  ${Qx.sqlDsum(Qx.sqlDiscPrice, rescale = 4)} AS revenue,
         |  count(*) AS n_items
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey
         |WHERE sn.n_name IN ('NATION_3', 'NATION_7')
         |  AND cn.n_name IN ('NATION_3', 'NATION_7')
         |  AND sn.n_name <> cn.n_name
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q113_pareto_suppliers" ->
      s"""WITH per AS (
         |  SELECT l_suppkey, CAST(sum($sqlDiscPrice) AS DECIMAL(18,4)) AS rev_d
         |  FROM lineitem GROUP BY l_suppkey),
         |cum AS (
         |  SELECT l_suppkey, rev_d,
         |    sum(rev_d) OVER (ORDER BY rev_d DESC, l_suppkey
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_d,
         |    row_number() OVER (ORDER BY rev_d DESC, l_suppkey) AS rank,
         |    CAST(sum(rev_d) OVER () AS DECIMAL(18,4)) AS total_d
         |  FROM per)
         |SELECT rank, l_suppkey,
         |  CAST(rev_d AS DOUBLE) AS revenue,
         |  CAST(CAST(cum_d AS DECIMAL(18,4)) AS DOUBLE) /
         |    CAST(total_d AS DOUBLE) AS cum_share
         |FROM cum
         |WHERE CAST(cum_d - rev_d AS DECIMAL(18,4)) < total_d * CAST(0.8 AS DECIMAL(1,1))
         |ORDER BY rank""".stripMargin)
}
