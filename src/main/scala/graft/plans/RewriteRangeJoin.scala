package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, ByteType, DataType, DateType, IntegerType, LongType, ShortType, TimestampType}

/** Optimizer rule: rewrite a pure RANGE join (an inner join whose only
  * cross-side predicate is a containment band `lo <= p AND p <= hi`)
  * into an equi-join on a minted bucket key — the logical-plan
  * generalization of [[graft.ops.RangeJoin.pointInInterval]], applied
  * automatically so ANY query in the session (SQL included) gets the
  * hash-join plan instead of the nested-loop one.
  *
  * Without an equi predicate Spark can only plan such a join as
  * BroadcastNestedLoopJoin (fine while one side broadcasts) or a
  * cartesian product (catastrophic at scale). The rewrite quantizes
  * the point side to `floor(p / grain)`, explodes each interval into
  * the buckets it touches, joins on bucket equality, and keeps the
  * ORIGINAL condition as the residual filter — so the rewritten join
  * is value-identical by construction (a matching pair meets in
  * exactly one bucket: the point's).
  *
  * Safety gates, each load-bearing:
  *   - INNER joins only (outer variants change row-preservation
  *     semantics under the fan-out);
  *   - fires only when NO cross-side equality exists (with one, Spark
  *     already hash-joins and the band is a cheap residual) — this is
  *     also the self-termination guard, since the rewritten join HAS
  *     a cross-side equality;
  *   - both bounds and the point must be DETERMINISTIC, single-sided
  *     expressions of ONE bucketable family — integral, timestamp, or
  *     date (an analyzed plan has already coerced a mixed date/ts band
  *     to one type, so same-family is what survivors look like);
  *   - fires only when BOTH sides' size estimates exceed the
  *     broadcast threshold — below it, BroadcastNestedLoopJoin is a
  *     perfectly good plan and the explode would add work (a negative
  *     threshold disables broadcasting entirely, so the rewrite then
  *     always applies);
  *   - inverted (lo > hi) and NULL-ended intervals are filtered
  *     before the explode: they match nothing under the original
  *     predicate, but a descending/NULL Sequence would throw.
  *
  * Grain contract: per-interval fan-out is width/grain + 1 bucket
  * rows, so the grain should sit near the TYPICAL interval width.
  * The grain is type-derived (the r8 rule took integral columns only,
  * so a SQL time-band join silently stayed a nested loop):
  *   - integral columns: `spark.graft.rangeJoin.grain` units
  *     (default 1024);
  *   - timestamps: bucket over unix_micros with
  *     `spark.graft.rangeJoin.grainSeconds` (default 3600 — an hour);
  *   - dates: bucket over unix_date with
  *     `spark.graft.rangeJoin.grainDays` (default 16).
  *
  * Wide-interval fallback (ADVICE r8: a fixed grain has no fan-out
  * bound — one mis-grained interval spanning millions of buckets
  * could OOM the explode, and past 2^31 buckets Sequence THROWS, a
  * cliff where the pre-rule plan merely crawled): intervals whose
  * fan-out exceeds `spark.graft.rangeJoin.maxFanout` (default 4096)
  * do NOT explode into real buckets. They explode into a fixed ring
  * of `spark.graft.rangeJoin.wideSalt` (default 32) SENTINEL buckets
  * instead, and every point emits exactly TWO join rows — its real
  * bucket tagged narrow, plus one hash-salted sentinel tagged wide —
  * so the join key becomes (is_wide, bucket). A (point, interval)
  * pair still meets exactly once: in the point's real bucket when the
  * interval is narrow, in the point's one sentinel when it is wide.
  * The wide arm is therefore a salted DISTRIBUTED nested loop over
  * only the oversized intervals — work |points|x|wide|/salt per task,
  * the same total comparisons the pre-rule plan would do, with
  * bounded fan-out (salt per wide interval, 2 per point) and no
  * Sequence cliff. When every interval is narrow the sentinel probe
  * rows hash-miss an empty build bucket and the only cost is the
  * doubled point-side shuffle rows — the price of never fanning out
  * unboundedly on data the planner cannot see. A workload that KNOWS
  * its intervals are narrow can opt out (`maxFanout` <= 0): points
  * then emit a single probe row and every interval explodes into its
  * real buckets unconditionally — the unguarded plan, with the
  * unguarded hazard, by explicit request only.
  */
object RewriteRangeJoin extends Rule[LogicalPlan] with PredicateHelper {
  private val enabledKey = "spark.graft.rangeJoin.enabled"
  private val grainKey = "spark.graft.rangeJoin.grain"
  private val grainSecondsKey = "spark.graft.rangeJoin.grainSeconds"
  private val grainDaysKey = "spark.graft.rangeJoin.grainDays"
  private val maxFanoutKey = "spark.graft.rangeJoin.maxFanout"
  private val wideSaltKey = "spark.graft.rangeJoin.wideSalt"

  /** The bucketable families; a band qualifies when point and both
    * bounds sit in the SAME family. */
  private def family(e: Expression): Option[Int] = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => Some(0)
    case TimestampType => Some(1)
    case DateType => Some(2)
    case _ => None
  }

  /** A conjunct `small <= large` (strictness retained only in the
    * residual, not the bucket math — one extra bucket is cheaper
    * than a second code path). */
  private def asBound(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(a, b) => Some((a, b))
    case LessThan(a, b)        => Some((a, b))
    case GreaterThanOrEqual(a, b) => Some((b, a))
    case GreaterThan(a, b)        => Some((b, a))
    case _ => None
  }

  /** The family's long view: integral casts, timestamps become
    * unix_micros (a Cast to long would truncate to SECONDS — fine for
    * bucketing but needlessly coarse), dates become unix_date days. */
  private def toUnits(e: Expression): Expression = e.dataType match {
    case TimestampType => UnixMicros(e)
    case DateType => Cast(UnixDate(e), LongType)
    case LongType => e
    case _ => Cast(e, LongType)
  }

  /** floor(e / grain) in overflow-free long arithmetic: IntegralDivide
    * truncates toward zero, so subtract 1 exactly when the dividend is
    * negative with a nonzero remainder (ADVICE r8: the previous
    * (e - pmod(e, g)) spelling underflowed within a partial grain of
    * Long.MinValue; here q-1 fires only when the remainder is nonzero,
    * which the lone q = Long.MinValue case, grain = 1, never is). */
  private def floorDiv(e: Expression, grain: Long): Expression = {
    val ce = toUnits(e)
    val g = Literal(grain, LongType)
    val q = IntegralDivide(ce, g)
    If(And(LessThan(ce, Literal(0L, LongType)),
        Not(EqualTo(Remainder(ce, g), Literal(0L, LongType)))),
      Subtract(q, Literal(1L, LongType)), q)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(enabledKey, "true").toBoolean) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint) if eligible(j) =>
        rewrite(j, left, right, cond, hint).getOrElse(j)
    }
  }

  private def grainFor(fam: Int): Long = fam match {
    case 1 => conf.getConfString(grainSecondsKey, "3600").toLong * 1000000L
    case 2 => conf.getConfString(grainDaysKey, "16").toLong
    case _ => conf.getConfString(grainKey, "1024").toLong
  }

  private def sideOf(e: Expression, l: LogicalPlan, r: LogicalPlan): Option[Boolean] =
    if (e.references.isEmpty) None // a constant bound needs no join at all
    else if (e.references.subsetOf(l.outputSet)) Some(true)
    else if (e.references.subsetOf(r.outputSet)) Some(false)
    else None

  private def eligible(j: Join): Boolean = {
    // never touch streaming joins: a stream-stream interval join's
    // time band is what drives watermark state cleanup — burying it
    // under a Generate would break the streaming planner's handling
    if (j.left.isStreaming || j.right.isStreaming) return false
    // both sides past the broadcast ceiling (or broadcasting disabled):
    // below it BroadcastNestedLoopJoin is the better plan
    val threshold = conf.autoBroadcastJoinThreshold
    threshold < 0 ||
      (j.left.stats.sizeInBytes > threshold && j.right.stats.sizeInBytes > threshold)
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: org.apache.spark.sql.catalyst.plans.logical.JoinHint)
      : Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    // an existing cross-side equality means Spark already has its
    // hash key — and it is what stops this rule re-firing on its own
    // rewritten join
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        sideOf(a, left, right).isDefined && sideOf(b, left, right).isDefined &&
          sideOf(a, left, right) != sideOf(b, left, right)
      case EqualNullSafe(a, b) =>
        sideOf(a, left, right).isDefined && sideOf(b, left, right).isDefined &&
          sideOf(a, left, right) != sideOf(b, left, right)
      case _ => false
    }
    if (hasEqui) return None

    // hunt a band: two conjuncts bounding the SAME point expression
    // from below and above, point on one side, both bounds on the other
    val bounds = conjuncts.flatMap(c => asBound(c).map(b => (c, b._1, b._2)))
    val band = bounds.iterator.flatMap { case (_, lo, p) =>
      bounds.collectFirst {
        case (_, p2, hi) if p2.semanticEquals(p) && !(hi.semanticEquals(lo)) &&
            p.deterministic && lo.deterministic && hi.deterministic &&
            family(p).isDefined && family(p) == family(lo) && family(p) == family(hi) &&
            (for {
              ps <- sideOf(p, left, right); ls <- sideOf(lo, left, right)
              hs <- sideOf(hi, left, right)
            } yield ls == hs && ps != ls).getOrElse(false) =>
          (p, lo, hi)
      }
    }.take(1).toSeq.headOption
    band.map { case (p, lo, hi) =>
      val grain = grainFor(family(p).get)
      val maxFanout = conf.getConfString(maxFanoutKey, "4096").toLong
      val fallback = maxFanout > 0
      val salt = conf.getConfString(wideSaltKey, "32").toLong
      val pointOnLeft = sideOf(p, left, right).get
      val (pts, ivs) = if (pointOnLeft) (left, right) else (right, left)

      // ---- point side: two (is_wide, bucket) probe rows per point —
      // the real bucket for narrow intervals, one hash-salted sentinel
      // for wide ones (just the real bucket when the fallback is
      // opted out)
      val pBucket = floorDiv(p, grain)
      val pSalt = Cast(Pmod(new Murmur3Hash(Seq(p)),
        Literal(salt.toInt, IntegerType)), LongType)
      val wP = AttributeReference("__rj_w_p", BooleanType, nullable = false)()
      val bP = AttributeReference("__rj_b_p", LongType, nullable = true)()
      val narrowProbe =
        CreateNamedStruct(Seq(Literal("w"), Literal(false), Literal("b"), pBucket))
      val probes =
        if (fallback) Seq(narrowProbe,
          CreateNamedStruct(Seq(Literal("w"), Literal(true), Literal("b"), pSalt)))
        else Seq(narrowProbe)
      val ptsGen = Generate(
        Inline(CreateArray(probes)),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(wP, bP), child = pts)

      // ---- interval side: narrow intervals explode into their real
      // buckets; wide ones (fan-out over the cap, or a wrapped — i.e.
      // overflowed — width) into the fixed sentinel ring
      val ivFiltered = Filter(
        LessThanOrEqual(toUnits(lo), toUnits(hi)), ivs)
      val bLo = floorDiv(lo, grain)
      val bHi = floorDiv(hi, grain)
      val widthB = Subtract(bHi, bLo)
      val wide: Expression =
        if (!fallback) Literal(false)
        else Or(GreaterThan(widthB, Literal(maxFanout, LongType)),
          LessThan(widthB, Literal(0L, LongType)))
      val bI = AttributeReference("__rj_b_i", LongType, nullable = true)()
      // Sequence is TimeZoneAwareExpression: without a timeZoneId it
      // reports unresolved even over longs, and the optimizer's plan
      // validator rejects the rewrite
      val step = Some(Literal(1L, LongType))
      val tz = Some(conf.sessionLocalTimeZone)
      val realSeq = Sequence(bLo, bHi, step, tz)
      val ivGen = Generate(
        Explode(if (!fallback) realSeq
          else If(wide,
            Sequence(Literal(0L, LongType), Literal(salt - 1, LongType), step, tz),
            realSeq)),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(bI), child = ivFiltered)
      // the wide flag rides as a projected column (Generate preserves
      // its child's output, so lo/hi are still in scope here)
      val wI = Alias(wide, "__rj_w_i")()
      val ivProj = Project(ivGen.output :+ wI, ivGen)

      val bucketEq = And(EqualTo(wP, wI.toAttribute), EqualTo(bP, bI))
      val (nl, nr) = if (pointOnLeft) (ptsGen, ivProj) else (ivProj, ptsGen)
      Project(j.output, Join(nl, nr, Inner, Some(And(bucketEq, cond)), hint))
    }
  }
}
