package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

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
  *   - both bounds and the point must be DETERMINISTIC, single-sided,
  *     integral-typed expressions (cast to long for the bucket math);
  *   - fires only when BOTH sides' size estimates exceed the
  *     broadcast threshold — below it, BroadcastNestedLoopJoin is a
  *     perfectly good plan and the explode would add work (a negative
  *     threshold disables broadcasting entirely, so the rewrite then
  *     always applies);
  *   - inverted (lo > hi) and NULL-ended intervals are filtered
  *     before the explode: they match nothing under the original
  *     predicate, but a descending/NULL Sequence would throw.
  *
  * Grain contract (`spark.graft.rangeJoin.grain`, default 1024 units):
  * per-interval fan-out is width/grain + 1 bucket rows. The right
  * value sits near the typical interval width; both mis-sizings
  * degrade linearly (interval-side row multiplication vs residual-
  * filter work from unrelated co-bucketed intervals), never as a
  * cliff. Strict bounds (`<`) are accepted and kept verbatim in the
  * residual, so they cost one extra bucket row at worst.
  */
object RewriteRangeJoin extends Rule[LogicalPlan] with PredicateHelper {
  private val enabledKey = "spark.graft.rangeJoin.enabled"
  private val grainKey = "spark.graft.rangeJoin.grain"

  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
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

  /** floor(e / grain) for possibly-negative longs: pmod is
    * non-negative, so (e - pmod(e, g)) is the greatest multiple of g
    * at or below e and the integral divide is exact (no truncation
    * asymmetry). */
  private def floorDiv(e: Expression, grain: Long): Expression = {
    val ce = Cast(e, LongType)
    val g = Literal(grain, LongType)
    IntegralDivide(Subtract(ce, Pmod(ce, g)), g)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(enabledKey, "true").toBoolean) return plan
    val grain = conf.getConfString(grainKey, "1024").toLong
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint) if eligible(j) =>
        rewrite(j, left, right, cond, hint, grain).getOrElse(j)
    }
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
      cond: Expression, hint: org.apache.spark.sql.catalyst.plans.logical.JoinHint,
      grain: Long): Option[LogicalPlan] = {
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
            integral(p) && integral(lo) && integral(hi) &&
            (for {
              ps <- sideOf(p, left, right); ls <- sideOf(lo, left, right)
              hs <- sideOf(hi, left, right)
            } yield ls == hs && ps != ls).getOrElse(false) =>
          (p, lo, hi)
      }
    }.take(1).toSeq.headOption
    band.map { case (p, lo, hi) =>
      val pointOnLeft = sideOf(p, left, right).get
      val (pts, ivs) = if (pointOnLeft) (left, right) else (right, left)
      val bucketP = Alias(floorDiv(p, grain), "__rj_bucket_p")()
      val ptsProj = Project(pts.output :+ bucketP, pts)
      val ivFiltered = Filter(
        LessThanOrEqual(Cast(lo, LongType), Cast(hi, LongType)), ivs)
      val bucketI = AttributeReference("__rj_bucket_i", LongType, nullable = false)()
      // Sequence is TimeZoneAwareExpression: without a timeZoneId it
      // reports unresolved even over longs, and the optimizer's plan
      // validator rejects the rewrite
      val ivGen = Generate(
        Explode(Sequence(floorDiv(lo, grain), floorDiv(hi, grain),
          Some(Literal(1L, LongType)), Some(conf.sessionLocalTimeZone))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(bucketI), child = ivFiltered)
      val bucketEq = EqualTo(bucketP.toAttribute, bucketI)
      val (nl, nr) = if (pointOnLeft) (ptsProj, ivGen) else (ivGen, ptsProj)
      Project(j.output, Join(nl, nr, Inner, Some(And(bucketEq, cond)), hint))
    }
  }
}
