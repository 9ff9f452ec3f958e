package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window => LWindow}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkStrategy

/** Whole-operator Catalyst extension (the (c) rung of the extension
  * ladder): per-group top-k as a first-class physical operator.
  *
  * The declarative spelling — `row_number().over(partitionBy(g)
  * .orderBy(o)) <= k` then filter — is how every engine user writes
  * it, and how q06/q76 are written here. Spark 3.5+ already prunes
  * that shape map-side (InferWindowGroupLimit inserts partial/final
  * WindowGroupLimitExec, so at most k rows per (partition, group)
  * reach the exchange) — but it still SORTS each group's survivors
  * and runs the full Window operator on the reduce side to assign
  * ranks. This operator takes the remaining step: the bounded heap
  * replaces the reduce-side sort entirely (O(n log k) insertion, no
  * sort buffer), and rank assignment happens while draining the
  * heap, so no Window/Sort node survives in the plan at all.
  *
  * [[RewriteRankLimitToTopK]] recognizes exactly that logical shape
  * and swaps in [[TopKPerGroupNode]]; [[TopKPerGroupStrategy]] plans
  * it as TWO [[TopKPerGroupExec]] phases (the agg partial/final
  * pattern applied to top-k):
  *
  *   - partial: per input partition, a size-k bounded heap per group
  *     — O(n log k) compute, O(groups x k) memory, NO sort — so at
  *     most k rows per (partition, group) ever reach the exchange;
  *   - exchange on the group keys (inserted by EnsureRequirements
  *     from the final phase's required distribution);
  *   - final: the same bounded heap over the pruned stream, then each
  *     group's survivors sort (k elements) and take row_number ranks.
  *
  * Semantics match the window form whenever the order is TOTAL within
  * a group (ties broken by some unique column — true of every rank
  * query in this engine, and the same caveat row_number itself
  * carries: with a non-total order both forms return an arbitrary
  * representative among tied rows). The same caveat covers the
  * `rank()`/`dense_rank()` spellings: with a total order all three
  * functions assign identical ranks, so the one heap operator serves
  * all three; under ties the emitted rank VALUES still follow each
  * function's semantics over the k survivors, but a boundary tie
  * group may be cut at k rows where the window form would keep every
  * tied row. Registered via
  * [[GraftExtensions]]; the q06/q76 DuckDB oracles gate the rewrite
  * end-to-end every round because the Verify session runs with
  * extensions on. */
sealed abstract class RankStyle
object RankStyle {
  /** row_number(): rank = position, always distinct. */
  case object RowNum extends RankStyle
  /** rank(): tied rows share the FIRST tied position's rank. */
  case object Rnk extends RankStyle
  /** dense_rank(): tied rows share a rank; no gaps after ties. */
  case object DenseRnk extends RankStyle
}

case class TopKPerGroupNode(
    group: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    style: RankStyle,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rankAttr is PRODUCED here, not consumed: without this override it
  // sits in references but not in the child's output, so every
  // rewritten plan reports a non-empty missingInput (the `!` invalid
  // marker in explain; a hard error under plan-change validation)
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

/** Matches `Filter(rank cmp lit, Window(rankfn as rank over
  * (partition by g order by o)))` — rankfn any of row_number, rank,
  * dense_rank, each with its own default frame —
  * once predicate pushdown has brought the filter adjacent to the
  * window. Only the EXACT single-comparison filter is rewritten; a
  * conjunction with other predicates is left alone (those predicates
  * may reference pre-window rows the heap would have pruned). Bounds
  * above [[RewriteRankLimitToTopK.maxRewriteK]] also stay on the
  * window form: the heap materializes k rows per (partition, group)
  * in executor memory with no spill path, so a large-k sampling query
  * belongs on Spark's stock WindowGroupLimit + sort, which spills. */
object RewriteRankLimitToTopK extends Rule[LogicalPlan] {
  /** Largest k the heap rewrite accepts. 64k rows/group/partition is
    * comfortably in-memory for any row the engine shuffles; beyond it
    * the stock spill-capable window path is the safer plan. */
  val maxRewriteK = 65536

  private def styleOf(fn: Expression, frame: WindowFrame): Option[RankStyle] =
    frame match {
      // all three RankLike functions resolve to the running ROW frame
      case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) =>
        fn match {
          case RowNumber()  => Some(RankStyle.RowNum)
          case _: Rank      => Some(RankStyle.Rnk)
          case _: DenseRank => Some(RankStyle.DenseRnk)
          case _            => None
        }
      case _ => None
    }

  private def bound(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(r: Attribute, Literal(v: Int, IntegerType))
      if r.semanticEquals(rank) => Some(v)
    case LessThan(r: Attribute, Literal(v: Int, IntegerType))
      if r.semanticEquals(rank) => Some(v - 1)
    case EqualTo(r: Attribute, Literal(1, IntegerType))
      if r.semanticEquals(rank) => Some(1)
    case GreaterThanOrEqual(Literal(v: Int, IntegerType), r: Attribute)
      if r.semanticEquals(rank) => Some(v)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond,
        LWindow(Seq(alias @ Alias(
          WindowExpression(fn, WindowSpecDefinition(part, order, frame)),
          _)), _, _, child, _))
        if part.nonEmpty && order.nonEmpty && styleOf(fn, frame).isDefined =>
      bound(cond, alias.toAttribute) match {
        case Some(k) if k >= 1 && k <= maxRewriteK =>
          TopKPerGroupNode(part, order, k, alias.toAttribute,
            styleOf(fn, frame).get, child)
        case Some(_) => // k <= 0 (always-false filter) or beyond the
          f            // heap's safe bound: stay on the window form
        case None => f
      }
  }
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(group, order, k, rankAttr, style, child) =>
      val partialExec = TopKPerGroupExec(group, order, k, rankAttr, style,
        planLater(child), partial = true)
      TopKPerGroupExec(group, order, k, rankAttr, style, partialExec,
        partial = false) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap per-group top-k. `partial = true` prunes without
  * ranking (pre-shuffle combiner); `partial = false` requires
  * clustering on the group keys, prunes again, and emits each group's
  * k survivors in order with the appended row_number rank. */
case class TopKPerGroupExec(
    group: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    style: RankStyle,
    child: SparkPlan,
    partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  // Unconditional: the partial phase doesn't OUTPUT rankAttr, but the
  // attribute still appears in this node's expressions (it's a
  // constructor arg), so it must be excluded from missingInput or the
  // partial node carries the `!` invalid marker too.
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(group) :: Nil

  override def outputPartitioning = child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupExprs = group
    val sortOrder = order
    val limit = k
    val isPartial = partial
    val rankStyle = style
    val finalOutput = output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      val ord = GenerateOrdering.generate(
        sortOrder.map(BindReferences.bindReference(_, childOutput)))
      // PriorityQueue head = WORST survivor (reverse of the sort order)
      val cmp = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          ord.compare(b, a)
      }
      val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          // initial capacity is capped: a large-k query must not
          // pre-allocate a k-sized array per group up front (the queue
          // grows on demand; maxRewriteK bounds the worst case)
          heap = new java.util.PriorityQueue[InternalRow](
            math.min(limit + 1, 1024), cmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < limit) heap.offer(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.offer(row.copy())
        }
      }
      val resultProj = UnsafeProjection.create(finalOutput, finalOutput)
      val rankRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      val entries = heaps.entrySet().iterator()
      new Iterator[InternalRow] {
        private var current: Iterator[InternalRow] = Iterator.empty
        override def hasNext: Boolean = {
          while (!current.hasNext && entries.hasNext) {
            val heap = entries.next().getValue
            val arr = new Array[InternalRow](heap.size())
            var i = arr.length - 1
            // drain the heap worst-first => arr ends up best-first
            while (i >= 0) { arr(i) = heap.poll(); i -= 1 }
            current =
              if (isPartial) arr.iterator
              else {
                // rank per the matched function's semantics over the k
                // survivors (identical to row_number under the rewrite's
                // total-order caveat; faithful on within-k ties)
                var prev: InternalRow = null
                var prevRank = 0
                arr.iterator.zipWithIndex.map { case (r, idx) =>
                  val tied = prev != null && ord.compare(prev, r) == 0
                  val rk = rankStyle match {
                    case RankStyle.RowNum   => idx + 1
                    case RankStyle.Rnk      => if (tied) prevRank else idx + 1
                    case RankStyle.DenseRnk => if (tied) prevRank else prevRank + 1
                  }
                  prev = r
                  prevRank = rk
                  rankRow.setInt(0, rk)
                  resultProj(joined(r, rankRow))
                }
              }
          }
          current.hasNext
        }
        override def next(): InternalRow = current.next()
      }
    }, preservesPartitioning = true)
  }
}
