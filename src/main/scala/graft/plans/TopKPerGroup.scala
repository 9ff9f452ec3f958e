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
  * Semantics are EXACT for all three rank functions, ties included —
  * the rewrite fires engine-wide on any session query, so it must
  * never change result cardinality:
  *
  *   - row_number() <= k emits exactly min(k, |group|) rows; with a
  *     non-total order the representative among tied rows is
  *     arbitrary, exactly as the window form's own caveat.
  *   - rank() <= k keeps every row with fewer than k strictly-better
  *     rows — possibly MORE than k rows under boundary ties (`rank()
  *     = 1` returns ALL tied winners). The keeper is tie-bucketed: a
  *     row is dropped only when k kept rows are strictly better, and
  *     since any row strictly better than a qualifier qualifies
  *     itself, dropped rows can never affect surviving ranks.
  *   - dense_rank() <= k keeps every row in the first k distinct-key
  *     buckets.
  *
  * Partial-phase soundness for the tie styles: a row's (dense) rank
  * over MORE rows can only grow, so "locally rank > k" implies
  * "globally rank > k" and local pruning keeps a superset of the true
  * qualifiers. Memory: row_number holds k rows per (partition,
  * group); the tie styles hold exactly the rows they must EMIT (the
  * true qualifying set, which under heavy ties is larger than k —
  * those rows cross the exchange in any correct plan; the stock
  * window path buffers the same rows in its sort instead). The
  * [[RewriteRankLimitToTopK.maxRewriteK]] bound keeps the
  * deliberately-huge-k case on Spark's spill-capable path, and the
  * PARTIAL phase is additionally budget-bounded in both distinct
  * groups and total held rows — over budget it flushes its keepers
  * downstream and starts fresh (see [[TopKPerGroupExec]]'s companion),
  * so unbounded group cardinality or mass ties degrade the partial
  * phase toward a pass-through instead of OOM. The FINAL phase's
  * memory is O(emitted rows per group x groups in the reduce
  * partition) by design: those rows are the operator's output, the
  * exchange has already divided the group count by the shuffle
  * parallelism, and a circuit breaker here would fail queries the
  * stock path completes — so none is installed. Registered
  * via [[GraftExtensions]]; the q06/q76/q76b DuckDB oracles gate the
  * rewrite end-to-end every round because the Verify session runs
  * with extensions on. */
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
    case EqualTo(Literal(1, IntegerType), r: Attribute)
      if r.semanticEquals(rank) => Some(1)
    case GreaterThanOrEqual(Literal(v: Int, IntegerType), r: Attribute)
      if r.semanticEquals(rank) => Some(v)
    case GreaterThan(Literal(v: Int, IntegerType), r: Attribute)
      if r.semanticEquals(rank) => Some(v - 1)
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
      // Planning-time conf read (SQLConf.get is the active session's
      // conf on the driver) so a session can shrink the flush budgets
      // — the spec runs the whole operator under a budget of a few
      // groups to prove flush-correctness.
      val conf = org.apache.spark.sql.internal.SQLConf.get
      val flushGroups = conf.getConfString(
        TopKPerGroupExec.flushGroupsKey,
        TopKPerGroupExec.defaultFlushGroups.toString).toInt
      val flushRows = conf.getConfString(
        TopKPerGroupExec.flushRowsKey,
        TopKPerGroupExec.defaultFlushRows.toString).toInt
      val partialExec = TopKPerGroupExec(group, order, k, rankAttr, style,
        planLater(child), partial = true, flushGroups, flushRows)
      TopKPerGroupExec(group, order, k, rankAttr, style, partialExec,
        partial = false, flushGroups, flushRows) :: Nil
    case _ => Nil
  }
}

object TopKPerGroupExec {
  /** Partial-phase flush budgets (session-overridable). The partial
    * keeper map holds one keeper per DISTINCT GROUP seen in the input
    * partition — k rows each (row_number) or the local qualifying tie
    * set (rank/dense_rank). Per-group memory is bounded, but group
    * COUNT is not: at 100 TB a map partition can see ~10^8 groups and
    * the stock hash-agg path this operator replaces would spill where
    * a plain map OOMs. Partial output is allowed to be a SUPERSET of
    * the true qualifiers (the final phase re-prunes after the
    * exchange), so the fix is a semantics-free flush: when the map
    * exceeds [[flushGroupsKey]] distinct groups or [[flushRowsKey]]
    * total held rows, drain every keeper downstream and start a fresh
    * generation. Worst case the partial phase degrades toward a
    * pass-through (what the plan would be with no partial phase at
    * all) — never wrong, never above the budget. The rows budget also
    * bounds rank()/dense_rank() mass-tie growth (a degenerate
    * `rank() = 1 on a constant key` holds the whole partition in one
    * keeper without it). */
  val flushGroupsKey = "spark.graft.topk.partialFlushGroups"
  val flushRowsKey = "spark.graft.topk.partialFlushRows"
  /** 1M groups; at k-ish rows each this is the same order as a
    * hash-agg partial's default spill threshold territory. */
  val defaultFlushGroups: Int = 1 << 20
  /** 4M rows held across all keepers — a hard byte-side backstop
    * independent of how the rows distribute over groups. */
  val defaultFlushRows: Int = 1 << 22
}

/** Per-group top-k with a style-specific keeper ([[HeapKeeper]] for
  * row_number, tie-exact [[TieKeeper]] for rank/dense_rank).
  * `partial = true` prunes without ranking (pre-shuffle combiner);
  * `partial = false` requires clustering on the group keys, prunes
  * again, and emits each group's qualifiers in order with the
  * appended rank. */
case class TopKPerGroupExec(
    group: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    style: RankStyle,
    child: SparkPlan,
    partial: Boolean,
    flushGroups: Int = TopKPerGroupExec.defaultFlushGroups,
    flushRows: Int = TopKPerGroupExec.defaultFlushRows) extends UnaryExecNode {

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
    val groupBudget = flushGroups
    val rowBudget = flushRows
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      val ord = GenerateOrdering.generate(
        sortOrder.map(BindReferences.bindReference(_, childOutput)))
      // comparators hoisted: one pair per partition, not per group
      val fwdCmp = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(a, b)
      }
      val revCmp = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
      }
      val keepers = new java.util.LinkedHashMap[UnsafeRow, GroupKeeper]()
      def mkKeeper(): GroupKeeper = rankStyle match {
        case RankStyle.RowNum   => new HeapKeeper(ord, revCmp, limit)
        case RankStyle.Rnk      => new TieKeeper(ord, fwdCmp, limit, dense = false)
        case RankStyle.DenseRnk => new TieKeeper(ord, fwdCmp, limit, dense = true)
      }
      def insertOne(row: InternalRow): Int = {
        val key = keyProj(row)
        var keeper = keepers.get(key)
        if (keeper == null) {
          keeper = mkKeeper()
          keepers.put(key.copy(), keeper)
        }
        val before = keeper.size
        keeper.insert(row)
        keeper.size - before
      }
      import scala.jdk.CollectionConverters._
      if (isPartial) {
        // Generation loop: fill the keeper map until the group or
        // held-row budget trips (or input ends), drain everything
        // downstream, start fresh. Partial output may be a superset,
        // so every flush is semantics-free; memory is bounded by the
        // budgets no matter the group cardinality or tie mass.
        new Iterator[InternalRow] {
          private var current: Iterator[InternalRow] = Iterator.empty
          private def fill(): Unit = {
            keepers.clear()
            var heldRows = 0
            while (iter.hasNext && keepers.size() < groupBudget && heldRows < rowBudget) {
              heldRows += insertOne(iter.next())
            }
            current = keepers.values().iterator().asScala.flatMap(_.drainRows())
          }
          override def hasNext: Boolean = {
            // fill() always consumes >= 1 input row, so this terminates
            while (!current.hasNext && iter.hasNext) fill()
            current.hasNext
          }
          override def next(): InternalRow = current.next()
        }
      } else {
        // Final phase: after the exchange every row of a group is in
        // this partition, so the map must hold all of the partition's
        // groups (k rows each — same order as the stock hash-agg
        // final; the exchange has already divided group count by the
        // shuffle parallelism).
        while (iter.hasNext) insertOne(iter.next())
        val resultProj = UnsafeProjection.create(finalOutput, finalOutput)
        val rankRow = new GenericInternalRow(1)
        val joined = new JoinedRow
        val entries = keepers.entrySet().iterator()
        new Iterator[InternalRow] {
          private var current: Iterator[InternalRow] = Iterator.empty
          override def hasNext: Boolean = {
            while (!current.hasNext && entries.hasNext) {
              current = entries.next().getValue.drainRanked().map { case (r, rk) =>
                rankRow.setInt(0, rk)
                resultProj(joined(r, rankRow))
              }
            }
            current.hasNext
          }
          override def next(): InternalRow = current.next()
        }
      }
    }, preservesPartitioning = true)
  }
}

/** Per-group keeper of the qualifying rows, style-specific. `insert`
  * copies rows it retains; drain emits best-first (partial: rows only;
  * final: rows with their rank values). Single-use. */
private sealed trait GroupKeeper {
  def insert(row: InternalRow): Unit
  /** Rows currently held — the partial phase's flush accounting. */
  def size: Int
  def drainRows(): Iterator[InternalRow]
  def drainRanked(): Iterator[(InternalRow, Int)]
}

/** row_number(): exactly k survivors — the bounded heap. `revCmp`
  * must be the REVERSE of `ord` (heap head = worst survivor). */
private final class HeapKeeper(
    ord: org.apache.spark.sql.catalyst.expressions.BaseOrdering,
    revCmp: java.util.Comparator[InternalRow],
    k: Int) extends GroupKeeper {
  // Initial capacity capped: a large-k query must not pre-allocate a
  // k-sized array per group up front (grows on demand; maxRewriteK
  // bounds the worst case).
  private val heap = new java.util.PriorityQueue[InternalRow](
    math.min(k + 1, 1024), revCmp)

  override def insert(row: InternalRow): Unit =
    if (heap.size() < k) heap.offer(row.copy())
    else if (ord.compare(row, heap.peek()) < 0) {
      heap.poll(); heap.offer(row.copy())
    }

  override def size: Int = heap.size()

  private def bestFirst(): Array[InternalRow] = {
    val arr = new Array[InternalRow](heap.size())
    var i = arr.length - 1
    while (i >= 0) { arr(i) = heap.poll(); i -= 1 } // worst-first drain
    arr
  }

  override def drainRows(): Iterator[InternalRow] = bestFirst().iterator
  override def drainRanked(): Iterator[(InternalRow, Int)] =
    bestFirst().iterator.zipWithIndex.map { case (r, i) => (r, i + 1) }
}

/** rank()/dense_rank(): tie-bucketed keeper, exact under ties.
  * Invariant after every insert — a bucket survives iff it qualifies:
  * rank: strictly-better kept rows (totalRows - lastBucket) < k;
  * dense: bucket index < k. Rows dropped under the invariant can
  * never affect survivors' ranks (anything strictly better than a
  * qualifier qualifies), and a row's (dense) rank only grows as rows
  * are added, so partial-phase pruning keeps a superset of the true
  * qualifiers. Memory is the emitted row set itself. */
private final class TieKeeper(
    ord: org.apache.spark.sql.catalyst.expressions.BaseOrdering,
    fwdCmp: java.util.Comparator[InternalRow],
    k: Int, dense: Boolean) extends GroupKeeper {
  private val buckets =
    new java.util.TreeMap[InternalRow, java.util.ArrayList[InternalRow]](fwdCmp)
  private var totalRows = 0

  override def size: Int = totalRows

  override def insert(row: InternalRow): Unit = {
    if (!buckets.isEmpty) {
      val worstEntry = buckets.lastEntry()
      if (ord.compare(row, worstEntry.getKey) > 0) {
        // strictly worse than every kept bucket: qualifies only if the
        // keeper is not yet full for its style
        val full = if (dense) buckets.size() >= k else totalRows >= k
        if (full) return
      }
    }
    val copied = row.copy()
    var bucket = buckets.get(copied)
    if (bucket == null) {
      bucket = new java.util.ArrayList[InternalRow]()
      buckets.put(copied, bucket)
    }
    bucket.add(copied)
    totalRows += 1
    // restore the invariant: evict trailing buckets that no longer
    // qualify (at most the one the insert displaced, but loop anyway)
    var done = false
    while (!done && !buckets.isEmpty) {
      val last = buckets.lastEntry()
      val lastSize = last.getValue.size()
      val evict =
        if (dense) buckets.size() > k
        else totalRows - lastSize >= k
      if (evict) { buckets.remove(last.getKey); totalRows -= lastSize }
      else done = true
    }
  }

  import scala.jdk.CollectionConverters._

  private def bucketIter = buckets.entrySet().iterator().asScala

  override def drainRows(): Iterator[InternalRow] =
    bucketIter.flatMap(_.getValue.iterator().asScala)

  override def drainRanked(): Iterator[(InternalRow, Int)] = {
    var rowsBefore = 0
    var bucketIdx = 0
    bucketIter.flatMap { e =>
      val rank = if (dense) bucketIdx + 1 else rowsBefore + 1
      rowsBefore += e.getValue.size()
      bucketIdx += 1
      e.getValue.iterator().asScala.map(r => (r, rank))
    }
  }
}
