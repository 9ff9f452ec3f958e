package graft.ops

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

/** Property evidence for the q220 extreme-buffer algebra (the
  * [[FoldAlgebraSpec]] pattern: the closed form vs the literal model
  * on RANDOM inputs, pure JVM — here at stress depths k ∈ {1, 2, 3}
  * where the shipped instance runs the same depth-generic algebra at
  * k = 16). The literal model is the live multiset itself; the buffer
  * model mirrors [[MatView.signedExtremeState]] (per-round net + rank
  * + truncate + bound marker), [[MatView.mergeExtremeState]] (sum per
  * value, most-extreme bound, NO re-truncation), and
  * [[MatView.compactExtremeState]] (re-truncate positives, widen
  * bound, keep negatives).
  *
  * The property that makes the design trustworthy is SAFETY under the
  * retraction contract (retract only what is live): the served view
  * is either the EXACT literal extreme or a loud rescan — never a
  * wrong value, never empty while values live, never a value while
  * empty. Plus: histories with no retractions never rescan, and
  * physical compaction at any point is serving-equivalent. */
class ExtremeBufferAlgebraSpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int = 400): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- the buffer model (one group, one side) -------------------------
  private case class Side(vals: Map[Long, Long], bound: Option[Long])
  private val empty = Side(Map.empty, None)

  /** Per-round commit: net signed counts, rank ALL nonzero rows by
    * value, keep k, bound = most extreme dropped (sign-blind) —
    * mirrors signedExtremeState. */
  private def commit(hist: Map[Long, Long], top: Boolean, k: Int): Side = {
    val nz = hist.filter(_._2 != 0L)
    val ranked = nz.keys.toSeq.sortBy(v => if (top) -v else v)
    val dropped = ranked.drop(k)
    Side(ranked.take(k).map(v => v -> nz(v)).toMap,
      if (dropped.isEmpty) None
      else Some(if (top) dropped.max else dropped.min))
  }

  /** Read-side merge: plain sums, zeros annihilate, bounds fold to the
    * most extreme — mirrors mergeExtremeState (no re-truncation). */
  private def merge(a: Side, b: Side, top: Boolean): Side = {
    val vals = (a.vals.keySet ++ b.vals.keySet).iterator
      .map(v => v -> (a.vals.getOrElse(v, 0L) + b.vals.getOrElse(v, 0L)))
      .filter(_._2 != 0L).toMap
    val bound = (a.bound, b.bound) match {
      case (None, x) => x
      case (x, None) => x
      case (Some(x), Some(y)) => Some(if (top) math.max(x, y) else math.min(x, y))
    }
    Side(vals, bound)
  }

  /** Physical compaction: re-truncate POSITIVES to k, widen the bound
    * by what was dropped, keep negatives — mirrors compactExtremeState. */
  private def compact(s: Side, top: Boolean, k: Int): Side = {
    val ranked = s.vals.filter(_._2 > 0L).keys.toSeq.sortBy(v => if (top) -v else v)
    val dropped = ranked.drop(k)
    val kept = ranked.take(k).toSet
    merge(Side(s.vals.filter { case (v, n) => n < 0L || kept(v) }, s.bound),
      Side(Map.empty,
        if (dropped.isEmpty) None
        else Some(if (top) dropped.max else dropped.min)), top)
  }

  private sealed trait Serve
  private case object Empty extends Serve
  private case class Exact(v: Long) extends Serve
  private case object Rescan extends Serve

  /** The served extreme — mirrors extremesExactView's guard: a
    * candidate must STRICTLY clear the bound. */
  private def serve(s: Side, top: Boolean): Serve = {
    val pos = s.vals.collect { case (v, n) if n > 0L => v }
    val cand = if (pos.isEmpty) None else Some(if (top) pos.max else pos.min)
    (cand, s.bound) match {
      case (None, None) => Empty
      case (Some(c), None) => Exact(c)
      case (Some(c), Some(b)) if (top && c > b) || (!top && c < b) => Exact(c)
      case _ => Rescan
    }
  }

  // ---- history generator (the retraction contract holds) --------------
  // A history is a list of rounds; each round is a net multiset delta:
  // adds of arbitrary values, retracts only of currently-live counts.
  // Values are drawn from a SMALL domain so collisions, re-adds and
  // deep retractions all occur.
  private def histories(allowRetract: Boolean): Gen[List[Map[Long, Long]]] = {
    def round(live: Map[Long, Long]): Gen[Map[Long, Long]] = for {
      nAdd <- Gen.chooseNum(0, 4)
      adds <- Gen.listOfN(nAdd, Gen.zip(Gen.chooseNum(0L, 12L), Gen.chooseNum(1L, 2L)))
      retr <-
        if (!allowRetract || live.isEmpty) Gen.const(List.empty[(Long, Long)])
        else for {
          keys <- Gen.someOf(live.keys.toSeq)
          picks <- Gen.sequence[List[(Long, Long)], (Long, Long)](
            keys.toList.map(v => Gen.chooseNum(1L, live(v)).map(n => v -> -n)))
        } yield picks
    } yield (adds ++ retr).groupBy(_._1).view
      .mapValues(_.map(_._2).sum).filter(_._2 != 0L).toMap
    def loop(n: Int, live: Map[Long, Long],
             acc: List[Map[Long, Long]]): Gen[List[Map[Long, Long]]] =
      if (n == 0) Gen.const(acc.reverse)
      else round(live).flatMap { r =>
        val live2 = (live.keySet ++ r.keySet).iterator
          .map(v => v -> (live.getOrElse(v, 0L) + r.getOrElse(v, 0L)))
          .filter(_._2 > 0L).toMap
        loop(n - 1, live2, r :: acc)
      }
    Gen.chooseNum(1, 8).flatMap(n => loop(n, Map.empty, Nil))
  }

  private def fold(h: List[Map[Long, Long]], top: Boolean, k: Int): Side =
    h.map(commit(_, top, k)).foldLeft(empty)(merge(_, _, top))

  private def liveOf(h: List[Map[Long, Long]]): Map[Long, Long] =
    h.flatten.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .filter(_._2 > 0L).toMap

  test("SAFETY: under the retraction contract the served extreme is exact or a declared rescan — never wrong") {
    check(Prop.forAll(histories(allowRetract = true), Gen.oneOf(1, 2, 3),
      Gen.oneOf(true, false)) { (h, k, top) =>
      val live = liveOf(h)
      serve(fold(h, top, k), top) match {
        case Exact(v) =>
          live.nonEmpty :| "served a value on an empty group" &&
            (v == (if (top) live.keys.max else live.keys.min)) :| s"served $v, literal ${if (top) live.keys.max else live.keys.min}"
        case Empty  => live.isEmpty :| s"read empty while ${live.size} values live"
        case Rescan => Prop.passed // always conservative-safe
      }
    })
  }

  test("NO-RETRACTION histories never rescan (the bound guard does not over-fire on append-only folds)") {
    check(Prop.forAll(histories(allowRetract = false), Gen.oneOf(1, 2, 3),
      Gen.oneOf(true, false)) { (h, k, top) =>
      val live = liveOf(h)
      serve(fold(h, top, k), top) match {
        case Rescan   => Prop.falsified :| "append-only history declared a rescan"
        case Exact(v) =>
          (v == (if (top) live.keys.max else live.keys.min)) :| s"served $v"
        case Empty    => live.isEmpty :| "read empty on a non-empty group"
      }
    })
  }

  test("COMPACTION at any prefix stays SAFE and only ever degrades toward rescan — and is equivalent at compaction time") {
    check(Prop.forAll(histories(allowRetract = true), Gen.oneOf(1, 2, 3),
      Gen.oneOf(true, false), Gen.chooseNum(0, 8)) { (h, k, top, cutRaw) =>
      val cut = math.min(cutRaw, h.length)
      val (a, b) = h.splitAt(cut)
      val live = liveOf(h)
      // equivalence AT the compaction point: nothing after the fold
      val atCut = serve(fold(a, top, k), top) ==
        serve(compact(fold(a, top, k), top, k), top)
      // after further rounds: the compacted lineage must stay SAFE
      // (exact-or-rescan vs the literal) and may differ from the
      // uncompacted fold only by declaring a rescan where the deeper
      // uncompacted state could still answer (a later retraction of a
      // value compaction truncated away — the honest price of
      // bounding state at depth k)
      val s1 = serve(fold(h, top, k), top)
      val s2 = serve(b.map(commit(_, top, k))
        .foldLeft(compact(fold(a, top, k), top, k))(merge(_, _, top)), top)
      val safe2 = s2 match {
        case Exact(v) => live.nonEmpty &&
          v == (if (top) live.keys.max else live.keys.min)
        case Empty  => live.isEmpty
        case Rescan => true
      }
      atCut :| "serving changed at the compaction point itself" &&
        safe2 :| s"compacted lineage served unsafely: $s2 vs live $live" &&
        (s2 == s1 || s2 == Rescan) :| s"compaction degraded somewhere other than toward rescan: $s1 -> $s2"
    })
  }
}
