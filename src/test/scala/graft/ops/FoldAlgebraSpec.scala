package graft.ops

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

/** Property evidence for the round's algebraic reductions — each a
  * closed form the Spark plans rely on, checked here against the
  * literal model on RANDOM inputs (pure JVM, no Spark session):
  *
  *  - q175: FIFO lot fates are a function of the scalar consumed
  *    total (exhausted iff grant cumsum <= consumed; frontier = first
  *    survivor) — vs a literal lot-queue simulation.
  *  - q172: the sweep's island algebra (new period iff open >
  *    prev max close + 1; covered days = last close − first open + 1
  *    per period) — vs a literal day-set union.
  *  - q178: the contribution-explode centered moving sum — vs a
  *    literal windowed scan over the series.
  *
  * The DuckDB twins check the same reductions on the corpus; these
  * properties cover the input space the corpus cannot. */
class FoldAlgebraSpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int = 300): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("q175 closed form equals a literal FIFO queue on random ledgers") {
    val deltas = Gen.listOf(Gen.chooseNum(-40L, 40L)) // small => frequent clips
    check(Prop.forAll(deltas) { ds: List[Long] =>
      // literal queue
      var lots = Vector[(Int, Long)]() // (grant index, rem)
      var granted = 0L
      var nLots = 0
      ds.zipWithIndex.foreach { case (d, i) =>
        if (d > 0) { lots :+= (i, d); granted += d; nLots += 1 }
        else if (d < 0) {
          var need = -d
          while (need > 0 && lots.nonEmpty) {
            val (g, rem) = lots.head
            if (rem <= need) { need -= rem; lots = lots.tail }
            else { lots = (g, rem - need) +: lots.tail; need = 0 }
          }
        }
      }
      // closed form: capped scalar fold + grant cumsum
      val bal = ds.foldLeft(0L)((b, d) => math.max(b + d, 0L))
      val consumed = granted - bal
      val grants = ds.zipWithIndex.filter(_._1 > 0)
      val cums = grants.scanLeft(0L)(_ + _._1).tail
      val exhausted = cums.count(_ <= consumed)
      val frontier = grants.zip(cums).collectFirst {
        case ((_, i), c) if c > consumed => i
      }
      (bal == lots.map(_._2).sum) :| s"balance: $bal vs queue" &&
        (nLots - exhausted == lots.length) :| "open-lot count" &&
        (frontier == lots.headOption.map(_._1)) :| "FIFO frontier"
    })
  }

  test("q172 sweep island algebra equals a literal day-set union") {
    val spans = Gen.listOf(for {
      open <- Gen.chooseNum(0L, 60L)
      len <- Gen.chooseNum(0L, 10L)
    } yield (open, open + len))
    check(Prop.forAll(spans) { ss: List[(Long, Long)] =>
      val days = ss.flatMap { case (lo, hi) => lo to hi }.toSet
      val wantPeriods = days.count(d => !days.contains(d - 1))
      val wantCovered = days.size.toLong
      // the sweep: sort by (open, close), running max of close over
      // strictly preceding rows; new period iff open > prevMax + 1
      val sorted = ss.sorted
      var (prevMax, periods) = (Long.MinValue, 0L)
      var covered = 0L
      var (pStart, pEnd) = (0L, 0L)
      sorted.foreach { case (open, close) =>
        if (prevMax == Long.MinValue || open > prevMax + 1) {
          if (periods > 0) covered += pEnd - pStart + 1
          periods += 1; pStart = open; pEnd = close
        } else pEnd = math.max(pEnd, close)
        prevMax = math.max(prevMax, close)
      }
      if (periods > 0) covered += pEnd - pStart + 1
      (periods == wantPeriods) :| s"periods: $periods vs $wantPeriods" &&
        (covered == wantCovered) :| s"covered: $covered vs $wantCovered"
    })
  }

  test("q178 contribution explode equals a literal centered window") {
    val series = Gen.listOf(Gen.chooseNum(0L, 1000L)).map(_.zipWithIndex)
    check(Prop.forAll(series) { sv: List[(Long, Int)] =>
      // contribution explode: month m feeds centers m-6..m+6; keep
      // centers that exist and collected exactly 13 contributions
      val present = sv.map(_._2).toSet
      val contrib = sv.flatMap { case (v, m) => (-6 to 6).map(o => (m + o, v)) }
        .groupBy(_._1).map { case (c, vs) => c -> (vs.map(_._2).sum, vs.size) }
      val explodeForm = contrib.collect {
        case (c, (sum, 13)) if present(c) => c -> sum
      }
      // literal centered window over the contiguous series
      val byIdx = sv.map { case (v, m) => m -> v }.toMap
      val windowForm = sv.flatMap { case (_, m) =>
        val win = (m - 6 to m + 6).flatMap(byIdx.get)
        if (win.size == 13) Some(m -> win.sum) else None
      }.toMap
      (explodeForm == windowForm) :| s"$explodeForm vs $windowForm"
    })
  }
}
