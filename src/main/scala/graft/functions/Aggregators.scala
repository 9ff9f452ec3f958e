package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates (`org.apache.spark.sql.expressions.
  * Aggregator`) — the user-facing tier of Spark's custom-aggregation
  * stack (below it: DeclarativeAggregate / TypedImperativeAggregate
  * for engine-internal sketches; SURVEY.md §4 notes none are required
  * for reference parity, so these serve the extension surface).
  *
  * [[WeightedAvg]]: exact weighted mean with a (sum, weight) buffer —
  * partial-aggregable, so it map-side combines like any built-in.
  * Useful for fare-per-seat-km style KPIs where rows carry weights.
  */
object Aggregators {
  case class WeightedValue(value: Double, weight: Double)

  /** Count-min sketch as a typed Aggregator: the bounded-memory
    * heavy-hitters sketch (CMS estimate >= true count, and <= true
    * count + (e/width)·N with probability 1 - exp(-depth)).
    *
    * Division of labor keeps every row-level step inside codegen and
    * the two sides consistent BY CONSTRUCTION: the caller computes
    * the `depth` bucket indices as Column expressions
    * (`pmod(xxhash64(token, r), width)`) — so sketch BUILD and
    * query-time ESTIMATION share the exact same hash family with no
    * JVM-side re-implementation — and the aggregator only increments
    * a flat depth x width long table. The buffer is a few tens of KB
    * per partial, merge is elementwise add, so it map-side combines
    * like any built-in partial aggregate and the exchange carries one
    * table per map partition, never per row. */
  class CountMinSketch(val depth: Int, val width: Int)
    extends Aggregator[Seq[Int], Array[Long], Array[Long]] {
    require(depth > 0 && width > 0)
    override def zero: Array[Long] = new Array[Long](depth * width)
    override def reduce(b: Array[Long], idx: Seq[Int]): Array[Long] = {
      // fail loudly on build/probe drift: a caller whose array(...)
      // arity differs from this aggregator's depth would otherwise
      // throw IndexOutOfBounds per row (short) or silently drop hash
      // functions (long)
      require(idx.length == depth,
        s"CountMinSketch: caller passed ${idx.length} bucket indices, aggregator depth is $depth")
      var r = 0
      while (r < depth) { b(r * width + idx(r)) += 1L; r += 1 }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Bloom-filter bitmap build ([[graft.ops.BloomJoin]]): same
    * division of labor as [[CountMinSketch]] — the caller computes
    * the k bit positions as codegen'd column expressions and this
    * aggregator only sets bits in a flat m-bit long array. Partial-
    * aggregable: reduce sets, merge ORs, so the exchange carries one
    * m/8-byte bitmap per map partition. */
  class BloomBits(val mBits: Int) extends Aggregator[Seq[Int], Array[Long], Array[Long]] {
    require(mBits > 0 && mBits % 64 == 0, s"mBits $mBits must be a positive multiple of 64")
    override def zero: Array[Long] = new Array[Long](mBits / 64)
    override def reduce(b: Array[Long], pos: Seq[Int]): Array[Long] = {
      val it = pos.iterator
      while (it.hasNext) {
        val p = it.next()
        b(p >>> 6) |= 1L << (p & 63)
      }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Exact weighted mean over pre-scaled integer inputs: the caller
    * converts value to fixed-point units (`round(value * 10^scale)`
    * as LONG — exact for data with <= scale real decimal places) and
    * passes an integral weight. Long sums are exact and
    * order-independent, so unlike [[WeightedAvg]]'s double buffer the
    * result is partition-layout-invariant and can carry a DuckDB
    * oracle twin (the q90/q98 micro-ratio discipline applied to the
    * Aggregator surface). `finish` performs the only inexact steps —
    * long->double conversion, one descale, one division — each a
    * single deterministic IEEE operation both engines spell
    * identically.
    *
    * The 2^53 guard is transactional, not advisory (Qx.guarded's
    * rationale): past it the long sum no longer converts to DOUBLE
    * exactly and cross-engine bit-identity silently breaks, so fail
    * loudly instead. At larger scales callers shrink valueScale (buy
    * headroom) exactly like dsum's rescale ladder. */
  class WeightedAvgExact(valueScale: Int)
    extends Aggregator[(Long, Long), (Long, Long), Double] {
    private val descale = math.pow(10, valueScale)
    private val exactBound = 1L << 53
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), a: (Long, Long)): (Long, Long) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    override def merge(b1: (Long, Long), b2: (Long, Long)): (Long, Long) =
      (b1._1 + b2._1, b1._2 + b2._2)
    override def finish(r: (Long, Long)): Double = {
      require(math.abs(r._1) < exactBound && math.abs(r._2) < exactBound,
        s"WeightedAvgExact: scaled sum ${r._1}/${r._2} exceeds 2^53 — " +
          "no longer double-exact; reduce valueScale for headroom")
      if (r._2 == 0L) Double.NaN else (r._1.toDouble / descale) / r._2.toDouble
    }
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  object WeightedAvg extends Aggregator[WeightedValue, (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), a: WeightedValue): (Double, Double) =
      (b._1 + a.value * a.weight, b._2 + a.weight)
    override def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
      (b1._1 + b2._1, b1._2 + b2._2)
    override def finish(r: (Double, Double)): Double =
      if (r._2 == 0.0) Double.NaN else r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
