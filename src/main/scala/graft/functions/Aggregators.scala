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
