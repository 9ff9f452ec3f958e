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
