package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface: a weighted-mean `Aggregator` for corpus quality
  * scores (mean quality weighted by token count — long docs count more).
  *
  * `Aggregator[IN, BUF, OUT]` is the user-facing typed custom-aggregate
  * API: `reduce` runs map-side (partial aggregation), `merge` combines
  * partials after the shuffle — so the shuffle carries one (sum, weight)
  * pair per group, exactly like a built-in agg. Numeric caveat: float
  * summation order varies with partitioning, so outputs are
  * run-deterministic only after rounding — which is why this surface is
  * spec-tested rather than oracle-hashed.
  */
object QualityAggregator extends Aggregator[(Double, Long), (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)

  override def reduce(b: (Double, Long), in: (Double, Long)): (Double, Long) =
    (b._1 + in._1 * in._2, b._2 + in._2)

  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(r: (Double, Long)): Double =
    if (r._2 == 0L) 0.0 else r._1 / r._2

  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
