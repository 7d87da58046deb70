package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregation through the Dataset `Aggregator` API — the
  * type-safe sibling of the untyped decSum2 path. The buffer carries an
  * EXACT decimal sum (scale 2, HALF_UP — the same semantics as
  * `CAST(value AS DECIMAL(18,2))`, via BigDecimal.valueOf = the
  * toString-based conversion both engines use), so partition count and
  * merge order cannot change the result; the mean is one double division
  * at the end. Registered per-key through KeyValueGroupedDataset.agg. */
object ExactMeanAgg
    extends Aggregator[(String, Double), (java.math.BigDecimal, Long), Double] {
  private val HalfUp = java.math.RoundingMode.HALF_UP
  def zero: (java.math.BigDecimal, Long) = (java.math.BigDecimal.ZERO, 0L)
  def reduce(b: (java.math.BigDecimal, Long), v: (String, Double)): (java.math.BigDecimal, Long) =
    (b._1.add(java.math.BigDecimal.valueOf(v._2).setScale(2, HalfUp)), b._2 + 1)
  def merge(a: (java.math.BigDecimal, Long), b: (java.math.BigDecimal, Long)): (java.math.BigDecimal, Long) =
    (a._1.add(b._1), a._2 + b._2)
  def finish(b: (java.math.BigDecimal, Long)): Double =
    if (b._2 == 0) 0.0 else b._1.doubleValue() / b._2
  def bufferEncoder: Encoder[(java.math.BigDecimal, Long)] =
    Encoders.tuple(Encoders.DECIMAL, Encoders.scalaLong)
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
