package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Order-independent value statistics: count, min, max, and an exact sum
  * held as integer cents (2-dp doubles → long), so merge order across
  * partitions can never change the result — the property a custom UDAF
  * must have to be deterministic under Spark's partial aggregation.
  */
final case class ValueStats(n: Long, minV: Double, maxV: Double, cents: Long)

object ValueStatsAgg extends Aggregator[Double, ValueStats, ValueStats] {
  def zero: ValueStats = ValueStats(0L, Double.PositiveInfinity, Double.NegativeInfinity, 0L)

  def reduce(b: ValueStats, v: Double): ValueStats =
    ValueStats(b.n + 1, math.min(b.minV, v), math.max(b.maxV, v),
      b.cents + math.round(v * 100))

  def merge(a: ValueStats, b: ValueStats): ValueStats =
    ValueStats(a.n + b.n, math.min(a.minV, b.minV), math.max(a.maxV, b.maxV),
      a.cents + b.cents)

  def finish(r: ValueStats): ValueStats = r

  def bufferEncoder: Encoder[ValueStats] = Encoders.product[ValueStats]
  def outputEncoder: Encoder[ValueStats] = Encoders.product[ValueStats]
}
