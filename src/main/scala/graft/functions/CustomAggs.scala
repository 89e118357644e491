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

/** Bounded top-k-per-group aggregate as a `TypedImperativeAggregate` — the
  * heavy-state UDAF tier. Each partition keeps at most k (key, value)
  * pairs; partial buffers MERGE map-side, so a group's rows never shuffle —
  * only k-row heaps do. That is the 100 TB shape for "top k per group":
  * window `row_number` ships every row to the group's partition first,
  * this ships k. Total order (value desc, key asc) makes results
  * deterministic under any partial-aggregation order.
  *
  * Key is LongType, value DoubleType (the id/measure case); outputs the
  * best-first array of (key, value) structs.
  */
final case class TopKByValue(
    key: org.apache.spark.sql.catalyst.expressions.Expression,
    value: org.apache.spark.sql.catalyst.expressions.Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[(Long, Double)]] {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types._
  import scala.collection.mutable.ArrayBuffer

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(key, value)
  override def nullable: Boolean = false

  // fail at analysis, not with a ClassCastException on an executor
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (key.dataType == org.apache.spark.sql.types.LongType &&
        value.dataType == org.apache.spark.sql.types.DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_by_value expects (BIGINT key, DOUBLE value), got " +
        s"(${key.dataType.sql}, ${value.dataType.sql})")
  }
  override def dataType: DataType = ArrayType(
    new StructType().add("key", LongType).add("value", DoubleType),
    containsNull = false)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0), value = newChildren(1))

  override def withNewMutableAggBufferOffset(o: Int): TopKByValue =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByValue =
    copy(inputAggBufferOffset = o)

  override def createAggregationBuffer(): ArrayBuffer[(Long, Double)] =
    ArrayBuffer.empty

  /** a strictly better than b: higher value, then lower key.
    * java.lang.Double.compare keeps the order TOTAL for NaN/-0.0 (Spark's
    * own double sort order) — `>`/`==` would make NaN tie with everything
    * and break sortWith's contract. */
  private def better(a: (Long, Double), b: (Long, Double)): Boolean = {
    val c = java.lang.Double.compare(a._2, b._2)
    c > 0 || (c == 0 && a._1 < b._1)
  }

  private def insert(buf: ArrayBuffer[(Long, Double)],
      cand: (Long, Double)): Unit =
    if (buf.length < k) buf += cand
    else {
      var worst = 0
      var i = 1
      while (i < buf.length) { if (better(buf(worst), buf(i))) worst = i; i += 1 }
      if (better(cand, buf(worst))) buf(worst) = cand
    }

  override def update(buf: ArrayBuffer[(Long, Double)],
      input: InternalRow): ArrayBuffer[(Long, Double)] = {
    val kv = key.eval(input)
    val vv = value.eval(input)
    if (kv != null && vv != null)
      insert(buf, (kv.asInstanceOf[Long], vv.asInstanceOf[Double]))
    buf
  }

  override def merge(a: ArrayBuffer[(Long, Double)],
      b: ArrayBuffer[(Long, Double)]): ArrayBuffer[(Long, Double)] = {
    b.foreach(insert(a, _))
    a
  }

  override def eval(buf: ArrayBuffer[(Long, Double)]): Any =
    new GenericArrayData(
      buf.sortWith(better).map { case (kk, vv) =>
        new GenericInternalRow(Array[Any](kk, vv))
      }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Long, Double)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (kk, vv) => out.writeLong(kk); out.writeDouble(vv) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Double)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[(Long, Double)]
    var i = 0
    while (i < n) { buf += ((in.readLong(), in.readDouble())); i += 1 }
    buf
  }

  override def prettyName: String = "topk_by_value"
}
