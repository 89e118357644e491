package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Two-sided theta sketch aggregate: one pass over (value, side) rows
  * builds a sketch per side; eval returns (a, b, intersection) cardinality
  * estimates. Theta is the sketch family that supports set INTERSECTION —
  * HLL cannot — and its state is a deterministic function of the input
  * SET (hash-based sampling, order-independent), so estimates are
  * replay-stable: exact below the sketch's nominal entries, bounded-error
  * beyond. The 100 TB shape for "customers active in BOTH periods"
  * without shuffling either side's keys.
  */
final case class ThetaIntersectAgg(
    value: Expression,
    side: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[(Union, Union)] {

  override def children: Seq[Expression] = Seq(value, side)
  override def nullable: Boolean = false
  override def dataType: DataType = new StructType()
    .add("a_est", DoubleType).add("b_est", DoubleType)
    .add("inter_est", DoubleType)

  override def checkInputDataTypes(): TypeCheckResult =
    if (value.dataType == LongType && side.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_intersect expects (BIGINT value, INT side), got " +
        s"(${value.dataType.sql}, ${side.dataType.sql})")

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0), side = newChildren(1))
  override def withNewMutableAggBufferOffset(o: Int): ThetaIntersectAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaIntersectAgg =
    copy(inputAggBufferOffset = o)

  private def newUnion(): Union = SetOperation.builder().buildUnion()

  override def createAggregationBuffer(): (Union, Union) =
    (newUnion(), newUnion())

  override def update(buf: (Union, Union), input: InternalRow): (Union, Union) = {
    val v = value.eval(input)
    val s = side.eval(input)
    if (v != null && s != null) {
      val target = if (s.asInstanceOf[Int] == 0) buf._1 else buf._2
      target.update(v.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: (Union, Union), b: (Union, Union)): (Union, Union) = {
    a._1.union(b._1.getResult)
    a._2.union(b._2.getResult)
    a
  }

  override def eval(buf: (Union, Union)): Any = {
    val ca = buf._1.getResult
    val cb = buf._2.getResult
    val inter = SetOperation.builder().buildIntersection()
    inter.intersect(ca)
    inter.intersect(cb)
    new GenericInternalRow(Array[Any](
      ca.getEstimate, cb.getEstimate, inter.getResult.getEstimate))
  }

  override def serialize(buf: (Union, Union)): Array[Byte] = {
    val a = buf._1.getResult.toByteArray
    val b = buf._2.getResult.toByteArray
    val out = java.nio.ByteBuffer.allocate(8 + a.length + b.length)
    out.putInt(a.length).put(a).putInt(b.length).put(b)
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): (Union, Union) = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    def readSide(): Union = {
      val n = in.getInt
      val arr = new Array[Byte](n)
      in.get(arr)
      val u = newUnion()
      u.union(Memory.wrap(arr))
      u
    }
    (readSide(), readSide())
  }

  override def prettyName: String = "theta_intersect"
}
