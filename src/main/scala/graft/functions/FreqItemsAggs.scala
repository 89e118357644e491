package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (heavy-hitters) sketches over strings — the mergeable
  * top-k shape for token statistics: per-shard sketches track at most
  * `maxMapSize` counters (Misra-Gries style), merge associatively, and
  * report items with deterministic error bounds. While the live item count
  * stays under the map capacity the counts are EXACT, which is what makes
  * the small-scale oracle exact while the operator remains the 100 TB
  * shape (counters, not corpus, cross the wire).
  */
final case class FreqSketchAgg(
    child: Expression,
    maxMapSize: Int = 128,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] {

  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    "maxMapSize must be a power of 2 >= 8")

  @transient private lazy val serde = new ArrayOfStringsSerDe

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_sketch_agg expects STRING, got ${child.dataType.sql}")

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def withNewMutableAggBufferOffset(o: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = o)

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.toString)
    buf
  }

  override def merge(a: ItemsSketch[String], b: ItemsSketch[String]): ItemsSketch[String] = {
    a.merge(b)
    a
  }

  override def eval(buf: ItemsSketch[String]): Any = buf.toByteArray(serde)

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(serde)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  override def prettyName: String = "freq_sketch_agg"
}

/** Union of serialized frequent-items sketches → best-first top-k
  * `(token, est)` structs. NO_FALSE_NEGATIVES keeps every true heavy
  * hitter in the candidate set; (estimate desc, token asc) is a total
  * order, so output is deterministic whenever estimates are exact. */
final case class FreqMergeTopK(
    child: Expression,
    k: Int,
    maxMapSize: Int = 128,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] {

  require(k > 0, "k must be positive")
  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    "maxMapSize must be a power of 2 >= 8")

  @transient private lazy val serde = new ArrayOfStringsSerDe

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    new StructType().add("token", StringType).add("est", LongType),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_merge_topk expects BINARY sketches, got ${child.dataType.sql}")

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def withNewMutableAggBufferOffset(o: Int): FreqMergeTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqMergeTopK =
    copy(inputAggBufferOffset = o)

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(ItemsSketch.getInstance(
        Memory.wrap(v.asInstanceOf[Array[Byte]]), serde))
    buf
  }

  override def merge(a: ItemsSketch[String], b: ItemsSketch[String]): ItemsSketch[String] = {
    a.merge(b)
    a
  }

  override def eval(buf: ItemsSketch[String]): Any = {
    val rows = buf.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .map(r => (r.getItem, r.getEstimate))
      .sortBy { case (tok, est) => (-est, tok) }
      .take(k)
      .map { case (tok, est) =>
        new GenericInternalRow(
          Array[Any](UTF8String.fromString(tok), est))
      }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(serde)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  override def prettyName: String = "freq_merge_topk"
}
