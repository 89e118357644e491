package graft.sources

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector with the reference's OData pushdown surface:
  * `$filter` (SupportsPushDownFilters), `$select`
  * (SupportsPushDownRequiredColumns) and `$top` (SupportsPushDownLimit) —
  * the rewrites the reference hand-rolls into request URLs
  * (resources/priorityDataSource.py:685,697-703,709-710) become Catalyst
  * pushdowns into this scan.
  *
  * The remote service is simulated by [[ODataTestServer]]: entities are
  * registered driver-side (as a bounded ERP REST endpoint would respond) and
  * served in pages — one InputPartition per page, the shape a real
  * `$skiptoken`-paging connector has (the reference notably does NOT page:
  * SURVEY §4.2). The server evaluates pushed predicates/projections/limits
  * itself, so what Spark doesn't push, Spark re-applies — both halves are
  * observable in tests.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.ODataSource")
  *     .option("entity", "customer").option("pageSize", "1000").load()
  * }}}
  */
class ODataSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val entity = options.get("entity")
    require(entity != null, "graft.sources.ODataSource requires .option(\"entity\", <name>)")
    ODataTestServer.schemaOf(entity)
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new ODataTable(properties.get("entity"), schema,
      Option(properties.get("pageSize")).map(_.toInt).getOrElse(1000))

  override def supportsExternalMetadata(): Boolean = true
}

final class ODataTable(entity: String, schema0: StructType, pageSize: Int)
    extends Table with SupportsRead {

  override def name(): String = s"odata:$entity"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ODataScanBuilder(entity, schema0, pageSize)
}

/** Aggregates the service can compute itself (OData `$apply=aggregate`). */
sealed trait ODataAgg
object ODataAgg {
  case object CountAll extends ODataAgg
  final case class MinOf(col: String) extends ODataAgg
  final case class MaxOf(col: String) extends ODataAgg
}

final class ODataScanBuilder(entity: String, full: StructType, pageSize: Int)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit
    with SupportsPushDownAggregates {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = full
  private var limit: Option[Int] = None
  private var aggs: Option[Seq[ODataAgg]] = None

  private def translateAggs(agg: Aggregation): Option[Seq[ODataAgg]] = {
    if (agg.groupByExpressions.nonEmpty) return None
    val specs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(ODataAgg.CountAll)
      case m: Min => m.column match {
        case n: NamedReference if n.fieldNames.length == 1 =>
          Some(ODataAgg.MinOf(n.fieldNames.head))
        case _ => None
      }
      case m: Max => m.column match {
        case n: NamedReference if n.fieldNames.length == 1 =>
          Some(ODataAgg.MaxOf(n.fieldNames.head))
        case _ => None
      }
      case _ => None
    }
    if (specs.forall(_.isDefined)) Some(specs.flatten) else None
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translateAggs(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    translateAggs(agg) match {
      case some @ Some(_) => aggs = some; true
      case None => false
    }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rejected) = filters.partition(f =>
      ODataTestServer.supportsFilter(f) &&
        f.references.forall(c => full.fields.find(_.name == c)
          .exists(sf => ODataTestServer.comparableType(sf.dataType))))
    pushed = supported
    rejected // residual filters Spark must evaluate itself
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }

  override def build(): Scan = aggs match {
    case Some(specs) =>
      new ODataAggScan(entity, full, pushed, specs)
    case None =>
      new ODataScan(entity, required, pushed, limit, pageSize)
  }
}

/** Completely-pushed aggregation: the "service" answers with a single row
  * (OData `$apply=aggregate(...)`), so Spark plans no aggregation at all. */
final class ODataAggScan(
    entity: String,
    full: StructType,
    filters: Array[Filter],
    specs: Seq[ODataAgg]) extends Scan with Batch {

  override def readSchema(): StructType = StructType(specs.zipWithIndex.map {
    case (ODataAgg.CountAll, i) => StructField(s"agg_$i", LongType, nullable = false)
    case (ODataAgg.MinOf(c), i) => StructField(s"agg_$i", full(c).dataType)
    case (ODataAgg.MaxOf(c), i) => StructField(s"agg_$i", full(c).dataType)
  })

  override def description(): String =
    s"ODataAggScan(entity=$entity, $$apply=aggregate(${specs.mkString(", ")}))"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val row = ODataTestServer.aggregate(entity, filters, specs)
    Array(ODataPage(0, Seq(row), readSchema()))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new ODataPageReader(p.asInstanceOf[ODataPage])
    }
}

final class ODataScan(
    entity: String,
    required: StructType,
    filters: Array[Filter],
    limit: Option[Int],
    pageSize: Int) extends Scan with Batch {

  override def readSchema(): StructType = required

  override def description(): String = {
    val f = if (filters.isEmpty) "" else
      " $filter=" + filters.map(_.toString).mkString(" and ")
    val t = limit.map(n => s" $$top=$n").getOrElse("")
    s"ODataScan(entity=$entity, $$select=${required.fieldNames.mkString(",")}$f$t)"
  }

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    // The "HTTP fetch": the server answers the pushed query in pages.
    val pages = ODataTestServer.query(entity, required, filters, limit, pageSize)
    pages.zipWithIndex
      .map { case (rows, i) => ODataPage(i, rows, required): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new ODataPageReader(p.asInstanceOf[ODataPage])
    }
}

/** One page of the simulated response, shipped to the executor. */
final case class ODataPage(
    pageNo: Int,
    rows: Seq[Seq[Any]],
    schema: StructType) extends InputPartition

final class ODataPageReader(page: ODataPage) extends PartitionReader[InternalRow] {
  private val it = page.rows.iterator
  private var current: InternalRow = _

  override def next(): Boolean =
    if (it.hasNext) { current = toInternal(it.next()); true } else false

  override def get(): InternalRow = current
  override def close(): Unit = ()

  private def toInternal(row: Seq[Any]): InternalRow = {
    val vals = page.schema.fields.zip(row).map {
      case (_, null) => null
      case (StructField(_, StringType, _, _), v) => UTF8String.fromString(v.toString)
      case (StructField(_, TimestampType, _, _), v: java.sql.Timestamp) =>
        DateTimeUtils.fromJavaTimestamp(v)
      case (StructField(_, TimestampType, _, _), v: java.time.Instant) =>
        DateTimeUtils.instantToMicros(v)
      case (StructField(_, TimestampNTZType, _, _), v: java.time.LocalDateTime) =>
        DateTimeUtils.localDateTimeToMicros(v)
      case (StructField(_, DateType, _, _), v: java.sql.Date) =>
        DateTimeUtils.fromJavaDate(v)
      case (StructField(_, DateType, _, _), v: java.time.LocalDate) =>
        DateTimeUtils.localDateToDays(v)
      case (StructField(_, dt: DecimalType, _, _), v: java.math.BigDecimal) =>
        org.apache.spark.sql.types.Decimal(v, dt.precision, dt.scale)
      case (f, v) if isPassthrough(f.dataType, v) => v
      case (f, v) =>
        sys.error(s"odata reader: unsupported ${f.dataType} value ${v.getClass}")
    }
    new GenericInternalRow(vals.toArray[Any])
  }

  private def isPassthrough(dt: DataType, v: Any): Boolean = (dt, v) match {
    case (LongType, _: java.lang.Long) => true
    case (IntegerType, _: java.lang.Integer) => true
    case (DoubleType, _: java.lang.Double) => true
    case (FloatType, _: java.lang.Float) => true
    case (BooleanType, _: java.lang.Boolean) => true
    case (ShortType, _: java.lang.Short) => true
    case (ByteType, _: java.lang.Byte) => true
    case (BinaryType, _: Array[Byte]) => true
    case _ => false
  }
}

/** The simulated Priority OData service: entity registry + query evaluator.
  * A real connector swaps this object for HTTP GETs with `$filter/$select/
  * $top/$skiptoken` query strings; everything else stays. */
object ODataTestServer {

  private val entities = new ConcurrentHashMap[String, (StructType, Seq[Seq[Any]])]()

  /** What the last scan asked of the "service" — observable in tests. */
  @volatile var lastRequest: String = ""

  /** Register an entity from a parquet table (driver-side, the bounded
    * response a demo ERP tenant returns). */
  def register(spark: SparkSession, entity: String, path: String): Unit = {
    val df = spark.read.parquet(path)
    val rows = df.collect().map(r => (0 until r.length)
      .map(i => r.get(i)).toSeq).toSeq
    entities.put(entity, (df.schema, rows))
  }

  def schemaOf(entity: String): StructType =
    Option(entities.get(entity))
      .getOrElse(sys.error(s"entity not registered: $entity"))._1

  /** Column types whose pushed-filter comparison the service implements;
    * filters on anything else stay residual (Spark evaluates them). */
  def comparableType(dt: DataType): Boolean = dt match {
    case StringType | TimestampType | TimestampNTZType | DateType |
         BooleanType | _: DecimalType => true
    case _: NumericType => true
    case _ => false
  }

  private def isIntegral(n: Number): Boolean = n match {
    case _: java.lang.Long | _: java.lang.Integer | _: java.lang.Short |
         _: java.lang.Byte => true
    case _ => false
  }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: java.sql.Timestamp, y: java.sql.Timestamp) => x.compareTo(y)
    case (x: java.sql.Timestamp, y: java.time.Instant) =>
      x.toInstant.compareTo(y)
    case (x: java.time.LocalDateTime, y: java.time.LocalDateTime) =>
      x.compareTo(y)
    case (x: java.time.LocalDateTime, y: java.sql.Timestamp) =>
      x.compareTo(y.toLocalDateTime)
    case (x: java.sql.Date, y: java.sql.Date) => x.compareTo(y)
    case (x: java.sql.Date, y: java.time.LocalDate) =>
      x.toLocalDate.compareTo(y)
    case (x: java.time.LocalDate, y: java.time.LocalDate) => x.compareTo(y)
    case (x: java.lang.Boolean, y: java.lang.Boolean) => x.compareTo(y)
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y)
    case (x: Number, y: Number) if isIntegral(x) && isIntegral(y) =>
      java.lang.Long.compare(x.longValue(), y.longValue()) // exact past 2^53
    case (x: java.math.BigDecimal, y: Number) =>
      x.compareTo(new java.math.BigDecimal(y.toString))
    case (x: Number, y: java.math.BigDecimal) =>
      new java.math.BigDecimal(x.toString).compareTo(y)
    case (x: Number, y: Number) =>
      java.lang.Double.compare(x.doubleValue(), y.doubleValue())
    case (x: String, y: String) => x.compareTo(y)
    case (x: UTF8String, y) => cmp(x.toString, y)
    case (x, y: UTF8String) => cmp(x, y.toString)
    case _ => sys.error(s"incomparable: $a vs $b")
  }

  private def evalFilter(f: Filter, row: Seq[Any], idx: Map[String, Int]): Boolean = {
    def value(col: String): Any = row(idx(col))
    f match {
      case EqualTo(c, v) => value(c) != null && cmp(value(c), v) == 0
      case GreaterThan(c, v) => value(c) != null && cmp(value(c), v) > 0
      case GreaterThanOrEqual(c, v) => value(c) != null && cmp(value(c), v) >= 0
      case LessThan(c, v) => value(c) != null && cmp(value(c), v) < 0
      case LessThanOrEqual(c, v) => value(c) != null && cmp(value(c), v) <= 0
      case IsNotNull(c) => value(c) != null
      case other => sys.error(s"unsupported pushed filter: $other")
    }
  }

  def supportsFilter(f: Filter): Boolean = f match {
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual |
         _: LessThan | _: LessThanOrEqual | _: IsNotNull => true
    case _ => false
  }

  /** Evaluate a completely-pushed aggregation (OData `$apply=aggregate`). */
  def aggregate(
      entity: String,
      filters: Array[Filter],
      specs: Seq[ODataAgg]): Seq[Any] = {
    val (schema, rows) = entities.get(entity)
    lastRequest = s"GET /$entity?$$apply=aggregate(" +
      specs.mkString(", ") + ")" +
      (if (filters.nonEmpty) s"&$$filter=${filters.mkString(" and ")}" else "")
    val idx = schema.fieldNames.zipWithIndex.toMap
    val kept = rows.filter(r => filters.forall(evalFilter(_, r, idx)))
    specs.map {
      case ODataAgg.CountAll => kept.size.toLong
      case ODataAgg.MinOf(c) =>
        val vs = kept.map(_(idx(c))).filter(_ != null)
        if (vs.isEmpty) null else vs.reduce((a, b) => if (cmp(a, b) <= 0) a else b)
      case ODataAgg.MaxOf(c) =>
        val vs = kept.map(_(idx(c))).filter(_ != null)
        if (vs.isEmpty) null else vs.reduce((a, b) => if (cmp(a, b) >= 0) a else b)
    }
  }

  /** Evaluate $filter/$select/$top and page the result. */
  def query(
      entity: String,
      required: StructType,
      filters: Array[Filter],
      limit: Option[Int],
      pageSize: Int): Seq[Seq[Seq[Any]]] = {

    val (schema, rows) = entities.get(entity)
    lastRequest = s"GET /$entity?$$select=${required.fieldNames.mkString(",")}" +
      (if (filters.nonEmpty) s"&$$filter=${filters.mkString(" and ")}" else "") +
      limit.map(n => s"&$$top=$n").getOrElse("")

    val idx = schema.fieldNames.zipWithIndex.toMap
    val proj = required.fieldNames.map(idx).toSeq
    val filtered = rows.iterator
      .filter(r => filters.forall(evalFilter(_, r, idx)))
      .map(r => proj.map(r))
    val limited = limit.map(n => filtered.take(n)).getOrElse(filtered).toSeq
    limited.grouped(pageSize).toSeq match {
      case Seq() => Seq(Seq.empty)
      case pages => pages
    }
  }
}
