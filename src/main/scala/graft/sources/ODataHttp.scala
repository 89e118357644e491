package graft.sources

import java.net.{InetSocketAddress, URLDecoder, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.Row
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, NullOrdering, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** REAL HTTP transport for the OData connector.
  *
  * The DSv2 connector in [[ODataSource]] implements the full pushdown
  * surface against an in-process registry — its one admitted gap was the
  * socket: pages were served by a method call, not a network request
  * (reference transport: HTTPS GETs with basic auth and OData query
  * options, resources/priorityDataSource.py:246-256,639-746). This module
  * closes that gap with pure-JDK machinery:
  *
  *   - [[ODataHttpServer]]: an actual `com.sun.net.httpserver.HttpServer`
  *     bound to 127.0.0.1 on an ephemeral port, fronting the same entity
  *     registry. Speaks OData-shaped JSON: `value` row arrays,
  *     `@odata.nextLink` continuation with `$skiptoken`, basic-auth 401
  *     challenges, and `$select/$filter/$top` query options parsed
  *     server-side from the URL.
  *   - [[ODataHttpSource]]: a DataSource V2 provider whose scan planning
  *     does an HTTP preflight (page count + registry generation) and whose
  *     readers fetch their page with `java.net.http.HttpClient` —
  *     EXECUTOR-side, over a real TCP socket, with auth headers.
  *
  * What stays simulated: the dataset behind the server (a demo tenant in
  * this JVM's memory — the same boundary as before). The schema channel is
  * the real contract end-to-end: `GET $metadata` serves EDMX (entity
  * Properties + Key refs + NavigationProperty subforms), and
  * [[ODataHttpSource.inferSchema]] walks that wire document with
  * [[graft.schema.MetadataXml]] — the reference's discovery loop
  * (priorityDataSource.py:347-458) over an actual socket.
  */
object ODataJson {

  /** schema-driven value → JSON (OData v4 literal shapes: ISO-8601
    * timestamps, decimals as strings to keep exactness, binary as
    * base64). */
  def writeValue(mapper: ObjectMapper, node: ObjectNode, name: String,
      dt: DataType, v: Any): Unit = {
    if (v == null) { node.putNull(name); return }
    dt match {
      case LongType => node.put(name, v.asInstanceOf[Number].longValue)
      case IntegerType | ShortType | ByteType =>
        node.put(name, v.asInstanceOf[Number].intValue)
      case DoubleType => node.put(name, v.asInstanceOf[Number].doubleValue)
      case FloatType => node.put(name, v.asInstanceOf[Number].floatValue)
      case BooleanType => node.put(name, v.asInstanceOf[java.lang.Boolean])
      case StringType => node.put(name, v.toString)
      case _: DecimalType =>
        node.put(name, v.asInstanceOf[java.math.BigDecimal].toPlainString)
      case TimestampType => v match {
        case t: java.sql.Timestamp => node.put(name, t.toInstant.toString)
        case i: java.time.Instant => node.put(name, i.toString)
      }
      case TimestampNTZType =>
        node.put(name, v.asInstanceOf[java.time.LocalDateTime].toString)
      case DateType => v match {
        case d: java.sql.Date => node.put(name, d.toLocalDate.toString)
        case d: java.time.LocalDate => node.put(name, d.toString)
      }
      case BinaryType => node.put(name, v.asInstanceOf[Array[Byte]])
      case ArrayType(et, _) =>
        val arr = node.putArray(name)
        v.asInstanceOf[scala.collection.Seq[_]].foreach(e =>
          writeElement(mapper, arr, et, e))
      case st: StructType =>
        node.set[JsonNode](name, rowToJson(mapper, st, v.asInstanceOf[Row]))
        ()
      case other => sys.error(s"odata-http serde: unsupported type $other")
    }
  }

  private def writeElement(mapper: ObjectMapper, arr: ArrayNode,
      dt: DataType, v: Any): Unit = {
    // elements ride through a one-field wrapper to reuse writeValue
    val tmp = mapper.createObjectNode()
    writeValue(mapper, tmp, "e", dt, v)
    arr.add(tmp.get("e"))
  }

  def rowToJson(mapper: ObjectMapper, schema: StructType, row: Row): ObjectNode = {
    val node = mapper.createObjectNode()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      writeValue(mapper, node, f.name, f.dataType, row.get(i))
    }
    node
  }

  /** Registry rows are plain Seq[Any]; same shape, no Row allocation. */
  def seqToJson(mapper: ObjectMapper, schema: StructType, row: Seq[Any]): ObjectNode = {
    val node = mapper.createObjectNode()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      writeValue(mapper, node, f.name, f.dataType, row(i))
    }
    node
  }

  /** JSON → external JVM value (the shapes [[ODataRowsReader]] converts
    * to Catalyst: java.sql types, BigDecimal, Seq, Row). */
  def readValue(dt: DataType, n: JsonNode): Any = {
    if (n == null || n.isNull) return null
    dt match {
      case LongType => java.lang.Long.valueOf(n.asLong)
      case IntegerType => java.lang.Integer.valueOf(n.asInt)
      case ShortType => java.lang.Short.valueOf(n.asInt.toShort)
      case ByteType => java.lang.Byte.valueOf(n.asInt.toByte)
      case DoubleType => java.lang.Double.valueOf(n.asDouble)
      case FloatType => java.lang.Float.valueOf(n.floatValue)
      case BooleanType => java.lang.Boolean.valueOf(n.asBoolean)
      case StringType => n.asText
      case _: DecimalType => new java.math.BigDecimal(n.asText)
      case TimestampType =>
        java.sql.Timestamp.from(java.time.Instant.parse(n.asText))
      case TimestampNTZType => java.time.LocalDateTime.parse(n.asText)
      case DateType => java.sql.Date.valueOf(java.time.LocalDate.parse(n.asText))
      case BinaryType => n.binaryValue
      case ArrayType(et, _) =>
        import scala.jdk.CollectionConverters._
        n.elements().asScala.map(readValue(et, _)).toVector
      case st: StructType =>
        Row.fromSeq(st.fields.map(f => readValue(f.dataType, n.get(f.name))).toSeq)
      case other => sys.error(s"odata-http serde: unsupported type $other")
    }
  }

  def jsonToSeq(schema: StructType, n: JsonNode): Seq[Any] =
    schema.fields.map(f => readValue(f.dataType, n.get(f.name))).toSeq
}

/** OData `$filter` expression syntax: the CLIENT renders Spark pushed
  * filters into the wire grammar; the SERVER parses the wire grammar back
  * against the entity schema. Conjunctions of binary comparisons plus the
  * `ne null` existence probe — exactly the subset the registry evaluator
  * implements ([[ODataTestServer.supportsFilter]]). */
object ODataFilterSyntax {

  def render(filters: Seq[Filter]): String = filters.map(term).mkString(" and ")

  private def term(f: Filter): String = f match {
    case EqualTo(c, v) => s"$c eq ${lit(v)}"
    case GreaterThan(c, v) => s"$c gt ${lit(v)}"
    case GreaterThanOrEqual(c, v) => s"$c ge ${lit(v)}"
    case LessThan(c, v) => s"$c lt ${lit(v)}"
    case LessThanOrEqual(c, v) => s"$c le ${lit(v)}"
    case IsNotNull(c) => s"$c ne null"
    case other => sys.error(s"odata-http: unrenderable filter $other")
  }

  private def lit(v: Any): String = v match {
    case s: String => "'" + s.replace("'", "''") + "'"
    case s: org.apache.spark.unsafe.types.UTF8String =>
      "'" + s.toString.replace("'", "''") + "'"
    case t: java.sql.Timestamp => s"datetime'${t.toInstant}'"
    case i: java.time.Instant => s"datetime'$i'"
    case d: java.time.LocalDateTime => s"datetime'$d'" // TIMESTAMP_NTZ literal
    case d: java.sql.Date => s"date'${d.toLocalDate}'"
    case d: java.time.LocalDate => s"date'$d'"
    case b: java.lang.Boolean => b.toString
    case d: java.math.BigDecimal => d.toPlainString
    case n: Number => n.toString
    case other => sys.error(s"odata-http: unrenderable literal $other")
  }

  /** Split on top-level " and " (string literals may contain the word). */
  private def splitConjuncts(s: String): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var inQuote = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') { inQuote = !inQuote; cur += c; i += 1 }
      else if (!inQuote && s.startsWith(" and ", i)) {
        out += cur.toString; cur.clear(); i += 5
      } else { cur += c; i += 1 }
    }
    if (cur.nonEmpty) out += cur.toString
    out.toList
  }

  private val Term = "^(\\w+) (eq|gt|ge|lt|le|ne) (.+)$".r

  def parse(s: String, schema: StructType): Array[Filter] =
    splitConjuncts(s).map {
      case Term(col, "ne", "null") => IsNotNull(col)
      case Term(col, op, rhs) =>
        val v = parseLit(rhs, schema(col).dataType)
        op match {
          case "eq" => EqualTo(col, v)
          case "gt" => GreaterThan(col, v)
          case "ge" => GreaterThanOrEqual(col, v)
          case "lt" => LessThan(col, v)
          case "le" => LessThanOrEqual(col, v)
        }
      case other => sys.error(s"odata-http: bad \\$$filter term '$other'")
    }.toArray

  /** `$apply` aggregate wire form: "count" | "min:col" | "max:col" |
    * "sum:col", comma-joined (a canonical compaction of OData's
    * `aggregate(col with min as a, ...)` — both ends are ours). */
  def renderAggs(specs: Seq[ODataAgg]): String = specs.map {
    case ODataAgg.CountAll => "count"
    case ODataAgg.MinOf(c) => s"min:$c"
    case ODataAgg.MaxOf(c) => s"max:$c"
    case ODataAgg.SumOf(c) => s"sum:$c"
  }.mkString(",")

  /** An empty spec list is legal: a zero-aggregate groupby is how Spark
    * pushes DISTINCT-on-group-keys (e.g. count() over a grouped result). */
  def parseAggs(s: String): Seq[ODataAgg] =
    s.split(',').toSeq.map(_.trim).filter(_.nonEmpty).map {
      case "count" => ODataAgg.CountAll
      case spec if spec.startsWith("min:") => ODataAgg.MinOf(spec.drop(4))
      case spec if spec.startsWith("max:") => ODataAgg.MaxOf(spec.drop(4))
      case spec if spec.startsWith("sum:") => ODataAgg.SumOf(spec.drop(4))
      case other => sys.error(s"odata-http: bad aggregate spec '$other'")
    }

  /** Result schema of a pushed aggregate: group keys first, aggregates
    * after — the contract both the server's serialization and the
    * client's parse share (mirrors ODataAggScan.readSchema). */
  def aggSchema(full: StructType, specs: Seq[ODataAgg],
      groupCols: Seq[String]): StructType = StructType(
    groupCols.map(c => full(c)) ++ specs.zipWithIndex.map {
      case (ODataAgg.CountAll, i) => StructField(s"agg_$i", LongType, nullable = false)
      case (ODataAgg.MinOf(c), i) => StructField(s"agg_$i", full(c).dataType)
      case (ODataAgg.MaxOf(c), i) => StructField(s"agg_$i", full(c).dataType)
      case (ODataAgg.SumOf(c), i) => StructField(s"agg_$i", full(c).dataType match {
        case DoubleType => DoubleType
        case _ => LongType
      })
    })

  /** `$orderby` wire form: "col asc|desc nullsfirst|nullslast" keys,
    * comma-joined — null placement is explicit so the service's sort is
    * bit-identical to the Spark sort it replaces. */
  def renderOrderBy(keys: Seq[ODataSortKey]): String =
    keys.map(k => s"${k.col} ${if (k.asc) "asc" else "desc"} " +
      (if (k.nullsFirst) "nullsfirst" else "nullslast")).mkString(",")

  def parseOrderBy(s: String): Seq[ODataSortKey] =
    s.split(',').toSeq.map { k =>
      k.trim.split(' ') match {
        case Array(col, dir, nulls) =>
          ODataSortKey(col, dir == "asc", nulls == "nullsfirst")
        case other => sys.error(s"odata-http: bad $$orderby key '$k'")
      }
    }

  private def parseLit(s: String, dt: DataType): Any = dt match {
    case StringType =>
      require(s.length >= 2 && s.head == '\'' && s.last == '\'', s)
      s.substring(1, s.length - 1).replace("''", "'")
    case TimestampType =>
      require(s.startsWith("datetime'") && s.endsWith("'"), s)
      java.sql.Timestamp.from(
        java.time.Instant.parse(s.substring(9, s.length - 1)))
    case TimestampNTZType =>
      require(s.startsWith("datetime'") && s.endsWith("'"), s)
      java.time.LocalDateTime.parse(s.substring(9, s.length - 1))
    case DateType =>
      require(s.startsWith("date'") && s.endsWith("'"), s)
      java.sql.Date.valueOf(java.time.LocalDate.parse(s.substring(5, s.length - 1)))
    case LongType => java.lang.Long.valueOf(s)
    case IntegerType => java.lang.Integer.valueOf(s)
    case ShortType => java.lang.Short.valueOf(s)
    case ByteType => java.lang.Byte.valueOf(s)
    case DoubleType => java.lang.Double.valueOf(s)
    case FloatType => java.lang.Float.valueOf(s)
    case BooleanType => java.lang.Boolean.valueOf(s)
    case _: DecimalType => new java.math.BigDecimal(s)
    case other => sys.error(s"odata-http: unfilterable type $other")
  }
}

/** The tenant's OData endpoint as an ACTUAL localhost HTTP service: same
  * registry and query evaluator as [[ODataTestServer]], but every page now
  * crosses a real TCP socket with basic auth, URL-encoded OData query
  * options, JSON bodies, and `@odata.nextLink` continuation. One instance
  * per JVM on an ephemeral port (no fixed-port collisions across
  * concurrently-forked test/bench JVMs). */
object ODataHttpServer {

  val user = "apiuser"
  val pass = "demo-secret"

  private val mapper = new ObjectMapper()

  /** Recent served request lines, oldest first — test observability.
    * Capped so a long bench JVM (hundreds of paged scans) doesn't grow
    * the log without bound. */
  val requestLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val MaxLog = 10000
  // CLQ.size() is an O(n) traversal — track the count separately so the
  // cap costs O(1) per request
  private val logSize = new java.util.concurrent.atomic.AtomicInteger()
  private def logRequest(line: String): Unit = {
    requestLog.add(line)
    if (logSize.incrementAndGet() > MaxLog && requestLog.poll() != null)
      logSize.decrementAndGet()
  }

  private lazy val running: HttpServer = {
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/odata", handle _)
    // EVERY server thread must be daemon, or a `runMain` JVM never exits:
    // sbt's forked run waits for natural JVM death (unlike test forks,
    // which System.exit), and DestroyJavaVM would wait on these threads
    // forever after main returns
    srv.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8,
      new java.util.concurrent.ThreadFactory {
        private val n = new java.util.concurrent.atomic.AtomicInteger()
        override def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"odata-http-${n.incrementAndGet()}")
          t.setDaemon(true); t
        }
      }))
    // HttpServer spawns its dispatcher from the thread calling start() and
    // the new thread INHERITS daemon status — start from a daemon thread
    // so the dispatcher can't pin the JVM either
    val starter = new Thread(() => srv.start(), "odata-http-starter")
    starter.setDaemon(true)
    starter.start()
    starter.join()
    srv
  }

  def endpoint: String =
    s"http://127.0.0.1:${running.getAddress.getPort}/odata"

  private def respond(x: HttpExchange, code: Int, body: Array[Byte],
      headers: (String, String)*): Unit = {
    headers.foreach { case (k, v) => x.getResponseHeaders.set(k, v) }
    x.sendResponseHeaders(code, body.length)
    val os = x.getResponseBody
    try os.write(body) finally os.close()
  }

  private def authorized(x: HttpExchange): Boolean = {
    val expect = "Basic " + Base64.getEncoder
      .encodeToString(s"$user:$pass".getBytes(UTF_8))
    Option(x.getRequestHeaders.getFirst("Authorization")).contains(expect)
  }

  private def parseQuery(raw: String): Map[String, String] =
    raw.split('&')
      .filter(_.nonEmpty)
      .map { kv =>
        kv.indexOf('=') match {
          // a value-less token ("?$preflight") is a presence flag keyed by
          // its own name, not an empty-string key
          case -1 => URLDecoder.decode(kv, UTF_8) -> ""
          case i => URLDecoder.decode(kv.take(i), UTF_8) ->
            URLDecoder.decode(kv.drop(i + 1), UTF_8)
        }
      }.toMap

  private def queryParams(x: HttpExchange): Map[String, String] =
    parseQuery(Option(x.getRequestURI.getRawQuery).getOrElse(""))

  /** Fault injection for specs: the next N authorized requests are
    * answered 503 before any handling — drives the reader's
    * transient-retry path over a real socket. */
  @volatile var failNext: Int = 0

  private def handle(x: HttpExchange): Unit =
    try {
      logRequest(s"${x.getRequestMethod} ${x.getRequestURI}")
      if (!authorized(x)) {
        respond(x, 401, """{"error":"unauthorized"}""".getBytes(UTF_8),
          "WWW-Authenticate" -> "Basic realm=\"odata\"")
        return
      }
      if (failNext > 0) synchronized {
        if (failNext > 0) {
          failNext -= 1
          respond(x, 503, """{"error":"injected transient failure"}""".getBytes(UTF_8),
            "Content-Type" -> "application/json")
          return
        }
      }
      // path: /odata/$metadata (the ONLY schema channel — EDMX, exactly
      // like a real Priority endpoint) or /odata/<entity>
      val parts = x.getRequestURI.getPath.stripPrefix("/odata/").split('/')
      val entity = parts(0)
      if (entity == "$metadata") {
        respond(x, 200, renderMetadataEdmx().getBytes(UTF_8),
          "Content-Type" -> "application/xml")
        return
      }
      // OData v4.01 JSON batch (POST /odata/$batch): N sub-requests, ONE
      // round-trip — the protocol's multi-entity transfer reducer the
      // reference never uses (it issues one GET per entity,
      // priorityDataSource.py:639-746). Each sub-request is the same
      // entity-serving path as a standalone GET, so every query option
      // ($select/$filter/$top/$orderby/$applyaggs) composes inside a
      // batch; failures are per-sub-request (status in the response
      // envelope), never the whole batch.
      if (entity == "$batch") {
        require(x.getRequestMethod == "POST", "odata-http: $batch is POST-only")
        val req = mapper.readTree(x.getRequestBody)
        val out = mapper.createObjectNode()
        val arr = out.putArray("responses")
        req.get("requests").forEach { r =>
          val node = arr.addObject()
          node.put("id", r.get("id").asText())
          try {
            val m = r.get("method").asText()
            require(m == "GET", s"odata-http: $$batch supports GET only, got $m")
            val url = r.get("url").asText()
            val qi = url.indexOf('?')
            val ent = if (qi < 0) url else url.take(qi)
            val rawQ = if (qi < 0) "" else url.drop(qi + 1)
            logRequest(s"BATCH GET /odata/$url")
            node.put("status", 200)
            node.set[ObjectNode]("body",
              mapper.readTree(serveEntity(ent, parseQuery(rawQ), rawQ)))
          } catch {
            case e: Throwable =>
              node.put("status", 500)
              node.set[ObjectNode]("body", mapper.createObjectNode()
                .put("error", String.valueOf(e.getMessage)))
          }
        }
        respond(x, 200, mapper.writeValueAsBytes(out),
          "Content-Type" -> "application/json")
        return
      }
      respond(x, 200,
        serveEntity(entity, queryParams(x),
          Option(x.getRequestURI.getRawQuery).getOrElse("")),
        "Content-Type" -> "application/json")
    } catch {
      case e: Throwable =>
        // if the failure struck AFTER sendResponseHeaders committed the
        // response, this second send throws — swallow it so the original
        // error still lands in the request log instead of being replaced
        // by an IllegalStateException and a dropped connection
        logRequest(s"ERROR ${x.getRequestURI}: ${String.valueOf(e.getMessage)}")
        try respond(x, 500,
          mapper.writeValueAsBytes(
            mapper.createObjectNode().put("error", String.valueOf(e.getMessage))),
          "Content-Type" -> "application/json")
        catch { case _: Throwable => () }
    }

  /** Serve one entity request (shared by the GET path and `$batch`
    * sub-requests): returns the JSON body bytes, throws on bad input. */
  private def serveEntity(entity: String, p: Map[String, String],
      rawQuery: String): Array[Byte] = {
      val full = ODataTestServer.schemaOf(entity)
      // an EMPTY $select is a pruned-to-zero-columns scan (a bare count():
      // Spark prunes every column and only row existence matters)
      def selected(): StructType = p.get("$select") match {
        case Some("") => StructType(Seq.empty[StructField])
        case Some(cols) => StructType(cols.split(',').map(full(_)))
        case None => full
      }
      // $skip + $top: the streaming row-cursor read — a half-open row range
      // of the entity in registry order, full schema or $select projection,
      // no filters (Spark applies its own filters downstream of a stream)
      if (p.contains("$skip")) {
        val from = p("$skip").toLong
        val until = from + p.getOrElse("$top", "1000").toLong
        val required = selected()
        val body = mapper.createObjectNode()
        body.put("@graft.rowcount", ODataTestServer.rowCount(entity))
        val arr = body.putArray("value")
        ODataTestServer.fetchRange(entity, required, from, until)
          .foreach(r => arr.add(ODataJson.seqToJson(mapper, required, r)))
        return mapper.writeValueAsBytes(body)
      }
      // pushed aggregation: the service computes the whole aggregate and
      // answers |groups| rows (group keys first, aggregates after)
      if (p.contains("$applyaggs")) {
        val specs = ODataFilterSyntax.parseAggs(p("$applyaggs"))
        val groups = p.get("$applygroups").filter(_.nonEmpty)
          .map(_.split(',').toSeq).getOrElse(Seq.empty)
        val afilters = p.get("$filter")
          .map(ODataFilterSyntax.parse(_, full)).getOrElse(Array.empty[Filter])
        val schema = ODataFilterSyntax.aggSchema(full, specs, groups)
        val body = mapper.createObjectNode()
        body.put("@graft.generation", ODataTestServer.generationOf(entity))
        if (!p.contains("$preflight")) {
          val rows = ODataTestServer.aggregate(entity, afilters, specs, groups)
          val arr = body.putArray("value")
          rows.foreach(r => arr.add(ODataJson.seqToJson(mapper, schema, r)))
        }
        return mapper.writeValueAsBytes(body)
      }
      val required = selected()
      val filters = p.get("$filter")
        .map(ODataFilterSyntax.parse(_, full)).getOrElse(Array.empty[Filter])
      val top = p.get("$top").map(_.toInt)
      val orderBy = p.get("$orderby")
        .map(ODataFilterSyntax.parseOrderBy).getOrElse(Seq.empty)
      val pageSize = p.getOrElse("$pagesize", "1000").toInt
      val skiptoken = p.getOrElse("$skiptoken", "0").toLong
      require(skiptoken % pageSize == 0,
        s"$$skiptoken=$skiptoken is not a page boundary for $$pagesize=$pageSize")
      val pageNo = (skiptoken / pageSize).toInt
      val body = mapper.createObjectNode()
      if (p.contains("$preflight")) {
        // planner path: one O(rows) count to size the scan's partitions
        val (nPages, gen) =
          ODataTestServer.preflight(entity, required, filters, top, pageSize, orderBy)
        body.put("@graft.generation", gen)
        body.put("@graft.pages", nPages)
        body.put("@graft.rowcount", ODataTestServer.rowCount(entity))
      } else {
        // page path: serve the page WITHOUT re-counting the entity — the
        // planner already paid the preflight once; a full page implies a
        // nextLink (worst case one trailing empty page on an exact
        // multiple, which returns no link and ends the walk)
        val gen = ODataTestServer.generationOf(entity)
        body.put("@graft.generation", gen)
        body.put("@graft.rowcount", ODataTestServer.rowCount(entity))
        val rows = ODataTestServer.fetchPage(
          ODataPageRef(entity, required, filters, top, pageNo, pageSize, gen, orderBy))
        val arr = body.putArray("value")
        var served = 0
        rows.foreach { r => arr.add(ODataJson.seqToJson(mapper, required, r)); served += 1 }
        val limitExhausted = top.exists(n => (pageNo + 1).toLong * pageSize >= n)
        if (served == pageSize && !limitExhausted) {
          val nextQ = rawQuery.split('&')
            .filter(_.nonEmpty)
            .filterNot(_.startsWith("%24skiptoken="))
            .filterNot(_.startsWith("$skiptoken=")) :+
            s"%24skiptoken=${(pageNo + 1).toLong * pageSize}"
          body.put("@odata.nextLink",
            s"$endpoint/$entity?${nextQ.mkString("&")}")
        }
      }
      mapper.writeValueAsBytes(body)
  }

  /** Spark type → EDM type, the reverse of the reference's datatype
    * dictionary (resources/static/datatypesConvert.json). Types outside
    * the dictionary use their standard OData v4 EDM names — the parse
    * side degrades unknown types to text exactly like the reference
    * ([[graft.types.EdmTypes.targetFor]] fallback). */
  private def edmTypeOf(dt: org.apache.spark.sql.types.DataType): String = dt match {
    case LongType => "Edm.Int64"
    case IntegerType => "Edm.Int32"
    case ShortType => "Edm.Int16"
    case ByteType => "Edm.SByte"
    case StringType => "Edm.String"
    case TimestampType => "Edm.DateTimeOffset"
    // OData v4 has no naive-datetime scalar; v2's Edm.DateTime is the
    // established wire name for one (still emitted by legacy producers),
    // and collapsing NTZ into DateTimeOffset would silently shift values
    case TimestampNTZType => "Edm.DateTime"
    case _: DecimalType => "Edm.Decimal"
    case DoubleType => "Edm.Double"
    case FloatType => "Edm.Single"
    case DateType => "Edm.Date"
    case BooleanType => "Edm.Boolean"
    case BinaryType => "Edm.Binary"
    case _ => "Edm.String"
  }

  /** Property attributes beyond Type: OData v4 Precision/Scale for
    * Edm.Decimal (so the client rebuilds the exact DecimalType) and
    * Nullable="false" (v4 default is nullable). */
  private def propAttrs(f: org.apache.spark.sql.types.StructField): String = {
    val dec = f.dataType match {
      case d: DecimalType => s""" Precision="${d.precision}" Scale="${d.scale}""""
      case _ => ""
    }
    val nullable = if (f.nullable) "" else " Nullable=\"false\""
    dec + nullable
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** `GET /odata/$metadata` — the EDMX document the reference walks to
    * discover entity schemas (priorityDataSource.py:347-458), rendered
    * from every registered entity. Key columns come from the `keyFlag`
    * StructField metadata ([[graft.types.EdmTypes.toStructType]] stamps
    * it); subform array-of-struct columns are omitted (they ride as
    * NavigationProperty/$expand in the row responses, not as scalar
    * properties). [[graft.schema.MetadataXml.parse]] reads this document
    * back — the full O8 discovery loop over a real socket. */
  def renderMetadataEdmx(): String = {
    val sb = new StringBuilder
    sb ++= "<?xml version=\"1.0\" encoding=\"utf-8\"?>\n"
    sb ++= "<edmx:Edmx Version=\"4.0\" xmlns:edmx=\"http://docs.oasis-open.org/odata/ns/edmx\">\n"
    sb ++= "  <edmx:DataServices>\n"
    sb ++= "    <Schema Namespace=\"Priority.OData\" xmlns=\"http://docs.oasis-open.org/odata/ns/edm\">\n"
    def property(f: org.apache.spark.sql.types.StructField, indent: String): Unit =
      sb ++= s"""$indent<Property Name="${xmlEscape(f.name)}" Type="${edmTypeOf(f.dataType)}"${propAttrs(f)}/>\n"""
    ODataTestServer.registeredEntities.sorted.foreach { name =>
      val schema = ODataTestServer.schemaOf(name)
      val (subforms, scalar) =
        schema.fields.partition(f => ODataTestServer.isSubform(f.dataType))
      val keys = scalar.filter(f =>
        f.metadata.contains("keyFlag") && f.metadata.getBoolean("keyFlag"))
      sb ++= s"""      <EntityType Name="${xmlEscape(name)}">\n"""
      if (keys.nonEmpty) {
        sb ++= "        <Key>"
        keys.foreach(k => sb ++= s"""<PropertyRef Name="${xmlEscape(k.name)}"/>""")
        sb ++= "</Key>\n"
      }
      scalar.foreach(property(_, "        "))
      // nested subform columns ride as NavigationProperty → a dedicated
      // EntityType, the reference's parent-entity/subform-entity split
      // (subform entities are EntityTypes of their own in Priority's
      // $metadata; readme.md names them <NAME>_SUBFORM)
      subforms.foreach { f =>
        sb ++= s"""        <NavigationProperty Name="${xmlEscape(f.name)}" Type="Collection(Priority.OData.${xmlEscape(s"${name}_${f.name}")})"/>\n"""
      }
      sb ++= "      </EntityType>\n"
      subforms.foreach { f =>
        val child = f.dataType.asInstanceOf[ArrayType]
          .elementType.asInstanceOf[StructType]
        sb ++= s"""      <EntityType Name="${xmlEscape(s"${name}_${f.name}")}">\n"""
        child.fields.foreach(property(_, "        "))
        sb ++= "      </EntityType>\n"
      }
    }
    sb ++= "    </Schema>\n  </edmx:DataServices>\n</edmx:Edmx>\n"
    sb.toString
  }

  // ---- client helpers (shared by planner and readers) --------------------

  private lazy val client: HttpClient = HttpClient.newHttpClient()

  /** Bounded page-GET retries on transient failures. The reference
    * isolates a failed entity and carries on (priorityDataSource.py:
    * 185-195); executor-side this engine additionally absorbs transient
    * 5xx / connection resets INSIDE the reader, so a server blip costs one
    * page re-GET after a short backoff instead of a whole Spark task retry
    * (which would re-fetch the page anyway — with scheduler latency and,
    * at default task-retry limits, query death on the 4th blip). 4xx is
    * never retried: an auth or grammar error is deterministic and must
    * surface immediately. */
  private val MaxAttempts = 3

  def getRaw(url: String, user: String, pass: String): Array[Byte] = {
    val req = HttpRequest.newBuilder(java.net.URI.create(url))
      .header("Authorization", "Basic " + Base64.getEncoder
        .encodeToString(s"$user:$pass".getBytes(UTF_8)))
      .GET().build()
    var attempt = 1
    while (true) {
      val failure: String =
        try {
          val resp = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
          val code = resp.statusCode()
          if (code == 200) return resp.body()
          val detail = s"HTTP $code: " + new String(resp.body(), UTF_8).take(200)
          if (code < 500) sys.error(s"odata-http GET $url -> $detail")
          detail // 5xx: transient until proven otherwise
        } catch {
          case e: java.io.IOException => // connect reset / refused / EOF
            s"${e.getClass.getSimpleName}: ${e.getMessage}"
        }
      if (attempt >= MaxAttempts)
        sys.error(s"odata-http GET $url failed after $MaxAttempts attempts " +
          s"(last: $failure)")
      Thread.sleep(50L << (attempt - 1)) // 50 ms, 100 ms
      attempt += 1
    }
    throw new IllegalStateException("unreachable")
  }

  def get(url: String, user: String, pass: String): JsonNode =
    mapper.readTree(getRaw(url, user, pass))

  /** POST with a JSON body and the same retry discipline as [[getRaw]]. */
  def postRaw(url: String, user: String, pass: String,
      payload: Array[Byte]): Array[Byte] = {
    def req = HttpRequest.newBuilder(java.net.URI.create(url))
      .header("Authorization", "Basic " + Base64.getEncoder
        .encodeToString(s"$user:$pass".getBytes(UTF_8)))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofByteArray(payload)).build()
    var attempt = 1
    while (true) {
      val failure: String =
        try {
          val resp = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
          val code = resp.statusCode()
          if (code == 200) return resp.body()
          val detail = s"HTTP $code: " + new String(resp.body(), UTF_8).take(200)
          if (code < 500) sys.error(s"odata-http POST $url -> $detail")
          detail
        } catch {
          case e: java.io.IOException =>
            s"${e.getClass.getSimpleName}: ${e.getMessage}"
        }
      if (attempt >= MaxAttempts)
        sys.error(s"odata-http POST $url failed after $MaxAttempts attempts " +
          s"(last: $failure)")
      Thread.sleep(50L << (attempt - 1))
      attempt += 1
    }
    throw new IllegalStateException("unreachable")
  }

  def enc(s: String): String = URLEncoder.encode(s, UTF_8)
}

/** DataSource V2 provider for the HTTP transport. Options: `endpoint`
  * (http://host:port/odata), `entity`, `user`, `pass`, `pageSize`.
  * Pushdown surface: `$select` (column prune), `$filter` (comparison
  * conjunctions), `$top` (limit); pages become input partitions fetched
  * executor-side over the socket. */
class ODataHttpSource extends TableProvider {

  private def opt(o: CaseInsensitiveStringMap, k: String): String =
    Option(o.get(k)).getOrElse(sys.error(s"odata-http: missing option '$k'"))

  /** Schema discovery over the wire: GET `$metadata`, walk the EDMX with
    * [[graft.schema.MetadataXml]] (the same parser the catalog bootstrap
    * judged by o08 uses — reference contract
    * priorityDataSource.py:347-458), then rebuild the NATIVE Spark schema:
    * scalar Properties via [[EdmTypes.nativeSpark]] (Decimal re-bounded
    * from the wire's Precision/Scale), NavigationProperty subforms as
    * array-of-struct columns resolved against their own EntityType. */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val xml = new String(ODataHttpServer.getRaw(
      s"${opt(options, "endpoint")}/$$metadata",
      opt(options, "user"), opt(options, "pass")), java.nio.charset.StandardCharsets.UTF_8)
    val entity = opt(options, "entity")
    val all = graft.schema.MetadataXml.parse(xml, "priority")
    val byName = all.map(e => e.entityName -> e).toMap
    val meta = byName.getOrElse(entity,
      sys.error(s"odata-http: entity '$entity' absent from \\$$metadata"))
    def scalarFields(m: graft.model.EntityMeta): Seq[StructField] =
      m.fields.map { f =>
        val dt = (f.sourceDataType, f.precision, f.scale) match {
          case ("Edm.Decimal", Some(p), Some(s)) =>
            org.apache.spark.sql.types.DecimalType(p, s)
          case ("Edm.Decimal", _, _) => // facet-less wire document
            org.apache.spark.sql.types.DecimalType(38, 18)
          case _ => graft.types.EdmTypes.nativeSpark
            .getOrElse(f.sourceDataType, StringType)
        }
        StructField(f.fieldName, dt, nullable = f.nullable,
          new org.apache.spark.sql.types.MetadataBuilder()
            .putBoolean("keyFlag", f.keyFlag).build())
      }
    val navFields = meta.navs.map { nav =>
      val child = byName.getOrElse(nav.target,
        sys.error(s"odata-http: subform EntityType '${nav.target}' missing"))
      StructField(nav.navName,
        org.apache.spark.sql.types.ArrayType(StructType(scalarFields(child))))
    }
    StructType(scalarFields(meta) ++ navFields)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val o = new CaseInsensitiveStringMap(properties)
    new ODataHttpTable(opt(o, "endpoint"), opt(o, "entity"), schema,
      opt(o, "user"), opt(o, "pass"),
      Option(o.get("pageSize")).map(_.toInt).getOrElse(1000))
  }

  override def supportsExternalMetadata(): Boolean = true
}

final class ODataHttpTable(endpoint: String, entity: String,
    schema0: StructType, user: String, pass: String, pageSize: Int)
    extends Table with SupportsRead {
  override def name(): String = s"odata-http:$entity"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ODataHttpScanBuilder(endpoint, entity, schema0, user, pass, pageSize)
}

final class ODataHttpScanBuilder(endpoint: String, entity: String,
    full: StructType, user: String, pass: String, pageSize: Int)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with SupportsPushDownLimit
    with SupportsPushDownTopN
    with SupportsPushDownAggregates {

  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  private var limit: Option[Int] = None
  private var topSort: Seq[ODataSortKey] = Seq.empty
  private var aggs: Option[Seq[ODataAgg]] = None
  private var groupCols: Seq[String] = Seq.empty

  private def translateGroupBy(agg: Aggregation): Option[Seq[String]] = {
    val cols = agg.groupByExpressions.toSeq.map {
      case n: NamedReference if n.fieldNames.length == 1 &&
          full.fields.find(_.name == n.fieldNames.head)
            .exists(f => ODataTestServer.comparableType(f.dataType)) =>
        Some(n.fieldNames.head)
      case _ => None
    }
    if (cols.forall(_.isDefined)) Some(cols.flatten) else None
  }

  private def sumType(col: String): Option[DataType] =
    full.fields.find(_.name == col).map(_.dataType).collect {
      case LongType | IntegerType | ShortType | ByteType => LongType
      case DoubleType => DoubleType
    }

  private def translateAggs(agg: Aggregation): Option[Seq[ODataAgg]] = {
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
      case sm: Sum if !sm.isDistinct => sm.column match {
        case n: NamedReference if n.fieldNames.length == 1 &&
            sumType(n.fieldNames.head).isDefined =>
          Some(ODataAgg.SumOf(n.fieldNames.head))
        case _ => None
      }
      case _ => None
    }
    if (specs.forall(_.isDefined)) Some(specs.flatten) else None
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translateAggs(agg).isDefined && translateGroupBy(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    (translateAggs(agg), translateGroupBy(agg)) match {
      case (some @ Some(_), Some(g)) => aggs = some; groupCols = g; true
      case _ => false
    }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // A filter only rides the wire if its rendered $filter string parses
    // back to the same render — the server speaks exactly the grammar
    // ODataFilterSyntax.parse accepts, so a literal the Term regex can't
    // round-trip (a newline in a string literal, a non-\w column name)
    // must stay a Spark-side residual instead of dying as an HTTP 500
    // after pushdown promised the source would apply it.
    def roundTrips(f: Filter): Boolean = scala.util.Try {
      val wire = ODataFilterSyntax.render(Seq(f))
      ODataFilterSyntax.render(
        ODataFilterSyntax.parse(wire, full).toSeq) == wire
    }.getOrElse(false)
    val (accepted, residual) = filters.partition(f =>
      ODataTestServer.supportsFilter(f) &&
        f.references.forall(c => full.fields.find(_.name == c)
          .exists(sf => ODataTestServer.comparableType(sf.dataType))) &&
        roundTrips(f))
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = StructType(requiredSchema.fields.filter(f =>
      full.fieldNames.contains(f.name)))

  override def pushLimit(n: Int): Boolean =
    if (aggs.nonEmpty) false // a limit over a pushed aggregate must run in Spark
    else { limit = Some(n); true }

  /** ORDER BY + LIMIT → `$orderby=...&$top=n` over the wire, complete
    * (no Spark sort), accepted only when the top-N fits one page — same
    * contract as the in-memory twin. */
  override def pushTopN(orders: Array[SortOrder], n: Int): Boolean = {
    if (aggs.nonEmpty) return false // see pushLimit
    val keys = orders.toSeq.map { so =>
      so.expression() match {
        case nr: NamedReference if nr.fieldNames.length == 1 &&
            full.fields.find(_.name == nr.fieldNames.head)
              .exists(f => ODataTestServer.comparableType(f.dataType)) =>
          Some(ODataSortKey(nr.fieldNames.head,
            so.direction() == SortDirection.ASCENDING,
            so.nullOrdering() == NullOrdering.NULLS_FIRST))
        case _ => None
      }
    }
    if (keys.forall(_.isDefined) && keys.nonEmpty && n <= pageSize) {
      topSort = keys.flatten
      limit = Some(n)
      true
    } else false
  }

  override def isPartiallyPushed(): Boolean = false

  override def build(): Scan = aggs match {
    case Some(specs) =>
      new ODataHttpAggScan(endpoint, entity, full, pushed, specs, groupCols,
        user, pass)
    case None =>
      new ODataHttpScan(endpoint, entity, required, pushed, limit,
        user, pass, pageSize, topSort)
  }
}

/** A completely-pushed aggregate over the wire: ONE partition whose
  * executor-side GET carries `$applyaggs`/`$applygroups` (+ `$filter`)
  * and receives |groups| result rows — a per-status rollup over a
  * billion-row entity moves |groups| rows, not a scan. */
final class ODataHttpAggScan(endpoint: String, entity: String,
    full: StructType, filters: Array[Filter], specs: Seq[ODataAgg],
    groupCols: Seq[String], user: String, pass: String)
    extends Scan with Batch {

  override def readSchema(): StructType =
    ODataFilterSyntax.aggSchema(full, specs, groupCols)

  override def description(): String =
    s"ODataHttpAggScan(endpoint=$endpoint, entity=$entity, " +
      s"$$apply=${ODataFilterSyntax.renderAggs(specs)}" +
      (if (groupCols.isEmpty) "" else s" groupby ${groupCols.mkString(",")}") +
      (if (filters.isEmpty) ""
       else s", $$filter=${ODataFilterSyntax.render(filters.toSeq)}") + ")"

  override def toBatch: Batch = this

  private def aggUrl(preflight: Boolean): String = {
    import ODataHttpServer.enc
    val qs = Seq(
      Some(s"%24applyaggs=${enc(ODataFilterSyntax.renderAggs(specs))}"),
      if (groupCols.isEmpty) None
      else Some(s"%24applygroups=${enc(groupCols.mkString(","))}"),
      if (filters.isEmpty) None
      else Some(s"%24filter=${enc(ODataFilterSyntax.render(filters.toSeq))}"),
      if (preflight) Some("%24preflight=true") else None).flatten
    s"$endpoint/$entity?${qs.mkString("&")}"
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val node = ODataHttpServer.get(aggUrl(preflight = true), user, pass)
    val gen = node.get("@graft.generation").asLong
    Array(ODataHttpPageRef(aggUrl(preflight = false), readSchema(), gen,
      user, pass))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ODataHttpPageRef.readerFactory
}

final class ODataHttpScan(endpoint: String, entity: String,
    required: StructType, filters: Array[Filter], limit: Option[Int],
    user: String, pass: String, pageSize: Int,
    orderBy: Seq[ODataSortKey] = Seq.empty) extends Scan with Batch {

  override def readSchema(): StructType = required

  /** The incremental pull (reference: `POST /refreshData?incremental=true`)
    * over the wire: the offset is a row cursor into the entity, each
    * micro-batch fetches its `$skip/$top` row ranges by HTTP GET —
    * checkpointed cursor + the registry's append-preserves-prefix contract
    * make the pull exactly-once across restarts. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    // Spark's current pushdown rules never push filters/limit/orderBy into
    // a streaming scan (it applies them downstream of the source) — but if
    // that ever changes, streaming the FULL entity here would silently
    // return rows Spark believes were already filtered at the source.
    // Fail loudly instead of returning wrong rows.
    require(filters.isEmpty && limit.isEmpty && orderBy.isEmpty,
      "odata-http streaming scan cannot honor pushed " +
        s"filters=${filters.mkString(",")} limit=$limit orderBy=$orderBy — " +
        "the micro-batch cursor reads raw row ranges")
    new ODataHttpMicroBatchStream(endpoint, entity, required, user, pass, pageSize)
  }

  override def description(): String =
    s"ODataHttpScan(endpoint=$endpoint, entity=$entity, " +
      s"$$select=${required.fieldNames.mkString(",")}" +
      (if (filters.isEmpty) ""
       else s", $$filter=${ODataFilterSyntax.render(filters.toSeq)}") +
      (if (orderBy.isEmpty) ""
       else s", $$orderby=${ODataFilterSyntax.renderOrderBy(orderBy)}") +
      limit.map(n => s", $$top=$n").getOrElse("")

  override def toBatch: Batch = this

  private def pageUrl(pageNo: Int, preflight: Boolean): String = {
    import ODataHttpServer.enc
    val qs = Seq(
      Some(s"%24select=${enc(required.fieldNames.mkString(","))}"),
      if (filters.isEmpty) None
      else Some(s"%24filter=${enc(ODataFilterSyntax.render(filters.toSeq))}"),
      if (orderBy.isEmpty) None
      else Some(s"%24orderby=${enc(ODataFilterSyntax.renderOrderBy(orderBy))}"),
      limit.map(n => s"%24top=$n"),
      Some(s"%24pagesize=$pageSize"),
      Some(s"%24skiptoken=${pageNo.toLong * pageSize}"),
      if (preflight) Some("%24preflight=true") else None).flatten
    s"$endpoint/$entity?${qs.mkString("&")}"
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // HTTP preflight: page count + registry generation, no rows
    val node = ODataHttpServer.get(pageUrl(0, preflight = true), user, pass)
    val nPages = node.get("@graft.pages").asInt
    val gen = node.get("@graft.generation").asLong
    (0 until nPages)
      .map(i => ODataHttpPageRef(pageUrl(i, preflight = false), required,
        gen, user, pass): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ODataHttpPageRef.readerFactory
}

/** One page fetch, shipped to the executor: the URL (with `$skiptoken`),
  * the projected schema, auth, and the planned-against generation. */
final case class ODataHttpPageRef(url: String, required: StructType,
    generation: Long, user: String, pass: String) extends InputPartition

object ODataHttpPageRef {
  /** Executor-side page fetch shared by row scans and aggregate scans:
    * GET the ref's URL over the socket, verify the registry generation
    * still matches the planned one, parse the rows by the ref's schema. */
  val readerFactory: PartitionReaderFactory = new PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val ref = p.asInstanceOf[ODataHttpPageRef]
      val node = ODataHttpServer.get(ref.url, ref.user, ref.pass)
      val gen = node.get("@graft.generation").asLong
      if (gen != ref.generation)
        sys.error(s"odata-http: entity re-registered (generation $gen) " +
          s"after this scan was planned (generation ${ref.generation}); " +
          "page boundaries are stale — re-plan the scan")
      import scala.jdk.CollectionConverters._
      val rows = node.get("value").elements().asScala
        .map(ODataJson.jsonToSeq(ref.required, _))
      new ODataRowsReader(rows, ref.required)
    }
  }
}

/** A half-open `$skip/$top` row range, fetched executor-side over HTTP —
  * the streaming twin of [[ODataHttpPageRef]]. No generation guard: the
  * registry's append contract keeps row indexes below the committed
  * cursor stable, which is exactly what the cursor offset relies on. */
final case class ODataHttpRangeRef(url: String, required: StructType,
    user: String, pass: String) extends InputPartition

final class ODataHttpMicroBatchStream(endpoint: String, entity: String,
    required: StructType, user: String, pass: String, pageSize: Int)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  override def initialOffset(): Offset = ODataOffset(0L)

  override def latestOffset(): Offset = {
    import ODataHttpServer.enc
    val node = ODataHttpServer.get(
      s"$endpoint/$entity?%24select=${enc(required.fieldNames.mkString(","))}" +
        s"&%24pagesize=$pageSize&%24preflight=true", user, pass)
    ODataOffset(node.get("@graft.rowcount").asLong)
  }

  override def deserializeOffset(json: String): Offset = {
    val pat = "\\{\"rowIdx\":(\\d+)\\}".r
    json.trim match {
      case pat(n) => ODataOffset(n.toLong)
      case other => sys.error(s"bad odata offset: $other")
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    import ODataHttpServer.enc
    val from = start.asInstanceOf[ODataOffset].rowIdx
    val until = end.asInstanceOf[ODataOffset].rowIdx
    (from until until by pageSize.toLong)
      .map { lo =>
        val hi = math.min(lo + pageSize, until)
        ODataHttpRangeRef(
          s"$endpoint/$entity?%24select=${enc(required.fieldNames.mkString(","))}" +
            s"&%24skip=$lo&%24top=${hi - lo}",
          required, user, pass): InputPartition
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val ref = p.asInstanceOf[ODataHttpRangeRef]
        val node = ODataHttpServer.get(ref.url, ref.user, ref.pass)
        import scala.jdk.CollectionConverters._
        val rows = node.get("value").elements().asScala
          .map(ODataJson.jsonToSeq(ref.required, _))
        new ODataRowsReader(rows, ref.required)
      }
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** OData v4.01 JSON-batch client: N entity requests in ONE HTTP round-trip
  * (`POST $batch`, json batch format) — the protocol's multi-entity
  * transfer reducer. The reference refresh loop issues one GET per entity
  * per cycle (resources/priorityDataSource.py:639-746); for the config/
  * dimension snapshot that loop re-pulls every cycle, batching collapses
  * K requests into one round-trip. Scale note: this is the DIMENSION
  * channel — small entities that land driver-side and broadcast into
  * joins. Facts keep the paged, partitioned [[ODataHttpSource]] scan;
  * a batch response is one JSON document and must stay small. */
object ODataBatchClient {

  final case class SubRequest(id: String, url: String)

  private val mapper = new ObjectMapper()

  /** POST the batch; returns sub-request id → response body. Throws if any
    * sub-request reports a non-200 status (per-sub-request failure is the
    * protocol contract — the envelope itself is always 200). */
  def pull(endpoint: String, user: String, pass: String,
      reqs: Seq[SubRequest]): Map[String, JsonNode] = {
    val body = mapper.createObjectNode()
    val arr = body.putArray("requests")
    reqs.foreach { r =>
      val n = arr.addObject()
      n.put("id", r.id); n.put("method", "GET"); n.put("url", r.url)
    }
    val resp = mapper.readTree(ODataHttpServer.postRaw(
      s"$endpoint/$$batch", user, pass, mapper.writeValueAsBytes(body)))
    import scala.jdk.CollectionConverters._
    resp.get("responses").elements().asScala.map { r =>
      val id = r.get("id").asText()
      require(r.get("status").asInt() == 200,
        s"odata-http $$batch sub-request '$id' failed: ${r.get("body")}")
      val body = r.get("body")
      // the server still paginates at $pagesize inside a $batch
      // sub-response; silently returning the first page would hand back
      // partial data as if complete — fail loudly instead. Batch is the
      // DIMENSION channel: an entity too big for one page belongs on the
      // paged, partitioned ODataHttpSource scan (or pass an explicit
      // $pagesize covering the entity in the sub-request url).
      require(!body.has("@odata.nextLink"),
        s"odata-http $$batch sub-response '$id' is paginated " +
          "(@odata.nextLink present): the entity exceeds one page — raise " +
          "$pagesize on the sub-request or use the paged source scan")
      id -> body
    }.toMap
  }

  /** A sub-response's `value` rows as external Rows against a schema. */
  def rows(schema: StructType, body: JsonNode): Seq[Row] = {
    import scala.jdk.CollectionConverters._
    body.get("value").elements().asScala
      .map(n => Row.fromSeq(ODataJson.jsonToSeq(schema, n))).toVector
  }
}
