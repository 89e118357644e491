package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.{fmtTs, fmtTsSec, tbl}
import graft.model.{EntityConfig, Fixtures}
import graft.ops.Relational._
import graft.types.EdmTypes

/** §2.1 of SURVEY.md — the operators the reference actually implements,
  * one DuckDB-verified query each. Reference citations sit on the ops in
  * `graft.ops.Relational` / `graft.types.EdmTypes`; these queries wire them
  * to the shared test tables.
  */
object RefOps extends QueryModule {

  private val F6 = "%Y-%m-%d %H:%M:%S.%f" // duckdb strftime, microseconds
  private val F0 = "%Y-%m-%d %H:%M:%S"

  private val RunId = "00000000-0000-4000-8000-000000000000"
  private val RunTs = "2026-01-01 00:00:00"

  /** events modeled as an incremental entity (SURVEY §2.1 O5). */
  private val eventsEntity = EntityConfig(
    "EVENTS", filterFlag = true, filterField = "ts", expand = Seq.empty,
    lastRun = Some("2024-01-20 00:00:00"),
    dataStartDate = Some("2024-01-05 00:00:00"))

  /** orders nested with its lineitem "subform" — models the OData `$expand`
    * payload shape from flat test tables. */
  private def nestedOrders(s: org.apache.spark.sql.SparkSession, dir: String) =
    nestChild(
      parent = tbl(s, dir, "orders"),
      child = tbl(s, dir, "lineitem"),
      parentKey = "o_orderkey", childKey = "l_orderkey",
      subformName = "lineitems_subform", sortCols = Seq("l_linenumber"))

  private val ordersCols =
    "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, " +
      s"strftime(o_orderdate, '$F0') AS o_orderdate, o_orderpriority FROM orders"

  def all: Seq[Q] = Seq(

    // O1: full entity scan with deterministic (metadata-order) columns.
    Q("o01_entity_scan",
      Some(s"$ordersCols ORDER BY o_orderkey"),
      (s, dir) =>
        tbl(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice"),
            fmtTsSec(col("o_orderdate")).as("o_orderdate"),
            col("o_orderpriority"))
          .orderBy("o_orderkey")),

    // O2: watermark predicate pushed into the scan (PushedFilters in explain).
    Q("o02_predicate_pushdown",
      Some("SELECT l_orderkey, l_linenumber, l_quantity, " +
        s"strftime(l_shipdate, '$F0') AS l_shipdate FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00' " +
        "ORDER BY l_orderkey, l_linenumber"),
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .filter(col("l_shipdate") >= to_timestamp(lit("1998-01-01 00:00:00")))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            fmtTsSec(col("l_shipdate")).as("l_shipdate"))
          .orderBy("l_orderkey", "l_linenumber")),

    // O4: the $top=1 connectivity probe — limit pushdown.
    Q("o04_limit_probe",
      Some("SELECT o_orderkey, o_orderstatus FROM orders ORDER BY o_orderkey LIMIT 1"),
      (s, dir) =>
        tbl(s, dir, "orders")
          .orderBy("o_orderkey").limit(1)
          .select("o_orderkey", "o_orderstatus")),

    // O5: incremental-vs-full watermark bound choice, both branches.
    Q("o05_watermark_modes",
      Some("SELECT event_id, 'incremental' AS run_mode, " +
        s"strftime(ts, '$F6') AS ts FROM events " +
        "WHERE ts >= TIMESTAMP '2024-01-20 00:00:00' " +
        "UNION ALL " +
        "SELECT event_id, 'full' AS run_mode, " +
        s"strftime(ts, '$F6') AS ts FROM events " +
        "WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' " +
        "ORDER BY run_mode, event_id"),
      (s, dir) => {
        val ev = H.events(s, dir)
        val inc = watermarkFilter(eventsEntity, incremental = true)(ev)
          .withColumn("run_mode", lit("incremental"))
        val full = watermarkFilter(eventsEntity, incremental = false)(ev)
          .withColumn("run_mode", lit("full"))
        inc.unionByName(full)
          .select(col("event_id"), col("run_mode"), fmtTs(col("ts")).as("ts"))
          .orderBy("run_mode", "event_id")
      }),

    // O6: timezone localize both directions (reference pytz-localizes the
    // watermark string before building $filter).
    Q("o06_tz_localize",
      Some(s"SELECT event_id, strftime(ts, '$F6') AS ts_raw, " +
        s"strftime((ts AT TIME ZONE 'Asia/Jerusalem') AT TIME ZONE 'UTC', '$F6') AS ts_utc, " +
        s"strftime((ts AT TIME ZONE 'UTC') AT TIME ZONE 'Asia/Jerusalem', '$F6') AS ts_local " +
        "FROM events ORDER BY event_id"),
      (s, dir) =>
        H.events(s, dir)
          .select(col("event_id"),
            fmtTs(col("ts")).as("ts_raw"),
            fmtTs(to_utc_timestamp(col("ts"), "Asia/Jerusalem")).as("ts_utc"),
            fmtTs(from_utc_timestamp(col("ts"), "Asia/Jerusalem")).as("ts_local"))
          .orderBy("event_id")),

    // O8: the $metadata EDMX walk, driver-verified: parse the fixture feed,
    // emit every (entity, field) with its source type, key flag, and mapped
    // target types — the full schema-inference output as data.
    Q("o08_metadata_schema",
      Some {
        def esc(v: String) = v.replace("'", "''") // SQL-literal escape
        val rows = for {
          m <- graft.schema.MetadataXml.parse(Fixtures.edmx, "priority")
          (f, i) <- m.fields.zipWithIndex
        } yield {
          val t = EdmTypes.targetFor(m.sourceSystem, f)
          s"('${esc(m.entityName)}', $i, '${esc(f.fieldName)}', '${esc(f.sourceDataType)}', " +
            s"${if (f.keyFlag) 1 else 0}, '${esc(t.spark.sql)}', '${esc(t.azureSql)}', '${esc(f.desc)}')"
        }
        "SELECT * FROM (VALUES " + rows.mkString(", ") +
          ") AS t(entity, ord, field, source_type, key_flag, spark_type, " +
          "azure_type, description) ORDER BY entity, ord"
      },
      (s, dir) => {
        import s.implicits._
        (for {
          m <- graft.schema.MetadataXml.parse(Fixtures.edmx, "priority")
          (f, i) <- m.fields.zipWithIndex
        } yield {
          val t = EdmTypes.targetFor(m.sourceSystem, f)
          (m.entityName, i, f.fieldName, f.sourceDataType,
            if (f.keyFlag) 1 else 0, t.spark.sql, t.azureSql, f.desc)
        }).toDF("entity", "ord", "field", "source_type", "key_flag",
          "spark_type", "azure_type", "description")
          .orderBy("entity", "ord")
      }),

    // O8/O9: the (sourceSystem, sourceType) → target-type mapping as data.
    Q("o09_type_mapping",
      Some {
        val rows = EdmTypes.mapping.toSeq.sortBy(k => (k._1._1, k._1._2))
          .map { case ((ss, st), t) =>
            s"('$ss', '$st', '${t.azureSql}', '${t.spark.sql}')"
          }
        "SELECT * FROM (VALUES " + rows.mkString(", ") +
          ") AS t(source_system, source_type, azure_type, spark_type) " +
          "ORDER BY source_system, source_type"
      },
      (s, dir) => {
        import s.implicits._
        EdmTypes.mapping.toSeq.sortBy(k => (k._1._1, k._1._2))
          .map { case ((ss, st), t) => (ss, st, t.azureSql, t.spark.sql) }
          .toDF("source_system", "source_type", "azure_type", "spark_type")
          .orderBy("source_system", "source_type")
      }),

    // O10: parent projection after subform split (deterministic column order).
    Q("o10_parent_project",
      Some(s"$ordersCols ORDER BY o_orderkey"),
      (s, dir) =>
        parentProjection(Seq("lineitems_subform"))(nestedOrders(s, dir))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice"),
            fmtTsSec(col("o_orderdate")).as("o_orderdate"),
            col("o_orderpriority"))
          .orderBy("o_orderkey")),

    // O11: explode subform into a child table inheriting the parent PK.
    // Inner `explode`: parents with empty arrays emit no children.
    Q("o11_explode_child",
      Some("SELECT l_orderkey AS o_orderkey, l_linenumber, l_partkey, " +
        "l_quantity, l_extendedprice, " +
        s"strftime(l_shipdate, '$F0') AS l_shipdate FROM lineitem " +
        "ORDER BY o_orderkey, l_linenumber"),
      (s, dir) =>
        explodeSubform("lineitems_subform", Seq("o_orderkey"))(nestedOrders(s, dir))
          .select(col("o_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_quantity"), col("l_extendedprice"),
            fmtTsSec(col("l_shipdate")).as("l_shipdate"))
          .orderBy("o_orderkey", "l_linenumber")),

    // O12+O13: lineage stamp + lowercase-all column names.
    Q("o12_lineage_lowercase",
      Some("SELECT n_nationkey, n_name, n_regionkey, " +
        s"'$RunId' AS extractionid, '$RunTs' AS extractiontimestamputc " +
        "FROM nation ORDER BY n_nationkey"),
      (s, dir) => {
        val shouty = tbl(s, dir, "nation")
          .toDF("N_NATIONKEY", "N_NAME", "N_REGIONKEY") // simulate source casing
        val staged = stampLineage(RunId, RunTs)(lowercaseAll(shouty))
        staged.select(col("n_nationkey"), col("n_name"), col("n_regionkey"),
          col("extractionid"),
          fmtTsSec(col("extractiontimestamputc")).as("extractiontimestamputc"))
          .orderBy("n_nationkey")
      }),

    // O16: DDL generation from entity metadata (typed cols + PK rule + audit).
    Q("o16_ddl_render",
      Some {
        val metas = Seq(Fixtures.ordersMeta)
        val rows = metas.map { m =>
          s"('${m.entityName.toLowerCase}', '${EdmTypes.ddl(m, "stg_")}', " +
            s"'${EdmTypes.createTableColumnTypes(m)}')"
        }
        "SELECT * FROM (VALUES " + rows.mkString(", ") +
          ") AS t(entity, ddl, jdbc_column_types) ORDER BY entity"
      },
      (s, dir) => {
        import s.implicits._
        Seq(Fixtures.ordersMeta)
          .map(m => (m.entityName.toLowerCase, EdmTypes.ddl(m, "stg_"),
            EdmTypes.createTableColumnTypes(m)))
          .toDF("entity", "ddl", "jdbc_column_types")
          .orderBy("entity")
      }),

    // O16b: the SAME entity metadata rendered for every warehouse dialect
    // the reference's type dictionary declares (datatypesConvert.json:4-36
    // carries MySQLDatatype / postgresDatatype / AzureSQLDatatype columns;
    // the reference executes only the Azure column — see EdmTypes.renderType
    // scaladoc). One row per (entity, dialect): the multi-target DDL a user
    // pointing a config at MySQL/Postgres would deploy.
    Q("o16b_ddl_dialects",
      Some {
        val m = Fixtures.ordersMeta
        val rows = Seq("azuresql", "mysql", "postgres").map { d =>
          s"('${m.entityName.toLowerCase}', '$d', " +
            s"'${EdmTypes.ddlDialect(m, "stg_", d)}', " +
            s"'${EdmTypes.createTableColumnTypes(m, d)}')"
        }
        "SELECT * FROM (VALUES " + rows.mkString(", ") +
          ") AS t(entity, dialect, ddl, jdbc_column_types) " +
          "ORDER BY entity, dialect"
      },
      (s, dir) => {
        import s.implicits._
        val m = Fixtures.ordersMeta
        Seq("azuresql", "mysql", "postgres")
          .map(d => (m.entityName.toLowerCase, d,
            EdmTypes.ddlDialect(m, "stg_", d),
            EdmTypes.createTableColumnTypes(m, d)))
          .toDF("entity", "dialect", "ddl", "jdbc_column_types")
          .orderBy("entity", "dialect")
      }),

    // O17: config → flat table worklist.
    Q("o17_config_flatten",
      Some {
        val rows = Fixtures.config.flatEntities.zipWithIndex
          .map { case (e, i) => s"($i, '$e')" }
        "SELECT * FROM (VALUES " + rows.mkString(", ") +
          ") AS t(ord, entity) ORDER BY ord"
      },
      (s, dir) => {
        import s.implicits._
        Fixtures.config.flatEntities.zipWithIndex.map(_.swap)
          .toDF("ord", "entity").orderBy("ord")
      }),

    // O18: latest-document-wins (top-1 by timestamp desc).
    Q("o18_latest_config",
      Some("SELECT event_id, user_id, event_type, " +
        s"strftime(ts, '$F6') AS ts FROM events " +
        "ORDER BY ts DESC, event_id DESC LIMIT 1"),
      (s, dir) =>
        H.events(s, dir)
          .orderBy(col("ts").desc, col("event_id").desc).limit(1)
          .select(col("event_id"), col("user_id"), col("event_type"),
            fmtTs(col("ts")).as("ts"))),

    // O19: watermark advance — max event-time per entity (the engine's
    // fix over the reference's wall-clock-now advance).
    Q("o19_watermark_advance",
      Some("SELECT event_type, " +
        s"strftime(max(ts), '$F6') AS new_last_run, " +
        "count(*) AS n_rows FROM events GROUP BY event_type ORDER BY event_type"),
      (s, dir) =>
        H.events(s, dir)
          .groupBy("event_type")
          .agg(fmtTs(max(col("ts"))).as("new_last_run"),
            count(lit(1)).as("n_rows"))
          .orderBy("event_type")),

    // O20/O21/O22: the catalog lifecycle driver-verified — existence probes,
    // create-iff-absent typed deploy, redeploy short-circuit, drop-all reset
    // — each step's outcome emitted as data. Self-healing across runs (the
    // db is dropped first), so the transcript is deterministic.
    Q("o20_catalog_lifecycle",
      Some("SELECT * FROM (VALUES " +
        "(1, 'db_pre_existed', 'false'), " +
        "(2, 'deploy_stg_orderitems', 'success'), " +
        "(3, 'deploy_stg_orders', 'success'), " +
        "(4, 'redeploy_stg_orderitems', 'exists'), " +
        "(5, 'redeploy_stg_orders', 'exists'), " +
        "(6, 'orders_exists', 'true'), " +
        "(7, 'drop_report', 'All 2 tables dropped.'), " +
        "(8, 'orders_exists_after', 'false')" +
        ") AS t(ord, step, result) ORDER BY ord"),
      (s, dir) => {
        import s.implicits._
        import graft.pipeline.CatalogOps
        val db = "graft_o20_lifecycle"
        s.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
        // physical cleanup: a crashed previous run's managed-table files
        // aren't in a NEW session's in-memory catalog, and would fail
        // CREATE TABLE with LOCATION_ALREADY_EXISTS
        val dbPath = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), s"$db.db")
        val fs = dbPath.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(dbPath)) fs.delete(dbPath, true)
        val metas = graft.schema.MetadataXml.parse(Fixtures.edmx, "priority")
        val pre = CatalogOps.ensureDatabase(s, db)
        val d1 = CatalogOps.deployTables(s, db, metas)
        val d2 = CatalogOps.deployTables(s, db, metas)
        val ex = CatalogOps.tableExists(s, db, "stg_orders")
        val report = CatalogOps.dropAll(s, db)
        val exAfter = CatalogOps.tableExists(s, db, "stg_orders")
        s.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
        Seq(
          (1, "db_pre_existed", pre.toString),
          (2, "deploy_stg_orderitems", d1("stg_orderitems")),
          (3, "deploy_stg_orders", d1("stg_orders")),
          (4, "redeploy_stg_orderitems", d2("stg_orderitems")),
          (5, "redeploy_stg_orders", d2("stg_orders")),
          (6, "orders_exists", ex.toString),
          (7, "drop_report", report),
          (8, "orders_exists_after", exAfter.toString))
          .toDF("ord", "step", "result").orderBy("ord")
      }),

    // O24: config CRUD round-trip driver-verified — the A1 source JSON
    // (carrying the reference's EntityID/entityID and dataStartDate/
    // datarStartDate key drift) parsed to the canonical model and emitted
    // as data: proof the quirk absorption produces exactly the canonical
    // config.
    Q("o24_config_roundtrip",
      Some("SELECT * FROM (VALUES " +
        "(0, 'priority_companyA', '03445d66', 'Israel', 'ORDERS', 1, " +
        "'CURDATE', 'ORDERITEMS', '2024-06-12 21:53:35', '2020-05-30 00:00:00'), " +
        "(1, 'priority_companyA', '03445d66', 'Israel', 'CTYPE', 0, " +
        "'', '', '2024-06-12 21:53:40', '2020-05-30 00:00:00')" +
        ") AS t(ord, datasource, account_id, tz, entity, filter_flag, " +
        "filter_field, expand_csv, last_run, data_start_date) ORDER BY ord"),
      (s, dir) => {
        import s.implicits._
        val cfg = graft.model.ConfigJson.parse(Fixtures.configJsonA1)
        cfg.entities.zipWithIndex.map { case (e, i) =>
          (i, cfg.datasourceName, cfg.accountId, cfg.systemTimezone,
            e.entityId, if (e.filterFlag) 1 else 0, e.filterField,
            e.expand.mkString(","), e.lastRun.getOrElse(""),
            e.dataStartDate.getOrElse(""))
        }.toDF("ord", "datasource", "account_id", "tz", "entity",
          "filter_flag", "filter_field", "expand_csv", "last_run",
          "data_start_date")
          .orderBy("ord")
      }),

    // O23: run report — records written per staged table.
    Q("o23_run_report",
      Some {
        val tables = Seq("region", "nation", "customer", "supplier", "orders", "lineitem")
        tables.map(t =>
          s"SELECT 'stg_$t' AS table_name, count(*) AS records_written FROM $t")
          .mkString("", " UNION ALL ", " ORDER BY table_name")
      },
      (s, dir) => {
        val tables = Seq("region", "nation", "customer", "supplier", "orders", "lineitem")
        tables.map { t =>
          tbl(s, dir, t).agg(count(lit(1)).as("records_written"))
            .withColumn("table_name", lit(s"stg_$t"))
            .select("table_name", "records_written")
        }.reduce(_.unionByName(_)).orderBy("table_name")
      }))
}
