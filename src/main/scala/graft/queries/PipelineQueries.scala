package graft.queries

import java.nio.file.Files

import graft.{Q, QueryModule}
import graft.H.tbl
import graft.model.{EntityConfig, ExtractionConfig}
import graft.ops.Relational.nestChild
import graft.pipeline.{Refresh, StateStore}

/** End-to-end refresh lifecycle (SURVEY §3.1) as a judged query: nested
  * ORDERS entity → incremental watermark filter → parent/child split →
  * lowercase + lineage → parquet staging write → run report. The oracle
  * recomputes the expected per-table row counts relationally.
  */
object PipelineQueries extends QueryModule {

  private val lastRun = "1999-01-01 00:00:00"

  private val config = ExtractionConfig(
    datasourceName = "tpch_fixture",
    uri = "file:///root/testdata",
    accountId = "testacc",
    systemTimezone = "UTC",
    sourceSystem = "priority",
    entities = Seq(EntityConfig("ORDERS", filterFlag = true,
      filterField = "o_orderdate", expand = Seq("LINEITEMS"),
      lastRun = Some(lastRun), dataStartDate = Some("1995-01-01 00:00:00"))))

  def all: Seq[Q] = Seq(
    Q("pipeline_refresh_report",
      Some("SELECT 'orders' AS entity_name, 'stg_orders' AS table_name, " +
        "count(*) AS records_written, 'success' AS status FROM orders " +
        s"WHERE o_orderdate >= TIMESTAMP '$lastRun' " +
        "UNION ALL " +
        "SELECT 'orders_lineitems_subform', 'stg_lineitems', count(*), 'success' " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        s"WHERE o_orderdate >= TIMESTAMP '$lastRun' " +
        "ORDER BY table_name"),
      (s, dir) => {
        val sinkDir = Files.createTempDirectory("graft_refresh").toString
        val state = new StateStore(s"$sinkDir/_state.json")
        val nested = nestChild(
          parent = tbl(s, dir, "orders"), child = tbl(s, dir, "lineitem"),
          parentKey = "o_orderkey", childKey = "l_orderkey",
          subformName = "lineitems_subform", sortCols = Seq("l_linenumber"))
        // deliberately NOT cached: materializing the array-of-struct column
        // costs more than recomputing the nest for the two table writes
        val reports = Refresh.refreshAll(
          config, incremental = true,
          sources = _ => nested,
          subformsOf = _ => Map("lineitems_subform" -> "LINEITEMS"),
          pkOf = _ => Seq("o_orderkey"),
          sinkDir = sinkDir, state = state,
          runId = "00000000-0000-4000-8000-000000000000",
          runTs = "2026-01-01 00:00:00")
        import s.implicits._
        reports.toDF("entity_name", "table_name", "records_written", "status")
          .orderBy("table_name")
      }))
}
