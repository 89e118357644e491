package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{EntityConfig, ExtractionConfig}
import graft.ops.Relational.nestChild
import graft.pipeline.{Bootstrap, CatalogOps, StateStore}

/** /initialDataLoad and /resetDataPlatform end-to-end (SURVEY §3.2/3.3):
  * metadata → catalog DDL → full refresh → run report, then destructive
  * rebuild.
  */
class BootstrapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private val edmx =
    """<edmx:Edmx Version="4.0" xmlns:edmx="http://docs.oasis-open.org/odata/ns/edmx">
      |  <edmx:DataServices>
      |    <Schema Namespace="G" xmlns="http://docs.oasis-open.org/odata/ns/edm">
      |      <EntityType Name="ORDERS">
      |        <Key><PropertyRef Name="o_orderkey"/></Key>
      |        <Property Name="o_orderkey" Type="Edm.Int64" Nullable="false"/>
      |        <Property Name="o_custkey" Type="Edm.Int64"/>
      |        <Property Name="o_totalprice" Type="Edm.Decimal"/>
      |      </EntityType>
      |      <EntityType Name="LINEITEMS">
      |        <Key><PropertyRef Name="o_orderkey"/><PropertyRef Name="l_linenumber"/></Key>
      |        <Property Name="o_orderkey" Type="Edm.Int64" Nullable="false"/>
      |        <Property Name="l_linenumber" Type="Edm.Int64" Nullable="false"/>
      |        <Property Name="l_quantity" Type="Edm.Decimal"/>
      |      </EntityType>
      |    </Schema>
      |  </edmx:DataServices>
      |</edmx:Edmx>""".stripMargin

  private val config = ExtractionConfig(
    "t", "file://x", "bootacc", "UTC", "priority",
    Seq(EntityConfig("ORDERS", filterFlag = false, "", Seq("LINEITEMS"), None, None)))

  test("initialDataLoad: metadata -> DDL -> full load -> report; reset rebuilds") {
    val dir = Files.createTempDirectory("boot").toString
    val state = new StateStore(s"$dir/state.json")
    def nested = nestChild(H.tbl(spark, sf, "orders"), H.tbl(spark, sf, "lineitem"),
      "o_orderkey", "l_orderkey", "lineitems_subform", Seq("l_linenumber"))

    val report = Bootstrap.initialDataLoad(
      spark, config, edmx,
      sources = _ => nested,
      subformsOf = _ => Map("lineitems_subform" -> "LINEITEMS"),
      sinkDir = dir, state = state, runId = "RUN", runTs = "2026-01-01 00:00:00")

    assert(report.database == "acc_bootacc")
    assert(report.tablesDeployed ==
      Map("stg_orders" -> "success", "stg_lineitems" -> "success"))
    assert(report.loadReports.map(_.status).forall(_ == "success"))
    val orders = report.loadReports.find(_.tableName == "stg_orders").get
    assert(orders.recordsWritten == H.tbl(spark, sf, "orders").count())
    // unfiltered entity: no watermark field, so nothing to advance
    assert(state.get("ORDERS").isEmpty)
    assert(CatalogOps.tableExists(spark, "acc_bootacc", "stg_orders"))

    // reset: drop-all then full rebuild (idempotent end state)
    val (dropMsg, report2) = Bootstrap.resetDataPlatform(
      spark, config, edmx,
      sources = _ => nested,
      subformsOf = _ => Map("lineitems_subform" -> "LINEITEMS"),
      sinkDir = dir, state = state, runId = "RUN2", runTs = "2026-01-02 00:00:00")
    assert(dropMsg == "All 2 tables dropped.")
    assert(report2.tablesDeployed.values.forall(_ == "success"))
    assert(state.get("ORDERS").isEmpty)
  }
}
