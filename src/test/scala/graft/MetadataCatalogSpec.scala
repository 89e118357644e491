package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Fixtures
import graft.pipeline.CatalogOps
import graft.schema.MetadataXml
import graft.types.EdmTypes

class MetadataCatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val edmx = Fixtures.edmx

  test("EDMX parse: entities, fields in order, composite keys, descriptions") {
    val metas = MetadataXml.parse(edmx, "priority")
    assert(metas.map(_.entityName) == Seq("ORDERS", "ORDERITEMS"))
    val orders = metas.head
    assert(orders.fields.map(_.fieldName) == Seq("ORDNAME", "CURDATE", "QPRICE", "ORD"))
    assert(orders.entityPk == Seq("ORDNAME"))
    assert(orders.fields.head.keyFlag && orders.fields.head.desc == "Order name")
    val items = metas(1)
    assert(items.entityPk == Seq("ORDNAME", "LINE")) // composite PK
    assert(items.fields.count(_.keyFlag) == 2)
  }

  test("parsed metadata flows into StructType + DDL (O8 → O16)") {
    val metas = MetadataXml.parse(edmx, "priority")
    val st = EdmTypes.toStructType(metas.head)
    assert(st("ordname").dataType == StringType) // PK erasure rule
    assert(st("ord").dataType == LongType)
    assert(EdmTypes.ddl(metas(1)).contains("PRIMARY KEY (ordname, line)"))
  }

  test("catalog lifecycle: ensure db, deploy tables iff absent, reset drops all (O20/O21)") {
    // unique name: "acc_testacc" belongs to the pipeline_initial_load query
    // (QueriesSmokeSpec may run it concurrently in the shared session)
    val db = "acc_metacatspec"
    assert(!CatalogOps.ensureDatabase(spark, db)) // created now
    assert(CatalogOps.ensureDatabase(spark, db)) // already exists

    val metas = MetadataXml.parse(edmx, "priority")
    val first = CatalogOps.deployTables(spark, db, metas)
    assert(first.values.forall(_ == "success"))
    assert(CatalogOps.tableExists(spark, db, "stg_orders"))
    val second = CatalogOps.deployTables(spark, db, metas)
    assert(second.values.forall(_ == "exists")) // create-iff-absent

    val msg = CatalogOps.dropAll(spark, db)
    assert(msg == "All 2 tables dropped.")
    assert(!CatalogOps.tableExists(spark, db, "stg_orders"))
  }

  test("fixture metadata matches the XML-derived metadata (A2 vs $metadata)") {
    val fromXml = MetadataXml.parse(edmx, "priority").head
    assert(fromXml.fields.map(f => (f.fieldName, f.sourceDataType, f.keyFlag)) ==
      Fixtures.ordersMeta.fields.map(f => (f.fieldName, f.sourceDataType, f.keyFlag)))
  }
}
