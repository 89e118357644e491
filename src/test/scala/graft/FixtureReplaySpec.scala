package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Relational._

final case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
    o_totalprice: Double)

/** End-to-end replay of the reference-shaped OData payload (FIXTURES.md A4)
  * through decode → flatten → lowercase → lineage, asserting the same
  * observable behavior the reference's pipeline has: children inherit the
  * parent PK, empty subforms emit no child rows, names are lowercased.
  */
class FixtureReplaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // FIXTURES.md A4 — the reference's /ORDERS?$expand=ORDERITEMS_SUBFORM shape
  private val payload =
    """{ "value": [
      |  { "ORDNAME": "SO25000001", "CURDATE": "2025-01-18T00:00:00+02:00",
      |    "QPRICE": 1234.500, "ORD": 1,
      |    "ORDERITEMS_SUBFORM": [
      |      {"ORDNAME": "SO25000001", "LINE": 1, "PARTNAME": "P-100",
      |       "TQUANT": 2, "PRICE": 617.250},
      |      {"ORDNAME": "SO25000001", "LINE": 2, "PARTNAME": "P-200",
      |       "TQUANT": 1, "PRICE": 0.000}
      |    ] },
      |  { "ORDNAME": "SO25000002", "CURDATE": "2025-01-19T00:00:00+02:00",
      |    "QPRICE": 0.0, "ORD": 2, "ORDERITEMS_SUBFORM": [] }
      |] }""".stripMargin

  test("A4 payload: decode, split, explode, lineage — reference semantics") {
    import spark.implicits._
    val raw = spark.read.json(Seq(payload).toDS())
    val entity = raw.select(explode(col("value")).as("r")).select("r.*")
    assert(entity.count() == 2)

    val stage = (df: org.apache.spark.sql.DataFrame) =>
      stampLineage("RUN-1", "2026-01-01 00:00:00")(lowercaseAll(df))

    val parent = stage(parentProjection(Seq("ORDERITEMS_SUBFORM"))(entity))
    assert(parent.columns.toSeq ==
      Seq("curdate", "ord", "ordname", "qprice", "extractionid", "extractiontimestamputc"))
    assert(parent.count() == 2)

    val child = stage(explodeSubform("ORDERITEMS_SUBFORM", Seq("ORDNAME"))(entity))
    assert(child.count() == 2) // only SO25000001's items; empty subform drops
    val pks = child.select("ordname").distinct().collect().map(_.getString(0))
    assert(pks.toSeq == Seq("SO25000001")) // parent PK inherited
    assert(child.columns.count(_ == "ordname") == 1)
    val lines = child.select("line").collect().map(_.getLong(0)).sorted
    assert(lines.toSeq == Seq(1L, 2L))
  }

  test("typed Dataset surface: case-class Encoder over orders") {
    import spark.implicits._
    val ds = H.tbl(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .as[Order]
    val finals = ds.filter(_.o_orderstatus == "F")
    val grouped = finals.groupByKey(_.o_custkey).count().collect()
    assert(grouped.map(_._2).sum == finals.count())
  }
}
