package graft

import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{EntityMeta, FieldMeta, Fixtures}
import graft.types.EdmTypes

class EdmTypesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  test("mapping is total over the reference's four priority Edm types") {
    val edm = Seq("Edm.String", "Edm.Decimal", "Edm.DateTimeOffset", "Edm.Int64")
    edm.foreach { t =>
      assert(EdmTypes.mapping.contains(("priority", t)), s"missing $t")
    }
    assert(EdmTypes.mapping(("priority", "Edm.Int64")).spark == LongType)
    assert(EdmTypes.mapping(("priority", "Edm.DateTimeOffset")).spark == TimestampType)
  }

  test("PK override: key fields become VARCHAR(255)/StringType whatever their source type") {
    val f = FieldMeta("ORD", "Edm.Int64", keyFlag = true)
    val t = EdmTypes.targetFor("priority", f)
    assert(t.azureSql == "VARCHAR(255)")
    assert(t.spark == StringType)
  }

  test("unknown source types degrade to text, never throw") {
    check(Prop.forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (sys, typ) =>
      val t = EdmTypes.targetFor(sys, FieldMeta("X", typ, keyFlag = false))
      t.spark == StringType || EdmTypes.mapping.contains((sys, typ))
    })
  }

  test("schema build: metadata order preserved, audit columns last, key metadata set") {
    val st = EdmTypes.toStructType(Fixtures.ordersMeta)
    assert(st.fieldNames.toSeq == Seq("ordname", "curdate", "qprice", "ord",
      "extractionid", "extractiontimestamputc"))
    assert(st("ordname").metadata.getBoolean("keyFlag"))
    assert(st("ordname").dataType == StringType) // PK erasure
    assert(st("qprice").dataType == DecimalType(38, 3))
  }

  test("DDL rendering: typed columns + PK clause + audit columns") {
    val ddl = EdmTypes.ddl(Fixtures.ordersMeta, "stg_")
    assert(ddl.startsWith("CREATE TABLE IF NOT EXISTS stg_orders ("))
    assert(ddl.contains("ordname VARCHAR(255)"))
    assert(ddl.contains("qprice NUMERIC"))
    assert(ddl.contains("extractionid VARCHAR(36)"))
    assert(ddl.contains("PRIMARY KEY (ordname)"))
  }

  test("composite PKs render comma-separated") {
    val m = EntityMeta("T", "priority",
      Seq(FieldMeta("A", "Edm.String", keyFlag = true),
        FieldMeta("B", "Edm.Int64", keyFlag = true)),
      Seq("A", "B"))
    assert(EdmTypes.ddl(m).contains("PRIMARY KEY (a, b)"))
  }
}
