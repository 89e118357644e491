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

  test("multi-dialect DDL: golden renders for the dictionary's three targets") {
    // the reference dictionary (datatypesConvert.json:4-36) declares MySQL
    // and Postgres target columns it never executes; pin the engine's
    // render of each byte-for-byte so a mapping drift is a test diff here,
    // not an oracle mismatch in o16b_ddl_dialects
    val m = Fixtures.ordersMeta
    assert(EdmTypes.ddlDialect(m, "stg_", "azuresql") ==
      EdmTypes.ddl(m, "stg_")) // azure render is the identity
    assert(EdmTypes.ddlDialect(m, "stg_", "mysql") ==
      "CREATE TABLE IF NOT EXISTS stg_orders (" +
        "ordname VARCHAR(255), curdate DATETIME, qprice NUMERIC(38,3), " +
        "ord BIGINT, extractionid VARCHAR(36), " +
        "extractiontimestamputc DATETIME, PRIMARY KEY (ordname))")
    assert(EdmTypes.ddlDialect(m, "stg_", "postgres") ==
      "CREATE TABLE IF NOT EXISTS stg_orders (" +
        "ordname VARCHAR(255), curdate TIMESTAMP, qprice NUMERIC, " +
        "ord BIGINT, extractionid VARCHAR(36), " +
        "extractiontimestamputc TIMESTAMP, PRIMARY KEY (ordname))")
    // the non-key String/Decimal cells follow the dictionary rows exactly:
    // MySQL TEXT(255) / scale-3 numeric, Postgres bare VARCHAR/NUMERIC
    val s = EdmTypes.renderType(
      EdmTypes.targetFor("priority",
        FieldMeta("X", "Edm.String", keyFlag = false)).azureSql, "mysql")
    assert(s == "TEXT(255)")
    assert(EdmTypes.renderType("VARCHAR", "postgres") == "VARCHAR")
  }

  test("composite PKs render comma-separated") {
    val m = EntityMeta("T", "priority",
      Seq(FieldMeta("A", "Edm.String", keyFlag = true),
        FieldMeta("B", "Edm.Int64", keyFlag = true)),
      Seq("A", "B"))
    assert(EdmTypes.ddl(m).contains("PRIMARY KEY (a, b)"))
  }
}
