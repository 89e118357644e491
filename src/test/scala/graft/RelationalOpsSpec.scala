package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.EntityConfig
import graft.ops.Relational._

class RelationalOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def orders = H.tbl(spark, sf, "orders")
  private def lineitem = H.tbl(spark, sf, "lineitem")

  private def entity(flag: Boolean, lastRun: Option[String], start: Option[String]) =
    EntityConfig("ORDERS", flag, "o_orderdate", Seq.empty, lastRun, start)

  test("watermark truth table: filterFlag off → no filter either mode") {
    val e = entity(flag = false, Some("1999-01-01 00:00:00"), Some("1995-01-01 00:00:00"))
    assert(watermarkFilter(e, incremental = true)(orders).count() == orders.count())
    assert(watermarkFilter(e, incremental = false)(orders).count() == orders.count())
  }

  test("watermark truth table: incremental uses lastRun, full uses dataStartDate") {
    val e = entity(flag = true, Some("1999-01-01 00:00:00"), Some("1995-01-01 00:00:00"))
    val inc = watermarkFilter(e, incremental = true)(orders)
    val full = watermarkFilter(e, incremental = false)(orders)
    assert(inc.count() ==
      orders.filter($"o_orderdate" >= "1999-01-01").count())
    assert(full.count() == orders.count()) // start predates all data
    assert(inc.count() < full.count())
  }

  test("lowercaseAll is idempotent and total") {
    val up = orders.toDF(orders.columns.map(_.toUpperCase).toIndexedSeq: _*)
    val once = lowercaseAll(up)
    assert(once.columns.forall(c => c == c.toLowerCase))
    assert(lowercaseAll(once).columns.toSeq == once.columns.toSeq)
  }

  test("nest/split round-trip: child rows == lineitem rows, parents all kept") {
    val nested = nestChild(orders, lineitem, "o_orderkey", "l_orderkey",
      "lineitems_subform", Seq("l_linenumber"))
    assert(nested.count() == orders.count()) // left join keeps all parents
    val parent = parentProjection(Seq("lineitems_subform"))(nested)
    assert(parent.columns.toSeq == orders.columns.toSeq) // deterministic order
    val child = explodeSubform("lineitems_subform", Seq("o_orderkey"))(nested)
    assert(child.count() == lineitem.count())
    assert(child.columns.contains("o_orderkey")) // parent PK inherited
  }

  test("explode drops parents with empty subforms (inner explode, O11)") {
    val someOrders = orders.limit(50)
    val noItems = lineitem.filter(lit(false))
    val nested = nestChild(someOrders, noItems, "o_orderkey", "l_orderkey",
      "sf", Seq("l_linenumber"))
    assert(explodeSubform("sf", Seq("o_orderkey"))(nested).count() == 0)
  }

  test("stampLineage adds run id + timestamp to every row") {
    val staged = stampLineage("RUN", "2026-01-01 00:00:00")(orders.limit(3))
    val rows = staged.select("extractionid", "extractiontimestamputc").distinct().collect()
    assert(rows.length == 1)
    assert(rows(0).getString(0) == "RUN")
  }

  test("dedupLatestByPk keeps exactly the latest row per key") {
    val df = Seq(
      ("a", "r1", 1), ("a", "r2", 2), ("b", "r1", 3)
    ).toDF("pk", "run", "v")
    val out = dedupLatestByPk(Seq("pk"), "run")(df)
      .orderBy("pk").collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(out.toSeq == Seq(("a", "r2", 2), ("b", "r1", 3)))
  }

  test("asOfJoin picks the single latest right row at or before left ts") {
    val left = Seq((1L, 10L, 100L), (2L, 10L, 50L)).toDF("p_id", "user_id", "p_ts")
    val right = Seq((7L, 10L, 90L), (8L, 10L, 100L), (9L, 10L, 200L))
      .toDF("c_id", "user_id", "c_ts")
    val out = asOfJoin(left, right, "user_id", "p_ts", "c_ts", "p_id", "c_id")
      .select("p_id", "c_id").orderBy("p_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1))))
    assert(out.toSeq == Seq((1L, Some(8L)), (2L, None)))
  }
}
