package graft

import org.scalatest.funsuite.AnyFunSuite

/** Spark 4 SQL-surface invariants behind the driver queries: pipe syntax
  * folds to the plain-SQL plan, SQL UDF bodies inline (no UDF boundary in
  * the physical plan), collations compare case-insensitively, and named
  * parameter markers bind server-side.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withView[A](name: String)(body: => A): A =
    try body finally spark.catalog.dropTempView(name)

  test("pipe syntax produces the same result and plan shape as plain SQL") {
    import spark.implicits._
    (1 to 100).map(i => (i, s"g${i % 3}")).toDF("v", "g")
      .createOrReplaceTempView("pipe_spec")
    withView("pipe_spec") {
      val piped = spark.sql(
        "FROM pipe_spec |> WHERE v > 10 " +
          "|> AGGREGATE count(*) AS n, sum(v) AS s GROUP BY g " +
          "|> WHERE n > 5 |> SELECT g, n, s |> ORDER BY g")
      val plain = spark.sql(
        "SELECT g, count(*) AS n, sum(v) AS s FROM pipe_spec WHERE v > 10 " +
          "GROUP BY g HAVING count(*) > 5 ORDER BY g")
      assert(piped.collect().toSeq == plain.collect().toSeq)
      val shape = piped.queryExecution.executedPlan.toString
      assert(shape.contains("HashAggregate"), shape)
    }
  }

  test("SQL UDF body inlines — no UDF node survives in the physical plan") {
    spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION spec_double(x BIGINT) " +
      "RETURNS BIGINT RETURN x * 2")
    val df = spark.range(5).selectExpr("spec_double(id) AS y")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(0L, 2L, 4L, 6L, 8L))
  }

  test("SQL table function parameter reaches the inner WHERE") {
    import spark.implicits._
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "s")
      .createOrReplaceTempView("tvf_spec")
    withView("tvf_spec") {
      spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION spec_pick(mk INT) " +
        "RETURNS TABLE(k INT, s STRING) " +
        "RETURN SELECT k, s FROM tvf_spec WHERE k >= mk")
      assert(spark.sql("SELECT * FROM spec_pick(2) ORDER BY k")
        .collect().map(_.getString(1)).toSeq == Seq("b", "c"))
    }
  }

  test("UTF8_LCASE collation: equality and DISTINCT ignore case") {
    import spark.implicits._
    Seq("Alpha", "ALPHA", "alpha", "Beta").toDF("s")
      .createOrReplaceTempView("coll_spec")
    withView("coll_spec") {
      val r = spark.sql(
        "SELECT count(*) AS m, count(DISTINCT s COLLATE UTF8_LCASE) AS d " +
          "FROM coll_spec WHERE s COLLATE UTF8_LCASE = 'aLpHa'").head()
      assert((r.getLong(0), r.getLong(1)) == (3L, 1L))
    }
  }

  test("named parameter markers bind typed values") {
    val r = spark.sql(
      "SELECT count(*) AS n FROM range(100) WHERE id BETWEEN :lo AND :hi",
      Map("lo" -> Int.box(10), "hi" -> Int.box(19))).head()
    assert(r.getLong(0) == 10L)
  }
}
