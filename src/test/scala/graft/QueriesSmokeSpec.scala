package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query runs end-to-end at sf0.001 (fast regression net;
  * value-level correctness is the driver's DuckDB compare + localcheck).
  * The queries execute ONCE through the shared [[QueryRuns]] pool (see its
  * scaladoc — r11 verdict item 2, the `sbt test` budget); each per-query
  * test just asserts its recorded outcome. */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("registry is consistent: every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.nonEmpty)
  }

  SparkEntry.queries.keysIterator.toSeq.sorted.foreach { name =>
    test(s"query $name executes at sf0.001") {
      assert(QueryRuns.all(name).get.rows >= 0)
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
