package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Production ETL input hygiene: the reference trusts every OData response
  * blindly (response.json() at priorityDataSource.py:182); the engine's
  * decode path must instead classify malformed records (PERMISSIVE +
  * columnNameOfCorruptRecord) or fail fast (FAILFAST), per run policy.
  */
class MalformedInputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val lines = Seq(
    """{"ordname": "SO1", "ord": 1}""",
    """{"ordname": "SO2", "ord": "not-a-number"}""",
    """{"ordname": "SO3", "ord": 3""", // truncated json
    """{"ordname": "SO4", "ord": 4}""")

  private val schema = StructType(Seq(
    StructField("ordname", StringType),
    StructField("ord", LongType),
    StructField("_bad", StringType)))

  test("PERMISSIVE decode keeps good rows and quarantines bad ones") {
    import spark.implicits._
    val df = spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .json(lines.toDS())
    val good = df.filter(col("_bad").isNull)
    val bad = df.filter(col("_bad").isNotNull)
    assert(good.count() == 2) // SO1, SO4
    assert(bad.count() == 2) // type error + truncated
    // quarantined rows keep the raw payload for replay
    assert(bad.select("_bad").collect().forall(_.getString(0).startsWith("{")))
  }

  test("FAILFAST decode aborts the load on the first malformed record") {
    import spark.implicits._
    val df = spark.read
      .schema(StructType(schema.dropRight(1)))
      .option("mode", "FAILFAST")
      .json(lines.toDS())
    assertThrows[SparkException](df.count())
  }
}
