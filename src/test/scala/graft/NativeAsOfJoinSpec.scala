package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom whole-operator as-of join (graft.plans.AsOfJoinPlan /
  * AsOfJoinExec / GraftStrategy): result-identical to the composed
  * equi-join + rank formulation, planned with one exchange per side, and
  * correct on the edge shapes the merge pass has to get right (no-match
  * keys, null times, tie-breaking, empty right side).
  */
class NativeAsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def leftDf = Seq(
    // (id, key, t)
    (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 5L),
    (4L, "b", 100L), (5L, "c", 7L), (6L, "z", 1L)
  ).toDF("p_id", "key", "p_t")

  private def rightDf = Seq(
    // (id, key, t) — "a" has ties at t=10; "c" only has later rows; "z" none
    (101L, "ra", 10L), (102L, "ra", 10L), (103L, "ra", 15L), (104L, "ra", 1L),
    (105L, "rb", 90L), (106L, "rb", 100L),
    (107L, "rc", 8L)
  ).toDF("c_id", "rkey", "c_t")
    .withColumn("rkey", expr("substr(rkey, 2)"))

  private def native(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame) =
    graft.plans.AsOfJoin.asOf(l, r, "key", "rkey", "p_t", "c_t", "c_id")

  test("matches the composed join+rank formulation on events at sf0.001") {
    val ev = H.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    val nat = native(
      purchases.withColumnRenamed("user_id", "key").withColumnRenamed("p_ts", "p_t"),
      clicks.withColumnRenamed("c_user", "rkey").withColumnRenamed("c_ts", "c_t"))
      .select(col("p_id"), col("c_id"))
    val composed = graft.ops.Relational.asOfJoin(
      purchases, clicks.withColumnRenamed("c_user", "user_id"),
      key = "user_id", leftTs = "p_ts", rightTs = "c_ts",
      leftId = "p_id", rightTieBreak = "c_id")
      .select(col("p_id"), col("c_id"))
    assert(nat.exceptAll(composed).isEmpty && composed.exceptAll(nat).isEmpty)
    assert(nat.count() === purchases.count()) // left outer: one row per left
  }

  test("backward match, tie-break by id, no-match key null-extends") {
    val out = native(leftDf, rightDf)
      .select("p_id", "c_id").as[(Long, Option[Long])].collect().toMap
    assert(out(1L) === Some(102L)) // t=10 ties -> max c_id wins
    assert(out(2L) === Some(103L)) // latest <= 20 is t=15
    assert(out(3L) === Some(104L)) // only t=1 qualifies
    assert(out(4L) === Some(106L)) // exact-equal time matches
    assert(out(5L) === None)       // "c" has only later rows
    assert(out(6L) === None)       // "z" unmatched key
  }

  test("null LEFT time matches nothing, in both directions") {
    val l = Seq((1L, "a", Option(10L)), (2L, "a", Option.empty[Long]))
      .toDF("p_id", "key", "p_t")
    val back = graft.plans.AsOfJoin
      .asOf(l, rightDf, "key", "rkey", "p_t", "c_t", "c_id")
      .select("p_id", "c_id").as[(Long, Option[Long])].collect().toMap
    assert(back(1L) === Some(102L) && back(2L) === None)
    val fwd = graft.plans.AsOfJoin
      .asOf(l, rightDf, "key", "rkey", "p_t", "c_t", "c_id", forward = true)
      .select("p_id", "c_id").as[(Long, Option[Long])].collect().toMap
    assert(fwd(1L) === Some(101L) && fwd(2L) === None)
  }

  test("null right times are dead rows; null left key never matches") {
    val l = Seq((1L, Option("a"), 10L), (2L, Option.empty[String], 10L))
      .toDF("p_id", "key", "p_t")
    val r = Seq((201L, Option("a"), Option(5L)), (202L, Option("a"), Option.empty[Long]))
      .toDF("c_id", "rkey", "c_t")
    val out = native(l, r).select("p_id", "c_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(out(1L) === Some(201L)) // the null-time row is skipped, not matched
    assert(out(2L) === None)
  }

  test("empty right side null-extends every left row") {
    val out = native(leftDf, rightDf.filter(col("c_id") < 0))
    assert(out.count() === 6 && out.filter(col("c_id").isNotNull).count() === 0)
  }

  test("tolerance bound lapses too-old matches to null-extension") {
    val out = graft.plans.AsOfJoin
      .asOf(leftDf, rightDf, "key", "rkey", "p_t", "c_t", "c_id",
        toleranceMicros = Some(4L))
      .select("p_id", "c_id").as[(Long, Option[Long])].collect().toMap
    assert(out(1L) === Some(102L)) // exact-time tie, gap 0 <= 4
    assert(out(2L) === None)       // best candidate gap 20-15=5 > 4 lapses
    assert(out(3L) === Some(104L)) // gap 5-1=4 <= 4 qualifies (boundary)
    assert(out(4L) === Some(106L)) // gap 0
  }

  test("forward direction: first right at/after, min-id tie-break, peek not consume") {
    val out = graft.plans.AsOfJoin
      .asOf(leftDf, rightDf, "key", "rkey", "p_t", "c_t", "c_id", forward = true)
      .select("p_id", "c_id").as[(Long, Option[Long])].collect().toMap
    assert(out(1L) === Some(101L)) // t=10 ties -> MIN c_id (101, not 102)
    assert(out(2L) === None)       // nothing at/after t=20 for key a
    assert(out(3L) === Some(101L)) // first >= 5 is t=10; row not consumed by p_id=1
    assert(out(4L) === Some(106L)) // exact equal time
    assert(out(5L) === Some(107L)) // forward finds the later-only row
    assert(out(6L) === None)
  }

  test("forward tolerance bounds the look-ahead") {
    val out = graft.plans.AsOfJoin
      .asOf(leftDf, rightDf, "key", "rkey", "p_t", "c_t", "c_id",
        toleranceMicros = Some(1L), forward = true)
      .select("p_id", "c_id").as[(Long, Option[Long])].collect().toMap
    assert(out(3L) === None)       // gap 10-5=5 > 1 lapses
    assert(out(5L) === Some(107L)) // gap 8-7=1 <= 1 qualifies
  }

  test("agrees with composed formulation on 50k synthetic rows, many keys per partition") {
    // deterministic pseudo-random shapes: hashed ids spread 300 keys and
    // collide times (div 7 / div 3) so every partition holds many key
    // groups, duplicate times exercise the tie-break, and ~1/6 of left
    // keys (key 250+) have no right rows at all
    val l = spark.range(50000L).selectExpr(
      "id AS p_id", "CAST(pmod(hash(id), 300) AS STRING) AS key",
      "CAST(pmod(hash(id * 31), 1000) div 7 AS BIGINT) AS p_t")
    val r = spark.range(50000L).selectExpr(
      "id + 1000000 AS c_id", "CAST(pmod(hash(id + 7), 250) AS STRING) AS rkey",
      "CAST(pmod(hash(id * 17), 1000) div 3 AS BIGINT) AS c_t")
    val nat = native(l, r).select("p_id", "c_id")
    val composed = graft.ops.Relational.asOfJoin(
      l.withColumnRenamed("key", "k").withColumnRenamed("p_t", "p_ts"),
      r.withColumnRenamed("rkey", "k").withColumnRenamed("c_t", "c_ts"),
      key = "k", leftTs = "p_ts", rightTs = "c_ts",
      leftId = "p_id", rightTieBreak = "c_id")
      .select("p_id", "c_id")
    assert(nat.count() === 50000L)
    assert(nat.exceptAll(composed).isEmpty && composed.exceptAll(nat).isEmpty)
  }

  test("custom rule pushes left-only filters through the node to the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_asof_push").toString
    leftDf.write.parquet(s"$dir/l")
    rightDf.write.parquet(s"$dir/r")
    val df = native(spark.read.parquet(s"$dir/l"), spark.read.parquet(s"$dir/r"))
      .filter(col("p_t") > 5L && col("c_id").isNotNull)
    // left-only conjunct moved below the custom node...
    val opt = df.queryExecution.optimizedPlan
    val topFilter = opt.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition.sql
    }
    assert(!topFilter.exists(_.contains("p_t")),
      s"left-only predicate stayed above the as-of join: $topFilter")
    // ...and all the way into the parquet scan by the built-in rules
    val scans = df.queryExecution.executedPlan.toString
    assert(scans.contains("PushedFilters") && scans.contains("GreaterThan(p_t,5"))
    // right-side predicate must NOT be pushed (it would change null-extension)
    assert(opt.toString.contains("isnotnull(c_id"))
    // and the result still honors both predicates
    val rows = df.select("p_id").as[Long].collect().sorted
    assert(rows === Array(1L, 2L, 4L)) // p_t>5 drops 3,6(t<=5)... and c filter drops 5
  }

  test("plans as AsOfJoin with one exchange per side (no join blow-up)") {
    val df = native(leftDf, rightDf)
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val s = plan.toString
    assert(s.contains("AsOfJoin"))
    assert(!s.contains("SortMergeJoin") && !s.contains("BroadcastHashJoin"))
  }
}
