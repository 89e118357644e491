package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.warehouse.dir",
        // swept at JVM exit — bucketed-table specs write real data here,
        // and java.io.tmpdir is RAM-backed tmpfs (see H.cleanupOnExit)
        H.cleanupOnExit(
          java.nio.file.Files.createTempDirectory("graft_wh").toString))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** ONE pooled execution of every registered query at sf0.001, shared by
  * QueriesSmokeSpec (asserts the counts) and PlanGuardsSpec (asserts the
  * plans). Before r12 each suite ran the full registry sequentially on its
  * own — together they were ~19 of the suite's 24 minutes, which overran
  * the round driver's `sbt test` budget (r11 verdict item 2).
  *
  * The pool mirrors graft.Verify's proven-safe shape: par=6, one
  * `spark.newSession()` per query (isolated temp views / session state),
  * and a sequential alone-on-the-session retry for the shared-CacheManager
  * unpersist race Verify documents. Plan strings are captured BEFORE the
  * count so AQE still prints the same pre-execution plan the guard
  * assertions were written against. */
object QueryRuns {
  final case class RunInfo(
      rows: Long,
      executedPlan: String,
      optimizedPlan: String,
      analyzed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)

  lazy val all: Map[String, scala.util.Try[RunInfo]] = {
    val session = TestSpark.spark // resolve OUTSIDE the pool (lazy-val lock)
    val sf = "/root/testdata/sf0.001"
    def runOnce(name: String): scala.util.Try[RunInfo] = scala.util.Try {
      val df = SparkEntry.queries(name)(session.newSession(), sf)
      val qe = df.queryExecution
      val info = RunInfo(-1L, qe.executedPlan.toString,
        qe.optimizedPlan.toString, qe.analyzed)
      val n = df.count()
      H.freeLocalCheckpoint(df)
      info.copy(rows = n)
    }
    val out = new java.util.concurrent.ConcurrentHashMap[
      String, scala.util.Try[RunInfo]]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    SparkEntry.queries.keysIterator.foreach { name =>
      pool.execute(() => { out.put(name, runOnce(name)); () })
    }
    pool.shutdown()
    pool.awaitTermination(2, java.util.concurrent.TimeUnit.HOURS)
    import scala.jdk.CollectionConverters._
    out.asScala.toMap.map {
      case (name, r) if r.isFailure => name -> runOnce(name) // lone retry
      case kv => kv
    }
  }
}
