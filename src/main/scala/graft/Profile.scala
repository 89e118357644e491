package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart, SparkListenerJobEnd}
import org.apache.spark.sql.SparkSession

/** Empirical profiler for one query (guide §1): splits wall time into
  * driver-side plan construction / analysis+optimization vs execution, and
  * prints per-stage task-time/shuffle metrics so the hot stage is visible
  * without the UI. `runMain graft.Profile <name> [sfDir] [reps]`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", H.scratchDir)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Seq("lineitem", "orders", "customer", "documents", "embeddings")
      .foreach(t => scala.util.Try(H.tbl(spark, sfDir, t).count()))

    final case class StageRow(id: Int, name: String, tasks: Int, taskMs: Long,
        gcMs: Long, shRead: Long, shWrite: Long, wallMs: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[StageRow]()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = ()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.add(StageRow(si.stageId, si.name.takeWhile(_ != '\n'),
          si.numTasks, m.executorRunTime, m.jvmGCTime,
          m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
          (for { a <- si.completionTime; b <- si.submissionTime } yield a - b).getOrElse(-1L)))
      }
    }

    (1 to reps).foreach { r =>
      stages.clear(); jobs.set(0)
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime() // fn() returned: plan built + any eager work inside
      val n = df.count()
      val t2 = System.nanoTime()
      H.freeLocalCheckpoint(df)
      Thread.sleep(300) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      println(f"[profile] rep $r: total ${(t2 - t0) / 1e9}%.2f s  (fn+eager ${(t1 - t0) / 1e9}%.2f s, count ${(t2 - t1) / 1e9}%.2f s), $n rows, ${jobs.get()} jobs")
      import scala.jdk.CollectionConverters._
      val rows = stages.asScala.toSeq.sortBy(-_.wallMs)
      println(f"[profile]   stages=${rows.size} wallSum=${rows.map(_.wallMs).sum / 1e3}%.2f s taskSum=${rows.map(_.taskMs).sum / 1e3}%.2f s gcSum=${rows.map(_.gcMs).sum / 1e3}%.2f s shRead=${rows.map(_.shRead).sum / 1e6}%.1f MB")
      rows.take(12).foreach { s =>
        println(f"[profile]   stage ${s.id}%4d wall=${s.wallMs}%6d ms task=${s.taskMs}%6d ms gc=${s.gcMs}%4d ms tasks=${s.tasks}%3d shR=${s.shRead / 1024}%6d KB shW=${s.shWrite / 1024}%6d KB  ${s.name.take(90)}")
      }
    }
    spark.stop()
  }
}
