package graft

import org.apache.spark.sql.SparkSession

/** Mini-bench for A/B experiments: same session config and timing action as
  * Bench (one shared session, each query once, codegen cold per query), over
  * an explicit query list. `runMain graft.BenchSome <sfDir> <q1> <q2> ...`
  */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
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
    scala.util.Try(H.events(spark, sfDir).count())
    var total = 0.0
    names.foreach { name =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      H.freeLocalCheckpoint(df)
      total += sec
      println(f"[benchsome] $name%-32s $sec%7.2f s")
    }
    println(f"[benchsome] TOTAL ${total}%.2f s over ${names.size} queries")
    // Codegen-compiler telemetry (drift-free A/B evidence): total janino
    // compilations and wall ms spent compiling this JVM. The bench runs 742
    // queries through ONE session, so the global codegen cache's hit rate —
    // not per-run host luck — decides how much of this is paid repeatedly.
    val cg = org.apache.spark.metrics.source.CodegenMetrics
    println(s"[benchsome] codegen: compiled=${cg.METRIC_COMPILATION_TIME.getCount} " +
      s"totalMs=${cg.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum} " +
      s"generatedClasses=${cg.METRIC_GENERATED_CLASS_BYTECODE_SIZE.getCount}")
    spark.stop()
  }
}
