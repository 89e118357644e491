package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Two r10 hardenings (the official CORRECTNESS_r10.json came back `{}`
  * because the sequential dump overran the driver's budget and the oracle
  * file was written LAST — a kill left parquet dirs but no oracle map, which
  * the compare reads as an empty round):
  *   1. `oracle_sql.json` is written FIRST — it depends only on
  *      `SparkEntry.oracleSql`, so even a mid-dump kill yields a partial,
  *      comparable record instead of a zeroed one.
  *   2. The dump runs on a small worker POOL, longest-first. The wall-time
  *      dominators are the ~28 executed-streaming queries, and their cost is
  *      micro-batch cadence + state-store I/O — wall-clock, not CPU — so they
  *      overlap almost perfectly. Each query gets its OWN child session
  *      (`spark.newSession()`): temp views, conf mutations, UDF registration
  *      and the streaming query manager are per-session; the shared
  *      persistent catalog is touched only under query-unique names; every
  *      file sink goes through H.tmpDir (unique dirs). Query programs hold
  *      no singleton mutable state (round-11 sweep: every `var` in
  *      functions/queries is method-local).
  */
object Verify {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: Verify <sfDir> <outDir> [queryName...]")
    val Array(sfDir, outDir) = args.take(2)
    // optional extra args: run only these queries (dev loop; the driver
    // always passes exactly two args and gets the full dump)
    val only = args.drop(2).toSet
    val unknown = only.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")}")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    // default to the machine's cores (bounded 32): the driver's budget is
    // wall-clock, and an un-set env var must not quarter the dump's cores
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", H.scratchDir)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Longest-first scheduling (classic LPT): order by the clean bench
    // reference when present so the streaming heavies launch immediately
    // instead of trailing the makespan. Unknown queries go first (unknown
    // cost is the risk; schedule it early).
    val refSec: Map[String, Double] = scala.util.Try {
      val txt = new String(Files.readAllBytes(Paths.get("BENCH_FULL.json")), "UTF-8")
      val body = txt.substring(txt.indexOf("\"queries\":{") + 11)
      """"([A-Za-z0-9_]+)":([0-9.Ee+-]+)""".r.findAllMatchIn(body)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }.getOrElse(Map.empty)
    val work = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.isEmpty || only(name) }
      .sortBy { case (name, _) => -refSec.getOrElse(name, 1e9) }

    val par = math.max(1, sys.env.getOrElse("SPARK_GRAFT_VERIFY_PAR", "6").toInt)
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val failed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
    val t00 = System.nanoTime()
    work.foreach { case (name, fn) =>
      pool.execute { () =>
        val t0 = System.nanoTime()
        var df: org.apache.spark.sql.DataFrame = null
        try {
          val ss = spark.newSession()
          df = fn(ss, sfDir)
          df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
          // release the result's own localCheckpoint blocks (H.materialized
          // frees a query's INPUTS; the checkpointed result itself would
          // otherwise sit in executor storage until GC notices — across ~700
          // queries that is a steadily rising heap floor, r9 verdict item 5)
          H.freeLocalCheckpoint(df)
          val sec = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[verify] $name%-32s ${sec}%7.2f s  (${done.incrementAndGet()}/${work.size}, wall ${(System.nanoTime() - t00) / 1e9}%.0f s)")
        } catch { case e: Throwable =>
          // free on the FAILURE path too: a query that dies after its
          // localCheckpoint materialized would otherwise leak those blocks
          // across the rest of the run (r10 advice item 3)
          if (df != null) scala.util.Try(H.freeLocalCheckpoint(df))
          failed.add(name); done.incrementAndGet()
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    pool.shutdown()
    pool.awaitTermination(24, java.util.concurrent.TimeUnit.HOURS)
    // Sequential retry of pool-phase failures: concurrent queries share
    // the session-wide CacheManager, so two queries caching IDENTICAL
    // subplans share one InMemoryRelation — the first query's unpersist
    // can drop it mid-read for the second, whose rebuild then needs a
    // localCheckpoint that was freed with it ("Block rdd_N does not
    // exist", observed once in ~6 full boards on the dedup family).
    // Alone on the session, the retry cannot hit the race.
    val byName = SparkEntry.queries
    failed.toArray.map(_.toString).sorted.foreach { name =>
      val t0 = System.nanoTime()
      var df: org.apache.spark.sql.DataFrame = null
      try {
        df = byName(name)(spark.newSession(), sfDir)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        H.freeLocalCheckpoint(df)
        failed.remove(name)
        System.err.println(f"[verify] $name%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (sequential retry ok)")
      } catch { case e: Throwable =>
        if (df != null) scala.util.Try(H.freeLocalCheckpoint(df))
        System.err.println(s"[verify] $name failed on retry: ${e.getMessage}")
      }
    }
    val wall = (System.nanoTime() - t00) / 1e9
    System.err.println(f"[verify] dump complete: ${work.size - failed.size}/${work.size} ok, wall ${wall}%.1f s, par=$par")
    spark.stop()
    if (!failed.isEmpty)
      System.err.println(s"[verify] FAILED: ${failed.toArray.toSeq.map(_.toString).sorted.mkString(", ")}")
  }
}
