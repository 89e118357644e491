package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One named, judged query: a Spark DataFrame program plus (optionally) the
  * equivalent ANSI SQL for the DuckDB oracle. Oracle-less queries get the
  * driver's weaker rows-only check (used for ops whose semantics aren't
  * SQL-expressible, e.g. approx sketches).
  */
final case class Q(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)

trait QueryModule {
  def all: Seq[Q]
}

/** Shared helpers for oracle-exact query authoring.
  *
  * Determinism rules (the DuckDB compare hashes values, so results must be
  * bit-reproducible across runs AND engines):
  *   - Never emit a raw double produced by a multi-row aggregation: Spark's
  *     partial-aggregation order varies run-to-run. Sum through an exact
  *     DECIMAL cast, then cast the final value back to DOUBLE (both engines
  *     round-to-nearest identically on the cast, so the result is
  *     bit-identical and the output schema is a plain double).
  *   - Never emit raw timestamps (parquet tz-annotation differs between a
  *     Spark write and a DuckDB read); format to strings.
  *   - Every query ends with a total-order sort so row order is stable.
  */
object H {
  /** Spark-side timestamp → string, microsecond precision.
    * DuckDB twin: strftime(ts, '%Y-%m-%d %H:%M:%S.%f'). */
  def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Second-precision variant for date-like timestamps.
    * DuckDB twin: strftime(ts, '%Y-%m-%d %H:%M:%S'). */
  def fmtTsSec(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Exact money: 2-dp doubles → DECIMAL(12,2) (values < 1e10). */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Exact small factor (discount/tax ∈ [0,2]) → DECIMAL(4,2). */
  def dec2s(c: Column): Column = c.cast(DecimalType(4, 2))

  /** Exact decimal sum emitted as a plain double (see determinism rules). */
  def sumMoney(c: Column): Column = sum(dec2(c)).cast("double")

  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    canonicalTypes(spark.read.parquet(s"$dir/$name.parquet"))

  /** The session's shuffle parallelism — the scale-adaptive partition count
    * for explicit repartitions (never a hard-coded constant: the bench
    * runs this engine at several core counts, and a cluster session sets
    * its own value). */
  def numShufflePartitions(df: DataFrame): Int =
    // non-numeric values (e.g. "auto" on some platforms) fall back to the
    // cluster's default parallelism instead of throwing at plan build
    scala.util.Try(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
      .getOrElse(df.sparkSession.sparkContext.defaultParallelism)

  /** Spread a frame across the session's shuffle parallelism by hash of
    * `key` — the guide-§2.5 "repartition immediately after the read" fix
    * for CPU-dense work above an under-split source. Two measured local
    * under-parallelism sources (r11 profile): (a) a single-file parquet
    * scan is ONE task regardless of cores (splits stop at row-group
    * granularity), so per-row-heavy map chains run 1-threaded; (b) AQE's
    * byte-based partition coalescing (minPartitionSize = 1 MB) collapses
    * a small cached/checkpointed aggregate to 1 partition, and a
    * CPU-dense expansion join downstream inherits it. The explicit count
    * pins the exchange against AQE coalescing (REPARTITION_BY_NUM); the
    * bytes moved are the narrow pre-expansion rows — the "shuffle a
    * lightweight proxy to parallelize the heavy work" trade. Use ONLY
    * above work that is CPU-dense per input byte (hashing, codecs, pair
    * expansion); a plain aggregation is better served by the scan's own
    * partitioning and map-side combine. */
  def spread(df: DataFrame, key: Column): DataFrame =
    df.repartition(numShufflePartitions(df), key)

  /** Canonicalize physically-encoding-dependent column types at the load
    * boundary, so every query downstream sees one schema regardless of how
    * the parquet writer annotated the data. The reference does the same
    * thing one level up — schema comes from $metadata, never from the file
    * (reference/resources/priorityDataSource.py:375-458). Current rules:
    *   - TIMESTAMP_NTZ (micros, isAdjustedToUTC=0) → TimestampType. All
    *     harness sessions run UTC, so NTZ wall-time → UTC instant is
    *     deterministic and matches DuckDB's naive-timestamp read.
    *   - DATE → TimestampType (midnight UTC). The date-valued columns
    *     (o_orderdate, l_shipdate, …) have always shipped as timestamps;
    *     if a future provision ships parquet DATE, every timestamp
    *     comparison/format downstream keeps working, and DuckDB agrees
    *     because it casts DATE to midnight in timestamp comparisons and
    *     strftime alike.
    *   - DECIMAL(p,s) → DOUBLE. The numeric measure columns (prices,
    *     quantities, event values) have always shipped as DOUBLE and every
    *     query (and the H.dec2 exact-sum discipline) is written against
    *     that; a provision that re-encodes them as parquet DECIMAL would
    *     otherwise shift every downstream output schema and trip the
    *     functions that reject decimal inputs outright — the same one-
    *     encoding-breaks-a-family failure as the r6 NTZ burn. The values
    *     testdata ships are 2-dp, so decimal→double is exact.
    * Nanos-as-long is handled per-table (see `events`): a bare LongType
    * can't be distinguished from a genuine integer column generically. */
  def canonicalTypes(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{DateType, DecimalType, TimestampNTZType}
    val ts = df.schema.fields.collect {
      case f if f.dataType == TimestampNTZType || f.dataType == DateType => f.name
    }
    val dec = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[DecimalType] => f.name
    }
    val t = ts.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast("timestamp")))
    dec.foldLeft(t)((d, c) => d.withColumn(c, col(c).cast("double")))
  }

  /** Spark scratch (shuffle files, spills, block-manager disk store) for
    * the single-JVM harness: RAM-backed tmpfs when available. On this box
    * /tmp is a virtual disk with intermittent multi-second flush stalls
    * that land on whichever shuffle-heavy query is running (measured: the
    * same query 5 s warm and 60-90 s when a stall hits); /dev/shm takes
    * the disk out of the shuffle path entirely. The cluster analogue is
    * instance-local NVMe for `spark.local.dir` — never network storage. */
  def scratchDir: String = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) {
      val d = new java.io.File(shm, "graft-scratch")
      d.mkdirs()
      d.getAbsolutePath
    } else System.getProperty("java.io.tmpdir")
  }

  /** Fresh exit-cleaned scratch directory for query-program sinks
    * (streaming checkpoints, roundtrip files, layout rewrites), placed on
    * the RAM-backed scratch volume rather than /tmp: on this box /tmp is
    * disk-backed, and a streaming checkpoint's WAL/state fsync cadence on
    * it measurably inflates every micro-batch (r7 verdict #3). */
  def tmpDir(prefix: String): String =
    cleanupOnExit(java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(scratchDir), prefix).toString)

  /** Register a scratch directory for recursive deletion at JVM exit.
    *
    * Query programs that exercise a SINK (layout rewrites, streaming
    * checkpoints, roundtrip sources) write real files and return a lazy
    * reader over them, so the files must outlive the query call — but
    * build.sbt points java.io.tmpdir at /dev/shm, where an unbounded
    * accumulation of forgotten sink dirs would eat RAM until reboot.
    * A shutdown hook bounds the leak to one process lifetime: every
    * Bench/Verify run (and each forked test JVM) sweeps its own scratch
    * on exit. Returns the path for inline use. */
  def cleanupOnExit(dir: String): String = {
    exitSweeper // force hook registration
    exitDirs.synchronized { exitDirs += dir }
    dir
  }
  private val exitDirs = scala.collection.mutable.ArrayBuffer.empty[String]
  private lazy val exitSweeper: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      exitDirs.synchronized(exitDirs.toList).foreach { d =>
        scala.util.Try {
          import java.nio.file.{Files, Paths}
          import scala.jdk.CollectionConverters._
          Files.walk(Paths.get(d)).sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.foreach(p => Files.deleteIfExists(p))
        }
      }))

  /** Materialize `result` via an eager localCheckpoint, then release the
    * plan's inputs: `caches` through the CacheManager, `checkpoints` (frames
    * produced by localCheckpoint) through their RDD blocks. Use at the tail
    * of a query whose plan leans on .cache()/.localCheckpoint() — the small
    * checkpointed result is self-contained, so executor storage does not
    * accumulate across a 100-query benchmark run. */
  def materialized(result: DataFrame, caches: Seq[DataFrame],
      checkpoints: Seq[DataFrame] = Nil): DataFrame = {
    val out = result.localCheckpoint()
    caches.foreach(_.unpersist(blocking = false))
    checkpoints.foreach(freeLocalCheckpoint)
    out
  }

  /** Two-phase PARALLEL global rank — the engine's replacement for
    * `row_number() OVER (ORDER BY …)`, which plans a single-partition
    * window (one task sorts the whole input; the r8 events_rfm nit).
    * Phase 1 range-partitions by the total order `ord` (so partition i's
    * rows all sort before partition i+1's) and ranks WITHIN partitions;
    * phase 2 adds broadcast per-partition row-count offsets. `ord` must be
    * a total order (include a tie-break key) for the rank to be
    * deterministic. Returns (ranked frame with `out` = 1-based global
    * rank, the checkpointed range-partitioned frame) — the caller frees
    * the checkpoint via [[freeLocalCheckpoint]] (or [[materialized]])
    * once the result is materialized. The only remaining sub-frame is the
    * ≤32-row partition-offset table (bounded by partition count). */
  def globalRank(df: DataFrame, ord: Seq[Column], out: String)
      : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    // The within-partition rank comes from `monotonically_increasing_id`
    // over the range-partitioned-and-sorted frame (id = pid·2³³ + local
    // index in physical row order, which the sort pins to `ord`), NOT from
    // a row_number window: the window's ClusteredDistribution(__pid) can't
    // see that __pid IS the partition id, so it re-shuffled and re-sorted
    // the whole frame a second time (r12: one full exchange+sort removed).
    // `ord` is a caller-contract total order, so the physical order — and
    // hence the id — is deterministic.
    val pp = df.repartitionByRange(numShufflePartitions(df), ord: _*)
      .sortWithinPartitions(ord: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint() // read by the offset pass AND the rank pass
    val offs = pp.groupBy(shiftright(col("__mid"), 33).as("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off",
        sum("__cnt").over(Window.orderBy("__pid")) - col("__cnt"))
      .select(col("__pid").as("__pid2"), col("__off"))
    val ranked = pp
      .join(broadcast(offs),
        shiftright(col("__mid"), 33) === col("__pid2"))
      .withColumn(out, (col("__off") +
        col("__mid").bitwiseAND(lit((1L << 33) - 1)) + 1L).cast("long"))
      .drop("__mid", "__pid2", "__off")
    (ranked, pp)
  }

  /** Two-phase PARALLEL prefix sum — the engine's replacement for
    * `sum(v) OVER (ORDER BY …)`, which (like the global rank) plans a
    * single-partition window. Same machinery as [[globalRank]]: phase 1
    * range-partitions by the total order `ord` and prefix-sums WITHIN
    * partitions; phase 2 adds broadcast per-partition sum offsets (exact
    * for any associative +: longs, exact decimals). `ord` must be a total
    * order for boundary ties to land deterministically. Returns (frame
    * with `out` = inclusive running sum of `value`, the checkpointed
    * range-partitioned frame to free once the result materializes). */
  def globalCumSum(df: DataFrame, ord: Seq[Column], value: Column,
      out: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val pp = df.repartitionByRange(numShufflePartitions(df), ord: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value)
      .localCheckpoint() // read by the offset pass AND the cumsum pass
    val offs = pp.groupBy("__pid").agg(sum("__v").as("__s"))
      .withColumn("__off",
        sum("__s").over(Window.orderBy("__pid")) - col("__s"))
      .select(col("__pid").as("__pid2"), col("__off"))
    val cum = pp
      .withColumn("__lc", sum("__v").over(
        Window.partitionBy("__pid").orderBy(ord: _*)))
      .join(broadcast(offs), col("__pid") === col("__pid2"))
      .withColumn(out, col("__off") + col("__lc"))
      .drop("__pid", "__pid2", "__off", "__lc", "__v")
    (cum, pp)
  }

  /** Free the executor blocks behind an (eager) localCheckpoint frame — a
    * checkpointed RDD is persisted OUTSIDE the CacheManager, so
    * Dataset.unpersist() can't reach it; its LogicalRDD leaf can. Safe only
    * on frames that are dead (nothing unexecuted still reads them). */
  def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))

  /** The events table's `ts` column has shipped in two different physical
    * encodings across driver provisions: TIMESTAMP(NANOS) (readable only via
    * spark.sql.legacy.parquet.nanosAsLong, set in Verify/Bench and test
    * sessions, surfacing as LongType) and TIMESTAMP_NTZ micros (canonicalized
    * by `tbl`). Normalize every shape a future provision could plausibly
    * ship to TimestampType here:
    *   - LongType: an epoch integer whose unit is undeclared (bare INT64,
    *     or nanos surfaced by the legacy flag). Dispatch on magnitude
    *     per-row — nanos ≥1e17, micros ≥1e14, millis ≥1e11, else seconds —
    *     which is unambiguous for any epoch between 1973 and 5138, far
    *     beyond the data's range. Integer arithmetic only (`div`), so no
    *     double-precision loss on ~1.7e18 nano values; pure columnar, no
    *     driver-side sampling job.
    *   - StringType: ISO text → to_timestamp.
    *   - INT96 / TIMESTAMP(MILLIS|MICROS) / NTZ / DATE: already
    *     TimestampType after `canonicalTypes` — pass through. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = tbl(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr(
          "timestamp_micros(CASE" +
            " WHEN abs(ts) >= 100000000000000000 THEN ts div 1000" +
            " WHEN abs(ts) >= 100000000000000 THEN ts" +
            " WHEN abs(ts) >= 100000000000 THEN ts * 1000" +
            " ELSE ts * 1000000 END)"))
      case org.apache.spark.sql.types.StringType =>
        df.withColumn("ts", to_timestamp(col("ts")))
      case _ => df // TimestampType already, incl. NTZ/DATE via canonicalTypes
    }
  }
}
