package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-11 waves 158-160: semantic invariants the hash compare can't
  * localize — an independent sequential Bradley-Terry fit, the state-
  * evolution upgrade contract, and the KMV estimator's error envelope. */
class Round11WavesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("pref_bradley_terry matches an independent sequential MM fit (same integer arithmetic)") {
    // derive the comparison counts on the driver from raw events —
    // completely independent of the query's window/grid machinery
    val ev = H.events(spark, sf)
      .select("user_id", "event_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime * 1000 + r.getTimestamp(2).getNanos / 1000 % 1000,
        r.getDouble(3)))
    val wins = scala.collection.mutable.Map.empty[(Long, Long), Long]
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val (sa, sb) = (a._2 % 8, b._2 % 8)
          if (sa != sb) {
            // current row b vs previous row a: b wins on higher value,
            // ties to the lower system id (the query's rule)
            val bWins = b._4 > a._4 || (b._4 == a._4 && sb < sa)
            val (w, l) = if (bWins) (sb, sa) else (sa, sb)
            wins((w, l)) = wins.getOrElse((w, l), 0L) + 1
          }
        case _ =>
      }
    }
    val g = Array.tabulate(8, 8)((i, j) =>
      wins.getOrElse((i.toLong, j.toLong), 0L) + wins.getOrElse((j.toLong, i.toLong), 0L))
    val w = Array.tabulate(8)(i => (0 until 8).map(j => wins.getOrElse((i.toLong, j.toLong), 0L)).sum)
    val wt = Array.tabulate(8)(i => (0 until 8).map(j => g(i)(j)).sum)
    var p = Array.fill(8)(1000000L)
    for (_ <- 1 to 20) {
      val praw = Array.tabulate(8) { i =>
        if (wt(i) == 0) p(i)
        else {
          val d = (0 until 8).map(j => if (j == i) 0L
            else (BigInt(g(i)(j)) * 1000000000 / BigInt(p(i) + p(j))).toLong).sum
          (BigInt(w(i)) * 1000000000 / BigInt(d)).toLong
        }
      }
      val s = praw.map(BigInt(_)).sum
      p = Array.tabulate(8)(i =>
        if (wt(i) == 0) praw(i) else (BigInt(praw(i)) * 8000000 / s).toLong)
    }
    val got = SparkEntry.queries("pref_bradley_terry")(spark, sf)
      .orderBy("sys").collect()
    assert(got.length == 8)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("games") == wt(i), s"games sys=$i")
      assert(r.getAs[Long]("wins") == w(i), s"wins sys=$i")
      assert(r.getAs[Long]("strength_micro") == p(i),
        s"strength sys=$i: got ${r.getAs[Long]("strength_micro")}, want ${p(i)}")
    }
    // normalization invariant: strengths of played systems sum to ~8e6
    val played = got.filter(_.getAs[Long]("games") > 0)
    if (played.nonEmpty) {
      val s = played.map(_.getAs[Long]("strength_micro")).sum
      assert(math.abs(s - 8000000L) <= 8 * played.length,
        s"strengths not normalized: $s")
    }
  }

  test("stream_state_evolve: upgrade carries v1 state and the evolved field only covers phase 2") {
    val out = SparkEntry.queries("stream_state_evolve")(spark, sf).collect()
    assert(out.nonEmpty)
    val sub = H.events(spark, sf).filter(pmod(col("event_id"), lit(7)) === 2)
    val exp = sub.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum((col("value").cast("decimal(12,2)") * 100).cast("long")).as("cents"),
        max(when(pmod(col("event_id"), lit(3)) === 2, col("event_id")))
          .as("mx"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]).getOrElse(-1L))).toMap
    assert(out.length == exp.size, s"${out.length} vs ${exp.size} users")
    out.foreach { r =>
      val (n, cents, mx) = exp(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("n") == n && r.getAs[Long]("total_cents") == cents
        && r.getAs[Long]("max_event_id_p2") == mx, r.toString)
    }
    // the evolution is real only if BOTH populations exist at this sf:
    // users whose state crossed the upgrade (mx >= 0 with phase-1 rows)
    // and v1-only users (mx == -1)
    assert(out.exists(_.getAs[Long]("max_event_id_p2") >= 0), "no phase-2 users")
    assert(out.exists(_.getAs[Long]("max_event_id_p2") == -1L), "no v1-only users")
  }

  test("pref_grpo_advantage: z-scores cancel within every group (floor-bounded)") {
    // Σ(r·n − Σr) = 0 exactly per group, so the milli-floored advantages
    // must sum within n of zero (each floor loses < 1 milli, signs mixed)
    val rows = SparkEntry.queries("pref_grpo_advantage")(spark, sf)
      .groupBy("user_id")
      .agg(sum("adv_milli").as("sa"), count(lit(1)).as("n"),
        max(abs(col("adv_milli"))).as("mx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Long]("sa")) <= r.getAs[Long]("n"),
        s"group z-scores do not cancel: $r")
    }
    // z-scores are scale-bounded: |adv| < sqrt(n)·1000 for any group
    rows.foreach { r =>
      val bound = math.ceil(math.sqrt(r.getAs[Long]("n").toDouble)) * 1000
      assert(r.getAs[Long]("mx") <= bound, s"advantage out of range: $r")
    }
  }

  test("plan_skew_advisor: census consistent with table counts; salt factor formula holds") {
    val rows = SparkEntry.queries("plan_skew_advisor")(spark, sf).collect()
    assert(rows.length == 4)
    val orders = H.tbl(spark, sf, "orders").count()
    val li = H.tbl(spark, sf, "lineitem").count()
    val byKey = rows.map(r => r.getAs[String]("shuffle_key") -> r).toMap
    assert(byKey("orders_custkey").getAs[Long]("n_rows") == orders)
    assert(byKey("lineitem_partkey").getAs[Long]("n_rows") == li)
    rows.foreach { r =>
      val (n, mx, s0) = (r.getAs[Long]("n_rows"),
        r.getAs[Long]("max_key_rows"), r.getAs[Long]("salt_factor"))
      assert(s0 == math.max(1L, math.ceil(mx * 32.0 / n).toLong), r.toString)
      assert(r.getAs[Long]("max_key_rows") <= n)
      assert((r.getAs[String]("decision") == "salt") == (mx * 32 > n * 2),
        r.toString)
    }
  }

  test("mix_doremi_step: weights normalize and order by excess loss") {
    val rows = SparkEntry.queries("mix_doremi_step")(spark, sf).collect()
    assert(rows.nonEmpty)
    // integer-floor normalization: Σ weight_micro within |domains| of 1e6
    val s = rows.map(_.getAs[Long]("weight_micro")).sum
    assert(math.abs(s - 1000000L) <= rows.length, s"weights not normalized: $s")
    // mirror descent is monotone: higher excess loss ⇒ weight not lower
    val byExcess = rows.sortBy(_.getAs[Long]("excess_milli"))
    byExcess.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("weight_micro") <= b.getAs[Long]("weight_micro") + 1,
          s"weight not monotone in excess: $a vs $b")
      case _ =>
    }
  }

  test("parquet bloom writer contract: enabled column's row groups carry bloom offsets") {
    // the source_parquet_bloom query relies on the writer actually
    // emitting blooms — pin the footer-level contract so a Spark upgrade
    // that silently drops the option fails here, not at 100 TB
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val out = H.tmpDir("graft_bloomspec") + "/part_bloom"
    H.tbl(spark, sf, "part")
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#p_partkey", "true")
      .option("parquet.bloom.filter.expected.ndv#p_partkey", "20000")
      .option("parquet.enable.dictionary#p_partkey", "false")
      .parquet(out)
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(out)
    val fs = root.getFileSystem(conf)
    var groups = 0; var bloomed = 0
    fs.listStatus(root).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).foreach { f =>
        val rd = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
        try rd.getFooter.getBlocks.forEach { blk =>
          groups += 1
          blk.getColumns.forEach { cc =>
            if (cc.getPath.toDotString == "p_partkey" &&
                cc.getBloomFilterOffset >= 0) bloomed += 1
          }
        } finally rd.close()
      }
    assert(groups > 0 && bloomed == groups,
      s"bloom offsets missing: $bloomed of $groups row groups")
  }

  test("plan_join_cardinality: KMV containment estimate lands inside its error envelope on FK joins") {
    val rows = SparkEntry.queries("plan_join_cardinality")(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("est_rows") > 0, r.toString)
      assert(r.getAs[Long]("true_rows") > 0, r.toString)
      // KMV with k=64 has ~1/sqrt(62) ≈ 13% relative error; the
      // containment assumption is EXACT for these FK joins (every fact
      // key exists in the dimension), so 50% is a generous envelope
      assert(r.getAs[Long]("err_pct") <= 50,
        s"estimator off by ${r.getAs[Long]("err_pct")}%: $r")
    }
    // bottom-k must plan TakeOrderedAndProject (never a global sort)
    val plan = SparkEntry.queries("plan_join_cardinality")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
