package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the governance/linkage wave.
  *
  * The Jaro-Winkler fixtures below are the values DuckDB's
  * jaro_winkler_similarity returns (probed against duckdb 1.x, which
  * vendors the rapidfuzz implementation) — the oracle hash-compares
  * doubles, so the expression must reproduce them bit-for-bit, including
  * the two non-obvious choices: transpositions use INTEGER halving (odd
  * raw counts round down) and empty-vs-empty scores 0.0, not 1.0.
  *
  * The Hilbert fixtures are from an independent Python run of the
  * textbook xy2d algorithm (Wikipedia form with in-loop rotation), which
  * the masked SQL formulation must match exactly.
  */
class GovernanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  import graft.functions.JaroWinkler

  private def jw(a: String, b: String): Double =
    JaroWinkler.score(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("jaro_winkler matches the DuckDB oracle fixtures bit-for-bit") {
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("dwayne", "duane") == 0.8400000000000001)
    assert(jw("dixon", "dicksonx") == 0.8133333333333332)
    assert(jw("abcd", "acbd") == 0.9249999999999999)
    // odd raw transposition count (3 mismatched matched positions):
    // integer halving t=1, and no prefix boost (common prefix 0)
    assert(jw("abcxyz", "bcaxyz") == 0.9444444444444445)
    // window = max(2,2)/2 - 1 = 0: only same-position chars can match
    assert(jw("ab", "ba") == 0.0)
    assert(jw("a", "") == 0.0)
    assert(jw("", "") == 0.0) // DuckDB's (rapidfuzz's) empty-empty choice
    assert(jw("abc", "abc") == 1.0)
    assert(jw("a", "a") == 1.0) // negative window clamps to 0
    assert(jw("Customer#000000001", "Customer#00000001Q") == 0.9777777777777777)
    assert(jw("Customer#000000001", "Customer#00000001") == 0.9888888888888889)
    assert(jw("Customer#000000001", "Customer#000000001Z") == 0.9894736842105263)
    assert(jw("CRAPO", "RAPOC") == 0.8666666666666667) // no boost at prefix 0
  }

  test("jaro_winkler expression stays inside whole-stage codegen") {
    val df = H.tbl(spark, "/root/testdata/sf0.001", "customer")
      .select(JaroWinkler.jaro_winkler(col("c_name"), lit("Customer#000000001"))
        .as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [jarowinklersim("), plan)
    assert(df.filter(col("s") === 1.0).count() == 1)
  }

  test("hilbert index matches the independent xy2d reference values") {
    import spark.implicits._
    // (x, y, expected d) for the 256x256 curve, from a Python xy2d run
    val fixtures = Seq(
      (0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 3L), (1L, 1L, 2L),
      (255L, 255L, 43690L), (128L, 0L, 60074L), (0L, 128L, 16384L),
      (37L, 199L, 24206L), (100L, 200L, 28272L), (255L, 0L, 65535L),
      (7L, 7L, 42L), (200L, 13L, 61587L))
    val base = fixtures.map { case (x, y, e) => (x, y, e) }
      .toDF("o_custkey", "dday", "expected")
      .selectExpr("o_custkey", "dday", "expected",
        "o_custkey AS hx", "dday AS hy", "CAST(0 AS BIGINT) AS hd")
    // thread `expected` through the per-level projections via a carry hack:
    // run the generator on a frame whose carry columns include expected
    val out = graft.queries.GovernanceQueries
      .hilbertIndexForTest(base)
      .select(col("expected"), col("hd")).collect()
    out.foreach(r => assert(r.getLong(1) == r.getLong(0),
      s"hilbert mismatch: expected ${r.getLong(0)} got ${r.getLong(1)}"))
  }

  test("hilbert shards have tight two-dimensional bounding boxes") {
    // locality sanity: with 64 shards over a 256x256 grid, a shard's
    // custkey-span x day-span area must be far below the full grid's —
    // the property that makes the layout skip files on 2-D predicates
    val rows = SparkEntry.queries("layout_hilbert")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    // custkey is the non-wrapping dimension at sf0.001 (0..149 < 256), so
    // per-shard custkey span directly measures the curve's locality; the
    // day dimension wraps the 256 grid multiple times over 7 years, which
    // is why the judged output reports raw day bounds but the tightness
    // assertion sticks to custkey
    val fullSpan = rows.map(_.getAs[Long]("custkey_hi")).max -
      rows.map(_.getAs[Long]("custkey_lo")).min
    val avgSpan = rows.map(r =>
      (r.getAs[Long]("custkey_hi") - r.getAs[Long]("custkey_lo")).toDouble)
      .sum / rows.length
    assert(avgSpan < fullSpan / 2.0,
      s"avg shard custkey span $avgSpan not tighter than half of $fullSpan")
  }

  test("er_blocked_linkage recovers the original for most corrupted names") {
    val out = SparkEntry.queries("er_blocked_linkage")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    val exact = out.count(_.getAs[Boolean]("exact_recovery"))
    // prefix blocking guarantees the true match is a candidate; JW should
    // rank it first for the clear majority of the three corruption modes
    assert(exact.toDouble / out.length > 0.8,
      s"only $exact/${out.length} linked back to their source record")
  }

  test("sample_weighted priorities are deterministic and length-biased") {
    val q = SparkEntry.queries("sample_weighted")(spark, "/root/testdata/sf0.001")
    val a = q.collect()
    val b = SparkEntry.queries("sample_weighted")(spark, "/root/testdata/sf0.001").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq) // reproducible
    assert(a.length == 100)
    // the sampled docs should skew long: mean sampled weight > corpus mean
    val corpusMean = H.tbl(spark, "/root/testdata/sf0.001", "documents")
      .agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    val sampleMean = a.map(_.getAs[Long]("w")).sum.toDouble / a.length
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean not above corpus mean $corpusMean")
  }
}
