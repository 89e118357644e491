package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{VectorSim => VS}

/** Pins the skew-capped sub-bucketing contract (PLANS.md addendum 137):
  * the depth ladder, the degenerate-at-gate-scale identity that keeps
  * every DuckDB hash unchanged, prefix consistency, and the cap itself
  * on a planted mega-bucket.
  */
class SkewCappedKeySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def vecs(rows: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "v")
      .withColumn("v", col("v").cast("array<double>"))
  }

  test("subDepthSql ladder: cap boundaries step the depth one bit at a time") {
    import spark.implicits._
    val cases = Seq(1L, 128L, 129L, 256L, 257L, 512L, 128L << 11,
      (128L << 11) + 1, Long.MaxValue / 4)
    val got = cases.toDF("cnt")
      .select(expr(VS.subDepthSql("cnt", 8)).as("d")).as[Int].collect()
    assert(got.toSeq == Seq(8, 8, 9, 9, 10, 10, 19, 20, 20))
  }

  test("gate-scale identity: all-small buckets reproduce the plain 8-plane bucketing") {
    // deterministic pseudo-vectors, few enough that no base bucket can
    // exceed SubCap — the regime every oracle SF lives in
    val rows = (0L until 300L).map { i =>
      (i, (1 to VS.Dim).map(d => math.sin(i * 31 + d * 7).abs + 0.1))
    }
    val df = vecs(rows)
    val (keyed, ck) = VS.skewCappedKey(df, "v", 300L, "jk")
    val plain = df.withColumn("bk", VS.lshBucketN("v", VS.planesFor(300L)))
      .select("vec_id", "bk")
    val joined = keyed.select("vec_id", "jk")
      .join(plain, "vec_id")
      .withColumn("same", col("jk") === col("bk"))
    assert(joined.filter(!col("same")).count() == 0)
    H.freeLocalCheckpoint(ck)
  }

  test("planted mega-bucket splits to longer prefixes; keys stay prefix-consistent") {
    // 600 near-identical vectors (one direction) land in ONE base bucket
    // (> SubCap), plus 100 scattered ones. The mega-bucket must join on
    // a longer prefix; every key must start with its 8-bit base.
    val mega = (0L until 600L).map { i =>
      (i, (1 to VS.Dim).map(d => 1.0 + (i % 7) * 1e-9 + d * 1e-12))
    }
    val scatter = (600L until 700L).map { i =>
      (i, (1 to VS.Dim).map(d => math.cos(i * 13 + d * 3)))
    }
    val df = vecs(mega ++ scatter)
    val (keyed, ck) = VS.skewCappedKey(df, "v", 700L, "jk")
    val base = VS.planesFor(700L)
    val sig = df.withColumn("full",
        VS.lshBucketN("v", base + VS.SubExtra))
      .select(col("vec_id"), col("full"))
    val chk = keyed.select("vec_id", "jk").join(sig, "vec_id")
      .select(col("vec_id"), col("jk"),
        length(col("jk")).as("dlen"),
        expr(s"substring(full, 1, length(jk)) = jk").as("pfx"),
        expr(s"substring(jk, 1, $base) = substring(full, 1, $base)")
          .as("baseok"))
      .collect()
    assert(chk.forall(_.getAs[Boolean]("pfx")), "jk must prefix the full signature")
    assert(chk.forall(_.getAs[Boolean]("baseok")))
    val megaLens = chk.filter(_.getAs[Long]("vec_id") < 600L)
      .map(_.getAs[Int]("dlen")).distinct
    // 600 vectors over cap 128 ⇒ ceil(log2(600/128)) = 3 extra bits
    assert(megaLens.toSeq == Seq(base + 3),
      s"mega bucket should deepen by 3 bits, got lengths $megaLens")
    // and no join key may group more than ~2·SubCap vectors once split
    // keys distribute (the planted clones share sign bits, so the split
    // here only proves depth; real corpora distribute across sub-keys —
    // asserted by the measured slopes in PLANS addendum 137)
    H.freeLocalCheckpoint(ck)
  }

  test("200k-vector regime: per-key pair fan-out stays under the cap bound (r9 quadratic regression guard)") {
    // Rebuilds the EXACT corpus shape where the r9 quadratic appeared
    // (PLANS addendum 137): sf0.1 embeddings replicated 100× with
    // norm-preserving cyclic rotations — ScaleProbe's gen. Pre-fix, the
    // top base bucket held 3.2k vectors and the within-bucket pair stream
    // was 167M rows (slopes 12-17×/decade); the skew-capped keys must hold
    // the pair mass near the uniform expectation so a future signature /
    // ladder change cannot silently reopen the quadratic. Guard, not
    // probe: red if any key's fan-out exceeds the post-split bound.
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val n0 = emb.count()
    val k = 100
    val corpus = (0 until k).map { c =>
      if (c == 0) emb
      else {
        val r = pmod(lit(c), size(col("v")))
        emb.withColumn("vec_id", col("vec_id") + lit(c * n0))
          .withColumn("v", concat(
            slice(col("v"), r + lit(1), size(col("v")) - r),
            slice(col("v"), lit(1), r)))
      }
    }.reduce(_ unionByName _)
    val (keyed, ck) = VS.skewCappedKey(corpus, "v", n0 * k, "jk")
    val stats = keyed.groupBy("jk").agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("maxc"),
        sum(col("c") * (col("c") - lit(1L))).cast("long").as("pairs2x"),
        count(lit(1)).as("keys")).collect()(0)
    H.freeLocalCheckpoint(ck)
    val maxc = stats.getAs[Long]("maxc")
    val pairs = stats.getAs[Long]("pairs2x") / 2
    info(s"n=${n0 * k} keys=${stats.getAs[Long]("keys")} maxKey=$maxc pairMass=$pairs")
    // Accepted post-fix state on this corpus (measured when the guard
    // shipped): maxKey = 2142, pairMass = 45.75M. The 2142-key is a GENUINE
    // near-parallel direction cluster (a base-label cluster times its
    // norm-preserving rotations) — no number of sign planes separates
    // near-parallel vectors, which is the documented LSH recall/cost dial,
    // not ladder failure. Pre-fix the SAME corpus measured 167M pair rows
    // (every 8-plane bucket oversized: 256 keys for 200k vectors) and the
    // top key held 3.2k. The guard pins both sides with margin: a ladder
    // or signature regression re-inflates pair mass toward 13× uniform
    // long before it doubles the top key.
    assert(maxc <= 20 * VS.SubCap, // 2560; current 2142, pre-fix 3.2k
      s"mega-key regression: $maxc vectors on one join key")
    val uniform = (n0 * k) * VS.SubCap / 2 // 12.8M at n=200k
    assert(pairs <= 5 * uniform, // current 3.57×; pre-fix was 13×
      s"pair mass $pairs exceeds 5x uniform $uniform — quadratic is back")
  }
}
