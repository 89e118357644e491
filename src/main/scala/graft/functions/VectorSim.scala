package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding similarity: exact brute-force cosine top-k (the baseline) and a
  * random-hyperplane LSH-bucketed variant (the scale path — candidates come
  * from a bucket equi-join, not an all-pairs cross product).
  *
  * Determinism: dot products / norms are built as explicit left-associated
  * 64-term sums over double-cast elements, the same tree DuckDB parses from
  * the generated SQL — results are bit-identical, no rounding tolerance
  * needed. Hyperplane coefficients come from an integer LCG evaluated in both
  * engines' integer arithmetic (exactly representable in double), not from a
  * printed float literal.
  */
object VectorSim {

  val Dim = 64
  val NumPlanes = 8

  /** Σ a[i]*b[i] as a left-assoc chain (bit-reproducible). 1-based arrays. */
  def dot(a: String, b: String): Column =
    (1 to Dim).map(i => element_at(col(a), i) * element_at(col(b), i))
      .reduce(_ + _)

  def dotSql(a: String, b: String): String =
    (1 to Dim).map(i => s"$a[$i] * $b[$i]").mkString(" + ")

  def norm2(a: String): Column = dot(a, a)
  def norm2Sql(a: String): String = dotSql(a, a)

  def cosine(a: String, an: String, b: String, bn: String): Column =
    dot(a, b) / (sqrt(col(an)) * sqrt(col(bn)))

  def cosineSql(a: String, an: String, b: String, bn: String): String =
    s"(${dotSql(a, b)}) / (sqrt($an) * sqrt($bn))"

  /** Σ (a[i]-b[i])² oracle form — the Spark side uses the fused
    * CustomExpressions.squared_distance (bit-identical by construction). */
  def ssdSql(a: String, b: String): String =
    (1 to Dim).map(i => s"($a[$i] - $b[$i]) * ($a[$i] - $b[$i])").mkString(" + ")

  /** Same, over the first `dims` elements (product-quantization subspaces). */
  def ssdSqlN(a: String, b: String, dims: Int): String =
    (1 to dims).map(i => s"($a[$i] - $b[$i]) * ($a[$i] - $b[$i])").mkString(" + ")

  /** LCG-derived hyperplane coefficient, exact in both engines:
    * ((1103515245*(p*Dim+i) + 12345) mod 2^31) / 2^31 - 0.5. */
  def coef(p: Int, i: Int): Double =
    ((1103515245L * (p * Dim + i) + 12345L) % 2147483648L).toDouble /
      2147483648.0 - 0.5

  /** '0'/'1' bucket signature from `planes` hyperplane sign bits. */
  def lshBucketN(v: String, planes: Int): Column =
    concat((0 until planes).map { p =>
      val d = (1 to Dim).map(i => element_at(col(v), i) * lit(coef(p, i - 1)))
        .reduce(_ + _)
      when(d > 0, "1").otherwise("0")
    }: _*)

  /** 8-char bucket signature — the oracle-parity form (`lshBucketSql`
    * unrolls exactly these NumPlanes planes). */
  def lshBucket(v: String): Column = lshBucketN(v, NumPlanes)

  /** Target mean bucket occupancy for count-adaptive bucketing. */
  val TargetBucket = 64L

  /** Count-adaptive hyperplane count: enough sign bits that the mean
    * bucket holds ~TargetBucket vectors. A FIXED bucket count saturates as
    * the corpus grows — with 2^8 buckets, a 100x corpus packs 100x the
    * vectors per bucket and any per-bucket pair enumeration goes quadratic
    * (measured: dedup_embedding_cosine slope 26.8 at k=100 on 8 fixed
    * planes, 2.0 after adaptive planes; PLANS.md round-7). Scaling LSH
    * parameters with corpus size is the standard construction (recall per
    * table drops as planes grow; at production recall targets one runs
    * several independent tables OR'd together — dedup_minhash_lsh's banding
    * is that construction). Never LESS than NumPlanes, so for any corpus
    * up to TargetBucket * 2^NumPlanes = 16384 vectors — which covers every
    * oracle-gate scale factor — this IS the 8-plane oracle bucketing, and
    * the DuckDB twin stays bit-identical there. */
  def planesFor(n: Long): Int = {
    var p = NumPlanes
    while ((n >> p) > TargetBucket && p < 24) p += 1
    p
  }

  /** Bucket from planes [start, start+count) — independent LSH tables use
    * disjoint plane ranges of the same LCG stream. */
  def lshBucketRange(v: String, start: Int, count: Int): Column =
    concat((start until start + count).map { p =>
      val d = (1 to Dim).map(i => element_at(col(v), i) * lit(coef(p, i - 1)))
        .reduce(_ + _)
      when(d > 0, "1").otherwise("0")
    }: _*)

  def lshBucketSqlRange(v: String, start: Int, count: Int): String =
    (start until start + count).map { p =>
      val d = (1 to Dim).map { i =>
        val k = p * Dim + (i - 1)
        s"$v[$i] * (CAST((1103515245 * CAST($k AS BIGINT) + 12345) % 2147483648 AS DOUBLE) " +
          "/ 2147483648.0 - 0.5)"
      }.mkString(" + ")
      s"CASE WHEN ($d) > 0 THEN '1' ELSE '0' END"
    }.mkString(" || ")

  def lshBucketSql(v: String): String = lshBucketSqlN(v, NumPlanes)

  def lshBucketSqlN(v: String, planes: Int): String =
    (0 until planes).map { p =>
      val d = (1 to Dim).map { i =>
        val k = p * Dim + (i - 1)
        s"$v[$i] * (CAST((1103515245 * CAST($k AS BIGINT) + 12345) % 2147483648 AS DOUBLE) " +
          "/ 2147483648.0 - 0.5)"
      }.mkString(" + ")
      s"CASE WHEN ($d) > 0 THEN '1' ELSE '0' END"
    }.mkString(" || ")

  // ---- skew-capped sub-bucketing ------------------------------------------
  //
  // Count-adaptive planes bound the MEAN bucket, but not the tail: on a
  // direction-concentrated corpus a few mega-buckets hold thousands of
  // vectors, and every within-bucket pair enumeration goes quadratic in the
  // largest bucket (measured: sim_knn_graph 12.4x/decade, emb_knn_outliers
  // 16.5x, emb_hubness_audit 14.3x at 200k probe vectors, where the top
  // bucket held 3.2k vectors and the pair stream was 167M rows for an 11M
  // uniform expectation). The fix is per-bucket depth: every vector carries
  // a LONGER signature (base + SubExtra sign bits), bucket counts are taken
  // on the base prefix, and oversized buckets join on a prefix extended by
  // ceil(log2(cnt / SubCap)) bits — so no join key ever groups more than
  // ~SubCap * skew-of-one-subdivision vectors. Different depths cannot
  // collide (a jkey starts with its base prefix and string equality
  // requires equal length). Recall within a split mega-bucket drops, which
  // is the standard LSH cost/recall dial — the multi-table/banding
  // construction is the recall recovery, exactly as argued for planesFor.
  // At every oracle gate SF all base buckets are <= SubCap, so the scheme
  // DEGENERATES to the plain base bucketing there and the DuckDB twin
  // (same construction over the same 8-plane base) stays bit-identical.

  val SubCap = 128L
  val SubExtra = 12

  /** CASE ladder: joining depth for a base-bucket of `cnt` vectors. */
  def subDepthSql(cnt: String, base: Int): String = {
    val arms = (0 to SubExtra).map { e =>
      if (e < SubExtra) s"WHEN $cnt <= ${SubCap << e} THEN ${base + e}"
      else s"ELSE ${base + e}"
    }.mkString(" ")
    s"(CASE $arms END)"
  }

  /** Spark side: attach `outCol` = skew-capped join key to `df` (which must
    * carry `vcol`: ARRAY<DOUBLE>). `n` = corpus size (drives the base plane
    * count exactly like [[planesFor]]). One bucket-domain count + one
    * key-domain join; everything else is per-row. */
  /** Returns (keyed frame, the checkpointed signed frame to free once the
    * caller's result materializes — the [[graft.H.globalRank]] contract). */
  def skewCappedKey(df: org.apache.spark.sql.DataFrame, vcol: String,
      n: Long, outCol: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.functions.{broadcast, col, count, lit, substring}
    val base = planesFor(n)
    // checkpoint the signed frame: the count pass AND the key attach both
    // read it, and the (base+SubExtra)-plane signature is the expensive
    // expression — never evaluate it twice
    val sig = df.withColumn("__sig", lshBucketN(vcol, base + SubExtra))
      .withColumn("__base", substring(col("__sig"), 1, base))
      .localCheckpoint()
    val counts = sig.groupBy("__base")
      .agg(count(lit(1)).as("__cnt"))
    // depth attach is BROADCAST: counts is bucket-domain (≤ n / SubCap-ish
    // occupied buckets; ≤ 2^planesFor(n) keys). At extreme corpus scale
    // (planesFor capped at 24 ⇒ up to 16M buckets) swap this for a plain
    // shuffle join on __base — the payload shuffled there is (vec_id, sig),
    // never the vectors, since callers re-join by key afterwards.
    val keyed = sig.join(broadcast(counts), "__base")
      .withColumn(outCol, org.apache.spark.sql.functions.expr(
        s"substring(__sig, 1, ${subDepthSql("__cnt", base)})"))
      .drop("__sig", "__base", "__cnt")
    (keyed, sig)
  }

  /** Oracle-side CTE pair for the same construction over the 8-plane base
    * (valid at every gate SF, where planesFor(n) == NumPlanes): emits
    * `s0` (vec_id, v, nrm, sig) and `n` (.. bucket) from `embeddings`.
    * s0/n are MATERIALIZED (r10 oracle-memory discipline, same class as
    * the r8/r9 OOM fixes): s0 carries the 20-plane signature expression —
    * ~130k chars of unrolled arithmetic — and n is self-joined by every
    * consumer; without the hints DuckDB inlines that expression into BOTH
    * join sides of every downstream pass, which is exactly the footprint
    * shape that flaked in the driver's long-lived comparator process. */
  def skewCappedCtesSql: String =
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |s0 AS MATERIALIZED (SELECT vec_id, v, (${norm2Sql("v")}) AS nrm,
       |  ${lshBucketSqlN("v", NumPlanes + SubExtra)} AS sig FROM e),
       |bc AS (SELECT substr(sig, 1, $NumPlanes) AS base,
       |  CAST(count(*) AS BIGINT) AS cnt FROM s0 GROUP BY 1),
       |n AS MATERIALIZED (SELECT s0.vec_id, s0.v, s0.nrm,
       |  substr(s0.sig, 1, ${subDepthSql("bc.cnt", NumPlanes)}) AS bucket
       |  FROM s0 JOIN bc ON substr(s0.sig, 1, $NumPlanes) = bc.base)"""
      .stripMargin
}
