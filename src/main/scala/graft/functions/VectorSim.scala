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

  def lshBucketSql(v: String): String =
    (0 until NumPlanes).map { p =>
      val d = (1 to Dim).map { i =>
        val k = p * Dim + (i - 1)
        s"$v[$i] * (CAST((1103515245 * CAST($k AS BIGINT) + 12345) % 2147483648 AS DOUBLE) " +
          "/ 2147483648.0 - 0.5)"
      }.mkString(" + ")
      s"CASE WHEN ($d) > 0 THEN '1' ELSE '0' END"
    }.mkString(" || ")
}
