package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Round-11 wave 187: DP-SGD privacy accounting — the Rényi-DP moments
  * accountant for the subsampled Gaussian mechanism (Mironov et al.
  * 2019, the TF-Privacy integer-order bound), evaluated against this
  * corpus's own training-run geometry. privacy_dp_accounting covers
  * query-release composition; this covers the TRAINING side — the ε a
  * lab reports for a DP-finetuned model.
  */
object DpSgdOpsQueries extends QueryModule {

  /** Integer Rényi orders and exact binomial coefficients C(α,k) —
    * compile-time constants (C(32,16) = 601,080,390 < 2^53, exact in a
    * double), embedded identically in both engines. */
  private val alphaGrid: Seq[Int] = 2 to 32
  private val binom: Seq[(Int, Int, Long)] = alphaGrid.flatMap { a =>
    (0 to a).map { k =>
      val c = (1 to k).foldLeft(1L)((acc, i) => acc * (a - i + 1) / i)
      (a, k, c)
    }
  }

  def all: Seq[Q] = Seq(

    // SUBSAMPLED-GAUSSIAN RDP ACCOUNTANT: per noise multiplier σ ∈
    // {0.5, 1.0, 2.0}, the per-step Rényi divergence at integer order α
    // is bounded by (1/(α−1))·ln Σ_{k=0..α} C(α,k)(1−q)^{α−k} q^k ·
    // e^{k(k−1)/(2σ²)}; after T steps the (ε, δ) guarantee is
    // ε = min_α [ T·RDP_α + ln(1/δ)/(α−1) ] at δ = 1/N². The run
    // geometry is data-derived (N = corpus size, batch 64 → q = 64/N,
    // T = 3 epochs), so the report moves with the corpus; everything
    // after the one count(*) is bounded: a 527-row (α, k, C) constant
    // table, a 31-row α reduce, a 3-row σ face union. The accountant's
    // defining behavior — more noise or a bigger corpus → smaller ε —
    // falls out as an oracle-checked fact across the three faces.
    Q("privacy_dpsgd_rdp",
      Some {
        val binomVals = binom.map { case (a, k, c) =>
          s"($a, $k, CAST($c AS DOUBLE))" }.mkString(", ")
        def face(sigmaMilli: Int) = {
          val s2 = sigmaMilli * sigmaMilli / 1000000.0
          s"""SELECT CAST($sigmaMilli AS BIGINT) AS sigma_milli,
             |  g.n, g.steps,
             |  CAST(floor(g.q * 1000000 + 0.5) AS BIGINT) AS q_micro,
             |  best.alpha AS best_alpha,
             |  CAST(floor(best.eps * 1000000 + 0.5) AS BIGINT) AS eps_micro
             |FROM g, (SELECT alpha, eps FROM (
             |  SELECT r.alpha,
             |    g2.steps * r.rdp + ln(1.0 / g2.delta) / (r.alpha - 1)
             |      AS eps
             |  FROM (SELECT b.alpha,
             |      ln(sum(b.c * pow(1 - g3.q, b.alpha - b.k)
             |        * pow(g3.q, b.k)
             |        * exp(b.k * (b.k - 1) / (2 * $s2))))
             |        / (b.alpha - 1) AS rdp
             |    FROM bn b, g g3 GROUP BY b.alpha) r, g g2)
             |  ORDER BY eps, alpha LIMIT 1) best""".stripMargin
        }
        s"""WITH n0 AS (SELECT CAST(count(*) AS BIGINT) AS n
           |  FROM documents),
           |g AS (SELECT n, 64.0 / n AS q,
           |    3 * CAST(ceil(n / 64.0) AS BIGINT) AS steps,
           |    1.0 / (CAST(n AS DOUBLE) * n) AS delta FROM n0),
           |bn(alpha, k, c) AS (VALUES $binomVals)
           |${Seq(500, 1000, 2000).map(face).mkString(" UNION ALL ")}
           |ORDER BY sigma_milli
           |""".stripMargin
      },
      (s, dir) => {
        val g = tbl(s, dir, "documents")
          .agg(count(lit(1)).cast("long").as("n"))
          .select(col("n"), (lit(64.0) / col("n")).as("q"),
            (lit(3L) * ceil(col("n") / 64.0).cast("long")).as("steps"),
            (lit(1.0) / (col("n").cast("double") * col("n"))).as("delta"))
          .localCheckpoint() // 1-row geometry, read per face
        val bn = s.createDataFrame(binom.map { case (a, k, c) =>
          (a, k, c.toDouble) }).toDF("alpha", "k", "c")
        val faces = Seq(500, 1000, 2000).map { sigmaMilli =>
          val s2 = sigmaMilli * sigmaMilli / 1000000.0
          val rdp = bn.crossJoin(broadcast(g))
            .groupBy("alpha")
            .agg((log(sum(col("c")
              * pow(lit(1) - col("q"), col("alpha") - col("k"))
              * pow(col("q"), col("k"))
              * exp(col("k") * (col("k") - 1) / (2 * s2))))
              / (col("alpha") - 1)).as("rdp"))
          val best = rdp.crossJoin(broadcast(g))
            .select(col("alpha"),
              (col("steps") * col("rdp")
                + log(lit(1.0) / col("delta")) / (col("alpha") - 1))
                .as("eps"))
            .orderBy(col("eps"), col("alpha")).limit(1)
          best.crossJoin(broadcast(g))
            .select(lit(sigmaMilli.toLong).as("sigma_milli"),
              col("n"), col("steps"),
              floor(col("q") * 1000000 + 0.5).cast("long").as("q_micro"),
              col("alpha").cast("long").as("best_alpha"),
              floor(col("eps") * 1000000 + 0.5).cast("long").as("eps_micro"))
        }
        val out = faces.reduce(_ unionByName _).orderBy("sigma_milli")
        H.materialized(out, caches = Nil, checkpoints = Seq(g))
      })
  )
}
