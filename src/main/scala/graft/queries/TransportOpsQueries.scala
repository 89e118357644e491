package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Eightieth wave: allocation and redundancy diagnostics — a
  * northwest-corner transportation plan between supplier-nation supply
  * and customer-nation demand (the classic OR initial-feasible-solution,
  * computed CLOSED-FORM from marginal prefix sums instead of the
  * textbook sequential allocation loop), an embedding-dimension
  * covariance audit (which of the 64 dimensions are redundant), a
  * price-point rounding-bias screen over the last-cents digits, and a
  * part-substitutability census from the (type, size) equivalence
  * classes.
  */
object TransportOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Northwest-corner transportation plan: supply_i = lineitems per
    // supplier nation, demand_j = lineitems per customer nation (each
    // lineitem contributes one unit to each marginal, so totals match
    // by construction). The textbook algorithm walks cells
    // sequentially; the closed form alloc(i,j) = max(0, min(cumS_i,
    // cumD_j) - max(cumS_{i-1}, cumD_{j-1})) needs only the two
    // 25-row cumulative marginals and a 625-cell broadcast cross —
    // the fact table reduces to marginals in one keyed aggregation
    // each, the allocation itself is O(nations²) at any data size.
    Q("orders_transport_nwcorner",
      Some(
        """WITH sup AS (SELECT s.s_nationkey AS nk,
          |  CAST(count(*) AS BIGINT) AS m
          |  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
          |  GROUP BY 1),
          |dem AS (SELECT c.c_nationkey AS nk, CAST(count(*) AS BIGINT) AS m
          |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
          |  JOIN customer c ON c.c_custkey = o.o_custkey GROUP BY 1),
          |cs AS (SELECT nk, sum(m) OVER (ORDER BY nk) AS hi,
          |  sum(m) OVER (ORDER BY nk) - m AS lo FROM sup),
          |cd AS (SELECT nk, sum(m) OVER (ORDER BY nk) AS hi,
          |  sum(m) OVER (ORDER BY nk) - m AS lo FROM dem),
          |a AS (SELECT cs.nk AS snk, cd.nk AS cnk,
          |  GREATEST(0, LEAST(cs.hi, cd.hi) - GREATEST(cs.lo, cd.lo))
          |    AS alloc
          |  FROM cs CROSS JOIN cd)
          |SELECT ns.n_name AS supply_nation, nc.n_name AS demand_nation,
          |  CAST(a.alloc AS BIGINT) AS alloc
          |FROM a JOIN nation ns ON ns.n_nationkey = a.snk
          |JOIN nation nc ON nc.n_nationkey = a.cnk
          |WHERE a.alloc > 0 ORDER BY a.snk, a.cnk
          |""".stripMargin),
      (s, dir) => {
        val li = tbl(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
        val sup = li.join(
            broadcast(tbl(s, dir, "supplier")
              .select(col("s_suppkey"), col("s_nationkey").as("nk"))),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy("nk").agg(count(lit(1)).cast("long").as("m"))
        val dem = li
          .join(tbl(s, dir, "orders")
              .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(tbl(s, dir, "customer")
              .select(col("c_custkey"), col("c_nationkey").as("nk"))),
            col("o_custkey") === col("c_custkey"))
          .groupBy("nk").agg(count(lit(1)).cast("long").as("m"))
        // bounded 25-row marginals: the unpartitioned window is fine
        def cum(df: org.apache.spark.sql.DataFrame) = df
          .withColumn("hi", sum("m").over(Window.orderBy("nk")))
          .withColumn("lo", col("hi") - col("m"))
        val cs = cum(sup).select(col("nk").as("snk"), col("hi").as("shi"),
          col("lo").as("slo"))
        val cd = cum(dem).select(col("nk").as("cnk"), col("hi").as("dhi"),
          col("lo").as("dlo"))
        val nat = broadcast(tbl(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name")))
        val out = cs.crossJoin(broadcast(cd))
          .select(col("snk"), col("cnk"),
            greatest(lit(0L), least(col("shi"), col("dhi")) -
              greatest(col("slo"), col("dlo"))).as("alloc"))
          .filter(col("alloc") > 0)
          .join(nat.withColumnRenamed("n_name", "supply_nation"),
            col("snk") === col("n_nationkey")).drop("n_nationkey")
          .join(nat.withColumnRenamed("n_name", "demand_nation")
              .withColumnRenamed("n_nationkey", "n2"),
            col("cnk") === col("n2"))
          .select(col("supply_nation"), col("demand_nation"),
            col("alloc").cast("long").as("alloc"))
          .orderBy("snk", "cnk")
        out
      }),

    // Embedding-dimension covariance audit: Pearson r between every
    // dimension pair (i<j) from exact integer moments over
    // milli-quantized coordinates (floor is engine-identical, sums are
    // BIGINT-exact; r itself is one fixed IEEE chain). Reports the 20
    // most correlated pairs — the redundancy signal that says two
    // dimensions carry the same feature. Shape: posexplode + a
    // vec-keyed self-join with i<j, then one (i,j)-keyed aggregation —
    // map-side combinable, no driver state, 64·63/2 output cells
    // regardless of corpus size.
    Q("emb_dim_covariance",
      Some(
        """WITH x AS (SELECT vec_id, i, CAST(floor(v * 1000) AS BIGINT) AS q
          |  FROM (SELECT vec_id, unnest(embedding::DOUBLE[]) AS v,
          |    generate_subscripts(embedding, 1) AS i FROM embeddings)),
          |p AS (SELECT a.i AS di, b.i AS dj,
          |  CAST(count(*) AS BIGINT) AS n,
          |  sum(a.q) AS sx, sum(b.q) AS sy, sum(a.q * a.q) AS sxx,
          |  sum(b.q * b.q) AS syy, sum(a.q * b.q) AS sxy
          |  FROM x a JOIN x b ON b.vec_id = a.vec_id AND a.i < b.i
          |  GROUP BY 1, 2),
          |r AS (SELECT di, dj,
          |  CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
          |    (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
          |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) <= 0.0 THEN 0.0
          |  ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
          |    (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
          |     sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
          |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END AS r
          |  FROM p)
          |SELECT CAST(di AS BIGINT) AS dim_i, CAST(dj AS BIGINT) AS dim_j,
          |  r FROM r ORDER BY abs(r) DESC, dim_i, dim_j LIMIT 20
          |""".stripMargin),
      (s, dir) => {
        val x = tbl(s, dir, "embeddings")
          .select(col("vec_id"),
            posexplode(col("embedding").cast("array<double>")))
          .select(col("vec_id"), (col("pos") + 1).as("i"),
            floor(col("col") * 1000).cast("long").as("q"))
        val p = x.as("a")
          .join(x.as("b"), col("b.vec_id") === col("a.vec_id") &&
            col("a.i") < col("b.i"))
          .groupBy(col("a.i").as("di"), col("b.i").as("dj"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum("a.q").as("sx"), sum("b.q").as("sy"),
            sum(expr("a.q * a.q")).as("sxx"),
            sum(expr("b.q * b.q")).as("syy"),
            sum(expr("a.q * b.q")).as("sxy"))
        val nd = col("n").cast("double")
        val varx = nd * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double")
        val vary = nd * col("syy").cast("double") -
          col("sy").cast("double") * col("sy").cast("double")
        val cov = nd * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")
        p.select(col("di").cast("long").as("dim_i"),
            col("dj").cast("long").as("dim_j"),
            when(varx * vary <= 0.0, 0.0)
              .otherwise(cov / (sqrt(varx) * sqrt(vary))).as("r"))
          .orderBy(abs(col("r")).desc, col("dim_i"), col("dim_j"))
          .limit(20)
      }),

    // Price-point rounding bias: the distribution of the last two cent
    // digits of order totals. Psychological pricing concentrates mass
    // on .00/.99 endings; the screen reports the top-10 point masses
    // and the exact total-variation distance from uniform in micro
    // (Σ|100·o_d − N| // (N // 5000), i.e. ·1e6/(200N) without ever
    // forming a >2^63 intermediate). One scan, one 100-bucket keyed
    // aggregation.
    Q("dq_price_points",
      Some(
        """WITH d AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
          |  % 100 AS dig, CAST(count(*) AS BIGINT) AS c
          |  FROM orders GROUP BY 1),
          |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM d),
          |tv AS (SELECT CAST(sum(abs(100 * d.c - n.n)) * 5000
          |  // max(n.n) AS BIGINT) AS tvd_micro FROM d, n)
          |SELECT CAST(d.dig AS BIGINT) AS cents_digits, d.c AS cnt,
          |  CAST(d.c * 1000000 // n.n AS BIGINT) AS share_micro,
          |  tv.tvd_micro
          |FROM d, n, tv ORDER BY d.c DESC, d.dig LIMIT 10
          |""".stripMargin),
      (s, dir) => {
        val d = tbl(s, dir, "orders")
          .select((floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
            % 100).as("dig"))
          .groupBy("dig").agg(count(lit(1)).cast("long").as("c"))
          .localCheckpoint() // bounded 100-bucket frame feeds two reduces
        val n = d.agg(sum("c").cast("long").as("n"))
        val tv = d.crossJoin(broadcast(n))
          .agg(expr("sum(abs(100 * c - n)) * 5000 div max(n)")
            .cast("long").as("tvd_micro"))
        val out = d.crossJoin(broadcast(n)).crossJoin(broadcast(tv))
          .select(col("dig").cast("long").as("cents_digits"), col("c")
              .as("cnt"),
            expr("c * 1000000 div n").cast("long").as("share_micro"),
            col("tvd_micro"))
          .orderBy(col("cnt").desc, col("cents_digits")).limit(10)
        H.materialized(out, Nil, Seq(d))
      }),

    // Part substitutability: (type, size) defines the interchangeable
    // class; each part's substitute count is its class size − 1. The
    // census emits the substitute-count histogram plus the share of
    // single-source (no-substitute) parts — the procurement-risk twin
    // of supply_single_source_risk from the catalog side. One keyed
    // aggregation, one bounded histogram reduce.
    Q("part_substitutes",
      Some(
        """WITH cls AS (SELECT p_type, p_size,
          |  CAST(count(*) AS BIGINT) AS sz FROM part GROUP BY 1, 2),
          |h AS (SELECT sz - 1 AS n_subs,
          |  CAST(sum(sz) AS BIGINT) AS n_parts FROM cls GROUP BY 1),
          |t AS (SELECT CAST(sum(n_parts) AS BIGINT) AS tot FROM h)
          |SELECT CAST(h.n_subs AS BIGINT) AS n_substitutes, h.n_parts,
          |  CAST(h.n_parts * 1000000 // t.tot AS BIGINT) AS share_micro
          |FROM h, t ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        val cls = tbl(s, dir, "part")
          .groupBy("p_type", "p_size")
          .agg(count(lit(1)).cast("long").as("sz"))
        val h = cls.groupBy((col("sz") - 1).as("n_subs"))
          .agg(sum("sz").cast("long").as("n_parts"))
          .localCheckpoint()
        val t = h.agg(sum("n_parts").cast("long").as("tot"))
        val out = h.crossJoin(broadcast(t))
          .select(col("n_subs").cast("long").as("n_substitutes"),
            col("n_parts"),
            expr("n_parts * 1000000 div tot").cast("long").as("share_micro"))
          .orderBy("n_substitutes")
        H.materialized(out, Nil, Seq(h))
      }))
}
