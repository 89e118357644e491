package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Forty-ninth wave: weighted-graph community quality (modularity of the
  * brand partition over the co-purchase graph) and duration-weighted
  * event-value averaging (the irregular-sampling mean). Both reduce to
  * exact integer sums over compressed domains; divisions happen once, at
  * the final micro scaling, on non-negative operands.
  */
object CommunityOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Modularity of the brand partition on the weighted co-purchase graph
    // Q = Σ_c [ e_c/m − (d_c/2m)² ]: per-community intra-edge weight and
    // degree mass, each term floored to micro. The ORACLE states the
    // textbook form (edge list with weights, then degree/community
    // reaggregation); the Spark plan exploits that every downstream sum
    // TELESCOPES all the way to per-order brand counts — the self-join
    // itself is algebra'd away (r9; the r8 plan still ran the orderkey
    // self-join before collapsing onto brands², measured 7.1×/decade).
    // With cnt = items of brand c in order o and n_o = Σ_c cnt:
    //   m   = Σ_o C(n_o,2)        (every within-order pair, weight 1 each)
    //   d_c = Σ_o cnt·(n_o−1)     (each pair touches both endpoints:
    //                              cross pairs once per side, same-brand
    //                              pairs twice ⇒ cnt·(n_o−cnt)+2·C(cnt,2))
    //   e_c = Σ_o C(cnt,2)        (same-brand pairs)
    // so the whole computation is one distinct + one (order,brand) groupBy
    // + one order-keyed window — strictly linear in lineitems, no pair
    // stream at any point.
    Q("graph_modularity",
      Some(
        """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
          |  FROM lineitem),
          |ed AS (SELECT a.pk AS p1, b.pk AS p2, CAST(count(*) AS BIGINT) AS w
          |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
          |  GROUP BY a.pk, b.pk),
          |m AS (SELECT CAST(sum(w) AS BIGINT) AS m FROM ed),
          |deg AS (SELECT pk, CAST(sum(w) AS BIGINT) AS d FROM (
          |  SELECT p1 AS pk, w FROM ed UNION ALL SELECT p2, w FROM ed) u
          |  GROUP BY pk),
          |pb AS (SELECT p_partkey AS pk, p_brand FROM part),
          |dc AS (SELECT pb.p_brand, CAST(sum(deg.d) AS BIGINT) AS d_c
          |  FROM deg JOIN pb ON pb.pk = deg.pk GROUP BY pb.p_brand),
          |ec AS (SELECT a.p_brand, CAST(sum(ed.w) AS BIGINT) AS e_c
          |  FROM ed JOIN pb a ON a.pk = ed.p1 JOIN pb b ON b.pk = ed.p2
          |  WHERE a.p_brand = b.p_brand GROUP BY a.p_brand)
          |SELECT dc.p_brand AS brand, coalesce(ec.e_c, 0) AS e_in, dc.d_c
          |  AS degree_mass,
          |  coalesce(ec.e_c, 0) * 1000000 // m.m
          |    - (dc.d_c * 1000 // (2 * m.m)) * (dc.d_c * 1000 // (2 * m.m))
          |    AS contrib_micro
          |FROM dc CROSS JOIN m LEFT JOIN ec ON ec.p_brand = dc.p_brand
          |ORDER BY brand
          |""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val pb = tbl(s, dir, "part")
          .select(col("p_partkey").as("pk"), col("p_brand"))
        // per-(order, brand) distinct-part counts: the ONLY fact-sized ops
        val ob = tbl(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
          .join(broadcast(pb), Seq("pk"))
          .groupBy(col("ok"), col("p_brand").as("b"))
          .agg(count(lit(1)).cast("long").as("cnt"))
          .withColumn("no", sum("cnt").over(Window.partitionBy("ok")))
          .localCheckpoint() // read by the brand reduce AND the m reduce
        // brand-domain reduce (~25 rows; map-side partial combine)
        // oracle's dc keeps only brands with an incident edge (deg comes
        // from the pair list) — d_c = 0 brands drop out, hence the filter
        val bysum = ob.groupBy(col("b").as("p_brand"))
          .agg(sum(col("cnt") * (col("no") - 1)).cast("long").as("d_c"),
            sum(expr("cnt * (cnt - 1) div 2")).cast("long").as("e_c"))
          .filter(col("d_c") > 0)
        // m from the per-order frame: Σ C(n_o, 2), counted once per order
        // (rows with the order's FIRST brand avoid a separate distinct)
        val m = ob.groupBy("ok")
          .agg(first(col("no")).as("no1"))
          .agg(sum(expr("no1 * (no1 - 1) div 2")).cast("long").as("m"))
        val out = bysum.crossJoin(broadcast(m))
          .withColumn("e_in", col("e_c"))
          .select(col("p_brand").as("brand"), col("e_in"),
            col("d_c").as("degree_mass"),
            // (d_c/2m)² enters as the square of the milli-scaled ratio so
            // the numerator never exceeds 64 bits at any corpus size
            expr("e_in * 1000000 div m" +
              " - (d_c * 1000 div (2 * m)) * (d_c * 1000 div (2 * m))")
              .as("contrib_micro"))
          .orderBy("brand")
        H.materialized(out, caches = Nil, checkpoints = Seq(ob))
      }),

    // Duration-weighted mean event value per user cohort: each reading
    // holds until the next one (step interpolation), so the mean weights
    // values by their holding time in seconds — the irregular-sampling
    // analogue of avg(). Cents × seconds keeps everything BIGINT; the
    // last reading of each user carries no duration and drops out, same
    // as the closed-form TWA. One window pass per user, then one
    // cohort-sized reduce.
    Q("ts_time_weighted_avg",
      Some(
        """WITH e AS (SELECT user_id, epoch_us(ts) AS um,
          |  CAST(floor(value*100 + 0.5) AS BIGINT) AS cents FROM events),
          |d AS (SELECT user_id, cents,
          |  (lead(um) OVER (PARTITION BY user_id ORDER BY um, cents) - um)
          |    // 1000000 AS dur FROM e),
          |g AS (SELECT user_id % 10 AS cohort,
          |  CAST(sum(cents * dur) AS BIGINT) AS wsum,
          |  CAST(sum(dur) AS BIGINT) AS tsum,
          |  CAST(count(*) AS BIGINT) AS readings
          |  FROM d WHERE dur IS NOT NULL GROUP BY user_id % 10)
          |SELECT cohort, readings, tsum AS total_seconds,
          |  wsum * 10000 // tsum AS twa_micro
          |FROM g ORDER BY cohort
          |""".stripMargin),
      (s, dir) => {
        H.events(s, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("um"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
          .withColumn("dur",
            expr("(lead(um) over (partition by user_id order by um, cents)" +
              " - um) div 1000000"))
          .filter(col("dur").isNotNull)
          .groupBy(pmod(col("user_id"), lit(10)).as("cohort"))
          .agg(sum(col("cents") * col("dur")).cast("long").as("wsum"),
            sum("dur").cast("long").as("tsum"),
            count(lit(1)).cast("long").as("readings"))
          .select(col("cohort"), col("readings"),
            col("tsum").as("total_seconds"),
            expr("wsum * 10000 div tsum").as("twa_micro"))
          .orderBy("cohort")
      }))
}
