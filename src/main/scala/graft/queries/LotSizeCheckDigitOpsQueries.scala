package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, QueryModule}
import graft.H.tbl

/** Round-9 wave 134: Wagner–Whitin dynamic lot sizing (the exact DP that
  * replaces EOQ when demand is time-varying — the classic MRP planning
  * kernel) and check-digit identifier auditing (Luhn + ISO 7064 mod 97-10
  * over planted single-digit and transposition errors — the standard DQ
  * gate on card-like / IBAN-like identifiers). Both exact-integer.
  */
object LotSizeCheckDigitOpsQueries extends QueryModule {

  /** Months in the data's calendar span (1995-01 .. 2001-08). */
  private val T = 80

  // ---- check-digit term builders (unrolled digit sums, identical ASTs
  // in both engines; digit p of x from the right is (x div 10^p) % 10) ----

  /** Luhn weighted digit term at 10^p within `x`, doubling odd positions
    * (counting the final check digit as position 0). */
  private def luhnTerm(x: String, p: Int, sql: Boolean): String = {
    val d =
      if (sql) s"(($x // ${pow10(p)}) % 10)"
      else s"(($x div ${pow10(p)}) % 10)"
    if (p % 2 == 1) s"(CASE WHEN $d > 4 THEN $d * 2 - 9 ELSE $d * 2 END)"
    else d
  }

  private def pow10(p: Int): String = ("1" + "0" * p) + (if (p >= 10) "" else "")

  /** Luhn checksum of the 10-digit id (positions 0..9). Valid iff ≡0 (mod 10). */
  private def luhnSum10(x: String, sql: Boolean): String =
    (0 to 9).map(luhnTerm(x, _, sql)).mkString(" + ")

  /** Luhn checksum over the 9 payload digits at their post-append positions
    * 1..9 — the generator side (check digit = (10 − S mod 10) mod 10). */
  private def luhnSumPayload(x: String, sql: Boolean): String =
    (0 to 8).map(p => luhnTerm(x, p, sql) match {
      // payload digit p sits at id position p+1, so the doubling parity
      // flips relative to the raw payload positions:
      case _ => {
        val d =
          if (sql) s"(($x // ${pow10(p)}) % 10)"
          else s"(($x div ${pow10(p)}) % 10)"
        if ((p + 1) % 2 == 1)
          s"(CASE WHEN $d > 4 THEN $d * 2 - 9 ELSE $d * 2 END)"
        else d
      }
    }).mkString(" + ")

  def all: Seq[Q] = Seq(

    // WAGNER–WHITIN LOT SIZING: per brand, the exact minimum-cost ordering
    // plan over the 80-month horizon (setup K=1000, holding h=1 per unit-
    // month), vs the two naive policies it dominates — lot-for-lot (order
    // every active month) and one-big-order. f(t) = min_j f(j−1) + K +
    // Σ_{i=j..t}(i−j)·d_i, with the holding term in closed form from the
    // prefix sums D and W=Σi·d_i: cost(j,t) = (W_t−W_{j−1}) − j(D_t−D_{j−1}).
    // All integer. Scale shape: ONE fact-sized (brand, month) reduce; the
    // dense 80-month grid, prefix arrays, and the O(T²)=6400-step DP run
    // as per-brand array folds — 25 independent bounded-state folds, no
    // shuffle after the reduce. The horizon T is calendar-bounded (a
    // constant w.r.t. corpus size), the same scale argument as
    // stats_theil_sen's day grid.
    Q("orders_wagner_whitin",
      Some(
        s"""WITH RECURSIVE dm AS (
           |  SELECT p_brand AS brand,
           |    CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate)
           |      AS BIGINT) AS m,
           |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS d
           |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           |  JOIN part ON p_partkey = l_partkey
           |  GROUP BY 1, 2),
           |grid AS (
           |  SELECT b.brand, CAST(mo.m AS BIGINT) AS m, coalesce(dm.d, 0) AS d
           |  FROM (SELECT DISTINCT brand FROM dm) b
           |  CROSS JOIN (SELECT unnest(range(1, ${T + 1})) AS m) mo
           |  LEFT JOIN dm ON dm.brand = b.brand AND dm.m = mo.m),
           |arr AS (
           |  SELECT brand, list(d ORDER BY m) AS dv,
           |    CAST(sum(d) AS BIGINT) AS total,
           |    CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_active
           |  FROM grid GROUP BY 1),
           |pre AS (
           |  SELECT brand, total, n_active,
           |    [CAST(0 AS BIGINT)] || [CAST(list_sum(dv[1:i]) AS BIGINT)
           |      FOR i IN range(1, ${T + 1})] AS cd,
           |    [CAST(0 AS BIGINT)] || [CAST(list_sum([dv[k] * k
           |      FOR k IN range(1, i + 1)]) AS BIGINT)
           |      FOR i IN range(1, ${T + 1})] AS cw
           |  FROM arr),
           |g AS (
           |  SELECT brand, CAST(0 AS BIGINT) AS t, [CAST(0 AS BIGINT)] AS dp,
           |    cd, cw, total, n_active
           |  FROM pre
           |  UNION ALL
           |  SELECT brand, t + 1,
           |    list_append(dp, list_min([dp[j] + 1000 + (cw[t+2] - cw[j])
           |      - j * (cd[t+2] - cd[j])
           |      FOR j IN range(1, CAST(t + 2 AS INT))])),
           |    cd, cw, total, n_active
           |  FROM g WHERE t < $T)
           |SELECT brand, total AS total_qty, n_active AS n_active_months,
           |  CAST(dp[${T + 1}] AS BIGINT) AS ww_optimal_cost,
           |  CAST(n_active * 1000 AS BIGINT) AS lot_for_lot_cost,
           |  CAST(1000 + (cw[${T + 1}] - cw[1]) - (cd[${T + 1}] - cd[1])
           |    AS BIGINT) AS single_order_cost,
           |  CAST((n_active * 1000 - dp[${T + 1}]) * 1000000
           |    // greatest(n_active * 1000, 1) AS BIGINT) AS savings_ppm
           |FROM g WHERE t = $T ORDER BY brand
           |""".stripMargin),
      (s, dir) => {
        val dm = tbl(s, dir, "lineitem")
          .join(tbl(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
          .join(tbl(s, dir, "part"), col("p_partkey") === col("l_partkey"))
          .groupBy(col("p_brand").as("brand"),
            ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")))
              .cast("long").as("m"))
          .agg(sum(col("l_quantity").cast("long")).cast("long").as("d"))
        val months = s.range(1, T + 1).select(col("id").as("m"))
        val grid = dm.select("brand").distinct()
          .crossJoin(broadcast(months))
          .join(dm, Seq("brand", "m"), "left")
          .select(col("brand"), col("m"), coalesce(col("d"), lit(0L)).as("d"))
        val arr = grid.groupBy("brand")
          .agg(
            transform(array_sort(collect_list(struct(col("m"), col("d")))),
              x => x.getField("d")).as("dv"),
            sum("d").cast("long").as("total"),
            sum(when(col("d") > 0, 1L).otherwise(0L)).cast("long")
              .as("n_active"))
          // prefix sums as array folds: cd[i+1] = D_i, cw[i+1] = W_i = Σ k·d_k
          .withColumn("cd", expr(
            """aggregate(dv, array(CAST(0 AS BIGINT)),
              |  (acc, d) -> array_append(acc,
              |    element_at(acc, size(acc)) + d))""".stripMargin))
          .withColumn("cw", expr(
            s"""aggregate(sequence(1, $T), array(CAST(0 AS BIGINT)),
               |  (acc, i) -> array_append(acc,
               |    element_at(acc, size(acc))
               |      + element_at(dv, i) * CAST(i AS BIGINT)))""".stripMargin))
          // the DP fold: dp[t+1] = f(t)
          .withColumn("dp", expr(
            s"""aggregate(sequence(1, $T), array(CAST(0 AS BIGINT)),
               |  (dp, t) -> array_append(dp, array_min(transform(
               |    sequence(1, t), j ->
               |      element_at(dp, j) + CAST(1000 AS BIGINT)
               |        + (element_at(cw, t + 1) - element_at(cw, j))
               |        - CAST(j AS BIGINT)
               |          * (element_at(cd, t + 1) - element_at(cd, j))))))"""
              .stripMargin))
        arr.select(col("brand"), col("total").as("total_qty"),
            col("n_active").as("n_active_months"),
            element_at(col("dp"), T + 1).as("ww_optimal_cost"),
            (col("n_active") * 1000).cast("long").as("lot_for_lot_cost"),
            (lit(1000L) + (element_at(col("cw"), T + 1)
              - element_at(col("cw"), 1))
              - (element_at(col("cd"), T + 1) - element_at(col("cd"), 1)))
              .cast("long").as("single_order_cost"),
            expr(s"CAST((n_active * 1000 - element_at(dp, ${T + 1})) * 1000000"
              + " div greatest(n_active * 1000, 1) AS BIGINT)")
              .as("savings_ppm"))
          .orderBy("brand")
      }),

    // CHECK-DIGIT AUDIT: every order key mints a 9-digit payload, protected
    // two ways — a Luhn check digit (card-number scheme) and ISO 7064
    // mod 97-10 double check digits (IBAN scheme). A deterministic 5% of
    // ids get a single-digit bump and 3% an adjacent-digit transposition,
    // planted on the SAME payload digit positions in both encodings, AFTER
    // check computation (a transmission error). The audit recomputes both
    // checks and reports flag rates per (scheme, error class) — exhibiting
    // the textbook contrast: both catch every single-digit error; mod 97
    // catches every real transposition; Luhn additionally misses the
    // 90↔09 adjacent swaps (and equal-digit "transpositions" are identity
    // — no scheme can or should flag them). Scale shape: pure per-row
    // integer map + one 6-row reduce — zero shuffle before the final
    // bounded-domain aggregate.
    Q("dq_check_digit",
      Some {
        val lsP = luhnSumPayload("payload", sql = true)
        val ls10 = luhnSum10("lid2", sql = true)
        s"""WITH base AS (
           |  SELECT o_orderkey AS ok,
           |    (o_orderkey * 1000003) % 1000000000 AS payload,
           |    (o_orderkey * 48271) % 101 AS h
           |  FROM orders),
           |ids AS (
           |  SELECT ok, payload, h,
           |    payload * 10 + (10 - ($lsP) % 10) % 10 AS lid,
           |    payload * 100 + (98 - (payload * 100) % 97) AS mid,
           |    ((payload // 100) % 10) AS p2,
           |    ((payload // 1000) % 10) AS p3
           |  FROM base),
           |c AS (
           |  SELECT ok,
           |    CASE WHEN h < 5 THEN 'bump' WHEN h < 8 THEN 'transpose'
           |      ELSE 'clean' END AS error_class,
           |    CASE WHEN h < 5 THEN
           |        lid + (CASE WHEN p2 < 9 THEN 1 ELSE -9 END) * 1000
           |      WHEN h < 8 THEN lid + (p3 - p2) * 1000 + (p2 - p3) * 10000
           |      ELSE lid END AS lid2,
           |    CASE WHEN h < 5 THEN
           |        mid + (CASE WHEN p2 < 9 THEN 1 ELSE -9 END) * 10000
           |      WHEN h < 8 THEN mid + (p3 - p2) * 10000 + (p2 - p3) * 100000
           |      ELSE mid END AS mid2
           |  FROM ids),
           |v AS (
           |  SELECT error_class,
           |    CASE WHEN ($ls10) % 10 = 0 THEN 1 ELSE 0 END AS luhn_ok,
           |    CASE WHEN mid2 % 97 = 1 THEN 1 ELSE 0 END AS m97_ok
           |  FROM c),
           |u AS (
           |  SELECT 'luhn' AS scheme, error_class, luhn_ok AS ok FROM v
           |  UNION ALL
           |  SELECT 'mod97', error_class, m97_ok FROM v)
           |SELECT scheme, error_class, CAST(count(*) AS BIGINT) AS n_ids,
           |  CAST(sum(1 - ok) AS BIGINT) AS n_flagged,
           |  CAST(sum(1 - ok) * 1000000 // count(*) AS BIGINT)
           |    AS flagged_ppm
           |FROM u GROUP BY 1, 2 ORDER BY 1, 2
           |""".stripMargin
      },
      (s, dir) => {
        val lsP = luhnSumPayload("payload", sql = false)
        val ls10 = luhnSum10("lid2", sql = false)
        val ids = tbl(s, dir, "orders")
          .select(col("o_orderkey").as("ok"),
            expr("(o_orderkey * 1000003) % 1000000000").as("payload"),
            expr("(o_orderkey * 48271) % 101").as("h"))
          .withColumn("lid", expr(s"payload * 10 + (10 - ($lsP) % 10) % 10"))
          .withColumn("mid",
            expr("payload * 100 + (98 - (payload * 100) % 97)"))
          .withColumn("p2", expr("(payload div 100) % 10"))
          .withColumn("p3", expr("(payload div 1000) % 10"))
        val c = ids.select(
          when(col("h") < 5, "bump").when(col("h") < 8, "transpose")
            .otherwise("clean").as("error_class"),
          when(col("h") < 5,
            col("lid") + when(col("p2") < 9, 1L).otherwise(-9L) * 1000)
            .when(col("h") < 8, col("lid") + (col("p3") - col("p2")) * 1000
              + (col("p2") - col("p3")) * 10000)
            .otherwise(col("lid")).as("lid2"),
          when(col("h") < 5,
            col("mid") + when(col("p2") < 9, 1L).otherwise(-9L) * 10000)
            .when(col("h") < 8, col("mid") + (col("p3") - col("p2")) * 10000
              + (col("p2") - col("p3")) * 100000)
            .otherwise(col("mid")).as("mid2"))
        val v = c.select(col("error_class"),
          when(expr(s"($ls10) % 10") === 0, 1L).otherwise(0L).as("luhn_ok"),
          when(expr("mid2 % 97") === 1, 1L).otherwise(0L).as("m97_ok"))
        val u = v.select(lit("luhn").as("scheme"), col("error_class"),
            col("luhn_ok").as("ok"))
          .unionAll(v.select(lit("mod97").as("scheme"), col("error_class"),
            col("m97_ok").as("ok")))
        u.groupBy("scheme", "error_class")
          .agg(count(lit(1)).cast("long").as("n_ids"),
            sum(lit(1L) - col("ok")).cast("long").as("n_flagged"),
            expr("CAST(sum(1 - ok) * 1000000 div count(1) AS BIGINT)")
              .as("flagged_ppm"))
          .orderBy("scheme", "error_class")
      })
  )
}
