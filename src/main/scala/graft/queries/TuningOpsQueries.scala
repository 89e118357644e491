package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl
import graft.functions.{DedupSketches => DS}

/** Twenty-second wave: tuning/allocation ops — an LSH band/row tuning
  * grid, classical seasonal decomposition, and exact token-budget
  * waterfilling across domains.
  *
  * Determinism: candidate counts are exact; theoretical recall uses only
  * dyadic arithmetic (0.5^r by literal halving, ^b by literal chained
  * multiplication — no pow()); decomposition averages go through the
  * round-to-1e9 integer trick; waterfilling is exact integer search on
  * the sorted domain with cross-product compares.
  */
object TuningOpsQueries extends QueryModule {

  /** (1 - 0.5^r)^b as SQL chained multiplication — dyadic-exact factors,
    * deterministic double product in fixed order, no pow(). */
  private def recallSql(r: Int, b: Int): String = {
    val half = 1.0 - math.pow(0.5, r) // exact dyadic literal
    val lit = half.toString
    "1.0 - " + (1 to b).map(_ => s"($lit)").mkString(" * ")
  }
  private def recallVal(r: Int, b: Int): Double = {
    val half = 1.0 - math.pow(0.5, r)
    1.0 - (1 to b).map(_ => half).product
  }

  def all: Seq[Q] = Seq(

    // LSH TUNING GRID: candidate volume vs theoretical recall-at-J=0.5
    // for four band/row splits of the same 12-hash signature — the table
    // an operator reads before committing an LSH config to a new corpus
    // (more bands = higher recall = more candidates to verify; this query
    // prices that trade on the actual data). One signature build is
    // shared; each config is one band equi-join over re-grouped columns
    // of the SAME cached signature — the grid costs four joins, not four
    // signature passes. Theoretical recall 1-(1-0.5^r)^b is dyadic
    // arithmetic only (no pow), so it hashes exactly.
    Q("dedup_lsh_tuning",
      Some {
        val configs = Seq((4, 3), (3, 4), (6, 2), (2, 6)) // (bands, rows)
        s"WITH sh AS (${DS.shinglesSql(3)}), " +
          s"sig AS (${DS.minhashSignatureSql}), " +
          configs.zipWithIndex.map { case ((b, r), ci) =>
            val bandsSql = (0 until b).map { bi =>
              val key = (0 until r).map(k => s"h${bi * r + k}")
                .mkString(" || '|' || ")
              s"SELECT doc_id, $bi AS band, $key AS key FROM sig"
            }.mkString(" UNION ALL ")
            s"b$ci AS ($bandsSql), " +
              s"c$ci AS (SELECT CAST(count(*) AS BIGINT) AS n FROM (" +
              "SELECT DISTINCT a.doc_id, b.doc_id FROM " +
              s"b$ci a JOIN b$ci b ON a.band = b.band AND a.key = b.key " +
              "AND a.doc_id < b.doc_id))"
          }.mkString(", ") + " " +
          "SELECT * FROM (" +
          configs.zipWithIndex.map { case ((b, r), ci) =>
            s"SELECT CAST($b AS BIGINT) AS bands, CAST($r AS BIGINT) AS rws, " +
              s"(SELECT n FROM c$ci) AS n_candidates, " +
              s"${recallSql(r, b)} AS recall_at_half"
          }.mkString(" UNION ALL ") +
          ") ORDER BY bands, rws"
      },
      (s, dir) => {
        val configs = Seq((4, 3), (3, 4), (6, 2), (2, 6))
        val sh = DS.shingles(tbl(s, dir, "documents"), 3)
        val sig = DS.minhashSignature(sh).cache()
        val counts = configs.map { case (b, r) =>
          val bandStructs = (0 until b).map { bi =>
            struct(lit(bi).as("band"),
              concat_ws("|", (0 until r).map(k => col(s"h${bi * r + k}")): _*)
                .as("key"))
          }
          val bands = sig
            .select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
            .select(col("doc_id"), col("bk.band").as("band"),
              col("bk.key").as("key"))
          val n = bands.select(col("band"), col("key"), col("doc_id").as("da"))
            .join(bands.select(col("band"), col("key"),
              col("doc_id").as("db")), Seq("band", "key"))
            .filter(col("da") < col("db"))
            .select("da", "db").distinct()
            .agg(count(lit(1)).as("n_candidates"))
          n.select(lit(b.toLong).as("bands"), lit(r.toLong).as("rws"),
            col("n_candidates"), lit(recallVal(r, b)).as("recall_at_half"))
        }
        H.materialized(
          counts.reduce(_.unionByName(_)).orderBy("bands", "rws"),
          caches = Seq(sig))
      }),

    // CLASSICAL SEASONAL DECOMPOSITION: daily totals → 7-day centered
    // moving-average trend → weekday seasonal index of the detrended
    // series. Each average is a single division of exact sums; the
    // seasonal mean accumulates detrended doubles through the
    // round-to-1e9 integer cast (order-independent), the repo's standard
    // trick for cross-engine double sums. Everything after the one
    // (type-free) daily reduce runs on the |days| domain.
    Q("ts_decompose",
      Some(
        """WITH d AS (
          |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
          |  FROM events GROUP BY 1),
          |t AS (
          |  SELECT day, c,
          |    CAST(sum(c) OVER w AS DOUBLE) / CAST(count(*) OVER w AS DOUBLE)
          |      AS trend,
          |    CAST(count(*) OVER w AS BIGINT) AS wdays
          |  FROM d WINDOW w AS (ORDER BY day
          |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
          |s AS (
          |  SELECT *, CAST(strftime(day, '%w') AS BIGINT) AS dow,
          |         c - trend AS detr FROM t),
          |idx AS (
          |  SELECT dow,
          |    CAST(sum(CAST(round(detr * 1000000000) AS BIGINT)) AS DOUBLE)
          |      / 1000000000.0 / count(*) AS seasonal
          |  FROM s WHERE wdays = 7 GROUP BY dow)
          |SELECT strftime(s.day, '%Y-%m-%d') AS day, s.c, s.trend, s.dow,
          |       i.seasonal,
          |       s.c - s.trend - i.seasonal AS residual
          |FROM s JOIN idx i ON s.dow = i.dow
          |ORDER BY s.day""".stripMargin),
      (s, dir) => {
        val d = H.events(s, dir)
          .groupBy(col("ts").cast("date").as("day"))
          .agg(count(lit(1)).as("c"))
        val w = Window.orderBy("day").rowsBetween(-3, 3)
        val t = d
          .withColumn("trend",
            sum("c").over(w).cast("double") /
              count(lit(1)).over(w).cast("double"))
          .withColumn("wdays", count(lit(1)).over(w).cast("long"))
        val sdf = t
          .withColumn("dow", (dayofweek(col("day")) - 1).cast("long"))
          .withColumn("detr", col("c") - col("trend"))
        val idx = sdf.filter(col("wdays") === 7)
          .groupBy("dow")
          .agg((sum(round(col("detr") * 1000000000L).cast("long"))
            .cast("double") / 1000000000.0 / count(lit(1))).as("seasonal"))
        sdf.join(idx, Seq("dow"))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("c"),
            col("trend"), col("dow"), col("seasonal"),
            (col("c") - col("trend") - col("seasonal")).as("residual"))
          .orderBy("day")
      }),

    // TOKEN-BUDGET WATERFILLING: allocate a global budget of B = half the
    // corpus's tokens across sources, capping each source at the water
    // level L so Σ min(c_i, L) = B — the exact form of capped/temperature
    // data mixing. The level is found analytically on the sorted domain:
    // for each prefix of ascending token counts, L = (B − prefix) ∕
    // (remaining sources); the valid row is picked by exact cross-product
    // compares (c_k·den ≤ num < c_{k+1}·den), allocations floor to
    // integers, and the remainder distributes to the first sources by
    // name — every output token count is exact. Runs entirely on the
    // |sources| domain after one token reduce.
    Q("mix_budget_waterfill",
      Some(
        """WITH c AS (
          |  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT)
          |    AS toks
          |  FROM documents GROUP BY 1),
          |tot AS (SELECT CAST(sum(toks) AS BIGINT) AS t,
          |               CAST(sum(toks) // 2 AS BIGINT) AS b,
          |               CAST(count(*) AS BIGINT) AS n FROM c),
          |r AS (
          |  SELECT *, CAST(row_number() OVER (ORDER BY toks, source) AS BIGINT)
          |    AS rnk,
          |    CAST(sum(toks) OVER (ORDER BY toks, source) AS BIGINT) AS pre
          |  FROM c, tot),
          |lvl AS (
          |  SELECT b - pre AS num, n - rnk AS den
          |  FROM r
          |  WHERE toks * (n - rnk + 1) < b - (pre - toks)
          |  ORDER BY rnk DESC LIMIT 1),
          |lv AS (
          |  SELECT coalesce((SELECT num // den FROM lvl),
          |    (SELECT b // n FROM tot)) AS floor_l),
          |alloc AS (
          |  SELECT source, toks,
          |    least(toks, (SELECT floor_l FROM lv)) AS base
          |  FROM c),
          |rem AS (
          |  SELECT (SELECT b FROM tot) - sum(base) AS r FROM alloc),
          |fin AS (
          |  SELECT source, toks, base,
          |    CAST(base + CASE WHEN base < toks AND
          |      row_number() OVER (ORDER BY CASE WHEN base < toks THEN 0
          |        ELSE 1 END, source) <= (SELECT r FROM rem)
          |      THEN 1 ELSE 0 END AS BIGINT) AS allocated
          |  FROM alloc WHERE true)
          |SELECT source, toks, CAST(allocated AS BIGINT) AS allocated,
          |  CAST(CASE WHEN allocated < toks THEN 1 ELSE 0 END AS BIGINT)
          |    AS capped
          |FROM fin ORDER BY source""".stripMargin),
      (s, dir) => {
        val c = tbl(s, dir, "documents")
          .groupBy("source")
          .agg(sum(size(split(col("text"), " "))).cast("long").as("toks"))
        val tot = c.agg(sum("toks").cast("long").as("t"),
          expr("CAST(sum(toks) AS BIGINT) div 2").as("b"),
          count(lit(1)).as("n"))
        val r = c.crossJoin(broadcast(tot))
          .withColumn("rnk",
            row_number().over(Window.orderBy("toks", "source")).cast("long"))
          .withColumn("pre",
            sum("toks").over(Window.orderBy("toks", "source")).cast("long"))
        // the last rank where the source's count sits BELOW the water
        // level over the remaining sources → L = (B - pre_before)/(n-k+1)
        val lvl = r
          .filter(col("toks") * (col("n") - col("rnk") + 1) <
            col("b") - (col("pre") - col("toks")))
          .select((col("b") - col("pre")).as("num"),
            (col("n") - col("rnk")).as("den"), col("rnk"))
          .orderBy(col("rnk").desc).limit(1)
          .select(expr("num div den").as("floor_l"), lit(0).as("p"))
        val fallback = tot.select(expr("b div n").as("floor_l"),
          lit(1).as("p"))
        // lvl may be empty (uniform counts: no source sits below the
        // level); the priority sort makes the coalesce deterministic
        val lv = broadcast(lvl.unionByName(fallback)
          .orderBy("p").limit(1).select("floor_l"))
        val alloc = c.crossJoin(lv)
          .select(col("source"), col("toks"),
            least(col("toks"), col("floor_l")).as("base"))
        val rem = broadcast(alloc.crossJoin(broadcast(tot))
          .agg((max("b") - sum("base")).cast("long").as("r")))
        alloc.crossJoin(rem)
          .withColumn("rn",
            row_number().over(Window.orderBy(
              when(col("base") < col("toks"), 0).otherwise(1),
              col("source"))).cast("long"))
          .select(col("source"), col("toks"),
            (col("base") + when(col("base") < col("toks") &&
              col("rn") <= col("r"), 1L).otherwise(0L)).cast("long")
              .as("allocated"))
          .withColumn("capped",
            when(col("allocated") < col("toks"), 1L).otherwise(0L)
              .cast("long"))
          .orderBy("source")
      })
  )
}
