package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Fifty-seventh wave: evaluation-of-structure ops — pair-recall of the
  * Soundex blocking key against the brand ground truth, capped directed
  * Hausdorff distance between brand point sets on the eps-grid, and
  * Cohen's kappa between two deterministic document raters. All counts
  * and distances are exact integers; kappa's chance correction is a
  * single cross-multiplied division.
  */
object AgreementOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Blocking recall: what fraction of same-brand part pairs land in the
    // same Soundex block (the pairs a blocked linkage could ever see)?
    // Both pair masses come from n·(n−1)/2 over count frames — the pair
    // space is never enumerated. Recall per brand in micro.
    Q("er_blocking_recall",
      Some {
        val sdx = {
          val w = "lower(string_split(p_name, ' ')[1])"
          val digits = s"translate($w, 'abcdefghijklmnopqrstuvwxyz', " +
            "'01230120022455012623010202')"
          val collapsed = (1 to 6).foldLeft(digits)((acc, d) =>
            s"regexp_replace($acc, '$d{2,}', '$d')")
          s"upper(substr($w, 1, 1)) || substr(rpad(substr(" +
            s"replace($collapsed, '0', ''), 2, 3), 3, '0'), 1, 3)"
        }
        s"""WITH p AS (SELECT p_brand, $sdx AS sdx FROM part),
           |tot AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n
           |  FROM p GROUP BY p_brand),
           |blk AS (SELECT p_brand, sdx, CAST(count(*) AS BIGINT) AS n
           |  FROM p GROUP BY p_brand, sdx),
           |cap AS (SELECT p_brand,
           |  CAST(sum(n * (n - 1) // 2) AS BIGINT) AS captured
           |  FROM blk GROUP BY p_brand)
           |SELECT tot.p_brand AS brand, tot.n * (tot.n - 1) // 2
           |    AS brand_pairs,
           |  coalesce(cap.captured, 0) AS captured_pairs,
           |  coalesce(cap.captured, 0) * 1000000
           |    // greatest(tot.n * (tot.n - 1) // 2, 1) AS recall_micro
           |FROM tot LEFT JOIN cap ON cap.p_brand = tot.p_brand
           |ORDER BY brand
           |""".stripMargin
      },
      (s, dir) => {
        val w = lower(element_at(split(col("p_name"), " ", -1), 1))
        val digits = translate(w, "abcdefghijklmnopqrstuvwxyz",
          "01230120022455012623010202")
        val collapsed = (1 to 6).foldLeft(digits)((acc, d) =>
          regexp_replace(acc, s"$d{2,}", s"$d"))
        val sdx = concat(upper(substring(w, 1, 1)),
          substring(rpad(substring(regexp_replace(collapsed, "0", ""),
            2, 3), 3, "0"), 1, 3))
        val p = tbl(s, dir, "part")
          .select(col("p_brand"), sdx.as("sdx"))
          .localCheckpoint() // totals + per-block counts
        val tot = p.groupBy("p_brand")
          .agg(count(lit(1)).cast("long").as("n"))
        val cap = p.groupBy("p_brand", "sdx")
          .agg(count(lit(1)).cast("long").as("bn"))
          .groupBy("p_brand")
          .agg(sum(expr("bn * (bn - 1) div 2")).cast("long").as("captured"))
        val out = tot.join(cap, Seq("p_brand"), "left")
          .withColumn("captured", coalesce(col("captured"), lit(0L)))
          .select(col("p_brand").as("brand"),
            expr("n * (n - 1) div 2").as("brand_pairs"),
            col("captured").as("captured_pairs"),
            expr("captured * 1000000 div " +
              "greatest(n * (n - 1) div 2, 1L)").as("recall_micro"))
          .orderBy("brand")
        H.materialized(out, caches = Nil, checkpoints = Seq(p))
      }),

    // Capped directed Hausdorff between brand point sets (5 focus
    // brands): per source point, min squared distance to the target set
    // searched in the 3×3 cell-100 neighborhood (which fully covers the
    // 100-radius ball); misses cap at 200² — the bounded-search contract
    // that keeps the op an equi-join at any scale. H(A→B) = max of the
    // per-point minima.
    Q("spatial_hausdorff_capped",
      Some(
        """WITH pts AS (SELECT p_brand AS b, p_partkey AS id,
          |  (p_partkey * 7919) % 1000 AS x, (p_partkey * 104729) % 1000 AS y
          |  FROM part WHERE p_brand IN
          |    ('Brand#11','Brand#12','Brand#13','Brand#14','Brand#15')),
          |pr AS (SELECT a.b AS ba, bb.b AS bb FROM
          |  (SELECT DISTINCT b FROM pts) a JOIN
          |  (SELECT DISTINCT b FROM pts) bb ON a.b <> bb.b),
          |mind AS (SELECT a.b AS ba, bset.b AS bb, a.id,
          |  min(CASE WHEN (a.x-t.x)*(a.x-t.x) + (a.y-t.y)*(a.y-t.y)
          |    <= 10000 THEN (a.x-t.x)*(a.x-t.x) + (a.y-t.y)*(a.y-t.y)
          |    END) AS md
          |  FROM pts a
          |  JOIN (SELECT DISTINCT b FROM pts) bset ON bset.b <> a.b
          |  LEFT JOIN pts t ON t.b = bset.b
          |    AND abs(a.x - t.x) <= 100 AND abs(a.y - t.y) <= 100
          |  GROUP BY a.b, bset.b, a.id)
          |SELECT ba, bb, CAST(max(coalesce(md, 40000)) AS BIGINT)
          |    AS hausdorff_d2,
          |  CAST(sum(CASE WHEN md IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          |    AS capped_points
          |FROM mind GROUP BY ba, bb ORDER BY ba, bb
          |""".stripMargin),
      (s, dir) => {
        val pts = tbl(s, dir, "part")
          .filter(col("p_brand").isin("Brand#11", "Brand#12", "Brand#13",
            "Brand#14", "Brand#15"))
          .select(col("p_brand").as("b"), col("p_partkey").as("id"),
            (col("p_partkey") * 7919 % 1000).as("x"),
            (col("p_partkey") * 104729 % 1000).as("y"))
          .localCheckpoint() // source explode + target side + brand domain
        val brands = pts.select("b").distinct()
        val offs = array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
          struct(lit(dx).as("dx"), lit(dy).as("dy")))): _*)
        val src = pts
          .join(broadcast(brands.select(col("b").as("tb"))),
            col("tb") =!= col("b"))
          .withColumn("o", explode(offs))
          .select(col("b").as("ba"), col("tb"), col("id"), col("x"),
            col("y"), (expr("x div 100") + col("o.dx")).as("cx"),
            (expr("y div 100") + col("o.dy")).as("cy"))
        val tgt = pts.select(col("b").as("t_b"), col("x").as("tx"),
          col("y").as("ty"), expr("x div 100").as("cx"),
          expr("y div 100").as("cy"))
        val d2 = (col("x") - col("tx")) * (col("x") - col("tx")) +
          (col("y") - col("ty")) * (col("y") - col("ty"))
        val mind = src.join(tgt, Seq("cx", "cy"), "left")
          .withColumn("md", when(col("t_b") === col("tb") &&
            d2 <= 10000, d2))
          .groupBy(col("ba"), col("tb").as("bb"), col("id"))
          .agg(min("md").as("md"))
        val out = mind.groupBy("ba", "bb")
          .agg(max(coalesce(col("md"), lit(40000L))).cast("long")
            .as("hausdorff_d2"),
            sum(when(col("md").isNull, 1L).otherwise(0L)).cast("long")
              .as("capped_points"))
          .orderBy("ba", "bb")
        H.materialized(out, caches = Nil, checkpoints = Seq(pts))
      }),

    // Cohen's kappa between two deterministic doc raters (character-mass
    // tertile vs word-count tertile): observed agreement corrected for
    // chance, κ_micro = (agree·N − Σrᵢcᵢ)·10⁶ // (N² − Σrᵢcᵢ) — exact
    // cross-multiplication, one confusion-matrix pass.
    Q("stats_cohens_kappa",
      Some(
        """WITH d AS (SELECT doc_id, n_chars,
          |  len(string_split(text, ' ')) AS words FROM documents),
          |rk AS (SELECT doc_id,
          |  ntile(3) OVER (ORDER BY n_chars, doc_id) AS r1,
          |  ntile(3) OVER (ORDER BY words, doc_id) AS r2 FROM d),
          |cm AS (SELECT r1, r2, CAST(count(*) AS BIGINT) AS n
          |  FROM rk GROUP BY r1, r2),
          |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
          |  CAST(sum(CASE WHEN r1 = r2 THEN n ELSE 0 END) AS BIGINT)
          |    AS agree FROM cm),
          |marg AS (SELECT CAST(sum(r.rn * c.cn) AS BIGINT) AS chance
          |  FROM (SELECT r1, CAST(sum(n) AS BIGINT) AS rn FROM cm
          |    GROUP BY r1) r
          |  JOIN (SELECT r2, CAST(sum(n) AS BIGINT) AS cn FROM cm
          |    GROUP BY r2) c ON c.r2 = r.r1)
          |SELECT tot.nn, tot.agree, marg.chance,
          |  ((tot.agree * tot.nn - marg.chance)
          |    + (tot.nn * tot.nn - marg.chance)) * 1000000
          |    // (tot.nn * tot.nn - marg.chance) - 1000000 AS kappa_micro
          |FROM tot CROSS JOIN marg
          |""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val d = tbl(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"),
            size(split(col("text"), " ", -1)).as("words"))
        val rk = d
          .withColumn("r1", ntile(3).over(
            Window.orderBy("n_chars", "doc_id")))
          .withColumn("r2", ntile(3).over(
            Window.orderBy("words", "doc_id")))
        val cm = rk.groupBy("r1", "r2")
          .agg(count(lit(1)).cast("long").as("n"))
          .localCheckpoint() // totals + both marginals
        val tot = cm.agg(sum("n").cast("long").as("nn"),
          sum(when(col("r1") === col("r2"), col("n")).otherwise(0L))
            .cast("long").as("agree"))
        val marg = cm.groupBy("r1").agg(sum("n").cast("long").as("rn"))
          .join(cm.groupBy("r2").agg(sum("n").cast("long").as("cn")),
            col("r2") === col("r1"))
          .agg(sum(col("rn") * col("cn")).cast("long").as("chance"))
        val out = tot.crossJoin(broadcast(marg))
          // +denominator offset keeps the numerator non-negative (ntile
          // marginals bound chance ≤ (N+2)²/3), so div == // exactly
          .select(col("nn"), col("agree"), col("chance"),
            expr("((agree * nn - chance) + (nn * nn - chance)) * 1000000" +
              " div (nn * nn - chance) - 1000000").as("kappa_micro"))
        H.materialized(out, caches = Nil, checkpoints = Seq(cm))
      }))
}
