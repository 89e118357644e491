package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Eighty-eighth wave: physical-design advisors and absorbing-chain
  * analytics — a sort-key advisor that measures zonemap prune rates per
  * candidate key under the current ingest layout, a partition-scheme
  * advisor scoring size skew and small-partition counts, expected
  * steps-to-purchase on the absorbing session Markov chain (unrolled
  * Jacobi sweeps in exact micro integers, the SQL text GENERATED once
  * and run verbatim by both engines), and weighted dyad reciprocity of
  * the user-transition digraph. The first two are the decisions a
  * 100 TB lakehouse makes before rewriting data — which column to sort
  * by, which key to partition by — expressed as measurable queries
  * instead of folklore.
  */
object LayoutAdvisorQueries extends QueryModule {

  /** Transient states of the session chain; 'purchase' is absorbing. */
  private val St = Seq("click" -> "c", "error" -> "e",
    "signup" -> "s", "view" -> "v")

  /** Absorbing-chain SQL, generated once per integer-division dialect
    * (`div` for Spark, `//` for DuckDB) so both engines run the same
    * quantized chain: micro-probabilities pm = n·1e6 div rowTotal
    * (BIGINT-safe at any corpus size because pm ≤ 1e6 afterwards), then
    * 12 unrolled Jacobi sweeps t ← 1e6 + (Σ pm·t) div 1e6 on the 1-row
    * pivot. EVTBL is the per-engine events relation.
    */
  private def absorbingSql(div: String, evtbl: String): String = {
    val piv = St.flatMap { case (pn, pa) => St.map { case (qn, qa) =>
      s"coalesce(max(CASE WHEN prev='$pn' AND curr='$qn' THEN pm END), 0)" +
        s" AS p_$pa$qa"
    } }.mkString(",\n  ")
    val s0 = "SELECT " +
      St.map(s => s"CAST(0 AS BIGINT) AS t_${s._2}").mkString(", ")
    val sweeps = (1 to 12).map { k =>
      val cols = St.map { case (_, pa) =>
        val dot = St.map { case (_, qa) =>
          s"piv.p_$pa$qa * s${k - 1}.t_$qa" }.mkString(" + ")
        s"CAST(1000000 + ($dot) $div 1000000 AS BIGINT) AS t_$pa"
      }.mkString(",\n    ")
      s"s$k AS (SELECT\n    $cols\n  FROM s${k - 1}, piv)"
    }.mkString(",\n")
    val fin = St.map { case (pn, pa) =>
      s"SELECT '$pn' AS state, t_$pa AS exp_steps_micro FROM s12"
    }.mkString(" UNION ALL ")
    s"""WITH t AS (SELECT lag(event_type) OVER (PARTITION BY user_id
       |    ORDER BY ts, event_id) AS prev, event_type AS curr
       |  FROM $evtbl),
       |c AS (SELECT prev, curr, CAST(count(*) AS BIGINT) AS n FROM t
       |  WHERE prev IS NOT NULL AND prev <> 'purchase' GROUP BY 1, 2),
       |rt AS (SELECT prev, CAST(sum(n) AS BIGINT) AS r FROM c GROUP BY 1),
       |pm AS (SELECT c.prev, c.curr, c.n * 1000000 $div rt.r AS pm
       |  FROM c JOIN rt ON rt.prev = c.prev WHERE c.curr <> 'purchase'),
       |piv AS (SELECT
       |  $piv
       |FROM pm),
       |s0 AS ($s0),
       |$sweeps
       |$fin ORDER BY state""".stripMargin
  }

  def all: Seq[Q] = Seq(

    // Sort-key advisor: would zone maps prune under each candidate sort
    // key, given the CURRENT ingest layout (chunks of ~400 consecutive
    // order keys — the arrival order)? Per candidate column the chunk
    // frame keeps min/max (ONE fact scan, all four candidates in one
    // keyed aggregation, stacked long afterwards), then a 20-probe
    // equi-width range workload counts surviving chunks. High prune_bps
    // = the data is already clustered on that key; low = a sort rewrite
    // would pay. The chunk frame is |orders|/400 rows — bounded relative
    // to facts — and probes broadcast.
    Q("layout_sortkey_advisor",
      Some(
        """WITH ch AS (SELECT l_orderkey // 400 AS chunk,
          |  CAST(min(date_diff('day', TIMESTAMP '1995-01-01',
          |    l_shipdate)) AS BIGINT) AS mn_ship,
          |  CAST(max(date_diff('day', TIMESTAMP '1995-01-01',
          |    l_shipdate)) AS BIGINT) AS mx_ship,
          |  CAST(min(l_partkey) AS BIGINT) AS mn_part,
          |  CAST(max(l_partkey) AS BIGINT) AS mx_part,
          |  CAST(min(l_suppkey) AS BIGINT) AS mn_supp,
          |  CAST(max(l_suppkey) AS BIGINT) AS mx_supp,
          |  CAST(min(CAST(l_quantity AS BIGINT)) AS BIGINT) AS mn_qty,
          |  CAST(max(CAST(l_quantity AS BIGINT)) AS BIGINT) AS mx_qty
          |  FROM lineitem GROUP BY 1),
          |lng AS (
          |  SELECT chunk, 'shipdate' AS cand, mn_ship AS mn, mx_ship AS mx
          |    FROM ch
          |  UNION ALL SELECT chunk, 'partkey', mn_part, mx_part FROM ch
          |  UNION ALL SELECT chunk, 'suppkey', mn_supp, mx_supp FROM ch
          |  UNION ALL SELECT chunk, 'quantity', mn_qty, mx_qty FROM ch),
          |g AS (SELECT cand, CAST(min(mn) AS BIGINT) AS gmin,
          |  CAST(max(mx) AS BIGINT) AS gmax,
          |  CAST(count(*) AS BIGINT) AS n_chunks FROM lng GROUP BY 1),
          |pr AS (SELECT g.cand,
          |  g.gmin + i.i * (g.gmax - g.gmin + 1) // 20 AS lo,
          |  g.gmin + (i.i + 1) * (g.gmax - g.gmin + 1) // 20 - 1 AS hi
          |  FROM g, (SELECT range AS i FROM range(0, 20)) i),
          |sc AS (SELECT p.cand, CAST(count(*) AS BIGINT) AS scanned
          |  FROM pr p JOIN lng l ON l.cand = p.cand
          |  WHERE NOT (l.mx < p.lo OR l.mn > p.hi) GROUP BY 1)
          |SELECT g.cand AS candidate, g.n_chunks, sc.scanned,
          |  CAST(10000 - sc.scanned * 10000 // (20 * g.n_chunks)
          |    AS BIGINT) AS prune_bps
          |FROM g JOIN sc ON sc.cand = g.cand ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        val ch = tbl(s, dir, "lineitem")
          .groupBy(expr("l_orderkey div 400").as("chunk"))
          .agg(
            min(datediff(col("l_shipdate"),
              to_timestamp(lit("1995-01-01 00:00:00")))).cast("long")
              .as("mn_ship"),
            max(datediff(col("l_shipdate"),
              to_timestamp(lit("1995-01-01 00:00:00")))).cast("long")
              .as("mx_ship"),
            min(col("l_partkey")).cast("long").as("mn_part"),
            max(col("l_partkey")).cast("long").as("mx_part"),
            min(col("l_suppkey")).cast("long").as("mn_supp"),
            max(col("l_suppkey")).cast("long").as("mx_supp"),
            min(col("l_quantity").cast("long")).cast("long").as("mn_qty"),
            max(col("l_quantity").cast("long")).cast("long").as("mx_qty"))
        val lng = ch.select(col("chunk"), expr(
          "stack(4, 'shipdate', mn_ship, mx_ship, 'partkey', mn_part, " +
            "mx_part, 'suppkey', mn_supp, mx_supp, 'quantity', mn_qty, " +
            "mx_qty) AS (cand, mn, mx)"))
        val g = lng.groupBy("cand")
          .agg(min(col("mn")).cast("long").as("gmin"),
            max(col("mx")).cast("long").as("gmax"),
            count(lit(1)).cast("long").as("n_chunks"))
        val pr = g.select(col("cand"), col("gmin"), col("gmax"),
            explode(sequence(lit(0L), lit(19L))).as("i"))
          .select(col("cand"),
            expr("gmin + i * (gmax - gmin + 1) div 20").as("lo"),
            expr("gmin + (i + 1) * (gmax - gmin + 1) div 20 - 1").as("hi"))
        val sc = lng.join(broadcast(pr), Seq("cand"))
          .filter(!(col("mx") < col("lo") || col("mn") > col("hi")))
          .groupBy("cand").agg(count(lit(1)).cast("long").as("scanned"))
        g.join(sc, Seq("cand"))
          .select(col("cand").as("candidate"), col("n_chunks"),
            col("scanned"),
            expr("10000 - scanned * 10000 div (20 * n_chunks)")
              .cast("long").as("prune_bps"))
          .orderBy("candidate")
      }),

    // Partition-scheme advisor for the documents corpus: for each
    // candidate partition key (lang, source, lang×source) — partition
    // count, total/max bytes, exact 2× median partition size (two
    // middle order statistics over the bounded partition frame), the
    // max/median skew ratio in milli, and how many partitions fall
    // under a quarter of the mean (the small-file pathology). Three
    // keyed aggregations over one fact column; every later stage runs
    // on the ≤|domain| partition frames.
    Q("layout_partition_advisor",
      Some(
        """WITH p AS (
          |  SELECT 'lang' AS scheme, lang AS pk,
          |    CAST(sum(n_chars) AS BIGINT) AS bytes
          |  FROM documents GROUP BY 2
          |  UNION ALL SELECT 'source', source,
          |    CAST(sum(n_chars) AS BIGINT) FROM documents GROUP BY 2
          |  UNION ALL SELECT 'lang_source', lang || '|' || source,
          |    CAST(sum(n_chars) AS BIGINT) FROM documents GROUP BY 2),
          |h AS (SELECT scheme, bytes, CAST(count(*) AS BIGINT) AS n
          |  FROM p GROUP BY 1, 2),
          |c AS (SELECT scheme, bytes, n,
          |  CAST(coalesce(sum(n) OVER (PARTITION BY scheme ORDER BY bytes
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |    AS BIGINT) AS bef,
          |  CAST(sum(n) OVER (PARTITION BY scheme) AS BIGINT) AS ng
          |  FROM h),
          |med AS (SELECT lo.scheme, lo.v + hi.v AS m2 FROM
          |  (SELECT scheme, min(bytes) AS v FROM c
          |    WHERE bef < (ng+1)//2 AND (ng+1)//2 <= bef + n
          |    GROUP BY 1) lo
          |  JOIN (SELECT scheme, min(bytes) AS v FROM c
          |    WHERE bef < ng//2 + 1 AND ng//2 + 1 <= bef + n
          |    GROUP BY 1) hi ON hi.scheme = lo.scheme),
          |tot AS (SELECT scheme, CAST(count(*) AS BIGINT) AS n_parts,
          |  CAST(sum(bytes) AS BIGINT) AS total_bytes,
          |  CAST(max(bytes) AS BIGINT) AS max_bytes FROM p GROUP BY 1),
          |sm AS (SELECT p.scheme, CAST(count(*) AS BIGINT) AS n_small
          |  FROM p JOIN tot ON tot.scheme = p.scheme
          |  WHERE p.bytes * 4 * tot.n_parts < tot.total_bytes GROUP BY 1)
          |SELECT t.scheme, t.n_parts, t.total_bytes, t.max_bytes,
          |  med.m2 AS median_2x_bytes,
          |  CAST(t.max_bytes * 2000 // med.m2 AS BIGINT) AS skew_milli,
          |  CAST(coalesce(sm.n_small, 0) AS BIGINT) AS small_parts
          |FROM tot t JOIN med ON med.scheme = t.scheme
          |LEFT JOIN sm ON sm.scheme = t.scheme ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        val d = tbl(s, dir, "documents")
          .select(col("lang"), col("source"), col("n_chars"))
        def scheme(name: String, key: org.apache.spark.sql.Column) =
          d.groupBy(key.as("pk"))
            .agg(sum(col("n_chars")).cast("long").as("bytes"))
            .select(lit(name).as("scheme"), col("pk"), col("bytes"))
        val p = scheme("lang", col("lang"))
          .unionByName(scheme("source", col("source")))
          .unionByName(scheme("lang_source",
            concat(col("lang"), lit("|"), col("source"))))
        val h = p.groupBy("scheme", "bytes")
          .agg(count(lit(1)).cast("long").as("n"))
        val wb = Window.partitionBy("scheme").orderBy("bytes")
          .rowsBetween(Window.unboundedPreceding, -1)
        val wg = Window.partitionBy("scheme")
        val c = h
          .withColumn("bef", coalesce(sum(col("n")).over(wb), lit(0L))
            .cast("long"))
          .withColumn("ng", sum(col("n")).over(wg).cast("long"))
        val lo = c.filter(col("bef") < expr("(ng+1) div 2") &&
            expr("(ng+1) div 2") <= col("bef") + col("n"))
          .groupBy("scheme").agg(min(col("bytes")).as("vlo"))
        val hi = c.filter(col("bef") < expr("ng div 2 + 1") &&
            expr("ng div 2 + 1") <= col("bef") + col("n"))
          .groupBy("scheme").agg(min(col("bytes")).as("vhi"))
        val med = lo.join(hi, Seq("scheme"))
          .select(col("scheme"), (col("vlo") + col("vhi")).as("m2"))
        val tot = p.groupBy("scheme")
          .agg(count(lit(1)).cast("long").as("n_parts"),
            sum(col("bytes")).cast("long").as("total_bytes"),
            max(col("bytes")).cast("long").as("max_bytes"))
        val sm = p.join(broadcast(tot), Seq("scheme"))
          .filter(col("bytes") * 4 * col("n_parts") < col("total_bytes"))
          .groupBy("scheme").agg(count(lit(1)).cast("long").as("n_small"))
        tot.join(med, Seq("scheme")).join(sm, Seq("scheme"), "left")
          .select(col("scheme"), col("n_parts"), col("total_bytes"),
            col("max_bytes"), col("m2").as("median_2x_bytes"),
            expr("max_bytes * 2000 div m2").cast("long").as("skew_milli"),
            coalesce(col("n_small"), lit(0L)).cast("long")
              .as("small_parts"))
          .orderBy("scheme")
      }),

    // Expected steps to purchase from each transient session state:
    // the absorbing-chain hitting time t = (I − Q)⁻¹·1, computed as 12
    // unrolled Jacobi sweeps over micro-quantized transition
    // probabilities — the SQL text is generated ONCE and executed
    // verbatim by both engines (only the integer-division token
    // differs), so the quantized fixpoint chain is reproducible to the
    // last micro. The heavy stage is the same one-window lag as
    // events_markov; every sweep runs on a 1-row pivot.
    Q("events_markov_absorbing",
      Some(absorbingSql("//", "events")),
      (s, dir) => {
        H.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts"),
            col("event_id"))
          .createOrReplaceTempView("events_mabs")
        s.sql(absorbingSql(" div ", "events_mabs"))
      }),

    // Weighted dyad reciprocity of the user-transition digraph: for
    // each unordered state pair, forward and reverse transition mass,
    // the mutual (min) component, and reciprocity 2·min/(fwd+rev) in
    // basis points — does traffic flow both ways between behaviors, or
    // is the funnel one-directional? Same one-window heavy stage; the
    // dyad frame is |types|² bounded.
    Q("graph_reciprocity",
      Some(
        """WITH t AS (SELECT lag(event_type) OVER (PARTITION BY user_id
          |    ORDER BY ts, event_id) AS prev, event_type AS curr
          |  FROM events),
          |c AS (SELECT prev AS a, curr AS b, CAST(count(*) AS BIGINT) AS w
          |  FROM t WHERE prev IS NOT NULL AND prev <> curr GROUP BY 1, 2),
          |p AS (SELECT CASE WHEN a < b THEN a ELSE b END AS u,
          |  CASE WHEN a < b THEN b ELSE a END AS v,
          |  CAST(sum(CASE WHEN a < b THEN w ELSE 0 END) AS BIGINT) AS fwd,
          |  CAST(sum(CASE WHEN a > b THEN w ELSE 0 END) AS BIGINT) AS rev
          |  FROM c GROUP BY 1, 2)
          |SELECT u, v, fwd, rev,
          |  CAST(CASE WHEN fwd < rev THEN fwd ELSE rev END AS BIGINT)
          |    AS mutual,
          |  CAST(20000 * (CASE WHEN fwd < rev THEN fwd ELSE rev END)
          |    // (fwd + rev) AS BIGINT) AS recip_bps
          |FROM p ORDER BY 1, 2
          |""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        val t = H.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts"),
            col("event_id"))
          .withColumn("prev", lag("event_type", 1).over(w))
          .withColumnRenamed("event_type", "curr")
          .filter(col("prev").isNotNull && col("prev") =!= col("curr"))
        val c = t.groupBy(col("prev").as("a"), col("curr").as("b"))
          .agg(count(lit(1)).cast("long").as("w"))
        c.groupBy(least(col("a"), col("b")).as("u"),
            greatest(col("a"), col("b")).as("v"))
          .agg(sum(when(col("a") < col("b"), col("w")).otherwise(0L))
              .cast("long").as("fwd"),
            sum(when(col("a") > col("b"), col("w")).otherwise(0L))
              .cast("long").as("rev"))
          .select(col("u"), col("v"), col("fwd"), col("rev"),
            least(col("fwd"), col("rev")).cast("long").as("mutual"),
            expr("20000 * (CASE WHEN fwd < rev THEN fwd ELSE rev END) " +
              "div (fwd + rev)").cast("long").as("recip_bps"))
          .orderBy("u", "v")
      })
  )
}
