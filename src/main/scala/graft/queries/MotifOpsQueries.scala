package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Fifty-first wave: matrix-profile-lite motif/discord discovery on the
  * daily series, Spearman rank correlation with exact 2× tie ranks, and
  * dedup-aware source mixing weights. The series ops run on the ≤30-row
  * per-type daily domain; Spearman reduces each type to one row of exact
  * integer rank sums before any division.
  */
object MotifOpsQueries extends QueryModule {

  private val DailySql =
    "SELECT event_type, CAST(strftime(ts, '%d') AS BIGINT) AS day, " +
      "CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2"

  def all: Seq[Q] = Seq(

    // Matrix-profile-lite: for every length-5 window of the daily count
    // series, the min integer SSD to any non-overlapping window (|i−j|≥5,
    // the standard trivial-match exclusion). The window with the smallest
    // profile value is the motif, the largest the discord. Window pairs
    // enumerate on the per-type day domain (≤26² starts), never on raw
    // events; the HAVING count=5 clause keeps partially-covered windows
    // out in both engines.
    Q("ts_matrix_profile_lite",
      Some(
        s"""WITH d AS ($DailySql),
           |pos AS (SELECT event_type, day AS i FROM d),
           |pd AS (SELECT a.event_type, a.i, b.i AS j, k.k,
           |  da.c AS ca, db.c AS cb
           |  FROM pos a JOIN pos b ON a.event_type = b.event_type
           |    AND abs(a.i - b.i) >= 5
           |  CROSS JOIN (SELECT unnest(range(0, 5)) AS k) k
           |  JOIN d da ON da.event_type = a.event_type AND da.day = a.i + k.k
           |  JOIN d db ON db.event_type = a.event_type AND db.day = b.i + k.k),
           |ssd AS (SELECT event_type, i, j,
           |  CAST(sum((ca - cb) * (ca - cb)) AS BIGINT) AS dist2
           |  FROM pd GROUP BY event_type, i, j HAVING count(*) = 5),
           |mp AS (SELECT event_type, i, CAST(min(dist2) AS BIGINT) AS mp
           |  FROM ssd GROUP BY event_type, i),
           |r AS (SELECT event_type, i, mp,
           |  row_number() OVER (PARTITION BY event_type ORDER BY mp, i)
           |    AS rna,
           |  row_number() OVER (PARTITION BY event_type ORDER BY mp DESC, i)
           |    AS rnd FROM mp)
           |SELECT event_type,
           |  CAST(max(CASE WHEN rna = 1 THEN i END) AS BIGINT) AS motif_start,
           |  CAST(max(CASE WHEN rna = 1 THEN mp END) AS BIGINT) AS motif_dist2,
           |  CAST(max(CASE WHEN rnd = 1 THEN i END) AS BIGINT) AS discord_start,
           |  CAST(max(CASE WHEN rnd = 1 THEN mp END) AS BIGINT)
           |    AS discord_dist2
           |FROM r GROUP BY event_type ORDER BY event_type
           |""".stripMargin),
      (s, dir) => {
        val d = H.events(s, dir)
          .groupBy(col("event_type"),
            date_format(col("ts"), "d").cast("long").as("day"))
          .agg(count(lit(1)).cast("long").as("c"))
          .localCheckpoint() // start spine ×2 and both count lookups
        val pos = d.select(col("event_type"), col("day").as("i"))
        val pairs = pos
          .join(d.select(col("event_type").as("et2"), col("day").as("j")),
            col("event_type") === col("et2") &&
              abs(col("i") - col("j")) >= 5)
          .withColumn("k", explode(array((0 to 4).map(k => lit(k.toLong)): _*)))
        val ca = d.select(col("event_type").as("ea"), col("day").as("dda"),
          col("c").as("ca"))
        val cb = d.select(col("event_type").as("eb"), col("day").as("ddb"),
          col("c").as("cb"))
        val ssd = pairs
          .join(ca, col("event_type") === col("ea") &&
            col("dda") === col("i") + col("k"))
          .join(cb, col("event_type") === col("eb") &&
            col("ddb") === col("j") + col("k"))
          .groupBy("event_type", "i", "j")
          .agg(count(lit(1)).as("kcnt"),
            sum((col("ca") - col("cb")) * (col("ca") - col("cb")))
              .cast("long").as("dist2"))
          .filter(col("kcnt") === 5)
        val mp = ssd.groupBy("event_type", "i")
          .agg(min("dist2").cast("long").as("mp"))
        val wa = Window.partitionBy("event_type").orderBy("mp", "i")
        val wd = Window.partitionBy("event_type")
          .orderBy(col("mp").desc, col("i"))
        val out = mp
          .withColumn("rna", row_number().over(wa))
          .withColumn("rnd", row_number().over(wd))
          .groupBy("event_type")
          .agg(max(when(col("rna") === 1, col("i"))).cast("long")
            .as("motif_start"),
            max(when(col("rna") === 1, col("mp"))).cast("long")
              .as("motif_dist2"),
            max(when(col("rnd") === 1, col("i"))).cast("long")
              .as("discord_start"),
            max(when(col("rnd") === 1, col("mp"))).cast("long")
              .as("discord_dist2"))
          .orderBy("event_type")
        H.materialized(out, caches = Nil, checkpoints = Seq(d))
      }),

    // Spearman rank correlation between event value and hour-of-day per
    // type. Tie ranks carried at 2× (2·(rank−1) + tie-count + 1 = twice
    // the average rank, always integer); ρ comes from the rank-difference
    // identity with divisions sequenced so every intermediate fits 64
    // bits at any corpus size. Two window passes over the typed rows,
    // one-row-per-type reduce.
    Q("stats_spearman_rho",
      Some(
        """WITH e AS (SELECT event_type AS t,
          |  CAST(floor(value*100 + 0.5) AS BIGINT) AS x,
          |  CAST(strftime(ts, '%H') AS BIGINT) AS y FROM events),
          |r AS (SELECT t,
          |  2*(rank() OVER (PARTITION BY t ORDER BY x) - 1)
          |    + count(*) OVER (PARTITION BY t, x) + 1 AS rx,
          |  2*(rank() OVER (PARTITION BY t ORDER BY y) - 1)
          |    + count(*) OVER (PARTITION BY t, y) + 1 AS ry FROM e),
          |g AS (SELECT t, CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum((rx - ry) * (rx - ry)) AS BIGINT) AS sum_d2sq
          |  FROM r GROUP BY t)
          |SELECT t AS event_type, n, sum_d2sq,
          |  1000000 - (sum_d2sq // (4*n)) * 6000000 // (n*n - 1) AS rho_micro
          |FROM g ORDER BY event_type
          |""".stripMargin),
      (s, dir) => {
        val e = H.events(s, dir)
          .select(col("event_type").as("t"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("x"),
            hour(col("ts")).cast("long").as("y"))
        val rx = rank().over(Window.partitionBy("t").orderBy("x"))
        val ry = rank().over(Window.partitionBy("t").orderBy("y"))
        val cx = count(lit(1)).over(Window.partitionBy("t", "x"))
        val cy = count(lit(1)).over(Window.partitionBy("t", "y"))
        e.withColumn("rx", lit(2) * (rx - 1) + cx + 1)
          .withColumn("ry", lit(2) * (ry - 1) + cy + 1)
          .groupBy(col("t").as("event_type"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum((col("rx") - col("ry")) * (col("rx") - col("ry")))
              .cast("long").as("sum_d2sq"))
          .withColumn("rho_micro",
            expr("1000000 - (sum_d2sq div (4*n)) * 6000000 div (n*n - 1)"))
          .orderBy("event_type")
      }),

    // Dedup-aware mixing weights: per source, total vs text-distinct doc
    // mass, and the mixing weight proportional to UNIQUE mass — the
    // upweight-fresh-sources rule applied after exact dedup. One
    // count-distinct pass; the normalizing total is a broadcast one-row
    // frame.
    Q("mix_source_dedup_weights",
      Some(
        """WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS docs,
          |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS uniq
          |  FROM documents GROUP BY source),
          |t AS (SELECT CAST(sum(uniq) AS BIGINT) AS tot FROM g)
          |SELECT g.source, g.docs, g.uniq,
          |  g.uniq * 1000000 // g.docs AS uniq_ratio_micro,
          |  g.uniq * 1000000 // t.tot AS weight_micro
          |FROM g CROSS JOIN t ORDER BY source
          |""".stripMargin),
      (s, dir) => {
        val g = tbl(s, dir, "documents")
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("docs"),
            count_distinct(md5(col("text"))).cast("long").as("uniq"))
          .localCheckpoint() // totals + the weighted rows
        val t = g.agg(sum("uniq").cast("long").as("tot"))
        val out = g.crossJoin(broadcast(t))
          .select(col("source"), col("docs"), col("uniq"),
            expr("uniq * 1000000 div docs").as("uniq_ratio_micro"),
            expr("uniq * 1000000 div tot").as("weight_micro"))
          .orderBy("source")
        H.materialized(out, caches = Nil, checkpoints = Seq(g))
      }))
}
