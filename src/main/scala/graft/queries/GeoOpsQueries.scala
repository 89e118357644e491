package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Forty-fifth wave: spatial operators beyond the grid equi-join
  * (join_spatial_grid) — ray-cast point-in-polygon containment, Morton
  * (geohash-style) bit-interleaved cell rollups, and grid-bucketed DBSCAN
  * core detection. Points are synthesized deterministically from part keys
  * (px = pk*7919 mod N, py = pk*104729 mod N) so every predicate is exact
  * integer arithmetic — the cross-multiplied ray test never divides.
  */
object GeoOpsQueries extends QueryModule {

  /** Concave 8-gon with integer vertices (closed ring). */
  private val Poly = Seq(
    (100, 100), (900, 150), (700, 450), (850, 800),
    (500, 650), (200, 850), (300, 500), (150, 350))

  private val Edges: Seq[(Int, Int, Int, Int)] =
    Poly.zip(Poly.tail :+ Poly.head).map { case ((x1, y1), (x2, y2)) =>
      (x1, y1, x2, y2)
    }

  /** Crossing-count term for one edge, exact integers: the ray from
    * (px,py) toward +x crosses edge (x1,y1)-(x2,y2) iff the edge straddles
    * py and the signed area test agrees with the edge direction. */
  private def crossSql(px: String, py: String,
      e: (Int, Int, Int, Int)): String = {
    val (x1, y1, x2, y2) = e
    val t = s"(($x2 - $x1) * ($py - $y1) - ($px - $x1) * ($y2 - $y1))"
    val straddle = s"(($y1 <= $py) <> ($y2 <= $py))"
    val side = if (y2 > y1) s"$t > 0" else s"$t < 0"
    s"CASE WHEN $straddle AND $side THEN 1 ELSE 0 END"
  }

  /** Morton interleave of the low `bits` bits of px/py (x even lanes). */
  private def mortonSql(px: String, py: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($px >> $i) & 1) << ${2 * i})",
        s"((($py >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")

  def all: Seq[Q] = Seq(

    // Point-in-polygon containment grouped by brand. The polygon is a
    // broadcast-literal constant and the ray test is a per-row 8-term
    // codegen'd expression — no join, no shuffle beyond the final tiny
    // groupBy; at 100 TB this is a single embarrassingly-parallel pass.
    Q("spatial_point_in_polygon",
      Some {
        val cross = Edges.map(crossSql("px", "py", _)).mkString(" + ")
        s"""WITH pts AS (SELECT p_brand,
           |  (p_partkey * 7919) % 1000 AS px,
           |  (p_partkey * 104729) % 1000 AS py FROM part),
           |c AS (SELECT p_brand, CASE WHEN ($cross) % 2 = 1 THEN 1 ELSE 0 END
           |  AS inside FROM pts)
           |SELECT p_brand AS brand, CAST(count(*) AS BIGINT) AS points,
           |  CAST(sum(inside) AS BIGINT) AS inside_n,
           |  CAST(sum(inside) AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT)
           |    AS inside_micro
           |FROM c GROUP BY p_brand ORDER BY brand
           |""".stripMargin
      },
      (s, dir) => {
        val cross = Edges.map(crossSql("px", "py", _)).mkString(" + ")
        tbl(s, dir, "part")
          .select(col("p_brand"),
            (col("p_partkey") * 7919 % 1000).as("px"),
            (col("p_partkey") * 104729 % 1000).as("py"))
          .withColumn("inside",
            when(expr(s"($cross) % 2") === 1, 1L).otherwise(0L))
          .groupBy(col("p_brand").as("brand"))
          .agg(count(lit(1)).cast("long").as("points"),
            sum("inside").cast("long").as("inside_n"))
          .withColumn("inside_micro",
            expr("inside_n * 1000000 div points"))
          .orderBy("brand")
      }),

    // Morton/geohash cell hierarchy: interleave 8 bits of x and y into a
    // 16-bit cell id, then report occupancy at three prefix depths (4, 8,
    // 12 bits) — the multi-resolution density pyramid used for spatial
    // partitioning decisions. One explode→groupBy pass (3 rows per point,
    // map-side combined); prefix truncation is a shift, never a string op.
    Q("spatial_geohash_prefix",
      Some {
        val m = mortonSql("px", "py", 8)
        s"""WITH pts AS (SELECT
           |  (p_partkey * 7919) % 256 AS px,
           |  (p_partkey * 104729) % 256 AS py FROM part),
           |g AS (SELECT ($m) AS g16 FROM pts),
           |l AS (SELECT 4 AS level, g16 >> 12 AS prefix FROM g
           |  UNION ALL SELECT 8, g16 >> 8 FROM g
           |  UNION ALL SELECT 12, g16 >> 4 FROM g)
           |SELECT CAST(level AS BIGINT) AS level, CAST(prefix AS BIGINT)
           |  AS prefix, CAST(count(*) AS BIGINT) AS n
           |FROM l GROUP BY level, prefix ORDER BY level, prefix
           |""".stripMargin
      },
      (s, dir) => {
        val m = mortonSql("px", "py", 8)
        tbl(s, dir, "part")
          .select((col("p_partkey") * 7919 % 256).as("px"),
            (col("p_partkey") * 104729 % 256).as("py"))
          .withColumn("g16", expr(m))
          .select(explode(array(
            struct(lit(4L).as("level"), expr("g16 >> 12").as("prefix")),
            struct(lit(8L).as("level"), expr("g16 >> 8").as("prefix")),
            struct(lit(12L).as("level"), expr("g16 >> 4").as("prefix"))))
            .as("x"))
          .select(col("x.level"), col("x.prefix").cast("long").as("prefix"))
          .groupBy("level", "prefix")
          .agg(count(lit(1)).cast("long").as("n"))
          .orderBy("level", "prefix")
      }),

    // DBSCAN core-point detection: a point is core if ≥ minPts neighbors
    // lie within eps (squared-integer distance). The engine buckets points
    // into eps-sized grid cells and explodes each point to its 3×3
    // neighborhood for an equi-join on cell — the explode-to-equi shape
    // (a bounded-width spatial window as a hash join, never a
    // BroadcastNestedLoopJoin); the oracle states the plain quadratic
    // predicate, proving the grid decomposition exact (cell == eps ⇒ any
    // pair within eps is ≤ 1 cell apart on each axis).
    Q("spatial_dbscan_cores",
      Some(
        """WITH pts AS (SELECT p_partkey AS id, p_brand,
          |  (p_partkey * 7919) % 1000 AS px,
          |  (p_partkey * 104729) % 1000 AS py FROM part),
          |nb AS (SELECT a.id, a.p_brand, CAST(count(*) AS BIGINT) AS nn
          |  FROM pts a JOIN pts b ON a.id <> b.id
          |    AND (a.px-b.px)*(a.px-b.px) + (a.py-b.py)*(a.py-b.py) <= 1600
          |  GROUP BY a.id, a.p_brand),
          |c AS (SELECT p.id, p.p_brand,
          |  CASE WHEN coalesce(nb.nn, 0) >= 4 THEN 1 ELSE 0 END AS core
          |  FROM pts p LEFT JOIN nb ON nb.id = p.id)
          |SELECT p_brand AS brand, CAST(count(*) AS BIGINT) AS points,
          |  CAST(sum(core) AS BIGINT) AS cores
          |FROM c GROUP BY p_brand ORDER BY brand
          |""".stripMargin),
      (s, dir) => {
        // The engine pairs DISTINCT POSITIONS (with multiplicities), not
        // points: the plane is a fixed 1000×1000 grid, so the position
        // domain is bounded at 1e6 no matter how the corpus grows, while
        // a point-pair grid join is Θ(n²/plane) once cells densify (the
        // r11 k100 probe measured the point form effectively hanging at
        // 2M points — ~6e10 candidate pairs). Per point at position q:
        // nn = Σ_{q' in ε-ball of q} m(q') − 1 (the −1 removes the point
        // itself; q'=q contributes the other m−1 co-located points).
        // Work: Θ(n) reduce + Θ(positions · ball) bounded pair join.
        val pts = tbl(s, dir, "part")
          .select(col("p_partkey").as("id"), col("p_brand"),
            (col("p_partkey") * 7919 % 1000).as("px"),
            (col("p_partkey") * 104729 % 1000).as("py"))
          .localCheckpoint() // position reduce + final per-point join
        val pos = pts.groupBy("px", "py")
          .agg(count(lit(1)).cast("long").as("m"))
          .localCheckpoint() // exploded left side + right side
        val offs = array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
          struct(lit(dx).as("dx"), lit(dy).as("dy")))): _*)
        val left = pos
          .withColumn("o", explode(offs))
          .select(col("px"), col("py"),
            (expr("px div 40") + col("o.dx")).as("cx"),
            (expr("py div 40") + col("o.dy")).as("cy"))
        val right = pos.select(col("px").as("rx"), col("py").as("ry"),
          col("m").as("rm"), expr("px div 40").as("cx"),
          expr("py div 40").as("cy"))
        // S(q) = ball mass INCLUDING q itself (dist 0 ≤ ε) → nn = S − 1
        val ballMass = left.join(right, Seq("cx", "cy"))
          .filter((col("px") - col("rx")) * (col("px") - col("rx")) +
            (col("py") - col("ry")) * (col("py") - col("ry")) <= 1600)
          .groupBy("px", "py").agg(sum("rm").cast("long").as("bm"))
        val out = pts
          .join(ballMass, Seq("px", "py"), "left")
          .select(col("p_brand"),
            when(coalesce(col("bm"), lit(1L)) - 1 >= 4, 1L).otherwise(0L)
              .as("core"))
          .groupBy(col("p_brand").as("brand"))
          .agg(count(lit(1)).cast("long").as("points"),
            sum("core").cast("long").as("cores"))
          .orderBy("brand")
        H.materialized(out, caches = Nil, checkpoints = Seq(pts, pos))
      }))
}
