package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Round-11 wave 161: two more operators a 100 TB training-data shop hits
  * next to the round's Bradley–Terry fit —
  *   - GRPO-style per-group advantage normalization (the RLHF
  *     data-prep step after reward scoring: z-score each response's
  *     reward within its prompt group),
  *   - a shuffle-skew advisor (exact per-key census → salt-factor
  *     recommendation), the planning face of `join_salted_skew`.
  */
object AdvantageSkewOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // GRPO ADVANTAGE: prompts are users, responses their events, reward
    // the event value in exact cents. advantage = (r − mean)/std over the
    // group collapses to the all-integer form
    //   adv = (r·n − Σr) / sqrt(n·Σr² − (Σr)²)
    // — numerator and radicand are EXACT integers (DECIMAL(38,0)/HUGEINT
    // widened), so both engines feed identical values into the one
    // double sqrt/divide tree and the milli-floor is bit-stable.
    // Degenerate groups (n<2 or zero variance) get advantage 0.
    // Scale shape: one per-user reduce + one shuffle join back on the
    // user key (NOT a broadcast — the user domain grows with the corpus;
    // the r11 broadcast-discipline sweep enforces exactly this).
    Q("pref_grpo_advantage",
      Some(
        """WITH r AS (SELECT event_id, user_id,
          |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
          |  FROM events),
          |g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
          |    CAST(sum(c) AS BIGINT) AS s,
          |    sum(CAST(c AS HUGEINT) * c) AS sq
          |  FROM r GROUP BY 1)
          |SELECT r.event_id, r.user_id, r.c AS reward_cents, g.n AS group_n,
          |  CASE WHEN g.n < 2
          |      OR CAST(g.n AS HUGEINT) * g.sq
          |         - CAST(g.s AS HUGEINT) * g.s <= 0 THEN 0
          |    ELSE CAST(floor(
          |      CAST(CAST(r.c AS HUGEINT) * g.n - g.s AS DOUBLE) * 1000.0
          |      / sqrt(CAST(CAST(g.n AS HUGEINT) * g.sq
          |          - CAST(g.s AS HUGEINT) * g.s AS DOUBLE))) AS BIGINT)
          |  END AS adv_milli
          |FROM r JOIN g USING (user_id)
          |ORDER BY event_id
          |""".stripMargin),
      (s, dir) => {
        val r = H.events(s, dir).select(
          col("event_id"), col("user_id"),
          (col("value").cast("decimal(12,2)") * 100).cast("long").as("c"))
        val g = r.groupBy("user_id").agg(
          count(lit(1)).cast("long").as("n"),
          sum("c").cast("long").as("s"),
          sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("sq"))
        r.join(g, Seq("user_id"))
          .select(col("event_id"), col("user_id"),
            col("c").as("reward_cents"), col("n").as("group_n"),
            expr("""CASE WHEN n < 2
              |    OR CAST(n AS DECIMAL(38,0)) * sq
              |       - CAST(s AS DECIMAL(38,0)) * s <= 0 THEN 0L
              |  ELSE CAST(floor(
              |    CAST(CAST(c AS DECIMAL(38,0)) * n - s AS DOUBLE) * 1000.0
              |    / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sq
              |        - CAST(s AS DECIMAL(38,0)) * s AS DOUBLE))) AS BIGINT)
              |  END""".stripMargin).as("adv_milli"))
          .orderBy("event_id")
      }),

    // SHUFFLE-SKEW ADVISOR: exact per-key census for four candidate
    // shuffle keys → hottest-key share, skew ratio (hottest/mean, milli),
    // and the salt-factor a 32-way shuffle needs so the hot key's rows
    // spread to ideal-task size: S = ceil(max_cnt · 32 / n_rows), floored
    // at 1 (no salting when the hot key already fits one ideal task).
    // The decision column mirrors join_salted_skew's physical rewrite.
    // Scale shape: one map-side-combined reduce per key; the report is 4
    // rows. (An advisor at 100 TB would sample or sketch — the exact
    // census IS the audit face, same stance as plan_join_cardinality.)
    Q("plan_skew_advisor",
      Some {
        def block(tag: String, tbl: String, key: String) =
          s"""c_$tag AS (SELECT $key AS k, CAST(count(*) AS BIGINT) AS c
             |  FROM $tbl GROUP BY 1),
             |r_$tag AS (SELECT '$tag' AS shuffle_key,
             |  CAST(sum(c) AS BIGINT) AS n_rows,
             |  CAST(count(*) AS BIGINT) AS n_keys,
             |  CAST(max(c) AS BIGINT) AS max_key_rows,
             |  CAST(max(c) * count(*) * 1000 // sum(c) AS BIGINT)
             |    AS skew_ratio_milli,
             |  greatest(CAST(ceil(CAST(max(c) * 32 AS DOUBLE)
             |    / CAST(sum(c) AS DOUBLE)) AS BIGINT), 1) AS salt_factor,
             |  CASE WHEN max(c) * 32 > sum(c) * 2 THEN 'salt'
             |    ELSE 'plain' END AS decision
             |  FROM c_$tag)""".stripMargin
        val specs = Seq(
          ("orders_custkey", "orders", "o_custkey"),
          ("lineitem_partkey", "lineitem", "l_partkey"),
          ("lineitem_orderkey", "lineitem", "l_orderkey"),
          ("events_user", "events", "user_id"))
        "WITH " + specs.map(s0 => block(s0._1, s0._2, s0._3)).mkString(",\n") +
          "\n" + specs.map(s0 => s"SELECT * FROM r_${s0._1}")
            .mkString("", " UNION ALL ", " ORDER BY shuffle_key")
      },
      (s, dir) => {
        val specs = Seq(
          ("orders_custkey", "orders", "o_custkey"),
          ("lineitem_partkey", "lineitem", "l_partkey"),
          ("lineitem_orderkey", "lineitem", "l_orderkey"),
          ("events_user", "events", "user_id"))
        specs.map { case (tag, tn, key) =>
          val src = if (tn == "events") H.events(s, dir) else tbl(s, dir, tn)
          src.groupBy(col(key).as("k"))
            .agg(count(lit(1)).cast("long").as("c"))
            .agg(sum("c").cast("long").as("n_rows"),
              count(lit(1)).cast("long").as("n_keys"),
              max("c").cast("long").as("max_key_rows"))
            .select(lit(tag).as("shuffle_key"),
              col("n_rows"), col("n_keys"), col("max_key_rows"),
              expr("CAST(max_key_rows * n_keys * 1000 div n_rows AS BIGINT)")
                .as("skew_ratio_milli"),
              expr("greatest(CAST(ceil(CAST(max_key_rows * 32 AS DOUBLE)" +
                " / CAST(n_rows AS DOUBLE)) AS BIGINT), 1L)").as("salt_factor"),
              expr("CASE WHEN max_key_rows * 32 > n_rows * 2 " +
                "THEN 'salt' ELSE 'plain' END").as("decision"))
        }.reduce(_ unionByName _).orderBy("shuffle_key")
      })
  )
}
