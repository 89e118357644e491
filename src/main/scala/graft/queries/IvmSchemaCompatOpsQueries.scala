package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Round-9 wave 140: incremental view maintenance for a JOIN view (the
  * DBToaster delta rules — ΔV = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB — on top of a
  * persisted aggregate state) and schema-registry compatibility
  * classification (BACKWARD / FORWARD / FULL / NONE per version
  * transition, Avro-style rules).
  */
object IvmSchemaCompatOpsQueries extends QueryModule {

  /** The schema registry fixture: five versions of one subject, as a
    * literal (version, field, type, has_default) table shared verbatim by
    * both engines. The four transitions exercise all four classes:
    * v1→v2 adds a defaulted field (FULL), v2→v3 removes a non-defaulted
    * field (BACKWARD), v3→v4 rewrites a type non-promotably (NONE),
    * v4→v5 adds a non-defaulted field (FORWARD). */
  private val RegistryRows: Seq[(Int, String, String, Int)] = Seq(
    (1, "orderkey", "long", 0), (1, "price", "double", 0),
    (1, "qty", "int", 0), (1, "note", "string", 0),
    (2, "orderkey", "long", 0), (2, "price", "double", 0),
    (2, "qty", "int", 0), (2, "note", "string", 0),
    (2, "channel", "string", 1),
    (3, "orderkey", "long", 0), (3, "price", "double", 0),
    (3, "qty", "int", 0), (3, "channel", "string", 1),
    (4, "orderkey", "long", 0), (4, "price", "double", 0),
    (4, "qty", "string", 0), (4, "channel", "string", 1),
    (5, "orderkey", "long", 0), (5, "price", "double", 0),
    (5, "qty", "string", 0), (5, "channel", "string", 1),
    (5, "batch", "long", 0))

  private val registrySqlValues: String =
    RegistryRows.map { case (v, f, t, d) => s"($v, '$f', '$t', $d)" }
      .mkString(", ")

  def all: Seq[Q] = Seq(

    // INCREMENTAL VIEW MAINTENANCE (JOIN VIEW): the view is the
    // (o_orderpriority × l_returnflag) count/quantity rollup of
    // orders ⋈ lineitem. The engine materializes the view state over the
    // OLD partitions (order batches 0-2 × line numbers 1-3), then applies
    // the three join-delta terms — ΔA⋈B_old, A_old⋈ΔB, ΔA⋈ΔB — as
    // partial aggregates merged into the state, never re-reading the old
    // fact data beyond the delta joins. The oracle computes the full view
    // directly, so any missed or double-counted delta term breaks the
    // hash. Scale shape: state is view-domain (bounded); each delta term
    // joins a delta-sized frame against one side; the merge is a
    // view-domain reduce.
    Q("pipeline_ivm_join",
      Some(
        """SELECT o_orderpriority, l_returnflag,
          |  CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
          |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
          |GROUP BY 1, 2 ORDER BY 1, 2
          |""".stripMargin),
      (s, dir) => {
        val tmp = H.tmpDir("graft_ivm")
        val a = tbl(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            pmod(col("o_orderkey"), lit(4)).as("ab"))
        val b = tbl(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_returnflag"),
            col("l_quantity").cast("long").as("q"), col("l_linenumber"))
        val aOld = a.filter(col("ab") < 3)
        val aNew = a.filter(col("ab") === 3)
        val bOld = b.filter(col("l_linenumber") < 4)
        val bNew = b.filter(col("l_linenumber") >= 4)
        def agg(df: org.apache.spark.sql.DataFrame) =
          df.groupBy("o_orderpriority", "l_returnflag")
            .agg(count(lit(1)).cast("long").as("n"),
              sum("q").cast("long").as("qty"))
        def j(x: org.apache.spark.sql.DataFrame,
            y: org.apache.spark.sql.DataFrame) =
          x.join(y, col("l_orderkey") === col("o_orderkey"))
        // state over the old partitions, persisted like a real MV
        agg(j(aOld, bOld)).write.mode("overwrite").parquet(s"$tmp/state")
        val state = s.read.parquet(s"$tmp/state")
        // the three delta terms of Δ(A ⋈ B)
        val deltas = Seq(j(aNew, bOld), j(aOld, bNew), j(aNew, bNew))
          .map(agg).reduce(_ unionByName _)
        state.unionByName(deltas)
          .groupBy("o_orderpriority", "l_returnflag")
          .agg(sum("n").cast("long").as("n"),
            sum("qty").cast("long").as("qty"))
          .orderBy("o_orderpriority", "l_returnflag")
      }),

    // SCHEMA-REGISTRY COMPATIBILITY: classify every consecutive version
    // transition of a subject under the Avro-style rules — BACKWARD (new
    // reader reads old data: every ADDED field needs a default, type
    // changes must be promotable), FORWARD (old reader reads new data:
    // every REMOVED field needed a default, promotions reversed are
    // checked the same way here), FULL = both, NONE = neither. Promotable
    // pairs: int→long, float→double (the Avro numeric ladder). The
    // fixture is a literal 5-version registry shared verbatim by both
    // engines; the output is the per-transition diff census + class.
    // Scale shape: registry-domain only — the governance op runs on
    // metadata, not facts.
    Q("pipeline_schema_compat",
      Some(
        s"""WITH reg(version, field, type, has_default) AS (VALUES
           |  $registrySqlValues),
           |p AS (
           |  SELECT o.version AS v_from, n.version AS nv,
           |    o.field AS of, o.type AS ot, o.has_default AS od,
           |    n.field AS nf, n.type AS nt, n.has_default AS nd
           |  FROM reg o FULL JOIN reg n
           |    ON n.version = o.version + 1 AND n.field = o.field
           |  WHERE (o.version IS NOT NULL AND o.version < 5)
           |     OR (o.version IS NULL AND n.version > 1)),
           |diff AS (
           |  SELECT coalesce(v_from, nv - 1) AS vf,
           |    CAST(sum(CASE WHEN of IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_added,
           |    CAST(sum(CASE WHEN of IS NULL AND nd = 0 THEN 1 ELSE 0 END)
           |      AS BIGINT) AS added_no_default,
           |    CAST(sum(CASE WHEN nf IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_removed,
           |    CAST(sum(CASE WHEN nf IS NULL AND od = 0 THEN 1 ELSE 0 END)
           |      AS BIGINT) AS removed_no_default,
           |    CAST(sum(CASE WHEN of IS NOT NULL AND nf IS NOT NULL
           |      AND ot <> nt
           |      AND NOT ((ot = 'int' AND nt = 'long')
           |            OR (ot = 'float' AND nt = 'double'))
           |      THEN 1 ELSE 0 END) AS BIGINT) AS bad_type_changes
           |  FROM p GROUP BY 1)
           |SELECT CAST(vf AS BIGINT) AS from_version,
           |  CAST(vf + 1 AS BIGINT) AS to_version,
           |  n_added, n_removed, bad_type_changes,
           |  CASE
           |    WHEN bad_type_changes > 0 THEN 'NONE'
           |    WHEN added_no_default = 0 AND removed_no_default = 0
           |      THEN 'FULL'
           |    WHEN added_no_default = 0 THEN 'BACKWARD'
           |    WHEN removed_no_default = 0 THEN 'FORWARD'
           |    ELSE 'NONE' END AS compat
           |FROM diff ORDER BY from_version
           |""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val reg = RegistryRows.toDF("version", "field", "type", "has_default")
        val o = reg.select(col("version").as("v_from"),
          col("field").as("of"), col("type").as("ot"),
          col("has_default").as("od"))
        val n = reg.select(col("version").as("nv"), col("field").as("nf"),
          col("type").as("nt"), col("has_default").as("nd"))
        val p = o.join(n, col("nv") === col("v_from") + 1 &&
            col("nf") === col("of"), "full")
          .filter((col("v_from").isNotNull && col("v_from") < 5) ||
            (col("v_from").isNull && col("nv") > 1))
        val diff = p
          .withColumn("vf", coalesce(col("v_from"), col("nv") - 1))
          .groupBy("vf")
          .agg(
            sum(when(col("of").isNull, 1L).otherwise(0L)).cast("long")
              .as("n_added"),
            sum(when(col("of").isNull && col("nd") === 0, 1L).otherwise(0L))
              .cast("long").as("added_no_default"),
            sum(when(col("nf").isNull, 1L).otherwise(0L)).cast("long")
              .as("n_removed"),
            sum(when(col("nf").isNull && col("od") === 0, 1L).otherwise(0L))
              .cast("long").as("removed_no_default"),
            sum(when(col("of").isNotNull && col("nf").isNotNull &&
              col("ot") =!= col("nt") &&
              !((col("ot") === "int" && col("nt") === "long") ||
                (col("ot") === "float" && col("nt") === "double")), 1L)
              .otherwise(0L)).cast("long").as("bad_type_changes"))
        diff.select(col("vf").cast("long").as("from_version"),
            (col("vf") + 1).cast("long").as("to_version"),
            col("n_added"), col("n_removed"), col("bad_type_changes"),
            when(col("bad_type_changes") > 0, "NONE")
              .when(col("added_no_default") === 0 &&
                col("removed_no_default") === 0, "FULL")
              .when(col("added_no_default") === 0, "BACKWARD")
              .when(col("removed_no_default") === 0, "FORWARD")
              .otherwise("NONE").as("compat"))
          .orderBy("from_version")
      })
  )
}
