package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.EntityConfig

/** The reference's row-pipeline operators re-expressed as composable,
  * Catalyst-friendly `DataFrame => DataFrame` transforms. Everything here is
  * declarative (pure Column expressions) so predicate pushdown, column
  * pruning, and whole-stage codegen all apply; nothing materializes on the
  * driver.
  */
object Relational {

  /** Incremental watermark filter — the reference's `$filter=<f> ge <ts>`
    * lower-bound choice (resources/priorityDataSource.py:656-692): when
    * `filterFlag` is off, no filter; incremental runs cut at `lastRun`, full
    * runs at `dataStartDate`. The predicate lands in the parquet/DSv2 scan via
    * Catalyst pushdown (the reference had to hand-roll this into the OData
    * URL, priorityDataSource.py:685).
    */
  def watermarkFilter(
      entity: EntityConfig,
      incremental: Boolean,
      tsCol: String => Column = col)(df: DataFrame): DataFrame = {
    if (!entity.filterFlag) df
    else {
      val bound = if (incremental) entity.lastRun else entity.dataStartDate
      bound match {
        case Some(ts) => df.filter(tsCol(entity.filterField) >= to_timestamp(lit(ts)))
        case None     => df
      }
    }
  }

  /** Lowercase every column name (reference: priorityDataSource.py:790,811 and
    * sqlDwh.py:220-224). Idempotent. */
  def lowercaseAll(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toLowerCase).toIndexedSeq: _*)

  /** Stamp run lineage onto every row — the reference mints one uuid4 + UTC
    * timestamp per run and stamps parents and children alike
    * (priorityDataSource.py:65-66,770-771,806-808). Parameterized here so
    * harness runs stay deterministic. */
  def stampLineage(runId: String, utcTs: String)(df: DataFrame): DataFrame =
    df.withColumn("extractionid", lit(runId))
      .withColumn("extractiontimestamputc", to_timestamp(lit(utcTs)))

  /** Re-nest a child table under its parent as an array-of-struct column —
    * the inverse of the reference's flatten, used to model OData `$expand`
    * payloads (priorityDataSource.py:697-703) from flat test tables.
    * `sortCols` makes the array order deterministic.
    */
  def nestChild(
      parent: DataFrame,
      child: DataFrame,
      parentKey: String,
      childKey: String,
      subformName: String,
      sortCols: Seq[String]): DataFrame = {
    val childCols = child.columns.filterNot(_ == childKey)
    val packed = child
      .groupBy(col(childKey).as(parentKey))
      .agg(sort_array(collect_list(struct(
        (sortCols ++ childCols.filterNot(sortCols.contains)).map(col).toIndexedSeq: _*)))
        .as(subformName))
    parent.join(packed, Seq(parentKey), "left")
  }

  /** Parent side of the reference's subform split: drop the nested columns
    * (priorityDataSource.py:781-786) — but with deterministic column order
    * (source order preserved), fixing the reference's Python-set
    * nondeterminism. */
  def parentProjection(subformCols: Seq[String])(df: DataFrame): DataFrame =
    df.drop(subformCols: _*)

  /** Child side of the split: explode one subform array into its own table,
    * children inheriting the parent PK columns
    * (pd.json_normalize(record_path, meta=pk) — priorityDataSource.py:804-820).
    * Uses `explode` (not `explode_outer`): parents with empty/missing subform
    * arrays contribute no child rows, exactly like the reference. PK columns
    * are inherited only when the child records don't already carry them —
    * Priority subform rows repeat the parent key, a case where the
    * reference's pandas json_normalize(meta=pk) raises on the name conflict;
    * the engine resolves it in favor of the child's own copy. */
  def explodeSubform(subformCol: String, parentPk: Seq[String])(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, StructType}
    val childFields = df.schema(subformCol).dataType match {
      case ArrayType(st: StructType, _) => st.fieldNames.toSeq
      case other => sys.error(s"$subformCol is not an array of structs: $other")
    }
    val inherited = parentPk.filterNot(pk =>
      childFields.exists(_.equalsIgnoreCase(pk)))
    df.select(parentPk.map(col) :+ explode(col(subformCol)).as("_r"): _*)
      .select(col("_r.*") +: inherited.map(col): _*)
  }

  /** Keep-latest dedup by PK — the stg→final promotion the reference left as
    * roadmap (its staging tables are keyless and append-only,
    * priorityDataSource.py:859). Window + row_number so it scales: one shuffle
    * on the PK, no global sort. */
  def dedupLatestByPk(pk: Seq[String], orderCol: String)(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(pk.map(col): _*)
      .orderBy(col(orderCol).desc, monotonically_increasing_id().desc)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Large×large time-proximity join: pairs with |left.ts - right.ts| <=
    * radius. A naive theta join is a cross product; here both sides bin
    * into radius-width buckets (micros), the left side probes bins
    * {b-1, b, b+1} via an EQUI-join, and the exact predicate filters the
    * bucket neighbors — cost follows matches per bucket, not |L|×|R|. Each
    * qualifying pair matches in exactly one right bin, so no dedup needed.
    */
  def proximityJoin(
      left: DataFrame,
      right: DataFrame,
      leftTs: String,
      rightTs: String,
      radiusSeconds: Long): DataFrame = {
    val radiusMicros = radiusSeconds * 1000000L
    val lb = left.withColumn("_lbin",
      expr(s"unix_micros($leftTs) div ${radiusMicros}L"))
      .withColumn("_bin", explode(expr("array(_lbin - 1L, _lbin, _lbin + 1L)")))
      .drop("_lbin")
    val rb = right.withColumn("_bin",
      expr(s"unix_micros($rightTs) div ${radiusMicros}L"))
    lb.join(rb, "_bin")
      .filter(abs(expr(s"unix_micros($leftTs) - unix_micros($rightTs)")) <= radiusMicros)
      .drop("_bin")
  }

  /** Skew-safe equi-join: salt the skewed (large) side's key over `factor`
    * sub-keys and replicate the other side once per salt, so a hot key's
    * rows spread across `factor` tasks instead of one straggler. Join
    * output is identical to the plain equi-join; only the shuffle layout
    * changes. (AQE's skew-join handles sort-merge skew automatically —
    * this is the explicit form for aggregation-feeding joins and for
    * engines/paths where AQE can't see the skew.) */
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      key: String,
      factor: Int): DataFrame = {
    val salted = skewed.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(factor.toLong)))
    val replicated = other
      .withColumn("_salt", explode(expr(s"sequence(0L, ${factor - 1}L)")))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** As-of join: for each left row, the single latest right row with
    * rightTs <= leftTs, matched on equi keys. Implemented as an equi-join
    * (shuffle on the key only — never a cross product) followed by a
    * row_number window; generalizes the reference's latest-config-wins lookup
    * (mongodbHelper.py:62-90).
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      leftId: String,
      rightTieBreak: String): DataFrame = {
    val l = left.alias("l")
    val r = right.alias("r")
    val joined = l.join(
      r,
      col(s"l.$key") === col(s"r.$key") && col(s"r.$rightTs") <= col(s"l.$leftTs"),
      "left")
    val w = Window.partitionBy(col(s"l.$leftId"))
      .orderBy(col(s"r.$rightTs").desc_nulls_last, col(s"r.$rightTieBreak").desc_nulls_last)
    joined.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .drop("_rn")
      // drop the right side's copy of the key (equal on matches, null on
      // misses) so the result has unambiguous columns and stays composable
      .drop(col(s"r.$key"))
  }
}
