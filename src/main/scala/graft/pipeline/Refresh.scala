package graft.pipeline

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.model.{EntityConfig, ExtractionConfig}
import graft.ops.Relational._

/** Watermark state store — the reference keeps per-entity `lastRun` inside
  * the Mongo config document (updateLastRun, priorityDataSource.py:594-633).
  * Here: a tiny driver-side JSON file updated strictly AFTER a successful
  * load (write-then-advance ordering), so a crash between load and advance
  * re-extracts rather than losing rows; the keep-latest dedup on promotion
  * makes the retry idempotent (the exactly-once gap in the reference).
  */
final class StateStore(path: String) {

  def get(entity: String): Option[String] = read().get(entity)

  def advance(entity: String, ts: String): Unit = {
    val m = read() + (entity -> ts)
    val json = m.toSeq.sorted
      .map { case (k, v) => s""""$k": "$v"""" }.mkString("{", ", ", "}")
    Files.write(Paths.get(path), json.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  private def read(): Map[String, String] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) Map.empty
    else {
      val s = new String(Files.readAllBytes(p), "UTF-8").trim
      """"([^"]+)": "([^"]+)"""".r.findAllMatchIn(s)
        .map(m => m.group(1) -> m.group(2)).toMap
    }
  }
}

final case class EntityReport(
    entityName: String,
    tableName: String,
    recordsWritten: Long,
    status: String)

/** Batch refresh lifecycle — SURVEY §3.1 re-expressed as per-entity Spark
  * plans: watermark filter → parent/child subform split → lowercase →
  * lineage stamp → sink write (Append if incremental, Overwrite if full) →
  * watermark advance. Per-entity failure isolation matches the reference's
  * try/continue loop (priorityDataSource.py:179-195).
  */
object Refresh {

  /** One entity: returns a report per written table (parent + one per
    * subform). `subforms` maps nested array-of-struct column → child table
    * name. */
  def refreshEntity(
      entity: EntityConfig,
      incremental: Boolean,
      source: DataFrame,
      subforms: Map[String, String],
      parentPk: Seq[String],
      sinkDir: String,
      runId: String,
      runTs: String): Seq[EntityReport] = {

    val filtered = watermarkFilter(entity, incremental)(source)
    val stage = (df: DataFrame) =>
      stampLineage(runId, runTs)(lowercaseAll(df))
    val mode = if (incremental) SaveMode.Append else SaveMode.Overwrite

    val parent = stage(parentProjection(subforms.keys.toSeq)(filtered))
    val parentTable = s"stg_${entity.entityId.toLowerCase}"
    val parentN = Sinks.writeParquet(parent, s"$sinkDir/$parentTable", mode)

    val childReports = subforms.toSeq.map { case (colName, childName) =>
      val child = stage(explodeSubform(colName, parentPk)(filtered))
      val childTable = s"stg_${childName.toLowerCase}"
      val n = Sinks.writeParquet(child, s"$sinkDir/$childTable", mode)
      EntityReport(s"${entity.entityId}_${childName}_SUBFORM".toLowerCase,
        childTable, n, "success")
    }

    EntityReport(entity.entityId.toLowerCase, parentTable, parentN, "success") +:
      childReports
  }

  /** All entities with per-entity failure isolation and write-then-advance
    * watermark ordering. `sources` resolves an entity id to its (possibly
    * nested) DataFrame. */
  def refreshAll(
      config: ExtractionConfig,
      incremental: Boolean,
      sources: String => DataFrame,
      subformsOf: String => Map[String, String],
      pkOf: String => Seq[String],
      sinkDir: String,
      state: StateStore,
      runId: String,
      runTs: String): Seq[EntityReport] =
    config.entities.flatMap { e =>
      Try(refreshEntity(e, incremental, sources(e.entityId), subformsOf(e.entityId),
        pkOf(e.entityId), sinkDir, runId, runTs)) match {
        case Success(reports) =>
          state.advance(e.entityId, runTs) // after successful load only
          reports
        case Failure(ex) =>
          Seq(EntityReport(e.entityId.toLowerCase,
            s"stg_${e.entityId.toLowerCase}", 0L, s"error: ${ex.getMessage}"))
      }
    }
}

/** Sinks — parquet for the harness; JDBC writer config for the production
  * Azure SQL target (reference: to_sql at priorityDataSource.py:891-896 and
  * typed DDL at sqlDwh.py:320-390). */
object Sinks {

  /** Write, then report rows written this run by re-reading the sink
    * (the run-report count, O23). */
  def writeParquet(df: DataFrame, path: String, mode: SaveMode): Long = {
    val before =
      if (mode == SaveMode.Append && Files.exists(Paths.get(path)))
        df.sparkSession.read.parquet(path).count()
      else 0L
    df.write.mode(mode).parquet(path)
    df.sparkSession.read.parquet(path).count() - before
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** Spark JDBC writer options for a typed Azure SQL load: explicit column
    * types (PKs VARCHAR(255), audit columns) and batched rewrites. Not
    * executed in the harness (no database); exercised by unit tests. */
  def jdbcOptions(meta: graft.model.EntityMeta, url: String, table: String): Map[String, String] =
    Map(
      "url" -> url,
      "dbtable" -> table,
      "createTableColumnTypes" -> graft.types.EdmTypes.createTableColumnTypes(meta),
      "batchsize" -> "10000",
      "isolationLevel" -> "READ_COMMITTED",
      "rewriteBatchedStatements" -> "true")
}
