package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.ExtractionConfig
import graft.schema.MetadataXml

/** /initialDataLoad — the reference's bootstrap orchestration (app.py:151-195,
  * SURVEY §3.2): ① deploy the type-mapping (pure code here, graft.types),
  * ② refresh metadata from `$metadata`, ③ ensure the account database,
  * ④ deploy typed tables iff absent, ⑤ full refresh. /resetDataPlatform is
  * the same preceded by dropAll (app.py:200-253, §3.3).
  */
object Bootstrap {

  final case class BootstrapReport(
      database: String,
      tablesDeployed: Map[String, String],
      loadReports: Seq[EntityReport])

  def initialDataLoad(
      spark: SparkSession,
      config: ExtractionConfig,
      metadataXml: String,
      sources: String => DataFrame,
      subformsOf: String => Map[String, String],
      sinkDir: String,
      state: StateStore,
      runId: String,
      runTs: String): BootstrapReport = {

    val db = s"acc_${config.accountId}" // reference: acc-<accountID>, sqlDwh.py:32
    val metas = MetadataXml.parse(metadataXml, config.sourceSystem)
    val byName = metas.map(m => m.entityName -> m).toMap

    CatalogOps.ensureDatabase(spark, db)
    // worklist = flatEntities (entity ids + expanded subform names, O17)
    val worklist = config.flatEntities.flatMap(byName.get)
    val deployed = CatalogOps.deployTables(spark, db, worklist)

    val reports = Refresh.refreshAll(
      config, incremental = false, sources, subformsOf,
      pkOf = e => byName.get(e).map(_.entityPk).getOrElse(Seq.empty),
      sinkDir = sinkDir, state = state, runId = runId, runTs = runTs)

    BootstrapReport(db, deployed, reports)
  }

  def resetDataPlatform(
      spark: SparkSession,
      config: ExtractionConfig,
      metadataXml: String,
      sources: String => DataFrame,
      subformsOf: String => Map[String, String],
      sinkDir: String,
      state: StateStore,
      runId: String,
      runTs: String): (String, BootstrapReport) = {
    val db = s"acc_${config.accountId}"
    val dropMsg =
      if (spark.catalog.databaseExists(db)) CatalogOps.dropAll(spark, db)
      else "All 0 tables dropped."
    (dropMsg, initialDataLoad(spark, config, metadataXml, sources,
      subformsOf, sinkDir, state, runId, runTs))
  }
}
