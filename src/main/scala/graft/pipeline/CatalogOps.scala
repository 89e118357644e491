package graft.pipeline

import org.apache.spark.sql.SparkSession

import graft.model.EntityMeta
import graft.types.EdmTypes

/** Catalog lifecycle — the reference's database/table existence probes and
  * destructive reset (`ifDbExist` sqlDwh.py:229-252, `ifTableExists`
  * sqlDwh.py:280-299, `deleteTables` sqlDwh.py:88-126, orchestrated by
  * /resetDataPlatform app.py:200-253) expressed over the Spark catalog.
  */
object CatalogOps {

  def ensureDatabase(spark: SparkSession, db: String): Boolean = {
    val existed = spark.catalog.databaseExists(db)
    if (!existed) spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
    existed
  }

  def tableExists(spark: SparkSession, db: String, table: String): Boolean =
    spark.catalog.tableExists(s"`$db`.`$table`")

  /** Create typed staging tables from entity metadata (create-iff-absent,
    * like deployExtractionconfigTables). Returns per-table outcome. */
  def deployTables(
      spark: SparkSession,
      db: String,
      metas: Seq[EntityMeta],
      prefix: String = "stg_"): Map[String, String] =
    metas.map { m =>
      val table = s"$prefix${m.entityName.toLowerCase}"
      if (tableExists(spark, db, table)) table -> "exists"
      else {
        val schema = EdmTypes.toStructType(m)
        val cols = schema.fields
          .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
        spark.sql(s"CREATE TABLE `$db`.`$table` ($cols) USING parquet")
        table -> "success"
      }
    }.toMap

  /** Drop every view then every table in the database (views first, like the
    * reference's deleteTables). Returns "All N tables dropped." to match the
    * run-report contract (readme.md:721-731). */
  def dropAll(spark: SparkSession, db: String): String = {
    // listTables(db) also returns session temp views (database = null);
    // a database reset must only touch the database's own objects.
    val tables = spark.catalog.listTables(db).collect()
      .filter(t => t.database == db)
    val (views, plain) = tables.partition(_.tableType == "VIEW")
    views.foreach(v => spark.sql(s"DROP VIEW IF EXISTS `$db`.`${v.name}`"))
    plain.foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$db`.`${t.name}`"))
    s"All ${tables.length} tables dropped."
  }
}
