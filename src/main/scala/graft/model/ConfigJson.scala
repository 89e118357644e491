package graft.model

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** extractionConfig JSON codec (reference contract: readme.md:158-216).
  *
  * The reference's config handling has three documented sharp edges
  * (SURVEY §2.1 "semantic quirks") that this codec resolves canonically:
  *   - key casing drift: code requires `EntityID` while readme examples use
  *     `entityID` (priorityDataSource.py:152,174 vs readme.md:170) — both
  *     accepted here;
  *   - `dataStartDate` vs the readme's `datarStartDate` typo (readme.md:175
  *     vs priorityDataSource.py:668) — both accepted;
  *   - truthiness: the reference parses incremental with a substring test
  *     (`param.lower() in 'true'`, app.py:281) where "", "t", "ru" all count
  *     as true — [[parseIncremental]] is a strict boolean parse instead.
  */
object ConfigJson {

  private val mapper = new ObjectMapper()

  def parse(json: String): ExtractionConfig = {
    val root = mapper.readTree(json)
    // explicit JSON null must become None, not the string "null"
    def str(n: JsonNode, keys: String*): Option[String] =
      keys.iterator.map(n.get)
        .collectFirst { case v if v != null && !v.isNull => v.asText }

    val entities = Option(root.get("entities")).toSeq
      .flatMap(_.elements().asScala)
      .map { e =>
        EntityConfig(
          entityId = str(e, "EntityID", "entityID", "entityId")
            .getOrElse(sys.error("entity missing EntityID")),
          filterFlag = Option(e.get("filterFlag")).exists(_.asBoolean(false)),
          filterField = str(e, "filterField").getOrElse(""),
          expand = Option(e.get("expand")).toSeq
            .flatMap(_.elements().asScala).map(_.asText),
          lastRun = str(e, "lastRun"),
          dataStartDate = str(e, "dataStartDate", "datarStartDate"))
      }

    ExtractionConfig(
      datasourceName = str(root, "datasourceName").getOrElse(""),
      uri = str(root, "uri").getOrElse(""),
      accountId = str(root, "accountID", "accountId").getOrElse(""),
      systemTimezone = str(root, "systemTimezone").getOrElse("UTC"),
      sourceSystem = str(root, "sourceSystem").getOrElse("priority"),
      entities = entities)
  }

  /** Strict boolean parse for ?incremental= — fixes app.py:281's substring
    * truthiness where "" and "ru" enable incremental mode. */
  def parseIncremental(param: String): Boolean =
    param.trim.toLowerCase match {
      case "true" => true
      case "false" | "" => false
      case other => sys.error(s"invalid incremental flag: '$other'")
    }
}
