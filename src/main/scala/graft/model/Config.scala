package graft.model

/** Job-spec model mirroring the reference's extractionConfig document
  * (reference: readme.md:158-216, consumed at app.py:36-64 and
  * resources/priorityDataSource.py:52-78). Canonical spellings fix the
  * reference's `EntityID`/`entityID` and `dataStartDate`/`datarStartDate`
  * casing drift (readme.md:170,175 vs priorityDataSource.py:174,668).
  */
final case class EntityConfig(
    entityId: String,
    filterFlag: Boolean,
    filterField: String,
    expand: Seq[String],
    lastRun: Option[String],
    dataStartDate: Option[String])

final case class ExtractionConfig(
    datasourceName: String,
    uri: String,
    accountId: String,
    systemTimezone: String,
    sourceSystem: String,
    entities: Seq[EntityConfig]) {

  /** Flat worklist of every table an extraction touches — the reference's
    * `flatEntities` (resources/sqlDwh.py:147-174): entity id plus each
    * expanded subform name. */
  def flatEntities: Seq[String] =
    entities.flatMap(e => e.entityId +: e.expand)
}

/** Per-entity schema document inferred from the source's `$metadata`
  * (reference: resources/priorityDataSource.py:347-458; example
  * readme.md:519-551). */
final case class FieldMeta(
    fieldName: String,
    sourceDataType: String,
    keyFlag: Boolean,
    desc: String = "",
    nullable: Boolean = true,
    // OData v4 Edm.Decimal facets, when the document carries them
    precision: Option[Int] = None,
    scale: Option[Int] = None)

/** `<NavigationProperty Name=.. Type="Collection(Ns.Target)"/>` — a nested
  * subform relation; `target` is the referenced EntityType's simple name. */
final case class NavMeta(navName: String, target: String)

final case class EntityMeta(
    entityName: String,
    sourceSystem: String,
    fields: Seq[FieldMeta],
    entityPk: Seq[String],
    navs: Seq[NavMeta] = Nil)

object Fixtures {
  /** The canonical fixture config (FIXTURES.md A1). */
  val config: ExtractionConfig = ExtractionConfig(
    datasourceName = "priority_companyA",
    uri = "https://host/odata/Priority/tabmob.ini/usdemo/",
    accountId = "03445d66",
    systemTimezone = "Israel",
    sourceSystem = "priority",
    entities = Seq(
      EntityConfig("ORDERS", filterFlag = true, filterField = "CURDATE",
        expand = Seq("ORDERITEMS"),
        lastRun = Some("2024-06-12 21:53:35"),
        dataStartDate = Some("2020-05-30 00:00:00")),
      EntityConfig("CTYPE", filterFlag = false, filterField = "",
        expand = Seq.empty,
        lastRun = Some("2024-06-12 21:53:40"),
        dataStartDate = Some("2020-05-30 00:00:00"))))

  /** EDMX shaped like the Priority `$metadata` the reference walks
    * (edmx:Edmx → DataServices → Schema → EntityType; FIXTURES.md A3) —
    * shared by MetadataCatalogSpec and the o08/o20 catalog queries. */
  val edmx: String =
    """<?xml version="1.0" encoding="utf-8"?>
      |<edmx:Edmx Version="4.0" xmlns:edmx="http://docs.oasis-open.org/odata/ns/edmx">
      |  <edmx:DataServices>
      |    <Schema Namespace="Priority.OData" xmlns="http://docs.oasis-open.org/odata/ns/edm">
      |      <EntityType Name="ORDERS">
      |        <Key><PropertyRef Name="ORDNAME"/></Key>
      |        <Property Name="ORDNAME" Type="Edm.String" Nullable="false">
      |          <Annotation Term="Org.OData.Core.V1.Description" String="Order name"/>
      |        </Property>
      |        <Property Name="CURDATE" Type="Edm.DateTimeOffset"/>
      |        <Property Name="QPRICE" Type="Edm.Decimal"/>
      |        <Property Name="ORD" Type="Edm.Int64"/>
      |      </EntityType>
      |      <EntityType Name="ORDERITEMS">
      |        <Key><PropertyRef Name="ORDNAME"/><PropertyRef Name="LINE"/></Key>
      |        <Property Name="ORDNAME" Type="Edm.String" Nullable="false"/>
      |        <Property Name="LINE" Type="Edm.Int64" Nullable="false"/>
      |        <Property Name="PARTNAME" Type="Edm.String"/>
      |        <Property Name="PRICE" Type="Edm.Decimal"/>
      |      </EntityType>
      |    </Schema>
      |  </edmx:DataServices>
      |</edmx:Edmx>""".stripMargin

  /** The canonical fixture config as the SOURCE JSON (FIXTURES.md A1),
    * deliberately carrying the reference's key-drift quirks — `EntityID` vs
    * `entityID`, `dataStartDate` vs `datarStartDate` (readme.md:170,175) —
    * that `ConfigJson.parse` must absorb. Shared by ConfigJsonSpec and the
    * o24 round-trip query. */
  val configJsonA1: String =
    """{
      |  "_id": "678a5c74ee789f0826b9466a",
      |  "datasourceName": "priority_companyA",
      |  "uri": "https://host/odata/Priority/tabmob.ini/usdemo/",
      |  "accountID": "03445d66",
      |  "systemTimezone": "Israel",
      |  "sourceSystem": "priority",
      |  "entities": [
      |    { "EntityID": "ORDERS", "filterFlag": true, "filterField": "CURDATE",
      |      "expand": ["ORDERITEMS"],
      |      "lastRun": "2024-06-12 21:53:35",
      |      "dataStartDate": "2020-05-30 00:00:00" },
      |    { "entityID": "CTYPE", "filterFlag": false, "filterField": "",
      |      "expand": [], "lastRun": "2024-06-12 21:53:40",
      |      "datarStartDate": "2020-05-30 00:00:00" }
      |  ]
      |}""".stripMargin

  /** Fixture metadata for ORDERS (FIXTURES.md A2). */
  val ordersMeta: EntityMeta = EntityMeta(
    entityName = "ORDERS",
    sourceSystem = "priority",
    fields = Seq(
      FieldMeta("ORDNAME", "Edm.String", keyFlag = true, desc = "Order name"),
      FieldMeta("CURDATE", "Edm.DateTimeOffset", keyFlag = false),
      FieldMeta("QPRICE", "Edm.Decimal", keyFlag = false),
      FieldMeta("ORD", "Edm.Int64", keyFlag = false)),
    entityPk = Seq("ORDNAME"))
}
