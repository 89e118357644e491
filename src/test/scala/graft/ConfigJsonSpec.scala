package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.ConfigJson

class ConfigJsonSpec extends AnyFunSuite {

  private val a1 = graft.model.Fixtures.configJsonA1

  test("A1 config parses; both EntityID/entityID and dataStartDate/datarStartDate accepted") {
    val cfg = ConfigJson.parse(a1)
    assert(cfg.accountId == "03445d66")
    assert(cfg.entities.map(_.entityId) == Seq("ORDERS", "CTYPE"))
    assert(cfg.entities.head.expand == Seq("ORDERITEMS"))
    assert(cfg.entities.head.filterFlag)
    assert(cfg.entities(1).dataStartDate.contains("2020-05-30 00:00:00")) // typo'd key
    assert(cfg.flatEntities == Seq("ORDERS", "ORDERITEMS", "CTYPE"))
  }

  test("explicit JSON null parses as None, not the string \"null\"") {
    val cfg = ConfigJson.parse(
      """{"entities": [{"EntityID": "X", "filterFlag": true,
        |"filterField": "ts", "lastRun": null, "dataStartDate": null}]}""".stripMargin)
    assert(cfg.entities.head.lastRun.isEmpty)
    assert(cfg.entities.head.dataStartDate.isEmpty)
  }

  test("incremental flag is a strict boolean, unlike the reference's substring test") {
    assert(ConfigJson.parseIncremental("true"))
    assert(ConfigJson.parseIncremental("TRUE"))
    assert(!ConfigJson.parseIncremental("false"))
    assert(!ConfigJson.parseIncremental("")) // reference: "" was TRUE (in 'true')
    assertThrows[RuntimeException](ConfigJson.parseIncremental("ru")) // ditto
    assertThrows[RuntimeException](ConfigJson.parseIncremental("yes"))
  }
}
