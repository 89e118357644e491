package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ODataTestServer

/** The connector's MICRO_BATCH_READ face: row-cursor offsets, checkpointed
  * resume, delta-only fetches, exactly-once across runs. */
class ODataStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("incremental pull: run 2 fetches only the rows appended after run 1") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_odstream").toString
    val sink = s"$tmp/sink"; val ckpt = s"$tmp/ckpt"
    ODataTestServer.registerDf("stream_ent",
      spark.range(0L, 10L).select($"id", ($"id" * 2).as("v")))

    def pull(): Unit = {
      val q = spark.readStream.format("graft.sources.ODataSource")
        .option("entity", "stream_ent").option("pageSize", "4").load()
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    pull()
    assert(spark.read.parquet(sink).count() === 10L)
    assert(ODataTestServer.lastRequest.contains("$skiptoken="),
      ODataTestServer.lastRequest)

    ODataTestServer.appendRows("stream_ent",
      spark.range(10L, 15L).select($"id", ($"id" * 2).as("v")))
    pull()
    // delta fetch started exactly at the committed cursor...
    assert(ODataTestServer.lastRequest.contains("$skiptoken=10&$top=5"),
      ODataTestServer.lastRequest)
    // ...and the sink holds every row exactly once
    val rows = spark.read.parquet(sink)
    assert(rows.count() === 15L)
    assert(rows.select("id").distinct().count() === 15L)
    assert(rows.agg(sum($"v")).as[Long].head() === (0L until 15L).map(_ * 2).sum)

    // idle run: nothing new, nothing re-read
    pull()
    assert(spark.read.parquet(sink).count() === 15L)
  }

  test("pages split a micro-batch into multiple partitions") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_odstream2").toString
    ODataTestServer.registerDf("stream_ent2",
      spark.range(0L, 9L).select($"id"))
    val q = spark.readStream.format("graft.sources.ODataSource")
      .option("entity", "stream_ent2").option("pageSize", "4").load()
      .writeStream.format("parquet")
      .option("path", s"$tmp/sink").option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val files = spark.read.parquet(s"$tmp/sink")
    assert(files.count() === 9L)
    // 9 rows / pageSize 4 -> 3 range partitions -> >= 3 output files
    val n = java.nio.file.Files.list(java.nio.file.Paths.get(s"$tmp/sink"))
      .filter(f => f.toString.endsWith(".parquet")).count()
    assert(n >= 3, s"expected >=3 part files, got $n")
  }
}
