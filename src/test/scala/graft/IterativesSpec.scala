package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{DedupSketches => DS, Iteratives}

/** Proves the two checkpointing modes of the iterative operators are
  * interchangeable: Local (executor blocks, single-node speed) and
  * Reliable (SparkContext checkpoint dir — the cluster path that
  * restarts from the last completed round after executor loss) must
  * produce IDENTICAL results, and the reliable run must actually write
  * generations into the checkpoint directory (i.e. the restartable
  * path executes, not just compiles). */
class IterativesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withCheckpointDir[A](f: java.io.File => A): A = {
    val dir = Files.createTempDirectory("graft-reliable-ckpt").toFile
    val sc = spark.sparkContext
    val before = sc.getCheckpointDir
    sc.setCheckpointDir(dir.getAbsolutePath)
    try f(dir)
    finally {
      before.foreach(sc.setCheckpointDir) // restore for other suites
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
    }
  }

  test("connectedComponents: Local and Reliable checkpoint modes agree") {
    val spark0 = spark
    import spark0.implicits._
    // chain 1-2-3-4-5 (diameter 4, needs pointer doubling), pair 10-11,
    // triangle 20-21-22 — three components
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 20L)).toDF("doc_a", "doc_b")
    val local = DS.connectedComponents(pairs, mode = Iteratives.Local)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val reliable = withCheckpointDir { dir =>
      val out = DS.connectedComponents(pairs, mode = Iteratives.Reliable)
        .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      // the reliable path must have materialized generations on disk
      def countFiles(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(countFiles).sum else 1
      assert(countFiles(dir) > 0, "reliable checkpoint dir is empty")
      out
    }
    assert(local == reliable)
    assert(local == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("pageRankMicro: Local and Reliable checkpoint modes agree") {
    val spark0 = spark
    import spark0.implicits._
    // hub 0 → {1,2,3}, cycle 1→2→3→1, isolated node 4 (keeps the damping
    // floor through the left join)
    val edges = Seq((0, 1), (0, 2), (0, 3), (1, 2), (2, 3), (3, 1))
      .toDF("src", "dst")
    val nodes = Seq(0, 1, 2, 3, 4).toDF("id")
    def run(mode: Iteratives.Mode): Seq[(Int, Long)] =
      Iteratives.pageRankMicro(edges, nodes, rounds = 3, mode = mode)
        .orderBy("id").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val local = run(Iteratives.Local)
    val reliable = withCheckpointDir(_ => run(Iteratives.Reliable))
    assert(local == reliable)
    // integer semantics: source/isolated nodes hold the damping floor
    val byId = local.toMap
    assert(byId(0) == 150000L && byId(4) == 150000L)
    assert(byId(1) > 150000L && byId(2) > byId(0) && byId(3) > byId(0))
  }
}
