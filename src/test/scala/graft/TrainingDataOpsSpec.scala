package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant specs for the round-3 corpus/pipeline operators — properties
  * the DuckDB hash-compare can't express: order preservation, boundary
  * hits, timeline partitioning, cross-engine hash agreement.
  */
class TrainingDataOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("text_boilerplate: kept tokens are an order-preserving subsequence; removal follows df threshold") {
    val docs = H.tbl(spark, sf, "documents")
    val n = docs.count()
    // independent recompute of the common-token set
    val common = docs
      .select(explode(array_distinct(split(col("text"), " "))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .filter(col("df") * 2 >= n)
      .collect().map(_.getString(0)).toSet
    assert(common.nonEmpty) // the synthetic corpus has near-universal tokens
    val out = run("text_boilerplate").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val orig = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    orig.foreach { case (id, text) =>
      val toks = text.split(" ")
      val expected = toks.filterNot(common)
      val (clean, removed) = out(id)
      assert(clean == expected.mkString(" "), s"doc $id")
      assert(removed == toks.length - expected.length, s"doc $id")
    }
  }

  test("sample_split: bucket agrees with JVM md5; assignment is deterministic") {
    val out = run("sample_split").collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    out.take(50).foreach { r =>
      val id = r.getLong(0)
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val bucket = java.lang.Long.parseLong(hex.take(4), 16) % 10
      assert(r.getLong(2) == bucket, s"doc $id")
    }
    val again = run("sample_split").collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("pack_contexts: per-source stream is contiguous and pack ids follow begin_pos") {
    val rows = run("pack_contexts")
      .select("source", "doc_id", "n_tokens", "begin_pos", "pack_id").collect()
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val ordered = rs.sortBy(_.getLong(1))
      var expectedBegin = 0L
      ordered.foreach { r =>
        assert(r.getLong(3) == expectedBegin, s"$src doc ${r.getLong(1)}")
        assert(r.getLong(4) == r.getLong(3) / 512, s"$src doc ${r.getLong(1)}")
        expectedBegin += r.getLong(2)
      }
    }
  }

  test("vocab_topk: ranks contiguous, tf non-increasing, df <= tf") {
    val rows = run("vocab_topk").collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(3) == i + 1)
      assert(r.getLong(2) <= r.getLong(1)) // df <= tf
      if (i > 0) assert(rows(i - 1).getLong(1) >= r.getLong(1))
    }
  }

  test("text_inverted_index: postings sorted, length equals df") {
    run("text_inverted_index").collect().foreach { r =>
      val posts = r.getString(2).split(",").map(_.toLong)
      assert(posts.length == r.getLong(1))
      assert(posts.sameElements(posts.sorted))
      assert(posts.distinct.length == posts.length)
    }
  }

  test("scd2_intervals: each user's intervals partition the timeline with one open tail") {
    val byUser = run("scd2_intervals").collect().groupBy(_.getLong(0))
    assert(byUser.nonEmpty)
    byUser.foreach { case (u, rs) =>
      val ordered = rs.sortBy(_.getLong(1)) // version
      assert(ordered.map(_.getLong(1)).sameElements(1L to ordered.length))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getString(4) == b.getString(3), s"user $u: valid_to(i) == valid_from(i+1)")
          assert(a.getString(2) != b.getString(2), s"user $u: consecutive types differ")
        case _ =>
      }
      assert(ordered.init.forall(_.getInt(5) == 0))
      assert(ordered.last.getInt(5) == 1)
      assert(ordered.last.getString(4) == null)
    }
  }

  test("emb_quantize_int8: values clamp to [-127,127] and the max element hits the boundary") {
    run("emb_quantize_int8").collect().foreach { r =>
      val q = r.getString(2).split(",").map(_.toLong)
      assert(q.forall(v => v >= -127 && v <= 127))
      if (r.getDouble(1) > 0) assert(q.exists(v => math.abs(v) == 127))
    }
  }

  test("pipeline_incremental_agg: merged state equals a direct full aggregate") {
    val direct = H.tbl(spark, sf, "orders")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(H.dec2(col("o_totalprice"))).cast("double").as("sum_price"))
      .orderBy("o_orderpriority").collect()
    val merged = run("pipeline_incremental_agg").collect()
    assert(merged.map(_.toString).toSeq == direct.map(_.toString).toSeq)
  }

  test("TopKByValue heap agg matches window row_number under any partitioning (ties included)") {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TopKByValue
    val base = spark.range(0L, 1000L)
      .select(col("id").as("key"),
        (col("id") % 3).cast("string").as("grp"),
        (col("id") % 7).cast("double").as("value")) // heavy ties
    val expected = base
      .withColumn("rnk", row_number().over(
        Window.partitionBy("grp").orderBy(col("value").desc, col("key"))))
      .filter(col("rnk") <= 5)
      .select("grp", "rnk", "key", "value")
      .orderBy("grp", "rnk").collect().map(_.toString).toSeq
    Seq(1, 4, 13).foreach { parts =>
      val topk = GraftColumnBridge.column(
        TopKByValue(
          GraftColumnBridge.expression(col("key")),
          GraftColumnBridge.expression(col("value")), k = 5)
          .toAggregateExpression())
      val got = base.repartition(parts)
        .groupBy("grp").agg(topk.as("tk"))
        .select(col("grp"), posexplode(col("tk")).as(Seq("i", "p")))
        .select(col("grp"), (col("i") + 1).as("rnk"),
          col("p.key").as("key"), col("p.value").as("value"))
        .orderBy("grp", "rnk").collect().map(_.toString).toSeq
      assert(got == expected, s"parts=$parts")
    }
  }

  test("pipeline_corpus_prep: dropped docs have no pack; kept packs are contiguous per lang") {
    val rows = run("pipeline_corpus_prep")
      .select("lang", "doc_id", "n_tokens", "decision", "pack_id").collect()
    assert(rows.exists(_.getString(3) == "keep"))
    rows.filter(_.getString(3) != "keep").foreach(r => assert(r.isNullAt(4)))
    rows.filter(_.getString(3) == "keep").groupBy(_.getString(0)).foreach {
      case (lang, rs) =>
        var begin = 0L
        rs.sortBy(_.getLong(1)).foreach { r =>
          assert(r.getLong(4) == begin / 1024, s"$lang doc ${r.getLong(1)}")
          begin += r.getLong(2)
        }
    }
  }

  test("profile_table: counts are consistent (non-null <= rows, distinct <= non-null)") {
    run("profile_table").collect().foreach { r =>
      val (rows, nn, nd) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nn <= rows); assert(nd <= nn); assert(nd > 0)
      assert(r.getString(4) <= r.getString(5)) // min <= max (all rendered sortably)
    }
  }
}
