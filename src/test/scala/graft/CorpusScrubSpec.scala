package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the corpus-scrub wave on constructed fixtures (the judged
  * queries verify the same ops against DuckDB on the real tables; these
  * pin the behaviors a hash compare can't explain when it breaks). */
class CorpusScrubSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("PII redaction masks every class and leaves clean text untouched") {
    import spark.implicits._
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipRe = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
    val phoneRe = "\\+\\d[\\d -]{7,}\\d"
    val df = Seq(
      "mail bob.smith+x@corp.example.org now",
      "server at 192.168.0.17 responded",
      "call +44 20 7946-0958 today",
      "no pii here at all").toDF("t")
      .withColumn("redacted", regexp_replace(regexp_replace(regexp_replace(
        col("t"), lit(emailRe), lit("<EMAIL>")),
        lit(ipRe), lit("<IP>")), lit(phoneRe), lit("<PHONE>")))
    val got = df.select("redacted").as[String].collect().toSeq
    assert(got == Seq(
      "mail <EMAIL> now",
      "server at <IP> responded",
      "call <PHONE> today",
      "no pii here at all"))
  }

  test("paragraph dedup keeps the globally first occurrence only, within and across docs") {
    import spark.implicits._
    // doc 1: A B A (A repeats in-doc); doc 2: B C (B already seen in doc 1)
    val segs = Seq((1L, 0, "A"), (1L, 1, "B"), (1L, 2, "A"),
      (2L, 0, "B"), (2L, 1, "C")).toDF("doc_id", "pos", "seg")
    val w = Window.partitionBy(md5(col("seg"))).orderBy("doc_id", "pos")
    val first = segs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("doc_id", "pos", "seg").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(first == Set((1L, 0, "A"), (1L, 1, "B"), (2L, 1, "C")))
  }

  test("line filter's nested word-count lambda ignores empty tokens") {
    import spark.implicits._
    val df = Seq(Seq("one two three four five six seven eight",
      "short line", "a  b  c  d  e  f  g  h")).toDF("segs")
      .withColumn("kept", filter(col("segs"), seg =>
        size(filter(split(seg, " "), w => w =!= "")) >= 8))
    val kept = df.select("kept").as[Seq[String]].collect()(0)
    // double-spaced segment still has 8 real words; 'short line' has 2
    assert(kept == Seq("one two three four five six seven eight",
      "a  b  c  d  e  f  g  h"))
  }

  test("radius search returns exactly the brute-force above-threshold set") {
    import spark.implicits._
    val e = H.tbl(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") === 3)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val got = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("sim",
        graft.functions.CustomExpressions.cosine_sim(col("qv"), col("v")))
      .filter(col("sim") >= 0.25)
      .select("vec_id").as[Long].collect().toSet
    // brute force on the driver over the same 500 rows
    val all = e.collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val qv = all.find(_._1 == 3L).get._2
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    val expect = all.filter { case (id, v) =>
      id != 3L && dot(qv, v) / (math.sqrt(dot(qv, qv)) * math.sqrt(dot(v, v))) >= 0.25
    }.map(_._1).toSet
    assert(got == expect && got.nonEmpty)
  }

  test("pii/url planted map stages stay in one whole-stage codegen span (no shuffle)") {
    val df = SparkEntry.queries("text_pii_redact")(spark, "/root/testdata/sf0.001")
    df.collect() // finalize the adaptive plan, then inspect the SAME dataset
    // the executed AQE plan prints "*(n)" whole-stage-codegen markers and
    // both Final and Initial sections — judge the Final section only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("*("), plan)
    // a global sort for output determinism is the ONLY exchange
    val exchanges = "Exchange ".r.findAllIn(plan).size
    assert(exchanges <= 1, s"map stage must not shuffle beyond the final sort:\n$plan")
  }
  // text_confusables_audit regression (r9 advisor, high): the extract MUST
  // go through the Column API — expr("regexp_extract(t,'[^\\x00-\\x7F]',0)")
  // has its backslashes stripped by the SQL string-literal parser, yielding
  // the char class [^x00-x7F] ('0'..'x'), which pulls 'y' out of "yeаh"
  // instead of the Cyrillic 'а' the DuckDB oracle extracts.
  test("confusable-char extract returns the first NON-ASCII char, not y/z/punct") {
    import spark.implicits._
    val planted = Seq("yeаh", "zoneа", "{weird}а", "plainа").toDF("t")
      .withColumn("c", regexp_extract(col("t"), "[^\\x00-\\x7F]", 0))
      .select("c").as[String].collect().toSeq
    assert(planted == Seq("а", "а", "а", "а"), planted)
    // and the broken form really is broken on this engine — pin the hazard
    // so nobody "simplifies" the Column call back into expr()
    val viaExpr = Seq("yeаh").toDF("t")
      .withColumn("c", expr("regexp_extract(t, '[^\\x00-\\x7F]', 0)"))
      .select("c").as[String].collect().head
    assert(viaExpr == "y", s"SQL-literal stripping changed: got '$viaExpr'")
  }

  // vocab_bpe_merge / vocab_bpe_train depend on replace() over the
  // boundary-doubled form realizing BPE's GREEDY LEFT-TO-RIGHT
  // NON-OVERLAPPING merge identically in Spark and DuckDB; pin the
  // overlap case ("a a a a" with merge (a,a) yields 2 merges, not 3).
  test("boundary-doubled replace is greedy left-to-right non-overlapping") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = Seq("a a a a", "a a a", "b a a b").toDF("text")
      .withColumn("s", concat(lit("#"), replace(col("text"), lit(" "), lit("##")), lit("#")))
      .withColumn("m", replace(col("s"), lit("#a##a#"), lit("#a_a#")))
      .withColumn("toks", split(regexp_replace(col("m"), "^#|#$", ""), "##"))
      .select("toks").as[Seq[String]].collect()
    assert(out(0) == Seq("a_a", "a_a"))      // 4 a's -> two pairs
    assert(out(1) == Seq("a_a", "a"))        // 3 a's -> pair + leftover
    assert(out(2) == Seq("b", "a_a", "b"))   // interior pair merges once
  }
}
