package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl
import graft.functions.{VectorSim => VS}

/** Twenty-ninth wave: suffix-order substring dedup, RAKE keyword
  * extraction, t-closeness privacy audit, and mutual-kNN graph build —
  * four curation ops a 100 TB training pipeline runs that the engine did
  * not yet express.
  *
  * `dedup_suffix_lcp` is the Lee-et-al-style exact long-repeat finder
  * (suffix-array adjacent-LCP, the method behind "Deduplicating Training
  * Data Makes Language Models Better"): sort (strided, capped) suffixes,
  * compare each with its sort-order neighbor, and any cross-document
  * repeated span ≥ the bucket width surfaces as an adjacent pair. The
  * distributed form replaces the monolithic suffix array with a
  * prefix-bucket shuffle: two suffixes with LCP ≥ B share their first B
  * chars, so bucketing by the B-char prefix is LOSSLESS for repeats ≥ B
  * and each bucket sorts independently (hot boilerplate prefixes are
  * ordinary skewed partitions for AQE). Per-document max repeat length is
  * exact under adjacent-only comparison: on the sorted chain between any
  * cross-doc pair (x∈A, y∈B) with LCP = L every adjacent step has
  * LCP ≥ L, and the first doc-change step away from x still involves doc
  * A — so doc A appears in some cross-doc ADJACENT pair with LCP ≥ L.
  * Pair ATTRIBUTION may shift to chain neighbors (documented, and the
  * oracle computes the identical strided form).
  */
object SuffixOpsQueries extends QueryModule {

  /** Suffix sampling stride: a repeat of length ≥ Bucket + Stride − 1 is
    * guaranteed to align two sampled suffixes on its body; shorter
    * repeats may be missed (the standard sampled-suffix tradeoff — at
    * 100 TB nobody materializes all O(total chars) suffixes). */
  private val Stride = 3
  /** Suffix cap: LCPs report min(true LCP, Cap). */
  private val Cap = 48
  /** Prefix-bucket width = minimum reported repeat length. */
  private val B = 16

  def all: Seq[Q] = Seq(

    Q("dedup_suffix_lcp",
      Some(
        s"""WITH sfx AS (
           |  SELECT d.doc_id, substr(d.text, p, $Cap) AS s
           |  FROM documents d
           |  JOIN generate_series(1, 100001, $Stride) AS t(p)
           |    ON p <= length(d.text) - ${B - 1}
           |), adj AS (
           |  SELECT doc_id, s,
           |         lag(doc_id) OVER w AS pdoc, lag(s) OVER w AS ps
           |  FROM sfx
           |  WINDOW w AS (PARTITION BY substr(s, 1, $B)
           |               ORDER BY s, doc_id)
           |), pair AS (
           |  SELECT least(doc_id, pdoc) AS doc_a,
           |         greatest(doc_id, pdoc) AS doc_b,
           |         lcp, substr(s, 1, lcp) AS span
           |  FROM (SELECT doc_id, pdoc, s,
           |          list_max(list_transform(range($B, ${Cap + 1}),
           |            k -> CASE WHEN substr(s, 1, k) = substr(ps, 1, k)
           |                 THEN k ELSE $B END)) AS lcp
           |        FROM adj WHERE pdoc IS NOT NULL AND pdoc <> doc_id)
           |), per AS (
           |  SELECT doc_a, doc_b, lcp, span, n_sites FROM (
           |    SELECT doc_a, doc_b, lcp, span,
           |           row_number() OVER (PARTITION BY doc_a, doc_b
           |             ORDER BY lcp DESC, span DESC) AS rn,
           |           CAST(count(*) OVER (PARTITION BY doc_a, doc_b)
           |             AS BIGINT) AS n_sites
           |    FROM pair) WHERE rn = 1
           |)
           |SELECT CAST(row_number() OVER
           |         (ORDER BY lcp DESC, doc_a, doc_b) AS BIGINT) AS rnk,
           |       doc_a, doc_b, CAST(lcp AS BIGINT) AS lcp, n_sites, span
           |FROM per QUALIFY rnk <= 20 ORDER BY rnk
           |""".stripMargin),
      (s, dir) => {
        // spread: the suffix explode ran in the single scan task (0.9 s,
        // 1 task, 14.8 MB shuffle write — r11 profile; H.spread)
        val docs = graft.H.spread(tbl(s, dir, "documents"), col("doc_id"))
        // docs shorter than B can't host a reported repeat — filter BEFORE
        // the explode (also keeps sequence() bounds valid: stop >= start)
        val sfx = docs.filter(length(col("text")) >= B)
          .select(col("doc_id"),
            explode(expr(s"sequence(1, length(text) - ${B - 1}, $Stride)")).as("p"),
            col("text"))
          .select(col("doc_id"), expr(s"substring(text, p, $Cap)").as("s"))
        val w = Window.partitionBy(expr(s"substring(s, 1, $B)"))
          .orderBy(col("s"), col("doc_id"))
        val adj = sfx
          .withColumn("pdoc", lag("doc_id", 1).over(w))
          .withColumn("ps", lag("s", 1).over(w))
          .filter(col("pdoc").isNotNull && col("pdoc") =!= col("doc_id"))
        // monotone prefix-equality fold: the last k with equal prefixes IS
        // the (capped) LCP; both suffixes share the first B chars by
        // construction so the fold starts at B, never below
        val pair = adj.select(
            least(col("doc_id"), col("pdoc")).as("doc_a"),
            greatest(col("doc_id"), col("pdoc")).as("doc_b"),
            expr(s"aggregate(sequence($B, $Cap), $B, (acc, k) -> " +
              "IF(substring(s, 1, k) = substring(ps, 1, k), k, acc))").as("lcp"),
            col("s"))
          .withColumn("span", expr("substring(s, 1, lcp)")).drop("s")
        // per-pair argmax via ONE partitioned window (no group-then-join-
        // back: the pick-back join re-read the 5M-row pair frame and the
        // original global-order rank window sorted every per-pair row in a
        // single partition — measured slope 5.4 at k=10, 2.9 after this)
        val wp = Window.partitionBy("doc_a", "doc_b")
        val per = pair
          .withColumn("rn", row_number().over(
            wp.orderBy(col("lcp").desc, col("span").desc)))
          .withColumn("n_sites", count(lit(1)).over(wp).cast("long"))
          .filter(col("rn") === 1)
        // distributed top-k (TakeOrderedAndProject), then rank the 20
        // survivors — never a global single-partition window
        val top = per
          .orderBy(col("lcp").desc, col("doc_a"), col("doc_b")).limit(20)
        top.withColumn("rnk", row_number().over(
            Window.orderBy(col("lcp").desc, col("doc_a"), col("doc_b")))
            .cast("long"))
          .select(col("rnk"), col("doc_a"), col("doc_b"),
            col("lcp").cast("long").as("lcp"), col("n_sites"), col("span"))
          .orderBy("rnk")
      }),

    // RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    // maximal stopword-free word runs; a word scores degree/freq where
    // degree sums the lengths of every phrase containing it; a phrase
    // scores the sum of its member words' scores. All-integer scoring
    // (micro-scaled floor division — Spark `div` and DuckDB `//` both
    // floor for positives) keeps the compare path float-free.
    Q("text_rake_keywords",
      Some(
        s"""WITH idxed AS (
           |  SELECT doc_id, ws, unnest(range(0, len(ws))) AS i
           |  FROM (SELECT doc_id,
           |          regexp_split_to_array(lower(text), '[^a-z]+') AS ws
           |        FROM documents) t
           |), words AS (
           |  SELECT doc_id, ws[i + 1] AS word, CAST(i + 1 AS BIGINT) AS idx,
           |         CASE WHEN ws[i + 1] IN ($StopSql) THEN 1 ELSE 0 END AS stop
           |  FROM idxed WHERE ws[i + 1] <> ''
           |), runs AS (
           |  SELECT doc_id, word, idx, stop,
           |         sum(stop) OVER (PARTITION BY doc_id ORDER BY idx) AS pid
           |  FROM words
           |), members AS (
           |  SELECT doc_id, word, idx, pid FROM runs WHERE stop = 0
           |), plen AS (
           |  SELECT doc_id, pid, count(*) AS plen
           |  FROM members GROUP BY doc_id, pid
           |), wstat AS (
           |  SELECT m.word, count(*) AS freq, sum(p.plen) AS degree
           |  FROM members m JOIN plen p
           |    ON p.doc_id = m.doc_id AND p.pid = m.pid
           |  GROUP BY m.word
           |), wscore AS (
           |  SELECT word, (degree * 1000000) // freq AS ws FROM wstat
           |), phrases AS (
           |  SELECT m.doc_id, m.pid,
           |         string_agg(m.word, ' ' ORDER BY m.idx) AS phrase,
           |         CAST(count(*) AS BIGINT) AS plen,
           |         CAST(sum(s.ws) AS BIGINT) AS score
           |  FROM members m JOIN wscore s ON s.word = m.word
           |  GROUP BY m.doc_id, m.pid
           |), ranked AS (
           |  SELECT phrase, plen, CAST(count(*) AS BIGINT) AS n_occ,
           |         score
           |  FROM phrases GROUP BY phrase, plen, score
           |)
           |SELECT CAST(row_number() OVER
           |         (ORDER BY score DESC, phrase) AS BIGINT) AS rnk,
           |       phrase, plen, n_occ, score
           |FROM ranked QUALIFY rnk <= 25 ORDER BY rnk
           |""".stripMargin),
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        val words = docs
          .select(col("doc_id"),
            posexplode(split(lower(col("text")), "[^a-z]+")).as(Seq("i0", "word")))
          .filter(col("word") =!= "")
          .withColumn("idx", (col("i0") + 1).cast("long")).drop("i0")
          .withColumn("stop",
            when(col("word").isInCollection(Stopwords), 1).otherwise(0))
        val wDoc = Window.partitionBy("doc_id").orderBy("idx")
        val members = words
          .withColumn("pid", sum("stop").over(wDoc))
          .filter(col("stop") === 0)
          .select("doc_id", "word", "idx", "pid")
          .localCheckpoint() // read by plen, wstat AND phrase assembly
        val plen = members.groupBy("doc_id", "pid")
          .agg(count(lit(1)).as("plen"))
        val wscore = members.join(plen, Seq("doc_id", "pid"))
          .groupBy("word")
          .agg(count(lit(1)).as("freq"), sum("plen").as("degree"))
          .select(col("word"), expr("(degree * 1000000) div freq").as("ws"))
        val phrases = members.join(broadcast(wscore), "word")
          .groupBy("doc_id", "pid")
          .agg(
            array_join(transform(array_sort(collect_list(struct(col("idx"),
              col("word")))), x => x.getField("word")), " ").as("phrase"),
            count(lit(1)).cast("long").as("plen"),
            sum("ws").cast("long").as("score"))
        val ranked = phrases.groupBy("phrase", "plen", "score")
          .agg(count(lit(1)).cast("long").as("n_occ"))
        val rw = Window.orderBy(col("score").desc, col("phrase"))
        H.materialized(
          ranked.withColumn("rnk", row_number().over(rw).cast("long"))
            .filter(col("rnk") <= 25)
            .select("rnk", "phrase", "plen", "n_occ", "score").orderBy("rnk"),
          caches = Nil, checkpoints = Seq(members))
      }),

    // t-closeness audit (Li et al. 2007): per quasi-identifier class
    // (nation × market segment), total-variation distance between the
    // class's sensitive-attribute distribution (order priority) and the
    // global one. Exact integer TVD numerator — |cnt_cv·N − cnt_gv·n_c|
    // summed over the value domain — so the compare path carries BIGINTs;
    // the t = 0.2 violation test cross-multiplies (5·num > 2·n_c·N)
    // instead of dividing. Scale shape: one shuffled count over the fact
    // join, then broadcast joins against the 5-row global distribution
    // and the class spine.
    Q("privacy_tcloseness",
      Some(
        """WITH f AS (
          |  SELECT c.c_nationkey AS nation, c.c_mktsegment AS segment,
          |         o.o_orderpriority AS pri
          |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
          |), cls AS (
          |  SELECT nation, segment, pri, count(*) AS cnt
          |  FROM f GROUP BY nation, segment, pri
          |), csz AS (
          |  SELECT nation, segment, sum(cnt) AS n_c FROM cls
          |  GROUP BY nation, segment
          |), gl AS (
          |  SELECT pri, count(*) AS gcnt FROM f GROUP BY pri
          |), tot AS (SELECT sum(gcnt) AS n FROM gl
          |), terms AS (
          |  SELECT s.nation, s.segment, s.n_c,
          |         abs(coalesce(c.cnt, 0) * t.n - g.gcnt * s.n_c) AS term
          |  FROM csz s CROSS JOIN gl g CROSS JOIN tot t
          |  LEFT JOIN cls c ON c.nation = s.nation
          |    AND c.segment = s.segment AND c.pri = g.pri
          |)
          |SELECT nation, segment, CAST(n_c AS BIGINT) AS n_class,
          |       CAST(sum(term) AS BIGINT) AS tvd_num,
          |       CAST(sum(term) AS DOUBLE) /
          |         (2.0 * n_c * (SELECT n FROM tot)) AS tvd,
          |       CASE WHEN 5 * sum(term) > 2 * n_c * (SELECT n FROM tot)
          |            THEN 1 ELSE 0 END AS t_violation
          |FROM terms GROUP BY nation, segment, n_c
          |ORDER BY tvd DESC, nation, segment
          |""".stripMargin),
      (s, dir) => {
        val f = tbl(s, dir, "orders")
          .join(tbl(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_nationkey").as("nation"),
            col("c_mktsegment").as("segment"),
            col("o_orderpriority").as("pri"))
        val cls = f.groupBy("nation", "segment", "pri")
          .agg(count(lit(1)).as("cnt")).localCheckpoint()
        // global distribution + total derive from the CLASS counts, not a
        // second pass over the fact join
        val gl = cls.groupBy("pri").agg(sum("cnt").as("gcnt"))
        val csz = cls.groupBy("nation", "segment").agg(sum("cnt").as("n_c"))
        val tot = gl.agg(sum("gcnt").as("n"))
        val terms = csz
          .crossJoin(broadcast(gl))       // |priorities| = 5: bounded
          .crossJoin(broadcast(tot))      // 1 row
          .join(cls.withColumnRenamed("nation", "cn")
              .withColumnRenamed("segment", "cs")
              .withColumnRenamed("pri", "cp"),
            col("cn") === col("nation") && col("cs") === col("segment") &&
              col("cp") === col("pri"), "left")
          .select(col("nation"), col("segment"), col("n_c"), col("n"),
            abs(coalesce(col("cnt"), lit(0L)) * col("n") -
              col("gcnt") * col("n_c")).as("term"))
        H.materialized(
          terms.groupBy("nation", "segment", "n_c", "n")
            .agg(sum("term").as("tvd_num"))
            .select(col("nation"), col("segment"),
              col("n_c").cast("long").as("n_class"),
              col("tvd_num").cast("long").as("tvd_num"),
              (col("tvd_num").cast("double") /
                (lit(2.0) * col("n_c") * col("n"))).as("tvd"),
              when(lit(5) * col("tvd_num") > lit(2) * col("n_c") * col("n"),
                1).otherwise(0).as("t_violation"))
            .orderBy(col("tvd").desc, col("nation"), col("segment")),
          caches = Nil, checkpoints = Seq(cls))
      }),

    // Mutual-kNN graph over the embedding corpus — the edge set semantic
    // dedup / density clustering pipelines consume. Candidates come from
    // an LSH-bucket self-join (never all-pairs), each node keeps its
    // in-bucket top-5 by exact cosine, and an edge survives only if BOTH
    // endpoints ranked each other (the mutual filter that strips hub
    // noise from kNN graphs). Grouping the directed top-k by the
    // unordered pair and requiring count = 2 implements mutuality with
    // one shuffle, no second self-join.
    Q("sim_knn_graph",
      Some(s"WITH ${VS.skewCappedCtesSql}, " +
        "p AS (SELECT a.vec_id AS src, b.vec_id AS dst, " +
        s"(${VS.dotSql("a.v", "b.v")}) / (sqrt(a.nrm) * sqrt(b.nrm)) AS sim " +
        "FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id), " +
        "knn AS (SELECT src, dst, sim, row_number() OVER " +
        "(PARTITION BY src ORDER BY sim DESC, dst) AS rnk FROM p " +
        "QUALIFY rnk <= 5), " +
        "mut AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b, " +
        "min(sim) AS sim FROM knn GROUP BY 1, 2 HAVING count(*) = 2) " +
        "SELECT a, b, sim FROM mut ORDER BY a, b"),
      (s, dir) => {
        val e = tbl(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        // skew-capped join keys: oversized buckets split on longer prefixes
        // so the pair stream never goes quadratic in a mega-bucket
        // (identical to the plain 8-plane bucketing at gate SFs)
        val (nk, sigCk) = VS.skewCappedKey(e, "v", e.count(), "bucket")
        val n = nk.localCheckpoint()
        val a = n.select(col("vec_id").as("src"), col("v").as("av"),
          col("bucket"))
        val b = n.select(col("vec_id").as("dst"), col("v").as("bv"),
          col("bucket").as("bucket_b"))
        val w = Window.partitionBy("src").orderBy(col("sim").desc, col("dst"))
        val knn = a.join(b,
            col("bucket") === col("bucket_b") && col("src") =!= col("dst"))
          .withColumn("sim",
            graft.functions.CustomExpressions.cosine_sim(col("av"), col("bv")))
          .select("src", "dst", "sim")
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 5)
          .select("src", "dst", "sim")
        H.materialized(
          knn.groupBy(least(col("src"), col("dst")).as("a"),
              greatest(col("src"), col("dst")).as("b"))
            .agg(min("sim").as("sim"), count(lit(1)).as("deg"))
            .filter(col("deg") === 2).drop("deg")
            .orderBy("a", "b"),
          caches = Nil, checkpoints = Seq(n, sigCk))
      }))

  /** RAKE stopword list — deliberately small and inline so the oracle
    * carries the identical set. */
  private val Stopwords = Seq("the", "a", "an", "of", "to", "in", "and",
    "or", "is", "for", "on", "with", "as", "by", "at", "from", "it",
    "this", "that", "be", "are", "was", "were")
  private def StopSql: String = Stopwords.map("'" + _ + "'").mkString(", ")
}
