package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, QueryModule}
import graft.H.tbl
import graft.functions.{VectorSim => VS}

/** Fourth wave of training-data-pipeline operators: the web-corpus
  * scrubbing stages that precede everything else in an LLM data pipeline —
  * PII redaction, URL/domain blocklist filtering, C4-style line-level
  * quality filtering, paragraph-level (sub-document) deduplication — plus
  * cosine radius search (range variant of the top-k exact baseline).
  *
  * The synthetic corpus contains no emails / URLs, so the PII and URL
  * queries PLANT deterministic spans derived from `doc_id` (identically in
  * the Spark program and the DuckDB oracle — the planted-fixture pattern
  * from `dedup_ngram_jaccard`); the regex detection/redaction then runs
  * over the combined text as it would over real pages.
  *
  * Scale shapes: PII / URL / line filtering are pure per-row map stages
  * (zero shuffle; a 100 TB corpus streams through them embarrassingly
  * parallel). Paragraph dedup shuffles once on the paragraph hash — the
  * same linear keep-first shape as `dedup_exact`, just at sub-document
  * granularity. Radius search broadcasts the (tiny) query set and scans
  * the corpus linearly, like `sim_cosine_topk`.
  */
object CorpusScrubQueries extends QueryModule {

  // Regexes shared by the Spark program and the oracle (Java regex and
  // DuckDB RE2 agree on this subset: classes, bounded reps, alternation).
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val IpRe = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
  private val PhoneRe = "\\+\\d[\\d -]{7,}\\d"

  /** DuckDB: planted-PII text (keep in lockstep with `piiText`). */
  private val PiiTextSql =
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@ex' || " +
      "CAST(doc_id % 7 AS VARCHAR) || '.com ip 10.' || " +
      "CAST(doc_id % 256 AS VARCHAR) || '.' || " +
      "CAST((doc_id * 7) % 256 AS VARCHAR) || '.' || " +
      "CAST(doc_id % 100 AS VARCHAR) || ' tel +1 555-' || " +
      "CAST(1000 + (doc_id * 13) % 9000 AS VARCHAR)"

  /** Spark: planted-PII text (keep in lockstep with `PiiTextSql`). */
  private def piiText = concat(
    col("text"), lit(" contact user"), col("doc_id").cast("string"),
    lit("@ex"), (col("doc_id") % 7).cast("string"),
    lit(".com ip 10."), (col("doc_id") % 256).cast("string"),
    lit("."), ((col("doc_id") * 7) % 256).cast("string"),
    lit("."), (col("doc_id") % 100).cast("string"),
    lit(" tel +1 555-"), (lit(1000) + (col("doc_id") * 13) % 9000).cast("string"))

  def all: Seq[Q] = Seq(

    // ---- PII redaction ---------------------------------------------------

    // Detect-and-mask over email / IPv4 / phone patterns: per-doc match
    // counts plus the fully redacted text. Pure map stage — the redaction
    // regexes run inside whole-stage codegen, nothing shuffles.
    Q("text_pii_redact",
      Some("WITH p AS (SELECT doc_id, " + PiiTextSql + " AS t FROM documents) " +
        "SELECT doc_id, " +
        s"CAST(len(regexp_extract_all(t, '$EmailRe')) AS BIGINT) AS n_email, " +
        s"CAST(len(regexp_extract_all(t, '$IpRe')) AS BIGINT) AS n_ip, " +
        s"CAST(len(regexp_extract_all(t, '$PhoneRe')) AS BIGINT) AS n_phone, " +
        s"regexp_replace(regexp_replace(regexp_replace(t, '$EmailRe', " +
        "'<EMAIL>', 'g'), '" + IpRe + "', '<IP>', 'g'), '" + PhoneRe +
        "', '<PHONE>', 'g') AS redacted " +
        "FROM p ORDER BY doc_id"),
      (s, dir) =>
        tbl(s, dir, "documents")
          .select(col("doc_id"), piiText.as("t"))
          .select(col("doc_id"),
            regexp_count(col("t"), lit(EmailRe)).cast("long").as("n_email"),
            regexp_count(col("t"), lit(IpRe)).cast("long").as("n_ip"),
            regexp_count(col("t"), lit(PhoneRe)).cast("long").as("n_phone"),
            regexp_replace(regexp_replace(regexp_replace(col("t"),
              lit(EmailRe), lit("<EMAIL>")),
              lit(IpRe), lit("<IP>")),
              lit(PhoneRe), lit("<PHONE>")).as("redacted"))
          .orderBy("doc_id")),

    // ---- URL / domain blocklist filter -----------------------------------

    // Extract each doc's URL domain, drop blocklisted domains with a
    // broadcast anti-join (the blocklist is always tiny next to the
    // corpus), report per-domain survivor stats.
    Q("text_url_filter",
      Some("WITH p AS (SELECT doc_id, text || ' see https://' || " +
        "CASE doc_id % 4 WHEN 0 THEN 'spam.example' WHEN 1 THEN 'ok.org' " +
        "WHEN 2 THEN 'news.site' ELSE 'blog.net' END || '/p/' || " +
        "CAST(doc_id AS VARCHAR) AS t FROM documents), " +
        "d AS (SELECT doc_id, regexp_extract(t, 'https://([A-Za-z.]+)/', 1) " +
        "AS domain FROM p) " +
        "SELECT domain, CAST(count(*) AS BIGINT) AS n_docs, " +
        "min(doc_id) AS min_doc, max(doc_id) AS max_doc FROM d " +
        "WHERE domain NOT IN ('spam.example', 'tracker.bad') " +
        "GROUP BY domain ORDER BY domain"),
      (s, dir) => {
        import s.implicits._
        val planted = tbl(s, dir, "documents")
          .select(col("doc_id"), concat(col("text"), lit(" see https://"),
            when(col("doc_id") % 4 === 0, "spam.example")
              .when(col("doc_id") % 4 === 1, "ok.org")
              .when(col("doc_id") % 4 === 2, "news.site")
              .otherwise("blog.net"),
            lit("/p/"), col("doc_id").cast("string")).as("t"))
          .select(col("doc_id"),
            regexp_extract(col("t"), "https://([A-Za-z.]+)/", 1).as("domain"))
        val blocklist = Seq("spam.example", "tracker.bad").toDF("domain")
        planted.join(broadcast(blocklist), Seq("domain"), "left_anti")
          .groupBy("domain")
          .agg(count(lit(1)).as("n_docs"),
            min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
          .orderBy("domain")
      }),

    // ---- C4-style line-level quality filter ------------------------------

    // Split each doc into "lines" (segments between ' the ' — the corpus
    // has no newlines), keep only segments with >= 8 real words, reassemble
    // the cleaned doc. Per-row array lambdas, zero shuffle: the C4 shape
    // where the unit of filtering is smaller than the document.
    Q("text_line_filter",
      Some("WITH l AS (SELECT doc_id, string_split(text, ' the ') AS segs " +
        "FROM documents), " +
        "k AS (SELECT doc_id, segs, list_filter(segs, s -> " +
        "len(list_filter(string_split(s, ' '), w -> w <> '')) >= 8) AS kept " +
        "FROM l) " +
        "SELECT doc_id, CAST(len(segs) AS BIGINT) AS n_segments, " +
        "CAST(len(kept) AS BIGINT) AS n_kept, " +
        "coalesce(array_to_string(kept, ' | '), '') AS cleaned " +
        "FROM k ORDER BY doc_id"),
      (s, dir) =>
        tbl(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " the ").as("segs"))
          .withColumn("kept", filter(col("segs"), seg =>
            size(filter(split(seg, " "), w => w =!= "")) >= 8))
          .select(col("doc_id"),
            size(col("segs")).cast("long").as("n_segments"),
            size(col("kept")).cast("long").as("n_kept"),
            array_join(col("kept"), " | ").as("cleaned"))
          .orderBy("doc_id")),

    // ---- paragraph-level dedup -------------------------------------------

    // Sub-document dedup: explode docs into positional segments, keep only
    // the globally FIRST occurrence of each distinct segment (by doc_id,
    // ONION-STYLE DUPLICATED-N-GRAM GATING (r9): gate each document by
    // the fraction of its distinct 5-grams that appear in ANY other
    // document — the cross-document duplication rate MassiveText/Gopher
    // filter on (public: Rae et al. 2021 §A.1.2; the "onion" dedup of
    // Pomikálek 2011). Distinct from the pairwise dedup family: no pair
    // is ever formed — and no per-gram frequency JOINS BACK to the gram
    // stream either. The identity dup = total − owned does it with two
    // independent reduces: a gram appears in exactly one doc ⟺ its
    // group has count 1, and that group's max(doc_id) IS the owner, so
    // the gram-keyed reduce (map-side combined) directly yields per-doc
    // unique-gram counts; the ORACLE states the textbook df-join form.
    // (A first cut checkpointed the gram stream and joined df back —
    // the k=100 probe measured 65 s at slope 10.6; this shape measures
    // 0.7 s at the same k=100, each gram shuffled once and reduced
    // map-side.) Docs shorter than
    // the gram width carry no evidence and are kept. Per-source summary
    // output (drop share + mean duplication ppm), domain-bounded.
    Q("dedup_onion_ngram",
      Some {
        import graft.functions.{DedupSketches => DS}
        s"""WITH sh AS (${DS.shinglesSql(5)}),
           |df AS (SELECT shingle, CAST(count(*) AS BIGINT) AS nd
           |  FROM sh GROUP BY 1),
           |perdoc AS (
           |  SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS total,
           |    CAST(sum(CASE WHEN df.nd >= 2 THEN 1 ELSE 0 END)
           |      AS BIGINT) AS dup
           |  FROM sh JOIN df USING (shingle) GROUP BY 1),
           |gated AS (
           |  SELECT d.doc_id, d.source,
           |    coalesce(p.dup * 1000000 // p.total, 0) AS dup_ppm
           |  FROM documents d LEFT JOIN perdoc p USING (doc_id))
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(CASE WHEN dup_ppm > 500000 THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_dropped,
           |  CAST(sum(dup_ppm) // count(*) AS BIGINT) AS mean_dup_ppm
           |FROM gated GROUP BY source ORDER BY source
           |""".stripMargin
      },
      (s, dir) => {
        import graft.functions.{DedupSketches => DS}
        val docs = tbl(s, dir, "documents")
        val sh = DS.shingles(docs, 5) // map-side explode, recomputed by
                                      // both reduces (cheaper than
                                      // materializing the gram stream)
        val total = sh.groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("total"))
        // count-1 gram groups: max(doc_id) is the sole owner — per-doc
        // OWNED counts without ever joining frequencies back
        val owned = sh.groupBy("shingle")
          .agg(count(lit(1)).as("nd"), max(col("doc_id")).as("doc_id"))
          .filter(col("nd") === 1)
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("uniq"))
        val gated = docs.select("doc_id", "source")
          .join(total, Seq("doc_id"), "left")
          .join(owned, Seq("doc_id"), "left")
          .select(col("source"),
            coalesce(
              expr("(total - coalesce(uniq, 0)) * 1000000 div total"),
              lit(0L)).as("dup_ppm"))
        gated.groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(when(col("dup_ppm") > 500000, 1L).otherwise(0L))
              .cast("long").as("n_dropped"),
            expr("CAST(sum(dup_ppm) div count(1) AS BIGINT)")
              .as("mean_dup_ppm"))
          .orderBy("source")
      }),

    // then position), reassemble survivors in document order. One shuffle
    // on the segment hash — linear, the keep-first shape of `dedup_exact`
    // applied below document granularity (what C4/CCNet do to boilerplate
    // paragraphs shared across pages).
    Q("dedup_paragraph",
      Some("WITH l AS (SELECT doc_id, string_split(text, ' the ') AS segs " +
        "FROM documents), " +
        "p AS (SELECT doc_id, unnest(range(0, len(segs))) AS pos, segs FROM l), " +
        "sg AS (SELECT doc_id, pos, segs[pos + 1] AS seg FROM p " +
        "WHERE segs[pos + 1] <> ''), " +
        "first AS (SELECT doc_id, pos, seg FROM sg QUALIFY row_number() OVER " +
        "(PARTITION BY md5(seg) ORDER BY doc_id, pos) = 1), " +
        "agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept, " +
        "string_agg(seg, ' | ' ORDER BY pos) AS cleaned FROM first GROUP BY doc_id), " +
        "tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_total FROM sg " +
        "GROUP BY doc_id) " +
        "SELECT d.doc_id, coalesce(t.n_total, 0) AS n_total, " +
        "coalesce(a.n_kept, 0) AS n_kept, coalesce(a.cleaned, '') AS cleaned " +
        "FROM documents d LEFT JOIN tot t ON d.doc_id = t.doc_id " +
        "LEFT JOIN agg a ON d.doc_id = a.doc_id ORDER BY d.doc_id"),
      (s, dir) => {
        val d = tbl(s, dir, "documents")
        val sg = d.select(col("doc_id"),
            posexplode(split(col("text"), " the ")).as(Seq("pos", "seg")))
          .filter(col("seg") =!= "")
        val w = Window.partitionBy(md5(col("seg"))).orderBy("doc_id", "pos")
        val first = sg.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
        val agg = first.groupBy("doc_id")
          .agg(count(lit(1)).as("n_kept"),
            array_join(transform(array_sort(
                collect_list(struct(col("pos"), col("seg")))),
              x => x.getField("seg")), " | ").as("cleaned"))
        val tot = sg.groupBy("doc_id").agg(count(lit(1)).as("n_total"))
        d.select("doc_id")
          .join(tot, Seq("doc_id"), "left")
          .join(agg, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_total"), lit(0L)).as("n_total"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            coalesce(col("cleaned"), lit("")).as("cleaned"))
          .orderBy("doc_id")
      }),

    // ---- BPE vocabulary-induction step -----------------------------------

    // One distributed BPE training iteration: count adjacent token pairs
    // corpus-wide (partial-agg bigram counts — map-side combine, one
    // shuffle), pick the most frequent pair, apply the merge to every doc
    // and report the per-doc merge effect. The merge application uses a
    // boundary-doubling trick ('#tok#' wrapping with '##' separators) so
    // plain left-to-right non-overlapping replace() — identical in Spark
    // and DuckDB — realizes exactly BPE's greedy merge ('#' never occurs
    // in the corpus). At 100 TB: bigram counting is the q1 aggregation
    // shape; the merge is a broadcast(1 row) + map stage.
    Q("vocab_bpe_merge",
      Some("WITH tk AS (SELECT doc_id, unnest(range(0, len(ts))) AS pos, ts " +
        "FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)), " +
        "tok AS (SELECT doc_id, pos, ts[pos + 1] AS tok FROM tk), " +
        "pr AS (SELECT doc_id, tok AS a, lead(tok) OVER " +
        "(PARTITION BY doc_id ORDER BY pos) AS b FROM tok), " +
        "cnt AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM pr " +
        "WHERE b IS NOT NULL GROUP BY a, b), " +
        "top AS (SELECT a, b, c FROM cnt ORDER BY c DESC, a, b LIMIT 1), " +
        "m AS (SELECT doc_id, '#' || replace(text, ' ', '##') || '#' AS s, " +
        "a, b, c, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens " +
        "FROM documents, top) " +
        "SELECT doc_id, a AS merge_a, b AS merge_b, c AS pair_count, n_tokens, " +
        "CAST(length(s) - length(replace(s, '#' || a || '##' || b || '#', " +
        "'#' || a || '_' || b || '#')) AS BIGINT) AS n_merges, " +
        "n_tokens - CAST(length(s) - length(replace(s, '#' || a || '##' || b || '#', " +
        "'#' || a || '_' || b || '#')) AS BIGINT) AS n_after " +
        "FROM m ORDER BY doc_id"),
      (s, dir) => {
        val d = tbl(s, dir, "documents")
        val tok = d.select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        val wDoc = Window.partitionBy("doc_id").orderBy("pos")
        val top = tok
          .withColumn("b", lead(col("tok"), 1).over(wDoc))
          .filter(col("b").isNotNull)
          .groupBy(col("tok").as("a"), col("b"))
          .agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("a"), col("b")).limit(1)
        val wrapped = concat(lit("#"),
          replace(col("text"), lit(" "), lit("##")), lit("#"))
        val pat = concat(lit("#"), col("a"), lit("##"), col("b"), lit("#"))
        val rep = concat(lit("#"), col("a"), lit("_"), col("b"), lit("#"))
        d.crossJoin(broadcast(top))
          .withColumn("s", wrapped)
          .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
          .withColumn("n_merges",
            (length(col("s")) - length(replace(col("s"), pat, rep))).cast("long"))
          .select(col("doc_id"), col("a").as("merge_a"), col("b").as("merge_b"),
            col("c").as("pair_count"), col("n_tokens"), col("n_merges"),
            (col("n_tokens") - col("n_merges")).as("n_after"))
          .orderBy("doc_id")
      }),

    // Multi-round BPE training: THREE chained merge iterations, each
    // counting corpus-wide bigrams (partial-agg shuffle), broadcasting the
    // winning pair, and rewriting every document via the boundary-doubling
    // replace() (see vocab_bpe_merge). The Spark loop localCheckpoints the
    // rewritten corpus between rounds (lineage truncation — the iterative-
    // loop rule) and caches each round's 1-row winner; the oracle chains
    // the identical three rounds as CTEs. Output: the learned merge table
    // (round, pair, count) — a real distributed tokenizer-training step.
    Q("vocab_bpe_train", Some {
      def round(i: Int): String = {
        val prev = s"d${i - 1}"
        s"t$i AS (SELECT doc_id, string_split(trim(s, '#'), '##') AS ts FROM $prev), " +
          s"u$i AS (SELECT doc_id, unnest(range(0, len(ts))) AS pos, ts FROM t$i), " +
          s"k$i AS (SELECT doc_id, pos, ts[pos + 1] AS tok FROM u$i), " +
          s"p$i AS (SELECT tok AS a, lead(tok) OVER " +
          s"(PARTITION BY doc_id ORDER BY pos) AS b FROM k$i), " +
          s"c$i AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM p$i " +
          s"WHERE b IS NOT NULL GROUP BY 1, 2), " +
          s"m$i AS (SELECT a, b, c FROM c$i ORDER BY c DESC, a, b LIMIT 1), " +
          s"d$i AS (SELECT doc_id, replace(s, '#' || a || '##' || b || '#', " +
          s"'#' || a || '_' || b || '#') AS s FROM $prev, m$i)"
      }
      "WITH d0 AS (SELECT doc_id, '#' || replace(text, ' ', '##') || '#' AS s " +
        "FROM documents), " +
        (1 to 3).map(round).mkString(", ") + " " +
        "SELECT * FROM (" +
        "SELECT 1 AS round, a AS merge_a, b AS merge_b, c AS pair_count FROM m1 " +
        "UNION ALL SELECT 2, a, b, c FROM m2 " +
        "UNION ALL SELECT 3, a, b, c FROM m3) ORDER BY round"
    },
      (s, dir) => {
        val wDoc = Window.partitionBy("doc_id").orderBy("pos")
        var docs = tbl(s, dir, "documents")
          .select(col("doc_id"),
            concat(lit("#"), replace(col("text"), lit(" "), lit("##")), lit("#"))
              .as("s"))
          .localCheckpoint()
        var rounds = Vector.empty[org.apache.spark.sql.DataFrame]
        var spent = Vector.empty[org.apache.spark.sql.DataFrame]
        for (i <- 1 to 3) {
          val top = docs
            .select(col("doc_id"),
              posexplode(split(regexp_replace(col("s"), "^#|#$", ""), "##"))
                .as(Seq("pos", "tok")))
            .withColumn("b", lead(col("tok"), 1).over(wDoc))
            .filter(col("b").isNotNull)
            .groupBy(col("tok").as("a"), col("b"))
            .agg(count(lit(1)).as("c"))
            .orderBy(col("c").desc, col("a"), col("b")).limit(1)
            .localCheckpoint() // 1 row; forces the round's shuffle once
          rounds :+= top.withColumn("round", lit(i))
          val prev = docs
          docs = docs.crossJoin(broadcast(top.select(col("a"), col("b"))))
            .withColumn("s", replace(col("s"),
              concat(lit("#"), col("a"), lit("##"), col("b"), lit("#")),
              concat(lit("#"), col("a"), lit("_"), col("b"), lit("#"))))
            .select("doc_id", "s")
            .localCheckpoint()
          spent :+= prev
        }
        graft.H.materialized(
          rounds.reduce(_ unionAll _)
            .select(col("round"), col("a").as("merge_a"), col("b").as("merge_b"),
              col("c").as("pair_count"))
            .orderBy("round"),
          caches = Nil, checkpoints = (spent :+ docs) ++ rounds)
      }),

    // ---- cosine radius search --------------------------------------------

    // Range variant of sim_cosine_topk: ALL corpus vectors within a cosine
    // radius of each query vector (dedup-threshold / recall-set shape,
    // where top-k's fixed k is wrong). Broadcast queries x linear scan;
    // fused native cosine, bit-identical to the oracle's unrolled form.
    // Oracle memory discipline (r7 verdict #1): the 3-row query side is
    // MATERIALIZED into its own CTE before the join fan-out, and the
    // unrolled 64-term cosine is computed ONCE in a sims projection then
    // filtered — DuckDB never plans the n x n frame and never evaluates
    // the big expression twice per row.
    Q("sim_range_search",
      Some("WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        s"n AS (SELECT vec_id, v, (${VS.norm2Sql("v")}) AS nrm FROM e), " +
        "qv AS MATERIALIZED (SELECT vec_id, v, nrm FROM n WHERE vec_id IN (3, 17, 42)), " +
        "sims AS (SELECT q.vec_id AS qid, c.vec_id AS vid, " +
        s"(${VS.dotSql("q.v", "c.v")}) / (sqrt(q.nrm) * sqrt(c.nrm)) AS sim " +
        "FROM qv q, n c WHERE c.vec_id <> q.vec_id) " +
        "SELECT qid, vid, sim FROM sims WHERE sim >= 0.25 ORDER BY qid, vid"),
      (s, dir) => {
        val e = tbl(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val q = e.select(col("vec_id").as("qid"), col("v").as("qv"))
          .filter(col("qid").isin(3, 17, 42))
        val c = e.select(col("vec_id").as("vid"), col("v").as("cv"))
        c.join(broadcast(q), col("vid") =!= col("qid"))
          .withColumn("sim",
            graft.functions.CustomExpressions.cosine_sim(col("qv"), col("cv")))
          .filter(col("sim") >= 0.25)
          .select("qid", "vid", "sim").orderBy("qid", "vid")
      }))
}
