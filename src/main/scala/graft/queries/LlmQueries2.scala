package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, QueryModule}
import graft.H.tbl
import graft.functions.{VectorSim => VS}

/** Second wave of LLM-pipeline operators: IVF-style ANN (the scale path
  * beyond hyperplane LSH), embedding-cosine near-dup detection, and BPE-ish
  * subword token counting.
  */
object LlmQueries2 extends QueryModule {

  def all: Seq[Q] = Seq(

    // IVF: assign every vector to its nearest "centroid" (deterministic
    // seed set: vec_id < 8), then answer queries by probing only the
    // query's own cell — the inverted-file shape where search cost follows
    // cell size, not corpus size.
    Q("sim_ivf_topk",
      Some("WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        s"n AS (SELECT vec_id, v, (${VS.norm2Sql("v")}) AS nrm FROM e), " +
        "cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8), " +
        "assign AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id " +
        s"ORDER BY (${VS.ssdSql("n.v", "cent.cv")}), cid) AS arn " +
        "FROM n, cent), " +
        "cells AS (SELECT n.vec_id, n.v, n.nrm, a.cid AS cell " +
        "FROM n JOIN assign a ON a.vec_id = n.vec_id AND a.arn = 1), " +
        "p AS (SELECT q.vec_id AS qid, c.vec_id AS vid, " +
        s"(${VS.dotSql("q.v", "c.v")}) / (sqrt(q.nrm) * sqrt(c.nrm)) AS sim " +
        "FROM cells q JOIN cells c ON q.cell = c.cell AND c.vec_id <> q.vec_id " +
        "WHERE q.vec_id < 10) " +
        "SELECT qid, vid, CAST(row_number() OVER " +
        "(PARTITION BY qid ORDER BY sim DESC, vid) AS BIGINT) AS rnk, sim " +
        "FROM p QUALIFY rnk <= 3 ORDER BY qid, rnk"),
      (s, dir) => {
        import graft.functions.{CustomExpressions => CE}
        val e = tbl(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val cent = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("v").as("cv"))
        val aw = Window.partitionBy("vec_id").orderBy(col("ssd"), col("cid"))
        // fused native distance/cosine: bit-identical to the unrolled oracle
        val assign = e.join(broadcast(cent))
          .withColumn("ssd", CE.squared_distance(col("v"), col("cv")))
          .withColumn("arn", row_number().over(aw))
          .filter(col("arn") === 1)
          .select(col("vec_id"), col("cid").as("cell"))
        val cells = e.join(assign, "vec_id").cache()
        val q = cells.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("v").as("qv"), col("cell"))
        val c = cells.select(col("vec_id").as("vid"), col("v").as("cv"),
          col("cell").as("cell_c"))
        val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vid"))
        graft.H.materialized(
          c.join(broadcast(q), col("cell") === col("cell_c") && col("vid") =!= col("qid"))
            .withColumn("sim", CE.cosine_sim(col("qv"), col("cv")))
            .withColumn("rnk", row_number().over(w).cast("long"))
            .filter(col("rnk") <= 3)
            .select("qid", "vid", "rnk", "sim").orderBy("qid", "rnk"),
          caches = Seq(cells))
      }),

    // Embedding-cosine near-dup: candidates from hyperplane-bucket
    // co-residency (never all-pairs), verified sim >= 0.4.
    Q("dedup_embedding_cosine",
      Some(s"WITH ${VS.skewCappedCtesSql}, " +
        "p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, " +
        s"(${VS.dotSql("a.v", "b.v")}) / (sqrt(a.nrm) * sqrt(b.nrm)) AS sim " +
        "FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id) " +
        "SELECT vec_a, vec_b, sim FROM p WHERE sim >= 0.4 ORDER BY vec_a, vec_b"),
      (s, dir) => {
        import graft.functions.{CustomExpressions => CE}
        val e = tbl(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        // skew-capped join keys (== the oracle's plain 8-plane buckets at
        // every gate SF; mega-buckets split on longer prefixes at corpus
        // scale — see VS.skewCappedKey). count() is a metadata job.
        val (nk, sigCk) = VS.skewCappedKey(e, "v", e.count(), "bucket")
        val n = nk.cache()
        val a = n.select(col("vec_id").as("vec_a"), col("v").as("av"),
          col("bucket"))
        val b = n.select(col("vec_id").as("vec_b"), col("v").as("bv"),
          col("bucket").as("bucket_b"))
        graft.H.materialized(
          a.join(b, col("bucket") === col("bucket_b") && col("vec_a") < col("vec_b"))
            .withColumn("sim", CE.cosine_sim(col("av"), col("bv")))
            .filter(col("sim") >= 0.4)
            .select("vec_a", "vec_b", "sim").orderBy("vec_a", "vec_b"),
          caches = Seq(n), checkpoints = Seq(sigCk))
      }),

    // Multimodal resize + feature-extract over TRUE pixels: each doc is
    // wrapped in a REAL PNG (zlib stream, scanline filters cycling all 5
    // spec types, two IDAT chunks), the decoder inflates + unfilters the
    // container bytes back to the raster, and "resize" subsamples every
    // 4th pixel byte. The oracle predicts the decoded pixels closed-form
    // (byte i = (i*31 + doc_id) % 256), so any codec bug — filter math,
    // zlib reassembly, chunk walk — breaks the hash.
    Q("multimodal_transform",
      Some("SELECT doc_id, CAST(len(vs) AS BIGINT) AS n_px, " +
        "md5(array_to_string(vs, ',')) AS px_md5, " +
        "CAST(list_sum(vs) AS BIGINT) AS px_sum, " +
        "CAST(list_min(vs) AS BIGINT) AS px_min, " +
        "CAST(list_max(vs) AS BIGINT) AS px_max FROM " +
        "(SELECT doc_id, list_transform(range(0, " +
        "(1 + doc_id % 32) * (1 + (doc_id * 7 + octet_length(encode(text))) % 32) * 3, " +
        "4), i -> (i * 31 + doc_id) % 256) AS vs FROM documents) " +
        "ORDER BY doc_id"),
      (s, dir) =>
        graft.functions.Multimodal.transform(s, tbl(s, dir, "documents"))
          .toDF().orderBy("doc_id")),

    // The JPEG sibling of multimodal_transform: each doc becomes a REAL
    // baseline grayscale JPEG (Annex K Huffman tables on the wire, DC-diff
    // coding, 0xFF00 stuffing) whose 8x8 blocks are constant-valued — a
    // pattern the DCT round-trips exactly — and the full decoder (marker
    // walk -> Huffman -> dequant -> IDCT -> clamp -> crop) recovers the
    // raster from container bytes alone. Dimensions avoid multiples of 8
    // so edge cropping runs on every image. The oracle predicts pixel
    // (x, y) = (doc_id*11 + (x//8)*37 + (y//8)*101) % 256 closed-form.
    Q("multimodal_jpeg",
      Some("WITH dims AS (SELECT doc_id, 5 + doc_id % 28 AS w, " +
        "5 + (doc_id * 5 + octet_length(encode(text))) % 28 AS h " +
        "FROM documents), " +
        "px AS (SELECT doc_id, list_transform(range(0, w * h), " +
        "i -> (doc_id * 11 + ((i % w) // 8) * 37 + ((i // w) // 8) * 101) % 256) " +
        "AS vs FROM dims) " +
        "SELECT doc_id, CAST(len(vs) AS BIGINT) AS n_px, " +
        "md5(array_to_string(vs, ',')) AS px_md5, " +
        "CAST(list_sum(vs) AS BIGINT) AS px_sum, " +
        "CAST(list_min(vs) AS BIGINT) AS px_min, " +
        "CAST(list_max(vs) AS BIGINT) AS px_max FROM px ORDER BY doc_id"),
      (s, dir) =>
        graft.functions.Multimodal.transformJpeg(s, tbl(s, dir, "documents"))
          .toDF().orderBy("doc_id")),

    // The audio leg of the multimodal family: each doc becomes a real
    // RIFF/WAVE container (PCM-16 mono, little-endian chunk sizes, an
    // odd-sized ancillary chunk forcing word-alignment handling) with
    // closed-form samples; the decoder walks the chunks from bytes alone
    // and the integer feature aggregates are oracle-exact.
    Q("multimodal_audio",
      Some("WITH dims AS (SELECT doc_id, " +
        "64 + (doc_id * 3 + octet_length(encode(text))) % 192 AS n " +
        "FROM documents), " +
        "pcm AS (SELECT doc_id, list_transform(range(0, n), " +
        "i -> (doc_id * 7 + i * 13) % 65536 - 32768) AS vs FROM dims) " +
        "SELECT doc_id, CAST(8000 AS BIGINT) AS sample_rate, " +
        "CAST(len(vs) AS BIGINT) AS n_samples, " +
        "md5(array_to_string(vs, ',')) AS pcm_md5, " +
        "CAST(list_sum(vs) AS BIGINT) AS pcm_sum, " +
        "CAST(list_min(vs) AS BIGINT) AS pcm_min, " +
        "CAST(list_max(vs) AS BIGINT) AS pcm_max FROM pcm ORDER BY doc_id"),
      (s, dir) =>
        graft.functions.Multimodal.transformAudio(s, tbl(s, dir, "documents"))
          .toDF().orderBy("doc_id")),

    // The video leg: each doc becomes a real Motion-JPEG AVI (RIFF walk,
    // LIST hdrl/movi, word alignment, avih cross-check) whose frames are
    // baseline JPEGs; frame sampling keeps every 2nd frame before exact
    // feature aggregates. Container walk + per-frame codec + stride
    // sampling, the standard video-pipeline shape, all oracle-exact.
    Q("multimodal_video",
      Some("WITH dims AS (SELECT doc_id, 5 + doc_id % 28 AS w, " +
        "5 + (doc_id * 5 + octet_length(encode(text))) % 28 AS h, " +
        "2 + doc_id % 4 AS nf FROM documents), " +
        "px AS (SELECT doc_id, nf, flatten(list_transform(range(0, nf, 2), " +
        "f -> list_transform(range(0, w * h), " +
        "i -> (doc_id * 11 + f * 59 + ((i % w) // 8) * 37 + ((i // w) // 8) * 101) % 256))) " +
        "AS vs FROM dims) " +
        "SELECT doc_id, CAST(nf AS BIGINT) AS n_frames, " +
        "CAST(len(vs) AS BIGINT) AS n_px, " +
        "md5(array_to_string(vs, ',')) AS px_md5, " +
        "CAST(list_sum(vs) AS BIGINT) AS px_sum, " +
        "CAST(list_min(vs) AS BIGINT) AS px_min, " +
        "CAST(list_max(vs) AS BIGINT) AS px_max FROM px ORDER BY doc_id"),
      (s, dir) =>
        graft.functions.Multimodal.transformVideo(s, tbl(s, dir, "documents"))
          .toDF().orderBy("doc_id")),

    // Fuzzy matching: edit distance over CANDIDATE pairs only. Candidates
    // come from MinHash-band buckets (3-gram shingles, the near-dup
    // generator) narrowed by a ±40-char length band — both prefilters are
    // cheap and scale-linear, so the per-pair DP (bounded to a 60-char
    // prefix) runs on O(candidates), never O(|bucket|²).
    Q("text_edit_distance",
      Some {
        import graft.functions.{DedupSketches => DS}
        s"WITH sh AS (${DS.shinglesSql(3)}), " +
          s"sig AS (${DS.minhashSignatureSql}), " +
          s"bands AS (${DS.lshBandsSql}), " +
          s"cand AS (${DS.candidatePairsSql}) " +
          "SELECT c.doc_a, c.doc_b, " +
          "CAST(levenshtein(substr(a.text, 1, 60), substr(b.text, 1, 60)) AS BIGINT) AS edit_dist " +
          "FROM cand c JOIN documents a ON a.doc_id = c.doc_a " +
          "JOIN documents b ON b.doc_id = c.doc_b " +
          "WHERE abs(length(a.text) - length(b.text)) <= 40 " +
          "ORDER BY doc_a, doc_b"
      },
      (s, dir) => {
        import graft.functions.{DedupSketches => DS}
        val docs = tbl(s, dir, "documents")
        // cached: the candidate self-join reads the band frame twice
        val sig = DS.minhashSignature(DS.shingles(docs, 3)).cache()
        val cand = DS.candidatePairs(DS.lshBands(sig))
        val a = docs.select(col("doc_id").as("doc_a"),
          substring(col("text"), 1, 60).as("head_a"),
          length(col("text")).as("len_a"))
        val b = docs.select(col("doc_id").as("doc_b"),
          substring(col("text"), 1, 60).as("head_b"),
          length(col("text")).as("len_b"))
        graft.H.materialized(
          cand.join(a, "doc_a").join(b, "doc_b")
            .filter(abs(col("len_a") - col("len_b")) <= 40)
            .select(col("doc_a"), col("doc_b"),
              levenshtein(col("head_a"), col("head_b")).cast("long").as("edit_dist"))
            .orderBy("doc_a", "doc_b"),
          caches = Seq(sig))
      }),

    // Dedup GROUP resolution: verified near-dup pairs (MinHash candidates,
    // exact Jaccard >= 0.5) clustered into connected components; the min
    // doc_id is the canonical survivor. This is the step that turns pair
    // lists into an actionable keep/drop decision. Oracle: DuckDB recursive
    // CTE computing min-reachable-id over the same edge set.
    Q("dedup_groups",
      Some {
        import graft.functions.{DedupSketches => DS}
        s"WITH RECURSIVE sh AS (${DS.shinglesSql(3)}), " +
          s"sig AS (${DS.minhashSignatureSql}), " +
          s"bands AS (${DS.lshBandsSql}), " +
          s"cand AS (${DS.candidatePairsSql}), " +
          "counts AS (SELECT doc_id, n FROM sig), " +
          "inter AS (SELECT doc_a, doc_b, count(*) AS ni FROM cand " +
          "JOIN sh sa ON sa.doc_id = doc_a " +
          "JOIN sh sb ON sb.doc_id = doc_b AND sb.shingle = sa.shingle " +
          "GROUP BY doc_a, doc_b), " +
          "pairs AS (SELECT c.doc_a, c.doc_b FROM cand c " +
          "JOIN counts ca ON ca.doc_id = c.doc_a " +
          "JOIN counts cb ON cb.doc_id = c.doc_b " +
          "LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b " +
          "WHERE CAST(coalesce(ni, 0) AS DOUBLE) / " +
          "CAST(ca.n + cb.n - coalesce(ni, 0) AS DOUBLE) >= 0.5), " +
          "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs " +
          "UNION ALL SELECT doc_b, doc_a FROM pairs), " +
          "reach AS (SELECT src AS node, src AS root FROM edges " +
          "UNION SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node) " +
          "SELECT node AS doc_id, min(root) AS canonical_id, " +
          "CAST(node = min(root) AS INTEGER) AS is_canonical " +
          "FROM reach GROUP BY node ORDER BY doc_id"
      },
      (s, dir) => {
        import graft.functions.{DedupSketches => DS}
        val sh = DS.shingles(tbl(s, dir, "documents"), 3).cache()
        val sig = DS.minhashSignature(sh).cache()
        // checkpointed: double-referenced inside verifiedJaccard (see
        // dedup_minhash_lsh for why localCheckpoint, not cache)
        val cand = DS.candidatePairs(DS.lshBands(sig)).localCheckpoint()
        val pairs = DS.verifiedJaccard(cand, sh, Some(sig.select(col("doc_id"), col("n"))))
          .filter(col("jaccard") >= 0.5).select("doc_a", "doc_b")
        val labels = DS.connectedComponents(pairs)
        graft.H.materialized(
          labels
            .select(col("node").as("doc_id"), col("label").as("canonical_id"),
              (col("node") === col("label")).cast("int").as("is_canonical"))
            .orderBy("doc_id"),
          caches = Seq(sh, sig), checkpoints = Seq(labels, cand))
      }),

    // CAPSTONE: the end-to-end training-set selection a real data pipeline
    // materializes — every document gets a keep/drop decision composed from
    // (a) the quality score and (b) near-dup group resolution (non-canonical
    // members of a verified near-dup component are dropped). One pass
    // composes the same building blocks the individual queries verify.
    Q("pipeline_training_select",
      Some {
        import graft.functions.{DedupSketches => DS, TextAnalysis => TA}
        val toks = "string_split(text, ' ')"
        val hits = TA.hitCountSql(toks, TA.stopwords.head._2)
        val qscore =
          s"CAST((CASE WHEN len($toks) BETWEEN 20 AND 200 THEN 1 ELSE 0 END) + " +
            s"(CASE WHEN CAST($hits AS DOUBLE) / CAST(len($toks) AS DOUBLE) < 0.4 THEN 1 ELSE 0 END) + " +
            s"(CASE WHEN CAST(len(list_distinct($toks)) AS DOUBLE) / CAST(len($toks) AS DOUBLE) > 0.3 " +
            "THEN 1 ELSE 0 END) AS BIGINT)"
        s"WITH RECURSIVE sh AS (${DS.shinglesSql(3)}), " +
          s"sig AS (${DS.minhashSignatureSql}), " +
          s"bands AS (${DS.lshBandsSql}), " +
          s"cand AS (${DS.candidatePairsSql}), " +
          "counts AS (SELECT doc_id, n FROM sig), " +
          "inter AS (SELECT doc_a, doc_b, count(*) AS ni FROM cand " +
          "JOIN sh sa ON sa.doc_id = doc_a " +
          "JOIN sh sb ON sb.doc_id = doc_b AND sb.shingle = sa.shingle " +
          "GROUP BY doc_a, doc_b), " +
          "pairs AS (SELECT c.doc_a, c.doc_b FROM cand c " +
          "JOIN counts ca ON ca.doc_id = c.doc_a " +
          "JOIN counts cb ON cb.doc_id = c.doc_b " +
          "LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b " +
          "WHERE CAST(coalesce(ni, 0) AS DOUBLE) / " +
          "CAST(ca.n + cb.n - coalesce(ni, 0) AS DOUBLE) >= 0.5), " +
          "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs " +
          "UNION ALL SELECT doc_b, doc_a FROM pairs), " +
          "reach AS (SELECT src AS node, src AS root FROM edges " +
          "UNION SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node), " +
          "grp AS (SELECT node AS doc_id, min(root) AS canonical_id " +
          "FROM reach GROUP BY node), " +
          s"q AS (SELECT doc_id, $qscore AS quality_score FROM documents) " +
          "SELECT d.doc_id, q.quality_score, " +
          "coalesce(g.canonical_id, d.doc_id) AS canonical_id, " +
          "CASE WHEN g.doc_id IS NOT NULL AND g.canonical_id <> d.doc_id " +
          "THEN 'drop_duplicate' " +
          "WHEN q.quality_score < 2 THEN 'drop_low_quality' " +
          "ELSE 'keep' END AS decision " +
          "FROM documents d JOIN q ON q.doc_id = d.doc_id " +
          "LEFT JOIN grp g ON g.doc_id = d.doc_id " +
          "ORDER BY d.doc_id"
      },
      (s, dir) => {
        import graft.functions.{DedupSketches => DS, TextAnalysis => TA}
        val docs = tbl(s, dir, "documents")
        val q = docs.withColumn("toks", TA.tokens(col("text")))
          .withColumn("n_tokens", size(col("toks")).cast("long"))
          .withColumn("hits", TA.hitCount(col("toks"), TA.stopwords.head._2))
          .withColumn("stop_ratio",
            col("hits").cast("double") / col("n_tokens").cast("double"))
          .withColumn("ttr",
            size(array_distinct(col("toks"))).cast("double") /
              col("n_tokens").cast("double"))
          .select(col("doc_id"),
            (when(col("n_tokens").between(20, 200), 1).otherwise(0) +
              when(col("stop_ratio") < 0.4, 1).otherwise(0) +
              when(col("ttr") > 0.3, 1).otherwise(0)).cast("long")
              .as("quality_score"))
        val sh = DS.shingles(docs, 3).cache()
        val sig = DS.minhashSignature(sh).cache()
        // checkpointed: double-referenced inside verifiedJaccard (see
        // dedup_minhash_lsh for why localCheckpoint, not cache)
        val cand = DS.candidatePairs(DS.lshBands(sig)).localCheckpoint()
        val pairs = DS.verifiedJaccard(cand, sh,
            Some(sig.select(col("doc_id"), col("n"))))
          .filter(col("jaccard") >= 0.5).select("doc_a", "doc_b")
        val labels = DS.connectedComponents(pairs)
        val grp = labels
          .select(col("node").as("doc_id"), col("label").as("canonical_id"))
        graft.H.materialized(
          q.join(grp, Seq("doc_id"), "left")
            .select(col("doc_id"), col("quality_score"),
              coalesce(col("canonical_id"), col("doc_id")).as("canonical_id"),
              when(col("canonical_id").isNotNull &&
                  col("canonical_id") =!= col("doc_id"), "drop_duplicate")
                .when(col("quality_score") < 2, "drop_low_quality")
                .otherwise("keep").as("decision"))
            .orderBy("doc_id"),
          caches = Seq(sh, sig), checkpoints = Seq(labels, cand))
      }),

    // Benchmark decontamination: flag corpus documents sharing >= 3 distinct
    // word-3-grams with a "benchmark" set (fixture: doc_id < 5) — the
    // test-set leakage check every training pipeline runs before a corpus
    // ships. The benchmark shingle set is small by construction, so the
    // overlap join broadcasts; corpus-side cost is one shuffle-free probe
    // plus a per-doc count.
    Q("text_decontaminate",
      Some {
        import graft.functions.{DedupSketches => DS}
        s"WITH sh AS (${DS.shinglesSql(3)}), " +
          "bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 5), " +
          "corpus AS (SELECT * FROM sh WHERE doc_id >= 5), " +
          "ov AS (SELECT doc_id, count(*) AS n_overlap FROM corpus " +
          "JOIN bench USING (shingle) GROUP BY doc_id) " +
          "SELECT d.doc_id, coalesce(ov.n_overlap, 0) AS n_overlap, " +
          "CAST(coalesce(ov.n_overlap, 0) >= 3 AS INTEGER) AS contaminated " +
          "FROM (SELECT doc_id FROM documents WHERE doc_id >= 5) d " +
          "LEFT JOIN ov ON ov.doc_id = d.doc_id ORDER BY d.doc_id"
      },
      (s, dir) => {
        import graft.functions.{DedupSketches => DS}
        val docs = tbl(s, dir, "documents")
        val sh = DS.shingles(docs, 3)
        val bench = sh.filter(col("doc_id") < 5)
          .select("shingle").distinct()
        val ov = sh.filter(col("doc_id") >= 5)
          .join(broadcast(bench), "shingle")
          .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
        docs.filter(col("doc_id") >= 5).select("doc_id")
          .join(ov, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
            (coalesce(col("n_overlap"), lit(0L)) >= 3).cast("int")
              .as("contaminated"))
          .orderBy("doc_id")
      }),

    // tf-idf top terms per document with a RATIONAL idf (N/df instead of
    // log(N/df)): every factor is an integer-derived double division, so the
    // scores hash bit-identically across engines (log() is only 1-ulp
    // accurate and would drift). Same ranking behavior for top-k purposes.
    // Scale shape: two partial-agg shuffles (doc-term, term) + a broadcast
    // scalar N — no all-pairs anything.
    Q("text_tfidf",
      Some("WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term " +
        "FROM documents), " +
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2), " +
        "dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1), " +
        "df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1), " +
        "n AS (SELECT count(*) AS n FROM documents), " +
        "s AS (SELECT tf.doc_id, tf.term, " +
        "(CAST(tf AS DOUBLE) / CAST(dl AS DOUBLE)) * " +
        "(CAST(n AS DOUBLE) / CAST(df AS DOUBLE)) AS score " +
        "FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN n) " +
        "SELECT doc_id, term, score, CAST(row_number() OVER " +
        "(PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rnk " +
        "FROM s QUALIFY rnk <= 3 ORDER BY doc_id, rnk"),
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        val tok = docs.select(col("doc_id"),
          explode(split(col("text"), " ")).as("term"))
        // ONE pass over the exploded corpus; doc length and doc frequency
        // both derive from the (much smaller) tf aggregate
        val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf")).cache()
        val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
        val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
        graft.H.materialized(
          tf.join(dl, "doc_id").join(df, "term").crossJoin(broadcast(n))
            .withColumn("score",
              (col("tf").cast("double") / col("dl").cast("double")) *
                (col("n").cast("double") / col("df").cast("double")))
            .withColumn("rnk", row_number().over(w).cast("long"))
            .filter(col("rnk") <= 3)
            .select("doc_id", "term", "score", "rnk")
            .orderBy("doc_id", "rnk"),
          caches = Seq(tf))
      }),

    // BPE-ish token counting: whitespace words sub-chunked to <=4 chars
    // (an aggregate higher-order fn — no UDF, stays in codegen).
    Q("text_tokens_bpe",
      Some("SELECT doc_id, " +
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words, " +
        "CAST(list_sum(list_apply(string_split(text, ' '), " +
        "w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT) AS n_bpe_tokens " +
        "FROM documents ORDER BY doc_id"),
      (s, dir) =>
        tbl(s, dir, "documents")
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_words"),
            expr("aggregate(split(text, ' '), 0L, " +
              "(acc, w) -> acc + CAST(ceil(length(w) / 4.0) AS LONG))")
              .as("n_bpe_tokens"))
          .orderBy("doc_id")),

    // Containment near-dup (subset duplicates): |A∩B| / min(|A|,|B|) finds
    // a document mostly CONTAINED in another — quote-expansion and
    // boilerplate-wrapping cases where symmetric Jaccard stays low because
    // the larger doc dilutes the union. Same LSH candidate generator and
    // shingle-intersection verify as dedup_minhash_lsh (computed once,
    // never all-pairs); only the final ratio differs.
    Q("dedup_containment",
      Some {
        import graft.functions.{DedupSketches => DS}
        s"WITH sh AS (${DS.shinglesSql(3)}), " +
          s"sig AS (${DS.minhashSignatureSql}), " +
          s"bands AS (${DS.lshBandsSql}), " +
          s"cand AS (${DS.candidatePairsSql}), " +
          "counts AS (SELECT doc_id, n FROM sig), " +
          "inter AS (SELECT doc_a, doc_b, count(*) AS ni FROM cand " +
          "JOIN sh sa ON sa.doc_id = doc_a " +
          "JOIN sh sb ON sb.doc_id = doc_b AND sb.shingle = sa.shingle " +
          "GROUP BY doc_a, doc_b), " +
          "j AS (SELECT c.doc_a, c.doc_b, CAST(coalesce(ni, 0) AS DOUBLE) / " +
          "CAST(least(ca.n, cb.n) AS DOUBLE) AS containment " +
          "FROM cand c JOIN counts ca ON ca.doc_id = c.doc_a " +
          "JOIN counts cb ON cb.doc_id = c.doc_b " +
          "LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b) " +
          "SELECT doc_a, doc_b, containment FROM j WHERE containment >= 0.6 " +
          "ORDER BY doc_a, doc_b"
      },
      (s, dir) => {
        import graft.functions.{DedupSketches => DS}
        val sh = DS.shingles(tbl(s, dir, "documents"), 3).cache()
        val sig = DS.minhashSignature(sh).cache()
        // materialized ONCE via eager localCheckpoint: cand feeds BOTH the
        // intersection join and the scoring join (Spark does not CSE across
        // DAG branches), and .cache() is the WRONG fix here — a cached
        // subplan's output partitioning is frozen and AQE skew-splitting is
        // disabled inside the InMemoryRelation build (measured 3x slower at
        // 10x sf0.1), while a checkpoint runs the band join as a normal
        // AQE job and pins only the result blocks.
        val cand = DS.candidatePairs(DS.lshBands(sig)).localCheckpoint()
        val counts = sig.select(col("doc_id"), col("n"))
        val inter = cand
          .join(sh.select(col("doc_id").as("doc_a"), col("shingle")), Seq("doc_a"))
          .join(sh.select(col("doc_id").as("doc_b"), col("shingle")), Seq("doc_b", "shingle"))
          .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("ni"))
        val j = cand
          .join(counts.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
          .join(counts.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
          .join(inter, Seq("doc_a", "doc_b"), "left")
          .select(col("doc_a"), col("doc_b"),
            (coalesce(col("ni"), lit(0L)).cast("double") /
              least(col("na"), col("nb")).cast("double")).as("containment"))
        graft.H.materialized(
          j.filter(col("containment") >= 0.6)
            .select("doc_a", "doc_b", "containment").orderBy("doc_a", "doc_b"),
          caches = Seq(sh, sig), checkpoints = Seq(cand))
      }),

    // Product-quantization ANN (the memory-bound scale path beyond IVF/LSH):
    // vectors are encoded once as M=4 subspace codes (nearest of K=8
    // deterministic codebook entries per 16-dim slice — 4 small ints
    // instead of 64 doubles, a 128x memory cut at serving time). A query
    // precomputes its 4x8 asymmetric-distance table; scoring the corpus is
    // then a broadcast lookup join on (sub, code) + a fixed-order 4-term
    // add — no vector arithmetic per candidate at all. The per-(query,
    // vector) partial distances come back via single-valued max(CASE)
    // pivots, so the double addition order is frozen and engine-exact.
    Q("sim_pq_topk",
      Some {
        val ssdA = VS.ssdSqlN("a.sv", "c.cv", 16)
        val ssdQ = VS.ssdSqlN("q.sv", "c.cv", 16)
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
          "subs AS (SELECT vec_id, s.sub, v[s.sub*16+1 : s.sub*16+16] AS sv " +
          "FROM e, (SELECT unnest([0,1,2,3]) AS sub) s), " +
          "cent AS (SELECT sub, vec_id AS cid, sv AS cv FROM subs WHERE vec_id < 8), " +
          "assign AS (SELECT vec_id, sub, cid FROM (" +
          "SELECT a.vec_id, a.sub, c.cid, " +
          s"row_number() OVER (PARTITION BY a.vec_id, a.sub ORDER BY ($ssdA), c.cid) AS rn " +
          "FROM subs a JOIN cent c ON a.sub = c.sub) WHERE rn = 1), " +
          s"dtab AS (SELECT q.vec_id AS qid, c.sub, c.cid, ($ssdQ) AS ssd " +
          "FROM subs q JOIN cent c ON q.sub = c.sub WHERE q.vec_id < 10), " +
          "scores AS (SELECT d.qid, a.vec_id AS vid, " +
          "max(CASE WHEN a.sub = 0 THEN d.ssd END) + max(CASE WHEN a.sub = 1 THEN d.ssd END) " +
          "+ max(CASE WHEN a.sub = 2 THEN d.ssd END) + max(CASE WHEN a.sub = 3 THEN d.ssd END) AS adist " +
          "FROM assign a JOIN dtab d ON a.sub = d.sub AND a.cid = d.cid " +
          "WHERE a.vec_id <> d.qid GROUP BY d.qid, a.vec_id) " +
          "SELECT qid, vid, CAST(row_number() OVER " +
          "(PARTITION BY qid ORDER BY adist, vid) AS BIGINT) AS rnk, adist " +
          "FROM scores QUALIFY rnk <= 3 ORDER BY qid, rnk"
      },
      (s, dir) => {
        import graft.functions.{CustomExpressions => CE}
        val e = tbl(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val subs = e.select(col("vec_id"), posexplode(array(
            (0 until 4).map(sb => slice(col("v"), sb * 16 + 1, 16)): _*))
          .as(Seq("sub", "sv")))
        val cent = subs.filter(col("vec_id") < 8)
          .select(col("sub").as("c_sub"), col("vec_id").as("cid"), col("sv").as("cv"))
        val aw = Window.partitionBy("vec_id", "sub").orderBy(col("ssd"), col("cid"))
        val assign = subs.join(broadcast(cent), col("sub") === col("c_sub"))
          .withColumn("ssd", CE.squared_distance(col("sv"), col("cv")))
          .withColumn("rn", row_number().over(aw)).filter(col("rn") === 1)
          .select(col("vec_id"), col("sub"), col("cid"))
        val dtab = subs.filter(col("vec_id") < 10)
          .join(broadcast(cent), col("sub") === col("c_sub"))
          .select(col("vec_id").as("qid"), col("sub").as("d_sub"),
            col("cid").as("d_cid"),
            CE.squared_distance(col("sv"), col("cv")).as("ssd"))
        val w = Window.partitionBy("qid").orderBy(col("adist"), col("vid"))
        assign
          .join(broadcast(dtab),
            col("sub") === col("d_sub") && col("cid") === col("d_cid") &&
              col("vec_id") =!= col("qid"))
          .groupBy(col("qid"), col("vec_id").as("vid"))
          .agg((max(when(col("sub") === 0, col("ssd"))) +
            max(when(col("sub") === 1, col("ssd"))) +
            max(when(col("sub") === 2, col("ssd"))) +
            max(when(col("sub") === 3, col("ssd")))).as("adist"))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 3)
          .select("qid", "vid", "rnk", "adist")
          .orderBy("qid", "rnk")
      }))
}
