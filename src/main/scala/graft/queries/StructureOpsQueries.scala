package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Thirtieth wave: link/sequence structure — HITS hub/authority scoring,
  * top-k session paths, URL canonicalization, and Kneser-Ney-smoothed
  * bigram probabilities. The common discipline: every score the compare
  * path carries is an exact BIGINT (un-normalized integer HITS rounds,
  * path counts, exact KN numerators/denominators with one final safe
  * division) — no float accumulation anywhere.
  */
object StructureOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // HITS (Kleinberg) over the nation-level trade graph (same edge build
    // as graph_pagerank: customer-nation → supplier-nation, top-7 partners
    // per source). Two un-normalized rounds in EXACT integer arithmetic:
    // h0 = 1, a1 = indegree, h1 = Σ_out a1, a2 = Σ_in h1, h2 = Σ_out a2.
    // Normalization only rescales — rankings are identical — and skipping
    // it keeps every value a BIGINT (bounded by deg^4·n, far under 2^63
    // for any real partner graph). Each round is one edge-pass
    // aggregation: the scalable O(rounds · |E|) shape.
    Q("graph_hits",
      Some("WITH pairs AS (SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w " +
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey " +
        "JOIN customer c ON o.o_custkey = c.c_custkey " +
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey GROUP BY 1, 2), " +
        "edges AS (SELECT src, dst FROM (SELECT src, dst, " +
        "row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rk FROM pairs) WHERE rk <= 7), " +
        "a1 AS (SELECT dst AS id, CAST(count(*) AS BIGINT) AS a FROM edges GROUP BY dst), " +
        "h1 AS (SELECT e.src AS id, CAST(sum(a1.a) AS BIGINT) AS h " +
        "FROM edges e JOIN a1 ON a1.id = e.dst GROUP BY e.src), " +
        "a2 AS (SELECT e.dst AS id, CAST(sum(h1.h) AS BIGINT) AS a " +
        "FROM edges e JOIN h1 ON h1.id = e.src GROUP BY e.dst), " +
        "h2 AS (SELECT e.src AS id, CAST(sum(a2.a) AS BIGINT) AS h " +
        "FROM edges e JOIN a2 ON a2.id = e.dst GROUP BY e.src) " +
        "SELECT n_name, coalesce(h2.h, 0) AS hub, coalesce(a2.a, 0) AS auth " +
        "FROM nation LEFT JOIN h2 ON h2.id = n_nationkey " +
        "LEFT JOIN a2 ON a2.id = n_nationkey ORDER BY n_name"),
      (s, dir) => {
        val li = tbl(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
        val ord = tbl(s, dir, "orders").select("o_orderkey", "o_custkey")
        val cust = tbl(s, dir, "customer").select("c_custkey", "c_nationkey")
        val supp = tbl(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        val pairs = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
          .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
          .groupBy(cust("c_nationkey").cast("int").as("src"),
            supp("s_nationkey").cast("int").as("dst"))
          .agg(count(lit(1)).as("w"))
        val rk = row_number()
          .over(Window.partitionBy("src").orderBy(col("w").desc, col("dst")))
        // four round-passes read the edge frame — materialize it once and
        // keep each round's plan shallow
        val edges = pairs.withColumn("rk", rk).filter(col("rk") <= 7)
          .select("src", "dst").localCheckpoint()
        val a1 = edges.groupBy(col("dst").as("id"))
          .agg(count(lit(1)).cast("long").as("a"))
        val h1 = edges.join(a1, edges("dst") === a1("id"))
          .groupBy(col("src").as("hid")).agg(sum("a").cast("long").as("h"))
        val a2 = edges.join(h1, edges("src") === col("hid"))
          .groupBy(col("dst").as("id")).agg(sum("h").cast("long").as("a"))
        val h2 = edges.join(a2, edges("dst") === a2("id"))
          .groupBy(col("src").as("hid")).agg(sum("a").cast("long").as("h"))
        val nat = tbl(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
        H.materialized(
          nat.join(h2, col("hid") === col("n_nationkey"), "left")
            .join(a2, a2("id") === col("n_nationkey"), "left")
            .select(col("n_name"), coalesce(col("h"), lit(0L)).as("hub"),
              coalesce(col("a"), lit(0L)).as("auth"))
            .orderBy("n_name"),
          caches = Nil, checkpoints = Seq(edges))
      }),

    // Top-k session paths: the ordered event-type journey per (user, day),
    // truncated to the first 8 steps, counted across the corpus. The
    // sequence assembly is a per-session sort (one hash shuffle on the
    // session key); the final top-20 is a distributed TakeOrdered, never
    // a global window over every distinct path.
    Q("events_top_paths",
      Some("WITH e AS (SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, " +
        "event_type, ts, event_id FROM events), " +
        "r AS (SELECT user_id, day, event_type, " +
        "row_number() OVER (PARTITION BY user_id, day ORDER BY ts, event_id) AS rn " +
        "FROM e), " +
        "p AS (SELECT user_id, day, string_agg(event_type, '>' ORDER BY rn) AS path " +
        "FROM r WHERE rn <= 8 GROUP BY user_id, day), " +
        "c AS (SELECT path, CAST(count(*) AS BIGINT) AS n_sessions, " +
        "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users " +
        "FROM p GROUP BY path) " +
        "SELECT CAST(row_number() OVER (ORDER BY n_sessions DESC, path) AS BIGINT) AS rnk, " +
        "path, n_sessions, n_users " +
        "FROM c QUALIFY rnk <= 20 ORDER BY rnk"),
      (s, dir) => {
        val e = H.events(s, dir)
          .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
            col("event_type"), col("ts"), col("event_id"))
        val rn = row_number().over(Window.partitionBy("user_id", "day")
          .orderBy("ts", "event_id"))
        val p = e.withColumn("rn", rn).filter(col("rn") <= 8)
          .groupBy("user_id", "day")
          .agg(array_join(transform(array_sort(collect_list(struct(col("rn"),
            col("event_type")))), x => x.getField("event_type")), ">").as("path"))
        val c = p.groupBy("path")
          .agg(count(lit(1)).cast("long").as("n_sessions"),
            countDistinct("user_id").cast("long").as("n_users"))
        val top = c.orderBy(col("n_sessions").desc, col("path")).limit(20)
        top.withColumn("rnk", row_number().over(
            Window.orderBy(col("n_sessions").desc, col("path"))).cast("long"))
          .select("rnk", "path", "n_sessions", "n_users").orderBy("rnk")
      }),

    // URL canonicalization — the dedup key a crawl pipeline computes
    // before anything else. Three messy variants per logical page
    // (case-shuffled scheme/host, explicit default port, trailing slash,
    // fragment, query params in shuffled order) synthesized
    // deterministically from doc_id; the canonicalizer lowercases
    // scheme+host, strips the scheme's default port, drops the fragment,
    // sorts query params, and trims the trailing slash — pure per-row
    // string expressions, no shuffle until the final canonical groupBy.
    Q("text_url_canonical",
      Some("WITH raw AS (SELECT doc_id, CASE doc_id % 3 " +
        "WHEN 0 THEN 'https://site' || CAST((doc_id // 3) % 7 AS VARCHAR) || " +
        "'.example/p/' || CAST(doc_id // 3 AS VARCHAR) || '?b=2&a=1' " +
        "WHEN 1 THEN 'HTTPS://Site' || CAST((doc_id // 3) % 7 AS VARCHAR) || " +
        "'.Example:443/p/' || CAST(doc_id // 3 AS VARCHAR) || '/?a=1&b=2#sec' " +
        "ELSE 'https://SITE' || CAST((doc_id // 3) % 7 AS VARCHAR) || " +
        "'.EXAMPLE:443/p/' || CAST(doc_id // 3 AS VARCHAR) || '?b=2&a=1#x' " +
        "END AS url FROM documents), " +
        "parts AS (SELECT doc_id, url, " +
        "lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme, " +
        "lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)) AS hostport, " +
        "regexp_extract(url, '^[A-Za-z]+://[^/?#]*([^?#]*)', 1) AS path, " +
        "regexp_extract(url, '\\?([^#]*)', 1) AS q FROM raw), " +
        "canon AS (SELECT doc_id, scheme || '://' || " +
        "CASE WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '') " +
        "WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '') " +
        "ELSE hostport END || " +
        "CASE WHEN path = '/' THEN '/' ELSE regexp_replace(path, '/$', '') END || " +
        "CASE WHEN q = '' THEN '' ELSE '?' || " +
        "array_to_string(list_sort(string_split(q, '&')), '&') END AS curl " +
        "FROM parts) " +
        "SELECT curl, CAST(count(*) AS BIGINT) AS n_docs, " +
        "min(doc_id) AS min_doc, max(doc_id) AS max_doc " +
        "FROM canon GROUP BY curl ORDER BY curl"),
      (s, dir) => {
        val raw = tbl(s, dir, "documents").select(col("doc_id"),
          expr("CASE doc_id % 3 " +
            "WHEN 0 THEN concat('https://site', CAST((doc_id div 3) % 7 AS STRING), " +
            "'.example/p/', CAST(doc_id div 3 AS STRING), '?b=2&a=1') " +
            "WHEN 1 THEN concat('HTTPS://Site', CAST((doc_id div 3) % 7 AS STRING), " +
            "'.Example:443/p/', CAST(doc_id div 3 AS STRING), '/?a=1&b=2#sec') " +
            "ELSE concat('https://SITE', CAST((doc_id div 3) % 7 AS STRING), " +
            "'.EXAMPLE:443/p/', CAST(doc_id div 3 AS STRING), '?b=2&a=1#x') " +
            "END").as("url"))
        val parts = raw.select(col("doc_id"),
          lower(regexp_extract(col("url"), "^([A-Za-z]+)://", 1)).as("scheme"),
          lower(regexp_extract(col("url"), "^[A-Za-z]+://([^/?#]+)", 1)).as("hostport"),
          regexp_extract(col("url"), "^[A-Za-z]+://[^/?#]*([^?#]*)", 1).as("path"),
          regexp_extract(col("url"), "\\?([^#]*)", 1).as("q"))
        val canon = parts.select(col("doc_id"), concat(
          col("scheme"), lit("://"),
          when(col("scheme") === "https",
              regexp_replace(col("hostport"), ":443$", ""))
            .when(col("scheme") === "http",
              regexp_replace(col("hostport"), ":80$", ""))
            .otherwise(col("hostport")),
          when(col("path") === "/", lit("/"))
            .otherwise(regexp_replace(col("path"), "/$", "")),
          when(col("q") === "", lit(""))
            .otherwise(concat(lit("?"),
              array_join(array_sort(split(col("q"), "&")), "&")))).as("curl"))
        canon.groupBy("curl")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
          .orderBy("curl")
      }),

    // Interpolated Kneser-Ney bigram probabilities (Chen & Goodman 1999)
    // with discount d = 3/4, computed EXACTLY: scaling by 4 clears the
    // discount, so P_KN(w2|w1) = num/den with
    //   num = max(4·c12 − 3, 0)·|bigram types| + 3·N1+(w1·)·N1+(·w2)
    //   den = 4·c(w1)·|bigram types|
    // — both BIGINTs on the compare path; the probability itself is ONE
    // final division (IEEE-exact in both engines). Count shapes: one
    // bigram reduce, then everything derives from the (w1, w2) count
    // frame — no second corpus pass; the w1/w2 marginal joins shuffle on
    // the vocab domain (unbounded — deliberately unhinted for AQE).
    Q("lm_kneser_ney",
      Some("WITH idxed AS (SELECT doc_id, ws, unnest(range(0, len(ws))) AS i " +
        "FROM (SELECT doc_id, regexp_split_to_array(lower(text), '[^a-z]+') AS ws " +
        "FROM documents) t), " +
        "words AS (SELECT doc_id, ws[i + 1] AS word, CAST(i + 1 AS BIGINT) AS idx " +
        "FROM idxed WHERE ws[i + 1] <> ''), " +
        "bg AS (SELECT word AS w1, lead(word) OVER " +
        "(PARTITION BY doc_id ORDER BY idx) AS w2 FROM words), " +
        "cnt AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bg " +
        "WHERE w2 IS NOT NULL GROUP BY w1, w2), " +
        "lhs AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1, " +
        "CAST(count(*) AS BIGINT) AS n1w1 FROM cnt GROUP BY w1), " +
        "rhs AS (SELECT w2, CAST(count(*) AS BIGINT) AS nctx FROM cnt GROUP BY w2), " +
        "tot AS (SELECT CAST(count(*) AS BIGINT) AS nbt FROM cnt), " +
        "scored AS (SELECT c.w1, c.w2, c.c12, " +
        "greatest(4 * c.c12 - 3, 0) * t.nbt + 3 * l.n1w1 * r.nctx AS num, " +
        "4 * l.c1 * t.nbt AS den " +
        "FROM cnt c JOIN lhs l ON l.w1 = c.w1 " +
        "JOIN rhs r ON r.w2 = c.w2 CROSS JOIN tot t) " +
        "SELECT CAST(row_number() OVER (ORDER BY c12 DESC, w1, w2) AS BIGINT) AS rnk, " +
        "w1, w2, c12, CAST(num AS BIGINT) AS num, CAST(den AS BIGINT) AS den, " +
        "CAST(num AS DOUBLE) / den AS pkn " +
        "FROM scored QUALIFY rnk <= 50 ORDER BY rnk"),
      (s, dir) => {
        val words = tbl(s, dir, "documents")
          .select(col("doc_id"),
            posexplode(split(lower(col("text")), "[^a-z]+")).as(Seq("i0", "word")))
          .filter(col("word") =!= "")
          .withColumn("idx", (col("i0") + 1).cast("long")).drop("i0")
        val bg = words
          .withColumn("w2", lead("word", 1).over(
            Window.partitionBy("doc_id").orderBy("idx")))
          .filter(col("w2").isNotNull)
          .select(col("word").as("w1"), col("w2"))
        val cnt = bg.groupBy("w1", "w2")
          .agg(count(lit(1)).cast("long").as("c12")).localCheckpoint()
        val lhs = cnt.groupBy(col("w1").as("lw1"))
          .agg(sum("c12").cast("long").as("c1"),
            count(lit(1)).cast("long").as("n1w1"))
        val rhs = cnt.groupBy(col("w2").as("rw2"))
          .agg(count(lit(1)).cast("long").as("nctx"))
        val tot = cnt.agg(count(lit(1)).cast("long").as("nbt"))
        val scored = cnt
          .join(lhs, col("lw1") === col("w1"))
          .join(rhs, col("rw2") === col("w2"))
          .crossJoin(broadcast(tot))
          .select(col("w1"), col("w2"), col("c12"),
            (greatest(lit(4L) * col("c12") - 3L, lit(0L)) * col("nbt") +
              lit(3L) * col("n1w1") * col("nctx")).as("num"),
            (lit(4L) * col("c1") * col("nbt")).as("den"))
        val top = scored.orderBy(col("c12").desc, col("w1"), col("w2")).limit(50)
        H.materialized(
          top.withColumn("rnk", row_number().over(
              Window.orderBy(col("c12").desc, col("w1"), col("w2"))).cast("long"))
            .select(col("rnk"), col("w1"), col("w2"), col("c12"),
              col("num").cast("long").as("num"), col("den").cast("long").as("den"),
              (col("num").cast("double") / col("den")).as("pkn"))
            .orderBy("rnk"),
          caches = Nil, checkpoints = Seq(cnt))
      }))
}
