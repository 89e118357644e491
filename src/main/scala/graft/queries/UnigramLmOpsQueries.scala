package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Round-10 wave 155: SentencePiece-style UNIGRAM language-model
  * tokenizer training (Kudo 2018) — the other half of subword tokenizer
  * construction next to the board's BPE merge loop: a Viterbi E-step
  * (per word, the min-cost segmentation under current piece costs via
  * bounded dynamic programming) and an M-step (piece re-estimation from
  * the Viterbi segmentations). Scale shape: ONE fact-sized token reduce
  * caps the word domain (top-50, length <= 8); everything after — the
  * candidate-piece census, the 8-step DP, the backtrack walk — runs on
  * bounded frames, so corpus growth only changes the first reduce.
  */
object UnigramLmOpsQueries extends QueryModule {

  private val MaxLen = 8 // word-length cap: bounds the DP depth
  private val MaxPiece = 4 // candidate pieces are 1-4 chars
  private val TopWords = 50

  def all: Seq[Q] = Seq(

    Q("vocab_unigram_viterbi",
      Some {
        // dp CTE chain: dp{j} holds (word, cost, k, piece) = the best
        // segmentation of the word's first j chars and its LAST step;
        // candidates at j pull dp{j-k} + the vocab cost of the k-char
        // piece ending at j. Ties break (cost, k, piece) — exact integer
        // milli costs make ties deterministic in both engines.
        val dpCtes = (1 to MaxLen).map { j =>
          val legs = (1 to math.min(MaxPiece, j)).map { k =>
            val prev =
              if (j - k == 0) s"SELECT word, 0 AS cost FROM words"
              else s"SELECT word, cost FROM dp${j - k}"
            s"SELECT w.word, p.cost + v.cost_milli AS cost, $k AS k, " +
              s"substr(w.word, ${j - k + 1}, $k) AS piece " +
              s"FROM words w JOIN ($prev) p ON p.word = w.word " +
              s"JOIN vocab v ON v.piece = substr(w.word, ${j - k + 1}, $k) " +
              s"WHERE length(w.word) >= $j"
          }.mkString(" UNION ALL ")
          s"dp$j AS MATERIALIZED (SELECT word, cost, k, piece FROM (" +
            s"SELECT *, row_number() OVER (PARTITION BY word " +
            s"ORDER BY cost, k, piece) AS rn FROM ($legs)) WHERE rn = 1)"
        }.mkString(", ")
        // backtrack walk: bt0 starts at pos = length(word); step t jumps
        // pos -> pos - k through the dp entry at pos, emitting the piece
        val btCtes = (1 to MaxLen).map { t =>
          val prev = if (t == 1) "bt0" else s"bt${t - 1}"
          val dpAt = (1 to MaxLen).map(j =>
            s"SELECT word, $j AS pos, k, piece FROM dp$j")
            .mkString(" UNION ALL ")
          s"bt$t AS (SELECT b.word, b.pos - d.k AS pos, d.piece " +
            s"FROM $prev b JOIN ($dpAt) d " +
            "ON d.word = b.word AND d.pos = b.pos WHERE b.pos > 0)"
        }.mkString(", ")
        val btUnion = (1 to MaxLen)
          .map(t => s"SELECT word, piece FROM bt$t").mkString(" UNION ALL ")
        s"""WITH toks AS (SELECT t AS word FROM (
           |    SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+'))
           |      AS t FROM documents)
           |  WHERE length(t) BETWEEN 2 AND $MaxLen),
           |words AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS wcnt
           |  FROM toks GROUP BY 1
           |  ORDER BY wcnt DESC, word LIMIT $TopWords),
           |occ AS (SELECT substr(w.word, CAST(s AS INTEGER),
           |      CAST(l AS INTEGER)) AS piece, w.wcnt
           |  FROM words w, range(1, $MaxLen + 1) t(s),
           |    range(1, $MaxPiece + 1) u(l)
           |  WHERE s + l - 1 <= length(w.word)),
           |pc AS (SELECT piece, CAST(sum(wcnt) AS BIGINT) AS pcnt
           |  FROM occ GROUP BY 1),
           |tot AS (SELECT CAST(sum(pcnt) AS BIGINT) AS n FROM pc),
           |vocab AS MATERIALIZED (SELECT piece,
           |    CAST(floor(-ln(CAST(pcnt AS DOUBLE) / CAST(tot.n AS DOUBLE))
           |      * 1000.0) AS BIGINT) AS cost_milli
           |  FROM pc CROSS JOIN tot),
           |$dpCtes,
           |bt0 AS (SELECT word, CAST(length(word) AS BIGINT) AS pos,
           |    '' AS piece FROM words),
           |$btCtes,
           |usage AS (SELECT u.piece,
           |    CAST(sum(w.wcnt) AS BIGINT) AS used_cnt
           |  FROM ($btUnion) u JOIN words w ON w.word = u.word GROUP BY 1),
           |utot AS (SELECT CAST(sum(used_cnt) AS BIGINT) AS n FROM usage)
           |SELECT u.piece, u.used_cnt, v.cost_milli AS old_cost_milli,
           |  CAST(floor(-ln(CAST(u.used_cnt AS DOUBLE)
           |    / CAST(utot.n AS DOUBLE)) * 1000.0) AS BIGINT)
           |    AS new_cost_milli,
           |  CAST(row_number() OVER (ORDER BY u.used_cnt DESC, u.piece)
           |    AS BIGINT) AS rnk
           |FROM usage u JOIN vocab v ON v.piece = u.piece CROSS JOIN utot
           |QUALIFY rnk <= 15 ORDER BY rnk
           |""".stripMargin
      },
      (s, dir) => {
        val toks = tbl(s, dir, "documents")
          .select(explode(split(lower(col("text")), "[^a-z]+")).as("word"))
          .filter(length(col("word")).between(2, MaxLen))
        val words = toks.groupBy("word")
          .agg(count(lit(1)).cast("long").as("wcnt"))
          .orderBy(col("wcnt").desc, col("word")).limit(TopWords)
          .localCheckpoint() // the DP joins + occurrence grid read it
        val occ = words
          .select(col("word"), col("wcnt"),
            explode(expr(
              s"""flatten(transform(sequence(1, $MaxLen), s ->
                 |  transform(sequence(1, $MaxPiece), l ->
                 |    named_struct('s', s, 'l', l))))""".stripMargin))
              .as("g"))
          .filter(col("g.s") + col("g.l") - 1 <= length(col("word")))
          .select(expr("substring(word, g.s, g.l)").as("piece"), col("wcnt"))
        val pc = occ.groupBy("piece")
          .agg(sum("wcnt").cast("long").as("pcnt"))
        val tot = pc.agg(sum("pcnt").cast("long").as("n"))
        // the whole piece-cost table as ONE broadcastable map row — it is
        // vocabulary-bounded (substrings of the top-50 words), and a map
        // lookup replaces the per-DP-level vocab joins
        val vm = pc.crossJoin(broadcast(tot))
          .agg(map_from_entries(collect_list(struct(col("piece"),
            expr("CAST(floor(-ln(CAST(pcnt AS DOUBLE) / CAST(n AS DOUBLE))" +
              " * 1000.0) AS BIGINT)")))).as("vm"))
          .localCheckpoint() // read by the DP pass AND the old-cost lookup
        // Viterbi DP *per row* (r12): the word cap (MaxLen) bounds the DP,
        // so each word folds its own best-segmentation table inside one
        // `aggregate` expression over its prefix positions — acc[i] is the
        // best (cost, k, piece) for the first i+1 chars, ties broken by
        // least() on the struct exactly as the old per-level
        // row_number(ORDER BY cost, k, piece). The old shape ran 8 DP
        // levels × (up to 4 joins + a window + a localCheckpoint) plus an
        // 8-round backtrack join loop = 78 jobs of pure scheduling
        // overhead on a 50-row frame; this is one projection.
        val legSql = (1 to MaxPiece).map { k =>
          val piece = s"substring(word, j - $k + 1, $k)"
          s"CASE WHEN j >= $k THEN named_struct(" +
            s"'cost', IF(j = $k, CAST(0 AS BIGINT), acc[j - $k - 1].cost)" +
            s" + element_at(vm, $piece), " +
            s"'k', CAST($k AS BIGINT), 'piece', $piece) " +
            "ELSE CAST(NULL AS STRUCT<cost: BIGINT, k: BIGINT, piece: STRING>) END"
        }.mkString("least(", ", ", ")")
        val dpSql = "aggregate(sequence(1, CAST(length(word) AS INT)), " +
          "CAST(array() AS ARRAY<STRUCT<cost: BIGINT, k: BIGINT, piece: STRING>>), " +
          s"(acc, j) -> array_append(acc, $legSql))"
        // backtrack: walk pos -> pos - dp[pos].k from pos = length(word),
        // collecting pieces — the same jumps the old bt1..bt8 joins made
        val btSql = s"aggregate(sequence(1, $MaxLen), " +
          "named_struct('pos', CAST(length(word) AS BIGINT), " +
          "'ps', CAST(array() AS ARRAY<STRING>)), " +
          "(st, t) -> IF(st.pos > 0, named_struct(" +
          "'pos', st.pos - dp[CAST(st.pos AS INT) - 1].k, " +
          "'ps', array_append(st.ps, dp[CAST(st.pos AS INT) - 1].piece)), st)).ps"
        val emitted = words.crossJoin(broadcast(vm))
          .withColumn("dp", expr(dpSql))
          .select(col("wcnt"), explode(expr(btSql)).as("piece"))
        val usage = emitted
          .groupBy("piece").agg(sum("wcnt").cast("long").as("used_cnt"))
        val utot = usage.agg(sum("used_cnt").cast("long").as("n"))
        val out = usage.crossJoin(broadcast(vm))
          .crossJoin(broadcast(utot))
          .select(col("piece"), col("used_cnt"),
            expr("element_at(vm, piece)").as("old_cost_milli"),
            expr("CAST(floor(-ln(CAST(used_cnt AS DOUBLE)" +
              " / CAST(n AS DOUBLE)) * 1000.0) AS BIGINT)")
              .as("new_cost_milli"))
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("used_cnt").desc, col("piece"))).cast("long"))
          .filter(col("rnk") <= 15)
          .orderBy("rnk")
        H.materialized(out, caches = Nil, checkpoints = Seq(words, vm))
      })
  )
}
