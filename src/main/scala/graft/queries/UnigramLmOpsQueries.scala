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
        val vocab = pc.crossJoin(broadcast(tot))
          .select(col("piece"),
            expr("CAST(floor(-ln(CAST(pcnt AS DOUBLE) / CAST(n AS DOUBLE))" +
              " * 1000.0) AS BIGINT)").as("cost_milli"))
          .localCheckpoint() // joined at every DP level
        // Viterbi DP over positions 1..MaxLen on the bounded word frame;
        // each level keeps (word, cost, k, piece) for its best prefix
        val dp = new Array[org.apache.spark.sql.DataFrame](MaxLen + 1)
        for (j <- 1 to MaxLen) {
          val legs = (1 to math.min(MaxPiece, j)).map { k =>
            val prev =
              if (j - k == 0) words.select(col("word"), lit(0L).as("pcost"))
              else dp(j - k).select(col("word"), col("cost").as("pcost"))
            words.filter(length(col("word")) >= j)
              .join(prev, Seq("word"))
              .select(col("word"), col("pcost"),
                expr(s"substring(word, ${j - k + 1}, $k)").as("piece"),
                lit(k.toLong).as("k"))
              .join(vocab, Seq("piece"))
              .select(col("word"),
                (col("pcost") + col("cost_milli")).as("cost"),
                col("k"), col("piece"))
          }
          dp(j) = legs.reduce(_ unionByName _)
            .withColumn("rn", row_number().over(Window.partitionBy("word")
              .orderBy(col("cost"), col("k"), col("piece"))))
            .filter(col("rn") === 1).drop("rn")
            .localCheckpoint() // read by levels j+1..j+4 AND the backtrack
        }
        val dpAll = (1 to MaxLen).map(j =>
            dp(j).select(col("word"), lit(j.toLong).as("pos"),
              col("k"), col("piece")))
          .reduce(_ unionByName _)
          .localCheckpoint() // the walk joins it MaxLen times
        var bt = words.select(col("word"),
          length(col("word")).cast("long").as("pos"))
        val emitted = (1 to MaxLen).map { _ =>
          val step = bt.filter(col("pos") > 0)
            .join(dpAll, Seq("word", "pos"))
          bt = step.select(col("word"), (col("pos") - col("k")).as("pos"))
          step.select(col("word"), col("piece"))
        }.reduce(_ unionByName _)
        val usage = emitted.join(words, Seq("word"))
          .groupBy("piece").agg(sum("wcnt").cast("long").as("used_cnt"))
        val utot = usage.agg(sum("used_cnt").cast("long").as("n"))
        val out = usage.join(vocab, Seq("piece"))
          .crossJoin(broadcast(utot))
          .select(col("piece"), col("used_cnt"),
            col("cost_milli").as("old_cost_milli"),
            expr("CAST(floor(-ln(CAST(used_cnt AS DOUBLE)" +
              " / CAST(n AS DOUBLE)) * 1000.0) AS BIGINT)")
              .as("new_cost_milli"))
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("used_cnt").desc, col("piece"))).cast("long"))
          .filter(col("rnk") <= 15)
          .orderBy("rnk")
        H.materialized(out, caches = Nil,
          checkpoints = Seq(words, vocab, dpAll) ++ (1 to MaxLen).map(dp))
      })
  )
}
