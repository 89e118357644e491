package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: token stats,
  * stopword/quality scoring, n-gram language ID, document fingerprinting.
  * All pure Column expressions (whole-stage codegen, no UDFs); every helper
  * has an exact SQL twin used by the DuckDB oracle.
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(text, " ")

  /** Per-language stopword marker sets for the n-gram language-ID heuristic.
    * Deliberately tiny: the point is the operator shape (score-per-language →
    * argmax), not lexicography. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en"),
    "fr" -> Seq("le", "la", "de", "et", "les", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"))

  /** Count of tokens contained in `words`. */
  def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words))).cast("long")

  def hitCountSql(toksSql: String, words: Seq[String]): String =
    s"CAST(len(list_filter($toksSql, x -> x IN (" +
      words.map(w => s"'$w'").mkString(", ") + "))) AS BIGINT)"

  /** Language prediction: per-language stopword hits, argmax with fixed
    * priority order on ties (en > es > fr > de). */
  def langScores(toks: Column): Seq[(String, Column)] =
    stopwords.map { case (lang, words) => lang -> hitCount(toks, words) }

  /** Normalized-text fingerprint: lowercase, collapse whitespace, md5. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  def fingerprintSql(textSql: String): String =
    s"md5(regexp_replace(lower($textSql), '\\s+', ' ', 'g'))"
}
