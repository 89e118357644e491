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

  /** Per-language stopword marker sets for the language-ID heuristic.
    * Deliberately tiny: the point is the operator shape (score-per-language →
    * argmax), not lexicography. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en"),
    "fr" -> Seq("le", "la", "de", "et", "les", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"))

  /** Characteristic character trigrams per language (the n-gram half of the
    * language-ID heuristic; combined with stopword hits for the score). */
  val charTrigrams: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("ing", "the", "ion"),
    "es" -> Seq("que", "ión", "ado"),
    "fr" -> Seq("les", "ent", "eur"),
    "de" -> Seq("der", "sch", "ung"))

  /** Occurrences of a literal substring: (len - len(text without it)) / n. */
  def substringCount(text: Column, lit_ : String): Column =
    ((length(text) - length(regexp_replace(text,
      java.util.regex.Pattern.quote(lit_), ""))) / lit_.length).cast("long")

  def substringCountSql(textSql: String, lit_ : String): String =
    s"CAST((length($textSql) - length(replace($textSql, '$lit_', ''))) / ${lit_.length} AS BIGINT)"

  /** Hybrid n-gram language score: stopword hits + char-trigram occurrences. */
  def langScore(toks: Column, text: Column, lang: String): Column = {
    val stop = hitCount(toks, stopwords.toMap.apply(lang))
    charTrigrams.toMap.apply(lang)
      .map(t => substringCount(text, t)).foldLeft(stop)(_ + _)
  }

  def langScoreSql(toksSql: String, textSql: String, lang: String): String =
    (hitCountSql(toksSql, stopwords.toMap.apply(lang)) +:
      charTrigrams.toMap.apply(lang).map(t => substringCountSql(textSql, t)))
      .mkString(" + ")

  /** Count of tokens contained in `words`. */
  def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words))).cast("long")

  def hitCountSql(toksSql: String, words: Seq[String]): String =
    s"CAST(len(list_filter($toksSql, x -> x IN (" +
      words.map(w => s"'$w'").mkString(", ") + "))) AS BIGINT)"

  /** Normalized-text fingerprint: lowercase, collapse whitespace, md5. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  def fingerprintSql(textSql: String): String =
    s"md5(regexp_replace(lower($textSql), '\\s+', ' ', 'g'))"
}
