package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives as pure Column expressions (whole-stage codegen;
  * no UDFs). All are deterministic so a DuckDB oracle can mirror them. */
object TextFunctions {
  /** Tokenizer regex shared with the oracle: letter runs, digit runs, or a
    * single non-alnum-non-space symbol — a BPE-ish pre-tokenization. */
  val TokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "for")

  /** Whitespace token count. */
  def wsTokens(text: Column): Column = size(split(text, "\\s+"))

  /** Regex (BPE-ish) token count. */
  def regexTokens(text: Column): Column = regexp_count(text, lit(TokenPattern))

  /** Number of tokens (simple single-space split) found in `words`. */
  def hitCount(text: Column, words: Seq[String]): Column = {
    val dict = array(words.map(lit): _*)
    size(filter(split(text, " "), t => array_contains(dict, t)))
  }

  /** Stopword ratio = stopword hits / whitespace tokens (IEEE double div). */
  def stopwordRatio(text: Column): Column =
    hitCount(text, EnStopwords).cast("double") / wsTokens(text)

  /** Mean word length over a single-space split. */
  def meanWordLen(text: Column): Column = {
    val words = split(text, " ")
    aggregate(words, lit(0L), (acc, w) => acc + length(w)).cast("double") / size(words)
  }

  /** Whitespace-normalized lowercase form (fingerprint input). */
  def normalized(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** md5 content fingerprint of the normalized text. */
  def fingerprint(text: Column): Column = md5(normalized(text).cast("binary"))

  /** Deterministic quality score in [0,1]: length prior × (1 − stopword
    * ratio) — a stand-in for a trained classifier, SQL-mirrorable. */
  def qualityScore(text: Column): Column =
    least(wsTokens(text).cast("double") / lit(100.0), lit(1.0)) *
      (lit(1.0) - stopwordRatio(text))
}
