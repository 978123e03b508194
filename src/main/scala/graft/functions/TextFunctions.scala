package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-pipeline operators (SURVEY.md §2.4,
  * §2.6): tokenization, shingling, quality features, language-ID
  * scoring. All codegen'd built-ins; shapes chosen to be exactly
  * replicable in the DuckDB oracles.
  */
object TextFunctions {

  /** Whitespace tokens (the documents table is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word k-shingles: sliding windows of k tokens joined by
    * a single space; empty array below k tokens. Custom single-pass
    * expression — see graft.plans.WordShingles for why the
    * declarative HOF version is quadratic per row.
    */
  def wordShingles(text: Column, k: Int): Column =
    graft.plans.WordShingles(text, k)

  /** BPE-ish regex token stream: letter runs, single digits, or single
    * non-alphanumeric marks (the shape of byte-level BPE pre-tokenizers).
    */
  val bpeTokenRe = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"

  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeTokenRe), lit(0)))

  /** Punctuation (non-alphanumeric, non-space) character count. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[^A-Za-z0-9 ]", ""))

  val stopwords: Seq[String] = Seq("a", "the", "is", "of", "and")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(stopwords: _*)))

  /** Mean token length (total token chars / token count). */
  def meanWordLen(text: Column): Column = {
    val toks = tokens(text)
    aggregate(transform(toks, t => length(t).cast("long")), lit(0L), (a, v) => a + v)
      .cast("double") / nullif(size(toks).cast("double"), lit(0.0))
  }

  /** Language marker-word inventories (stopword-profile language ID —
    * the classic n-gram/stopword heuristic, kept to pure rational
    * arithmetic so the oracle can replicate it exactly).
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "of", "and"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "las", "es", "y"),
    "fr" -> Seq("le", "les", "et", "est", "une"))

  def markerScore(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers: _*)))

  /** CJK codepoint presence (Java regex unicode range). */
  def cjkCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[一-鿿]"), lit(0)))
}
