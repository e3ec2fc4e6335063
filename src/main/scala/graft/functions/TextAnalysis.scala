package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID, document fingerprinting.
  *
  * Everything except the rolling hash is pure column expressions —
  * codegen'd, shuffle-free per row, and embarrassingly parallel at 100 TB
  * (each document is independent; the only shuffles are the final
  * aggregations on low-cardinality keys like lang/source).
  */
object TextAnalysis {

  /** Whitespace tokens of a trimmed document. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct word set (for set-similarity ops). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** [[tokenSet]] sorted in UTF8 binary order — the input contract of
    * the allocation-free two-pointer intersection
    * ([[graft.plans.SortedIntersectSize]]). Sorting costs n·log n ONCE
    * per document and is amortized over the many candidate pairs each
    * document appears in. */
  def sortedTokenSet(text: Column): Column = array_sort(tokenSet(text))

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Characters removed when stripping punctuation = punctuation count. */
  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,;:!?]", ""))).cast("long")

  /** Occurrences of any word in `pattern` (an alternation wrapped in \b). */
  def patternCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Stopword occurrences — the quality-scoring signal. */
  def stopwordCount(text: Column): Column =
    patternCount(text, "\\b(the|a|of|and|to|is|in)\\b")

  /** BPE-ish subword token count: a GPT-2-style pretokenizer regex
    * (letter runs / digit runs / punctuation runs, optionally
    * space-prefixed), restricted to RE2-compatible syntax so the DuckDB
    * oracle evaluates the identical pattern. */
  val bpePattern = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"

  def bpeTokenCount(text: Column): Column = patternCount(text, bpePattern)

  /** Per-language marker counts for the n-gram/stopword language-ID
    * heuristic. Kept deliberately simple & deterministic (the point is the
    * operator shape: per-row scoring, zero shuffles, argmax decode). */
  def langScores(text: Column): Seq[(String, Column)] = Seq(
    "en" -> patternCount(text, "\\b(the|and|of|is)\\b"),
    "fr" -> patternCount(text, "\\b(le|la|les|et|une)\\b"),
    "es" -> patternCount(text, "\\b(el|los|las|y|que)\\b"),
    "de" -> patternCount(text, "\\b(der|die|und|das|ist)\\b"),
    "zh" -> patternCount(text, "[一-鿿]"),
  )

  /** Argmax over [[langScores]] with a fixed tie-break order
    * (en > fr > es > de > zh). The mirrored DuckDB CASE must use the same
    * comparison chain — see LlmQueries. */
  def predictLang(text: Column): Column = {
    val s = langScores(text).toMap
    when(s("en") >= s("fr") && s("en") >= s("es") && s("en") >= s("de") && s("en") >= s("zh"), "en")
      .when(s("fr") >= s("es") && s("fr") >= s("de") && s("fr") >= s("zh"), "fr")
      .when(s("es") >= s("de") && s("es") >= s("zh"), "es")
      .when(s("de") >= s("zh"), "de")
      .otherwise("zh")
  }

  /** Canonical content fingerprint: md5 of the case/whitespace-normalized
    * text. Exact-duplicate groups share a fingerprint. */
  def md5Fingerprint(text: Column): Column = md5(lower(trim(text)))

  /** 64-bit polynomial rolling hash of the normalized text (base 1000003,
    * wrapping Long arithmetic — deterministic across JVMs). A cheap
    * order-sensitive fingerprint, unlike the order-insensitive word-set
    * signatures. UDF (loop-shaped), but O(len) per row and shuffle-free.
    */
  val rollingHash64 = udf { (text: String) =>
    if (text == null) 0L
    else {
      val s = text.trim.toLowerCase
      var h = 1125899906842597L
      var i = 0
      while (i < s.length) { h = h * 1000003L + s.charAt(i); i += 1 }
      h
    }
  }

  /** Per-document quality metrics frame: doc_id + token/char/punct/
    * stopword counts and ratio features. */
  def qualityMetrics(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col("doc_id"),
      col("lang"),
      col("source"),
      length(t).cast("long").as("n_chars_actual"),
      tokenCount(t).as("n_tokens"),
      punctCount(t).as("n_punct"),
      stopwordCount(t).as("n_stopwords"))
  }
}
