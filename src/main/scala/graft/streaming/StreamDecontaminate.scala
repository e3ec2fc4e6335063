package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis
import graft.operators.BloomFilter

/** Benchmark decontamination at the INGEST EDGE: documents arriving on
  * a stream are tested against the eval set's m-bit portable bloom
  * filter before they ever land in the corpus — the streaming sibling
  * of [[graft.operators.BloomFilter.decontaminateReport]].
  *
  * The whole test is stateless column arithmetic (the filter ships as
  * an `array<long>` literal; the gram hash is the expression-form
  * code-point fold, no UDF), so unlike a stream-static join it needs no
  * state store, no watermark, and no shuffle: each micro-batch filters
  * inside its own scan stage, at full append-mode parallelism. Bloom
  * semantics carry over exactly: zero false negatives (a contaminated
  * document can never slip through), false positives at the filter's
  * designed rate quarantine a few clean documents — the safe direction
  * for decontamination.
  */
object StreamDecontaminate {

  /** Append `n_flagged_grams` (distinct word n-grams of `text` that the
    * filter recognizes) and `contaminated` to a (possibly streaming)
    * documents frame. The filter arrives as a [[BloomFilter.Filter]]
    * bundle so the probe (m, k) can never drift from the build (m, k) —
    * drift would silently break the zero-false-negative guarantee. */
  def flag(docs: DataFrame, filter0: BloomFilter.Filter, n: Int): DataFrame =
    docs
      // token array staged so the gram lambda reads an attribute, not a
      // per-element re-evaluated split (wordNgramsFromTokens' contract)
      .withColumn("_toks", TextAnalysis.tokens(col("text")))
      .withColumn("n_flagged_grams",
        size(filter(
          array_distinct(TextAnalysis.wordNgramsFromTokens(col("_toks"), n)),
          g => filter0.contains(g))).cast("long"))
      .drop("_toks")
      .withColumn("contaminated", col("n_flagged_grams") > 0)

  /** Raw-triple form; validates shape via the [[BloomFilter.Filter]]
    * constructor. */
  def flag(docs: DataFrame, words: Array[Long], n: Int,
           m: Int = 65536, k: Int = 3): DataFrame =
    flag(docs, BloomFilter.Filter(words, m, k), n)

  /** Only the documents the filter clears — the stream that continues
    * into the corpus. */
  def admit(docs: DataFrame, filter0: BloomFilter.Filter, n: Int): DataFrame =
    flag(docs, filter0, n).where(!col("contaminated"))
      .drop("n_flagged_grams", "contaminated")

  def admit(docs: DataFrame, words: Array[Long], n: Int,
            m: Int = 65536, k: Int = 3): DataFrame =
    admit(docs, BloomFilter.Filter(words, m, k), n)
}
