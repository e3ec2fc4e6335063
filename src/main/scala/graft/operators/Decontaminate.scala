package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Benchmark decontamination for training corpora: flag training
  * documents that share any word n-gram with an evaluation/benchmark
  * set, the standard guard against test-set leakage before a training
  * run.
  *
  * Scale shape: the benchmark side is distinct n-grams of the EVAL set —
  * benchmark suites are KB–MB scale while the corpus is TB scale, so the
  * eval n-gram set is explicitly `broadcast` and the overlap is a
  * broadcast hash semi-ish join keyed on the n-gram string. The corpus
  * side never shuffles on data size: n-grams are generated inside
  * codegen ([[TextAnalysis.wordNgrams]]), the join is map-side, and the
  * only shuffle is the final per-doc aggregation keyed by `doc_id`.
  * Nothing here is quadratic and no driver-side collect touches either
  * side.
  */
object Decontaminate {

  /** Per-training-document overlap report: `(doc_id, n_shared)` for every
    * training doc sharing ≥ 1 word n-gram with `bench`, where `n_shared`
    * counts DISTINCT shared n-grams. Clean documents are absent (the
    * common case at scale — emit the flagged minority, not the corpus).
    */
  def overlapReport(train: DataFrame, bench: DataFrame, n: Int): DataFrame = {
    // ALL-occurrence gram stream (ngramStream: positional explode, gram
    // built in codegen — wordNgrams' per-element lambda dominated this
    // operator's cost); the broadcast join filters occurrences map-side
    // and the per-doc DISTINCT runs in the aggregate, over the MATCHED
    // rows only — at corpus scale that is the flagged minority, far
    // cheaper than pre-deduplicating the whole corpus gram stream
    val trainGrams = TextAnalysis.ngramStream(train, n, Seq("doc_id"))
    val benchGrams = bench
      .select(explode(TextAnalysis.wordNgrams(col("text"), n)).as("gram"))
      .distinct()
    trainGrams.join(broadcast(benchGrams), "gram")
      .groupBy("doc_id")
      .agg(countDistinct("gram").as("n_shared"))
  }
}
