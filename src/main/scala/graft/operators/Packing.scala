package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Sequence packing: group documents into fixed token-budget packs — the
  * step that turns a deduplicated corpus into training sequences. The
  * assignment is the deterministic by-order greedy rule: a document's
  * pack is floor(tokens-before-it / budget) within its partition, i.e. a
  * running-sum window — one shuffle on the partition column, no
  * driver-side loop, reproducible under any input partitioning.
  *
  * Scale: packing is embarrassingly parallel across `partitionCol`
  * (lang here; shard id in a real corpus) — a GLOBAL greedy pack would
  * serialize on a total order, which is exactly what the per-partition
  * window avoids. Pack sizes overshoot the budget by at most one
  * document (the greedy invariant, asserted in PackingSpec).
  */
object Packing {

  /** Per-document pack assignment: (doc_id, partitionCol, n_tokens,
    * pack_id). */
  def assignPacks(docs: DataFrame, budget: Long,
                  partitionCol: String = "lang"): DataFrame = {
    val w = Window.partitionBy(partitionCol).orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col("doc_id"), col(partitionCol),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      .withColumn("cum_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("pack_id", floor(col("cum_before") / lit(budget.toDouble)))
      .drop("cum_before")
  }

  /** Pack-level summary: docs and token total per (partitionCol,
    * pack_id). */
  def packSummary(docs: DataFrame, budget: Long,
                  partitionCol: String = "lang"): DataFrame =
    assignPacks(docs, budget, partitionCol)
      .groupBy(col(partitionCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("pack_tokens"))
}
