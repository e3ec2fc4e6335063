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

  /** Scale-shaped packing: the window key is the COMPOSITE
    * (partitionCol, shard) with shard = doc_id div shardWidth, so the
    * running-sum window's parallelism grows with the corpus instead of
    * capping at the ~5 distinct languages (where each language's whole
    * corpus would sort in ONE task). Per-shard pack ids are then offset
    * by a prefix sum of per-shard pack counts, which makes `pack_id`
    * globally unique AND contiguous from 0 within partitionCol — the
    * same ids a single global greedy pass per partitionCol would emit
    * pack-boundary-aligned at shard edges.
    *
    * The offset table has one row per occupied shard (corpus/shardWidth
    * rows, not corpus rows), so its prefix-sum window is dimension-sized
    * and the offsets join broadcasts. Every pack lives entirely inside
    * one shard, so all downstream per-pack work stays co-partitioned
    * with the (partitionCol, shard) shuffle.
    */
  def assignPacksSharded(docs: DataFrame, budget: Long,
                         partitionCol: String = "lang",
                         shardWidth: Long = 100L): DataFrame = {
    require(shardWidth > 0, "shardWidth must be positive")
    val local = docs
      .select(col("doc_id"), col(partitionCol),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      .withColumn("shard", expr(s"doc_id div $shardWidth"))
    val w = Window.partitionBy(partitionCol, "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val assigned = local
      .withColumn("cum_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("local_pack", floor(col("cum_before") / lit(budget.toDouble)))
      .drop("cum_before")
    val wo = Window.partitionBy(partitionCol).orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = assigned.groupBy(col(partitionCol), col("shard"))
      .agg((max("local_pack") + 1).as("n_packs"))
      .withColumn("pack_offset", coalesce(sum("n_packs").over(wo), lit(0L)))
      .drop("n_packs")
    assigned.join(offsets, Seq(partitionCol, "shard"))
      .withColumn("pack_id", col("local_pack") + col("pack_offset"))
      .drop("local_pack", "pack_offset")
  }

  /** Pack-level summary over [[assignPacksSharded]]: docs and token
    * total per (partitionCol, pack_id). */
  def packSummarySharded(docs: DataFrame, budget: Long,
                         partitionCol: String = "lang",
                         shardWidth: Long = 100L): DataFrame =
    assignPacksSharded(docs, budget, partitionCol, shardWidth)
      .groupBy(col(partitionCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("pack_tokens"))
}
