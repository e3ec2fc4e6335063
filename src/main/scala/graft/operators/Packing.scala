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
  * Two formulations:
  *  - [[assignPacks]]: window key = `partitionCol` alone. Correct, but
  *    the window's parallelism caps at the column's cardinality (~5
  *    langs here), so each partition's whole corpus sorts in ONE task —
  *    fine for dimension-sized groups, a scale-killer for corpus-sized
  *    ones.
  *  - [[assignPacksSharded]]: the 100 TB shape — composite
  *    (partitionCol, shard) window key whose cardinality grows with the
  *    corpus, plus a dimension-sized offset join to make pack ids
  *    globally unique. This is what the registry's `q_pack_sequences`
  *    runs.
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
    * capping at the ~5 distinct languages. Per-shard pack ids are then
    * offset by a prefix sum of per-shard pack counts.
    *
    * Semantics (deliberately NOT identical to [[assignPacks]]): packs
    * never span a shard boundary — the greedy restarts at each shard
    * edge, so pack contents realign there and `pack_tokens` can differ
    * from the unsharded greedy. Ids are unique and order-consistent
    * within `partitionCol` (doc order ⇒ non-decreasing pack_id) but not
    * necessarily contiguous: a single document larger than `budget`
    * skips ids, exactly as in [[assignPacks]]. Every pack lives entirely
    * inside one shard, so downstream per-pack work stays co-partitioned
    * with the (partitionCol, shard) shuffle.
    *
    * Cost shape: the corpus-sized window runs ONCE (the offset table is
    * derived from plain per-shard aggregates — total tokens and the
    * last document's tokens — using the greedy identity
    * n_packs = floor((total − last)/budget) + 1, valid because
    * cum_before is maximal at the shard's last document). The offset
    * table has one row per occupied (partitionCol, shard) — corpus /
    * shardWidth rows, not corpus rows — and is joined back with an
    * explicit `broadcast` since that join is load-bearing for the
    * no-second-shuffle design.
    *
    * CONTRACT on `shardWidth`: offsets size is corpus/shardWidth, so
    * shardWidth must scale with the corpus — pick it so the offset
    * table stays broadcast-sized (e.g. 10⁵–10⁶ docs/shard keeps offsets
    * ≤ 10⁶ rows even at 10¹¹ docs) while still giving far more shards
    * than cores. The default 100 suits the test corpus only. With a
    * too-small shardWidth the explicit broadcast (which bypasses
    * autoBroadcastJoinThreshold) would collect a corpus-proportional
    * table to the driver, and the per-partitionCol prefix-sum window
    * over offsets would serialize the same row count through ~#langs
    * tasks — both defeated by sizing shardWidth correctly.
    *
    * Returns the same schema as [[assignPacks]]:
    * (doc_id, partitionCol, n_tokens, pack_id).
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
    // Per-shard pack count WITHOUT re-running the corpus window:
    // local_pack is non-decreasing in doc order, so its max is attained
    // at the shard's last doc, where cum_before = total − last_tokens.
    val wo = Window.partitionBy(partitionCol).orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col(partitionCol), col("shard"))
      .agg(sum("n_tokens").as("tot"),
        max_by(col("n_tokens"), col("doc_id")).as("last_toks"))
      .withColumn("n_packs",
        floor((col("tot") - col("last_toks")) / lit(budget.toDouble)) + 1)
      .withColumn("pack_offset", coalesce(sum("n_packs").over(wo), lit(0L)))
      .select(col(partitionCol), col("shard"), col("pack_offset"))
    assigned.join(broadcast(offsets), Seq(partitionCol, "shard"))
      .withColumn("pack_id", col("local_pack") + col("pack_offset"))
      .select(col("doc_id"), col(partitionCol), col("n_tokens"), col("pack_id"))
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
