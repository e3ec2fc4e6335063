package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-shard assignment: give every document a deterministic global
  * training order — a reproducible pseudo-shuffle by the portable hash,
  * so the order is layout- and engine-independent — and cut that order
  * into fixed-size shards. The logical counterpart of
  * [[graft.io.Tables.writeTrainingShards]] (which delegates shard
  * membership to Spark's range partitioner + maxRecordsPerFile): this
  * one *names* each document's shard, so a loader manifest, a resume
  * cursor, or a per-shard audit can be computed without writing files.
  *
  * Scale shape (the [[Packing.assignPacksSharded]] recipe on a third
  * operator): a single global `row_number` window would sort the corpus
  * in ONE task, so the rank is computed per composite shard key
  * (pb, doc_id div shardWidth) — contiguous ranges of the global
  * (pb, doc_id) order, cardinality growing with the corpus — and made
  * global with a broadcast prefix-sum offset join. Same `shardWidth`
  * CONTRACT as Packing: size it so the offset table stays
  * broadcast-sized while leaving far more range-shards than cores; the
  * default 100 suits the test corpus only.
  */
object Sharding {

  /** (doc_id, train_rank, shard_id): train_rank is the 1-based position
    * in the deterministic pseudo-shuffled order (portable hash of
    * doc_id, ties by doc_id), shard_id = (train_rank − 1) div
    * recordsPerShard. Equal to the single-window formulation row for
    * row (pinned in CurationSpec).
    */
  def assignShards(docs: DataFrame, recordsPerShard: Long, seed: Int = 42,
                   shardWidth: Long = 100L): DataFrame = {
    require(recordsPerShard >= 1, "recordsPerShard must be >= 1")
    require(shardWidth > 0, "shardWidth must be positive")
    val local = docs.select(col("doc_id"))
      .withColumn("pb", Sampling.portableBucket(col("doc_id"), seed))
      .withColumn("rs", expr(s"doc_id div $shardWidth"))
    // (pb, rs, doc_id) order ≡ (pb, doc_id) order: rs = doc_id div W is
    // monotone in doc_id inside one pb bucket.
    val w = Window.partitionBy("pb", "rs").orderBy("doc_id")
    val assigned = local
      .withColumn("local_rank", row_number().over(w).cast("long"))
    // Offset table: one row per occupied (pb, rs) cell — corpus/W-sized
    // metadata, never corpus rows. The unpartitioned prefix window runs
    // over THAT table only (the documented Packing trade: metadata
    // serializes through one task; shardWidth must scale with n).
    val wo = Window.orderBy("pb", "rs")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy("pb", "rs").agg(count(lit(1)).as("n"))
      .withColumn("rank_offset", coalesce(sum("n").over(wo), lit(0L)))
      .select(col("pb"), col("rs"), col("rank_offset"))
    assigned.join(broadcast(offsets), Seq("pb", "rs"))
      .withColumn("train_rank", col("rank_offset") + col("local_rank"))
      .withColumn("shard_id", expr(s"(train_rank - 1) div $recordsPerShard"))
      .select(col("doc_id"), col("train_rank"), col("shard_id"))
  }
}
