package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Dedup
import graft.{io => gio}

/** Streaming NEAR-duplicate suppression at ingest — the streaming form
  * of [[graft.operators.Dedup.simhashNearDupPairs]], completing the
  * ingest-edge family (exact dedup = [[StreamDedup]], decontamination =
  * [[StreamDecontaminate]], admission caps = [[StreamCap]]).
  *
  * Rule: a document is ADMITTED iff no earlier-arrived document has a
  * 64-bit SimHash within Hamming distance ≤ `maxHamming`. "Earlier" is
  * a prior micro-batch, or the same batch with a smaller `doc_id`
  * (ingest ids are assigned in arrival order, so the tiebreak equals
  * arrival order — same contract as [[StreamDedup]] first-seen). The
  * comparison set is every SEEN document, admitted or not — the
  * non-recursive prune rule ([[graft.operators.Similarity
  * .semDedupSurvivors]] precedent), which makes the admitted set a pure
  * function of arrival order, independent of how the stream is chopped
  * into batches: batch-chop boundaries never change the answer, and the
  * whole-corpus batch replay is simply "drop every `doc_b` of
  * `simhashNearDupPairs`" (the spec asserts exactly that equivalence).
  *
  * State design — a TABLE, not a state store: a 100 TB corpus carries
  * ~10⁹ signatures; executor state stores hold state in memory per key
  * and checkpoint it per batch, which caps out orders of magnitude
  * earlier. Signatures live in a parquet table partitioned by
  * `batch_id` (12 bytes a row), and each batch's candidate probe is an
  * equi-join on the 4×16-bit pigeonhole chunk key — the identical
  * linear-scale join shape as the batch operator, with the corpus-sized
  * side streamed from disk, never collected. Exactly-once on replay:
  * the state write is a per-`batch_id` partition overwrite (idempotent
  * re-write of identical rows) and the probe reads only
  * `batch_id < current`, so a half-written partition from a crashed
  * attempt is invisible to its own retry.
  *
  * At real scale the state table would additionally be bucketed by
  * `chunk_val` ([[graft.io.Tables.writeBucketed]]) so the per-batch
  * probe join co-locates without shuffling the state side; the
  * batch-partitioned layout keeps the example self-contained.
  */
object StreamNearDedup {

  private def withSig(docs: DataFrame): DataFrame =
    Dedup.simhashSignatures(docs.select(col("doc_id"), col("text")))
      .select("doc_id", "simhash")

  /** (doc_id, simhash) → one row per 16-bit pigeonhole chunk. Any pair
    * within Hamming ≤ 3 agrees exactly on ≥ 1 of the 4 chunks, so the
    * chunk equi-join loses no true pair (Dedup.simhashNearDupPairs). */
  private def chunked(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map { i =>
        struct(lit(i).as("chunk_idx"),
          shiftrightunsigned(col("simhash"), i * 16)
            .bitwiseAND(lit(0xffffL)).as("chunk_val"))
      }: _*)).as("c"))
      .select(col("doc_id"), col("simhash"),
        col("c.chunk_idx").as("chunk_idx"), col("c.chunk_val").as("chunk_val"))

  /** One micro-batch: admit `batch` against the signatures accumulated
    * under `stateDir` by batches `< batchId`, then record this batch's
    * signatures under `batch_id=batchId` (partition overwrite —
    * idempotent on replay). Returns the admitted rows of `batch` with
    * their original columns. Directly callable in batch code; the
    * streaming wrapper [[admitted]] just feeds it micro-batches. */
  def admitBatch(batch: DataFrame, stateDir: String, batchId: Long,
                 maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk blocking is only exact for maxHamming <= 3")
    val spark = batch.sparkSession
    val sigs = withSig(batch).localCheckpoint()

    val priorChunks =
      if (gio.Tables.tableExists(spark, stateDir))
        Some(chunked(
          spark.read.parquet(stateDir).where(col("batch_id") < batchId)
            .select("doc_id", "simhash")))
      else None
    // a-side: every prior-batch signature counts unconditionally; a
    // same-batch signature counts only for larger-id docs (arrival-order
    // tiebreak). One unified join keeps it a single chunk-key exchange.
    val batchA = chunked(sigs).withColumn("is_prior", lit(false))
    val a = priorChunks
      .map(p => p.withColumn("is_prior", lit(true)).unionByName(batchA))
      .getOrElse(batchA)
      .select(col("doc_id").as("doc_a"), col("simhash").as("sim_a"),
        col("chunk_idx"), col("chunk_val"), col("is_prior"))
    val b = chunked(sigs)
      .select(col("doc_id").as("doc_b"), col("simhash").as("sim_b"),
        col("chunk_idx"), col("chunk_val"))
    // hamming verified INSIDE the join stage, before the distinct — the
    // candidate stream never re-shuffles (Dedup.simhashNearDupPairs).
    val dropped = b.join(a, Seq("chunk_idx", "chunk_val"))
      .where((col("is_prior") || col("doc_a") < col("doc_b")) &&
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))) <= maxHamming)
      .select(col("doc_b").as("doc_id")).distinct()

    val admitted = batch.join(dropped, Seq("doc_id"), "left_anti")
      .localCheckpoint() // sever lineage from stateDir BEFORE writing it
    gio.Tables.upsertPartitions(
      sigs.withColumn("batch_id", lit(batchId)), stateDir, Seq("batch_id"))
    admitted
  }

  /** The streaming query: admitted documents append to `outDir` (also
    * `batch_id`-partition-overwritten, so a replayed batch re-writes
    * identical output instead of duplicating it). */
  def admitted(docs: DataFrame, stateDir: String, outDir: String,
               checkpointDir: String, maxHamming: Int = 3): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val out = admitBatch(batch.toDF(), stateDir, batchId, maxHamming)
        gio.Tables.upsertPartitions(
          out.withColumn("batch_id", lit(batchId)), outDir, Seq("batch_id"))
        ()
      }
      .start()
}
