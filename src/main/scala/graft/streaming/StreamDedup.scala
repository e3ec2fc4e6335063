package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Streaming exact deduplication: first-seen-wins on a content
  * fingerprint, across micro-batches — the ingest-time form of
  * [[graft.operators.Dedup.exactGroups]] for a continuously-arriving
  * corpus (the reference's pipeline re-scrapes and re-delivers; a
  * training-data feed does the same at scale).
  *
  * `dropDuplicates` on a streaming frame keeps per-key state; the
  * watermark bounds it — a duplicate arriving later than `lateness`
  * after its original may be re-emitted, which is the standard
  * state-size/completeness trade (downstream batch dedup catches the
  * stragglers). State is keyed by the 32-byte fingerprint, not the
  * document, so state size is O(distinct keys), independent of document
  * length.
  */
object StreamDedup {

  /** Append-only stream of first-seen documents. Input needs `doc_id`,
    * `text`, and an event-time `us` column (epoch microseconds).
    * `dropDuplicatesWithinWatermark` (vs plain `dropDuplicates`) is what
    * lets the state store EVICT a fingerprint once the watermark passes
    * it — the difference between bounded and unbounded state on an
    * infinite stream. */
  def firstSeen(docs: DataFrame, lateness: String = "2 hours"): DataFrame =
    docs
      .withColumn("event_time", timestamp_micros(col("us")))
      .withWatermark("event_time", lateness)
      .withColumn("fingerprint", TextAnalysis.md5Fingerprint(col("text")))
      .dropDuplicatesWithinWatermark("fingerprint")
}
