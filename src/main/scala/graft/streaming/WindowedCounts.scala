package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time tumbling-window aggregation with a watermark — the
  * standard Structured Streaming shape (the reference has no time
  * windows; this is part of the engine's streaming surface beyond it).
  *
  * Input needs an event-time `us` column (epoch microseconds, as the
  * rest of the engine uses); the watermark bounds state: windows older
  * than (max event time − lateness) are finalized and dropped from
  * state, so long streams don't accumulate unbounded window state.
  */
object WindowedCounts {

  /** Per (tumbling window, event_type) counts and exact value sums.
    * Works on a streaming OR batch frame (same plan in both). */
  def eventTypeCounts(events: DataFrame, windowLen: String = "1 hour",
                      lateness: String = "2 hours"): DataFrame = {
    val withTime = events
      .withColumn("event_time", timestamp_micros(col("us")))
      .withWatermark("event_time", lateness)
    withTime
      .groupBy(window(col("event_time"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.queries.Tables.dsum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("total_value"))
  }
}
