package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.WindowedCounts

/** Watermarked tumbling-window aggregation: streaming (Update mode,
  * latest-wins upsert) converges to the identical batch aggregation. */
class StreamingWindowSpec extends SparkSpec {

  test("streamed windowed counts converge to the batch aggregation") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val events = raw
      .select(col("event_id"), graft.queries.Tables.usFromTs(raw).as("us"),
        col("event_type"), col("value"))

    val base = Files.createTempDirectory("graft-win").toString
    val inDir = s"$base/in"
    events.coalesce(2).write.parquet(inDir)

    val results = new java.util.concurrent.ConcurrentHashMap[String, Row]()
    val stream = spark.readStream
      .schema("event_id BIGINT, us BIGINT, event_type STRING, value DOUBLE")
      .parquet(inDir)
    WindowedCounts.eventTypeCounts(stream).writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        batch.collect().foreach { r =>
          results.put(s"${r.get(0)}|${r.get(1)}|${r.getString(2)}", r)
        }
        ()
      }
      .start().awaitTermination()

    val truth = WindowedCounts.eventTypeCounts(events).collect()
      .map(r => s"${r.get(0)}|${r.get(1)}|${r.getString(2)}" ->
        (r.getLong(3), r.getDouble(4))).toMap

    assert(truth.nonEmpty)
    assert(results.size() === truth.size)
    truth.foreach { case (k, (n, tv)) =>
      val got = results.get(k)
      assert(got != null, s"missing window $k")
      assert(got.getLong(3) === n, s"count mismatch in $k")
      assert(got.getDouble(4) === tv, s"sum mismatch in $k")
    }
  }
}
