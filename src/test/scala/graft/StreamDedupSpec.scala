package graft

import java.nio.file.Files
import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamDedup

/** Streaming first-seen dedup: duplicates are dropped WITHIN a batch and
  * ACROSS micro-batches (state store), and the keyed state is the
  * fingerprint, so re-deliveries in later drains are no-ops. */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  test("duplicates drop within and across drains; first delivery wins") {
    val base = Files.createTempDirectory("graft-sdedup").toString
    val inDir = s"$base/in"; Files.createDirectories(java.nio.file.Paths.get(inDir))
    val seen = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[(Long, String), java.lang.Boolean]())

    def drain(): Unit = {
      val stream = spark.readStream
        .schema("doc_id BIGINT, text STRING, us BIGINT")
        .json(inDir)
      StreamDedup.firstSeen(stream).writeStream
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$base/ckpt")
        .foreachBatch { (batch: Dataset[Row], _: Long) =>
          batch.select("doc_id", "text").collect()
            .foreach(r => seen.add((r.getLong(0), r.getString(1))))
          ()
        }
        .start().awaitTermination()
    }

    // drain 1: two distinct texts, one in-batch duplicate
    Seq((1L, "alpha beta", 1000000L), (2L, "gamma delta", 2000000L),
        (3L, "alpha beta", 3000000L))
      .toDF("doc_id", "text", "us")
      .write.mode("append").json(inDir)
    drain()
    assert(seen.size === 2, s"in-batch duplicate not dropped: $seen")
    assert(seen.contains((1L, "alpha beta")) || seen.contains((3L, "alpha beta")))

    // drain 2: a cross-batch re-delivery plus one genuinely new doc
    Seq((4L, "alpha beta", 4000000L), (5L, "epsilon zeta", 5000000L))
      .toDF("doc_id", "text", "us")
      .write.mode("append").json(inDir)
    drain()
    assert(seen.size === 3, s"cross-batch duplicate not dropped: $seen")
    assert(!seen.contains((4L, "alpha beta")), "re-delivered text must lose to its original")
    assert(seen.contains((5L, "epsilon zeta")))
  }
}
