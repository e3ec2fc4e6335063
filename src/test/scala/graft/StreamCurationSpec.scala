package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.BloomFilter
import graft.streaming.{Sessionize, StreamCap, StreamDecontaminate, StreamDedup}

/** END-TO-END streaming curation: the full ingest chain
  * decontaminate → first-seen dedup → per-key admission cap →
  * sessionize, composed as a tiered file pipeline (each stage its own
  * streaming query + checkpoint, downstream watching upstream's
  * output — the bronze/silver shape a real ingest deployment uses),
  * drained TWICE with new arrivals, redeliveries, contamination and
  * over-quota pressure in both drains. The final sessions table must
  * equal the hand-computed batch fold over the clean, deduped,
  * admitted arrivals — the streaming chain converges to batch
  * curation semantics across micro-batch boundaries.
  */
class StreamCurationSpec extends SparkSpec {
  import spark.implicits._

  private val m = 256
  private val k = 3

  test("decontaminate -> dedup -> cap -> sessionize converges over 2 drains") {
    val base = Files.createTempDirectory("graft-curate").toString
    val inDir = s"$base/in"
    Files.createDirectories(Paths.get(inDir))
    val s1 = s"$base/s1"; val s2 = s"$base/s2"; val s3 = s"$base/s3"
    val sessionsOut = s"$base/sessions"

    val benchGrams = Seq("the quick brown", "quick brown fox",
      "brown fox jumps").toDF("gram")
    val filter = BloomFilter.build(benchGrams, m, k)

    // one "arrival" = (doc_id, text, user, us, seq); us = doc_id seconds
    def row(id: Long, text: String, user: Long, seq: Long) =
      (id, text, user, id * 1000000L, seq)

    def drainAll(): Unit = {
      // stage A: stateless bloom decontamination at the ingest edge
      val in = spark.readStream
        .schema("doc_id BIGINT, text STRING, user BIGINT, us BIGINT, seq BIGINT")
        .json(inDir)
      StreamDecontaminate.admit(in, filter, n = 3).writeStream
        .format("parquet").option("path", s1)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$base/ckptA")
        .start().awaitTermination()
      // stage B: watermark-bounded first-seen dedup on the fingerprint
      val cleaned = spark.readStream
        .schema("doc_id BIGINT, text STRING, user BIGINT, us BIGINT, seq BIGINT")
        .parquet(s1)
      StreamDedup.firstSeen(cleaned).drop("event_time", "fingerprint")
        .writeStream
        .format("parquet").option("path", s2)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$base/ckptB")
        .start().awaitTermination()
      // stage C: lifetime per-user admission cap (k = 3), admitted docs
      // re-emitted as events for the sessionizer
      val deduped = spark.readStream
        .schema("doc_id BIGINT, text STRING, user BIGINT, us BIGINT, seq BIGINT")
        .parquet(s2)
      StreamCap.admitUpTo(deduped, "user", 3).writeStream
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$base/ckptC")
        .foreachBatch { (batch: Dataset[Row], _: Long) =>
          batch.select(col("doc_id").as("event_id"),
              (col("doc_id") * 1000000000L).as("ts"),
              col("key").cast("long").as("user_id"))
            .write.mode("append").parquet(s3)
          ()
        }
        .start().awaitTermination()
      // stage D: custom-state sessionization maintaining the final table
      Sessionize.run(spark, s3, sessionsOut, s"$base/ckptD")
        .awaitTermination()
    }

    // ---- drain 1: contamination, an in-batch redelivery, over-quota ----
    Seq(
      row(10L, "alpha beta gamma delta one", 1L, 1L),
      row(20L, "alpha beta gamma delta two", 1L, 2L),
      row(30L, "contains the quick brown fox here", 1L, 3L), // contaminated
      row(40L, "alpha beta gamma delta four", 1L, 4L),
      row(50L, "alpha beta gamma delta five", 1L, 5L), // over user-1 quota
      row(10L, "alpha beta gamma delta one", 1L, 1L),  // exact redelivery
      row(100L, "epsilon zeta eta theta one", 2L, 7L),
      row(5000L, "epsilon zeta eta theta two", 2L, 8L))
      .toDF("doc_id", "text", "user", "us", "seq")
      .write.mode("append").json(inDir)
    drainAll()

    val admitted1 = spark.read.parquet(s3)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    assert(admitted1 == Set((1L, 10L), (1L, 20L), (1L, 40L),
      (2L, 100L), (2L, 5000L)), s"drain-1 admitted: $admitted1")

    // ---- drain 2: cross-drain redelivery, exhausted quota, new user ----
    Seq(
      row(5100L, "epsilon zeta eta theta three", 2L, 9L), // extends session
      row(100L, "epsilon zeta eta theta one", 2L, 7L),    // cross-drain dup
      row(60L, "alpha beta gamma delta six", 1L, 11L),    // quota exhausted
      row(9000L, "the quick brown fox jumps again", 2L, 12L), // contaminated
      row(200L, "iota kappa lambda mu one", 3L, 13L))
      .toDF("doc_id", "text", "user", "us", "seq")
      .write.mode("append").json(inDir)
    drainAll()

    val admitted2 = spark.read.parquet(s3)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    assert(admitted2 == admitted1 ++ Set((2L, 5100L), (3L, 200L)),
      s"drain-2 admitted: $admitted2")

    // final sessions table == the batch fold over the curated arrivals:
    // user 1: 10,20,40 s apart-by-<gap      -> one 3-event session
    // user 2: 100 | 5000,5100 (gap 4900 s)  -> two sessions
    // user 3: 200                           -> one singleton
    val sessions = spark.read.parquet(sessionsOut)
      .select("user_id", "session_id", "n_events", "start_us", "last_us")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val expected = Set(
      (1L, 1L, 3L, 10000000L, 40000000L),
      (2L, 1L, 1L, 100000000L, 100000000L),
      (2L, 2L, 2L, 5000000000L, 5100000000L),
      (3L, 1L, 1L, 200000000L, 200000000L))
    assert(sessions == expected, s"sessions: $sessions")
  }
}
