package graft

import java.nio.file.Files
import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamCap

/** Streaming per-key admission cap: at most k per key over the life of
  * the stream, across any number of micro-batch drains; state survives
  * restarts via the checkpoint.
  */
class StreamCapSpec extends SparkSpec {
  import spark.implicits._

  test("admits at most k per key across drains; quota survives restart") {
    val base = Files.createTempDirectory("graft-scap").toString
    val inDir = s"$base/in"; Files.createDirectories(java.nio.file.Paths.get(inDir))
    val admitted = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[(String, Long), java.lang.Boolean]())

    def drain(): Unit = {
      val stream = spark.readStream
        .schema("key STRING, doc_id BIGINT, seq BIGINT")
        .json(inDir)
      StreamCap.admitUpTo(stream, "key", 3).writeStream
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$base/ckpt")
        .foreachBatch { (batch: Dataset[Row], _: Long) =>
          batch.collect().foreach(r =>
            admitted.add((r.getString(0), r.getLong(1))))
          ()
        }
        .start().awaitTermination()
    }

    // drain 1: key a over-delivers (5 > 3), key b stays under (2)
    (1 to 5).map(i => ("a", i.toLong, i.toLong))
      .++(Seq(("b", 101L, 6L), ("b", 102L, 7L)))
      .toDF("key", "doc_id", "seq")
      .write.mode("append").json(inDir)
    drain()
    val after1 = admitted.toArray.map(_.asInstanceOf[(String, Long)])
    assert(after1.count(_._1 == "a") == 3, s"key a: ${after1.toSeq}")
    assert(after1.count(_._1 == "b") == 2)
    // determinism: lowest-seq arrivals win inside the batch
    assert(after1.filter(_._1 == "a").map(_._2).sorted.toSeq == Seq(1L, 2L, 3L))

    // drain 2 (fresh query, same checkpoint): a is already exhausted,
    // b has room for exactly one more
    Seq(("a", 6L, 8L), ("b", 103L, 9L), ("b", 104L, 10L))
      .toDF("key", "doc_id", "seq")
      .write.mode("append").json(inDir)
    drain()
    val after2 = admitted.toArray.map(_.asInstanceOf[(String, Long)])
    assert(after2.count(_._1 == "a") == 3, "exhausted key admitted more")
    assert(after2.count(_._1 == "b") == 3)
    assert(after2.filter(_._1 == "b").map(_._2).sorted.toSeq ==
      Seq(101L, 102L, 103L))
  }
}
