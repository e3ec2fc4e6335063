package graft

import java.nio.file.Files
import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.streaming.Trigger
import graft.functions.PortableHash
import graft.operators.BloomFilter
import graft.streaming.StreamDecontaminate

/** Streaming decontamination: the bloom filter built batch-side from
  * the eval set flags contaminated documents on a stream, stateless —
  * verified against an independent JVM reference of the same portable
  * arithmetic (so the expression path, the UDF path, and plain Scala
  * all agree), including the no-false-negative guarantee.
  */
class StreamDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val m = 256
  private val k = 3

  /** Plain-Scala reference of the filter's double-hash probes. */
  private def probes(g: String): Seq[Int] = {
    val u = PortableHash.cp31u(g)
    val h1 = u % m
    val h2 = 1 + (u / m) % (m - 1)
    (0 until k).map(j => ((h1 + j * h2) % m).toInt)
  }
  private def member(bits: Array[Long])(g: String): Boolean =
    probes(g).forall(p => (bits(p >> 6) >> (p & 63) & 1L) == 1L)
  private def grams3(text: String): Set[String] =
    text.trim.split("\\s+").toSeq.sliding(3).filter(_.size == 3)
      .map(_.mkString(" ")).toSet

  test("stream flags exactly the bloom-positive docs; contaminated never admitted") {
    val bench = Seq("the quick brown fox jumps", "emoji 👍 bench gram here")
    val benchGrams = bench.flatMap(grams3).distinct.toDF("gram")
    val bits = BloomFilter.buildBits(benchGrams, m, k)

    val docs = Seq(
      (1L, "zz the quick brown fox sat"),       // shares "the quick brown"
      (2L, "prefix emoji 👍 bench gram tail"),  // shares the emoji gram
      (3L, "wholly unrelated vocabulary set"),  // clean (may bloom-FP)
      (4L, "short doc"))                        // < 3 tokens, no grams
    val base = Files.createTempDirectory("graft-sdecon").toString
    val inDir = s"$base/in"; Files.createDirectories(java.nio.file.Paths.get(inDir))
    docs.toDF("doc_id", "text").write.mode("append").json(inDir)

    val got = scala.collection.mutable.Map[Long, (Long, Boolean)]()
    val stream = spark.readStream.schema("doc_id BIGINT, text STRING").json(inDir)
    StreamDecontaminate.flag(stream, bits, n = 3, m = m, k = k).writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        batch.select("doc_id", "n_flagged_grams", "contaminated")
          .collect().foreach(r => got(r.getLong(0)) = (r.getLong(1), r.getBoolean(2)))
        ()
      }
      .start().awaitTermination()

    // parity with the independent reference, per document
    val expected = docs.map { case (id, text) =>
      val flagged = grams3(text).count(member(bits))
      id -> ((flagged.toLong, flagged > 0))
    }.toMap
    assert(got.toMap == expected)
    // the two truly-contaminated docs can never pass (no false negatives)
    assert(got(1L)._2 && got(2L)._2)
    assert(!got(4L)._2)

    // admit() drops exactly the contaminated set
    val admitted = StreamDecontaminate
      .admit(docs.toDF("doc_id", "text"), bits, n = 3, m = m, k = k)
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == expected.filter(!_._2._2).keySet)
  }
}
