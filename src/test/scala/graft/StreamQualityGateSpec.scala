package graft

import java.nio.file.Files
import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.streaming.Trigger
import graft.operators.QualityClassifier
import graft.streaming.StreamQualityGate

/** Streaming model-based quality gate: scores on the stream must be
  * BIT-IDENTICAL to batch [[QualityClassifier.scoreDocs]] on the same
  * rows (same pure arithmetic, no state), the admitted stream must be
  * exactly the batch keep-set with the document payload intact, and
  * the whole thing must run in append mode with no watermark (the
  * stateless-gate contract shared with StreamDecontaminate).
  */
class StreamQualityGateSpec extends SparkSpec {
  import spark.implicits._

  private val weights: Seq[Double] = (0 until 16).map(b => (b - 8) / 8.0)
  private val bias = 0.05

  test("stream qscore == batch scoreDocs bit-for-bit; admit == batch keep-set with payload") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "the quick brown fox"),
      (3L, ""),
      (4L, "zz yy xx ww vv uu"),
      (5L, "one token"))
    val base = Files.createTempDirectory("graft-sqgate").toString
    val inDir = s"$base/in"; Files.createDirectories(java.nio.file.Paths.get(inDir))
    docs.toDF("doc_id", "text").write.mode("append").json(inDir)

    val batch = QualityClassifier.scoreDocs(
        docs.toDF("doc_id", "text"), weights, bias, threshold = 0.0)
      .select("doc_id", "qscore", "keep")
      .collect().map(r => r.getLong(0) -> ((
        java.lang.Double.doubleToLongBits(r.getDouble(1)), r.getBoolean(2))))
      .toMap

    val got = scala.collection.mutable.Map[Long, (Long, Boolean)]()
    val stream = spark.readStream.schema("doc_id BIGINT, text STRING").json(inDir)
    StreamQualityGate.score(stream, weights, bias, threshold = 0.0).writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        b.select("doc_id", "qscore", "keep").collect()
          .foreach(r => got(r.getLong(0)) =
            (java.lang.Double.doubleToLongBits(r.getDouble(1)), r.getBoolean(2)))
        ()
      }
      .start().awaitTermination()
    assert(got.toMap == batch)

    val admitted = scala.collection.mutable.Map[Long, String]()
    StreamQualityGate.admit(stream, weights, bias, threshold = 0.0).writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$base/ckpt2")
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        assert(b.columns.toSeq.sorted == Seq("doc_id", "text")) // payload intact
        b.collect().foreach(r =>
          admitted(r.getAs[Long]("doc_id")) = r.getAs[String]("text"))
        ()
      }
      .start().awaitTermination()
    val expectKeep = docs.filter { case (id, _) => batch(id)._2 }.toMap
    assert(admitted.toMap == expectKeep)
    assert(admitted.nonEmpty && admitted.size < docs.size,
      s"gate should split the docs (kept ${admitted.size}/${docs.size})")
  }
}
