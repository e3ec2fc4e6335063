package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column handling: media as opaque `binary` payloads with
  * typed metadata, plus a batched decode/feature-extract stage.
  *
  * The Spark-side plumbing is real — schema, partition sizing, batch
  * iteration — while the actual byte decoding is a clearly-marked
  * deterministic STUB (the container ships no image/audio codecs; a real
  * deployment swaps `decodeBytesStub` for an imageio/ffmpeg call without
  * touching any plan shape).
  *
  * Scale notes: payloads never pass through a driver collect; decode runs
  * `mapPartitions` so per-partition setup (codec init in real life)
  * amortizes across a batch; metadata-only queries never touch the binary
  * column thanks to parquet column pruning.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType),
    StructField("media_meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("byte_len", LongType)))),
  ))

  /** Wrap a text corpus as fake media rows: payload = utf8 bytes, typed
    * metadata derived deterministically (so the pipeline is testable
    * without codecs). */
  def attachPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("fake/raw").as("format"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") * 7 % 480).cast("int").as("height"),
        length(col("text").cast("binary")).cast("long").as("byte_len"),
      ).as("media_meta"))

  /** STUB decoder: a real implementation decodes image/audio bytes; this
    * derives a deterministic 4-float feature vector from the raw bytes so
    * the distributed plumbing (batching, schema, partitioning) is
    * exercised end-to-end. */
  def decodeBytesStub(payload: Array[Byte]): Array[Float] = {
    var s0 = 0L; var s1 = 0L
    var i = 0
    while (i < payload.length) {
      s0 += payload(i) & 0xff
      s1 ^= (payload(i) & 0xffL) << (i % 56)
      i += 1
    }
    Array(payload.length.toFloat, s0.toFloat,
      (s1 & 0xffffff).toFloat, if (payload.length == 0) 0f else s0.toFloat / payload.length)
  }

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("features", ArrayType(FloatType)),
    StructField("batch_size", IntegerType)))

  /** Batched decode/feature-extract over media rows. Batches of
    * `batchSize` rows per call mirror the shape a vectorized (Arrow/Pandas
    * UDF) decode stage would use; `batch_size` is surfaced so tests can
    * assert the batching actually happened. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      batchSize: Int = 64): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select("doc_id", "payload").mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would initialize the codec here
        batch.iterator.map { r =>
          Row(r.getLong(0), decodeBytesStub(r.getAs[Array[Byte]](1)).toSeq,
            batch.size)
        }
      }
    }(enc)
  }
}
