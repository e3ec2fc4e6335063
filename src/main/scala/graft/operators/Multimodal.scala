package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column handling: media as opaque `binary` payloads with
  * typed metadata, plus a batched decode/feature-extract stage.
  *
  * The decoder is a REAL byte-level container parse — PNG signature +
  * IHDR fields, and a JPEG marker-segment walk to the SOF frame header
  * (the part of image decoding that is pure public file-format
  * arithmetic, no codec library needed). Pixel decoding (inflate/DCT)
  * is where a real deployment plugs imageio/ffmpeg into the same
  * `mapPartitions` batch shape.
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

  /** Deterministic image-container payloads for testing the decoder
    * without shipping codecs: a third of the corpus becomes a PNG
    * (signature + IHDR + fake CRC + text bytes as pseudo-IDAT data), a
    * third a JPEG (SOI + JFIF APP0 + a VARIABLE-LENGTH comment segment
    * carrying the source name — so the parser must genuinely walk
    * segments, not read a fixed offset + SOF0 + text bytes as
    * pseudo-entropy data), and a third stays raw text bytes (an
    * undecodable payload the parser must survive). Dimensions derive
    * from `n_chars`, all construction in pure column expressions. */
  def attachImagePayload(docs: DataFrame): DataFrame = {
    def be(v: Column, nBytes: Int): Column =
      unhex(lpad(hex(v), nBytes * 2, "0"))
    val w = (lit(1) + col("n_chars") % 640).cast("int")
    val h = (lit(1) + col("n_chars") * 7 % 480).cast("int")
    val textBytes = coalesce(col("text"), lit("")).cast("binary")
    val comBytes = coalesce(col("source"), lit("")).cast("binary")
    val png = concat(
      unhex(lit("89504E470D0A1A0A" + "0000000D" + "49484452")),
      be(w, 4), be(h, 4),
      unhex(lit("0802000000" + "00000000")), // depth 8, RGB, + fake CRC
      textBytes)
    val jpeg = concat(
      unhex(lit("FFD8" + // SOI
        "FFE000104A464946000101000048004800" + "00")), // 18-byte APP0
      unhex(lit("FFFE")), be(length(comBytes) + 2, 2), comBytes, // COM
      unhex(lit("FFC0001108")), be(h, 2), be(w, 2), // SOF0: depth 8 …
      unhex(lit("03011100021101031101")), // … 3 components
      textBytes)
    docs.select(col("doc_id"),
      when(col("doc_id") % 3 === 0, png)
        .when(col("doc_id") % 3 === 1, jpeg)
        .otherwise(textBytes).as("payload"))
  }

  /** Byte-level image-header parse: `(format, width, height, bit_depth)`,
    * all-null fields for payloads that are neither a valid PNG start nor
    * a walkable JPEG. PNG: 8-byte signature, then the IHDR chunk's
    * big-endian width/height and depth byte. JPEG: SOI marker, then a
    * genuine marker-segment walk (each segment skipped by its own
    * big-endian length) until a SOF frame header yields precision +
    * dimensions. Pure public file-format arithmetic — the DuckDB oracle
    * re-extracts the same fields from the same bytes. */
  def decodeImageHeader(p: Array[Byte]): (String, Integer, Integer, Integer) = {
    def u8(i: Int): Int = p(i) & 0xff
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    val pngMagic = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    if (p.length >= 25 && pngMagic.indices.forall(i => u8(i) == pngMagic(i))) {
      // first chunk must be IHDR: length 13, type "IHDR"
      if (p.length >= 29 && be32(8) == 13 && be32(12) == 0x49484452)
        ("png", be32(16), be32(20), u8(24))
      else ("png", null, null, null)
    } else if (p.length >= 2 && u8(0) == 0xFF && u8(1) == 0xD8) {
      var i = 2
      while (i + 3 < p.length && u8(i) == 0xFF) {
        val marker = u8(i + 1)
        // SOF0–SOF15 minus the non-frame DHT/JPG/DAC markers
        if (marker >= 0xC0 && marker <= 0xCF &&
            marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
          return if (i + 9 <= p.length)
            ("jpeg", be16(i + 7), be16(i + 5), u8(i + 4))
          else ("jpeg", null, null, null)
        }
        i += 2 + be16(i + 2) // marker bytes + length-prefixed segment
      }
      ("jpeg", null, null, null)
    } else (null, null, null, null)
  }

  private val decodedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("bit_depth", IntegerType),
    StructField("byte_len", LongType),
    StructField("batch_size", IntegerType)))

  /** Batched header decode over media rows. Batches of `batchSize` rows
    * per call mirror the shape a vectorized (Arrow/Pandas UDF) decode
    * stage would use — per-batch setup is where a real codec
    * initializes; `batch_size` is surfaced so tests can assert the
    * batching actually happened. */
  def decodeMedia(spark: SparkSession, media: DataFrame,
                  batchSize: Int = 64): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    media.select("doc_id", "payload").mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would initialize the codec here
        batch.iterator.map { r =>
          val payload = r.getAs[Array[Byte]](1)
          val (fmt, w, h, d) = decodeImageHeader(payload)
          Row(r.getLong(0), fmt, w, h, d, payload.length.toLong, batch.size)
        }
      }
    }(enc)
  }
}
