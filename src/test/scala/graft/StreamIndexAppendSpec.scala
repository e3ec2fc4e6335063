package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Similarity
import graft.streaming.StreamIndexAppend

/** Streaming IVF index append (the StreamQualityGate → index tail of
  * the ingest chain): vectors arriving in arbitrary micro-batch chops
  * must land the index in exactly the state the batch append produces
  * — every posting assigned by the SAVED (fit-on-A) quantizer, no
  * refit — and the replay semantics must converge (clean replay
  * no-op) while partial overlap stays loud. */
class StreamIndexAppendSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private def dir = spark.conf.get("spark.sql.warehouse.dir")
    .stripSuffix("/") + "/graft_ivf_stream_append"

  test("chopped stream == saved-quantizer assignment of the full corpus; " +
    "clean replay no-op; partial overlap loud") {
    val total = emb.count()
    val cut = total / 2
    val a = emb.where(col("vec_id") < cut)
    val b = emb.where(col("vec_id") >= cut)
    Similarity.buildIvfIndex(a, dir) // quantizer fit on A only

    // B arrives as three files → three micro-batches (maxFilesPerTrigger=1);
    // parquet stream source so the float payload is byte-identical to
    // what the batch path reads (JSON would re-parse floats as doubles)
    val base = Files.createTempDirectory("graft-ivf-stream").toString
    val inDir = s"$base/in"
    val third = (total - cut) / 3
    Seq(
      b.where(col("vec_id") < cut + third),
      b.where(col("vec_id") >= cut + third && col("vec_id") < cut + 2 * third),
      b.where(col("vec_id") >= cut + 2 * third)
    ).foreach(_.coalesce(1).write.mode("append").parquet(inDir))

    val stream = spark.readStream.schema(b.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    StreamIndexAppend.writer(stream, dir)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$base/ckpt")
      .start().awaitTermination()

    // final postings == assignment of the FULL corpus by the A-fit
    // quantizer (same witness as the batch append case in IndexedIvfSpec)
    val post = spark.read.parquet(s"$dir/postings")
    assert(post.count() === total)
    val cents = spark.read.parquet(s"$dir/centroids")
      .select("list_id", "cvec", "cc").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_._1).toSeq
    val ndot = graft.plans.DotProduct.dotCol(spark,
      _: org.apache.spark.sql.Column, _: org.apache.spark.sql.Column)
    val v = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("vec"))
      .withColumn("vv", ndot(col("vec"), col("vec")))
    val expected = Similarity.assignLists(v, cents, 2)
      .select("vec_id", "list_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val got = post.select("vec_id", "list_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got === expected)

    // the grown index serves
    assert(Similarity.ivfTopKFromIndex(spark, dir, 5, 5).count() > 0L)

    // clean replay (a whole already-processed batch redelivered) is a
    // no-op, not a crash — the stream converges
    val replayed = b.where(col("vec_id") < cut + third)
    assert(StreamIndexAppend.appendBatch(replayed, dir) === 0L)
    assert(spark.read.parquet(s"$dir/postings").count() === total)

    // partial overlap (some ids committed, some new) fails loudly
    val fresh = replayed.withColumn("vec_id", col("vec_id") + total * 10)
    val mixed = replayed.limit(2).union(fresh.limit(2))
    val e = intercept[IllegalArgumentException] {
      StreamIndexAppend.appendBatch(mixed, dir)
    }
    assert(e.getMessage.contains("partial overlap"))
    assert(spark.read.parquet(s"$dir/postings").count() === total)
  }
}
