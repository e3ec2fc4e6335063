package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** A/B for the sharded pair-answer delivery (r15, the r14 verdict's
  * #3): the q_dedup_minhash_lsh contract note attributes ~154 s of the
  * sf100 query to the trailing global `orderBy(doc_a, doc_b)` over the
  * 959.9M-row answer. Tables.writeShardedPairs delivers the same
  * global order as range-disjoint sorted shards via ONE hash exchange
  * (arithmetic boundaries — no RangePartitioner sampling job, which
  * re-executes the pair pipeline's reduce side a second time).
  *
  * Arms (same JVM, each re-runs the full minhash pipeline):
  *   bare    — pairs through noop, no ordering (the production floor)
  *   orderby — pairs.orderBy(doc_a, doc_b) through noop (the contract)
  *   sharded — the writeShardedPairs plan shape through noop
  *             (__shard + hash repartition + in-partition sort)
  * SPARK_GRAFT_WRITE=1 adds the real parquet sinks (orderBy write vs
  * writeShardedPairs) — same comparison with file IO included.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/repo/testdata-sf100 SPARK_GRAFT_CPUS=32 \
  *   SPARK_GRAFT_SHUFFLE=256 SPARK_DRIVER_MEM=80g \
  *   tools/run.sh graft.tools.ProbeShards
  */
object ProbeShards {
  def main(args: Array[String]): Unit = {
    Scratch.sweepStale()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "256"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docs.count()
    // shard count ≫ shuffle parallelism (see writeShardedPairs: k
    // shards hashed into k partitions leaves ~1/e of tasks empty)
    val nShards = sys.env.getOrElse("SPARK_GRAFT_SHARDS", "2048").toLong
    val width = math.max(1L, nDocs / nShards)
    def pairs: DataFrame =
      Dedup.minhashLshPairs(docs, 0.9, bands = 8, rows = 8)

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probeshards] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    (1 to rounds).foreach { i =>
      time(s"bare    run $i")(noop(pairs))
      time(s"orderby run $i")(noop(pairs.orderBy("doc_a", "doc_b")))
      time(s"sharded run $i")(noop(
        pairs.withColumn("__shard", expr(s"doc_a div $width"))
          .repartition(col("__shard"))
          .sortWithinPartitions("__shard", "doc_a", "doc_b")))
      System.gc()
    }

    if (sys.env.get("SPARK_GRAFT_WRITE").contains("1")) {
      val base = spark.conf.get("spark.sql.warehouse.dir")
        .stripSuffix("/") + "/graft_probe_shards"
      time("orderby WRITE")(
        pairs.orderBy("doc_a", "doc_b")
          .write.mode("overwrite").parquet(s"$base/sorted"))
      time("sharded WRITE")(
        graft.io.Tables.writeShardedPairs(pairs, s"$base/sharded", width))
      // clean up ~2x the answer in parquet
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
    }
    spark.stop()
  }
}
