package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.Manifest
import graft.operators.Similarity

/** Compaction measured in anger (r16 verdict #4): `Manifest.compact`
  * is spec-pinned at unit scale; this probe records what it actually
  * buys on a really-fragmented index — the many-batch streaming-append
  * shape at sf10.
  *
  * Protocol:
  *   1. build an IVF index on the first half of the embeddings corpus;
  *   2. fragment it with SPARK_GRAFT_BATCHES (default 48) appends of
  *      the second half (each append lands one list_id-clustered file
  *      set + one manifest version — the StreamIndexAppend tail shape);
  *   3. serve `ivfTopKFromIndex` SPARK_GRAFT_RUNS (default 3) times,
  *      recording per-run latency + the snapshot's postings file count;
  *   4. `Manifest.compact` (SPARK_GRAFT_TARGET_MB, default 64) + vacuum;
  *   5. serve again — answers must be BIT-IDENTICAL (printed as a
  *      checksum), only the file count and latency may move.
  *
  * Output lines are grep-able as `[probecompact]`; the headline
  * file-count/latency rows land in BASELINE.md.
  *
  * Usage (quiet box — see the sweep-hygiene note in BASELINE.md r16):
  *   SPARK_GRAFT_SF_DIR=/root/repo/testdata-sf10 SPARK_GRAFT_CPUS=32 \
  *   SPARK_GRAFT_SHUFFLE=64 SPARK_DRIVER_MEM=24g \
  *   tools/run.sh graft.tools.ProbeCompact
  */
object ProbeCompact {
  def main(args: Array[String]): Unit = {
    Scratch.sweepStale()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nBatches = sys.env.getOrElse("SPARK_GRAFT_BATCHES", "48").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val targetMb = sys.env.getOrElse("SPARK_GRAFT_TARGET_MB", "64").toLong
    val nQ = sys.env.getOrElse("SPARK_GRAFT_NQUERIES", "64").toInt
    val k = sys.env.getOrElse("SPARK_GRAFT_K", "10").toInt
    val nProbe = sys.env.getOrElse("SPARK_GRAFT_NPROBE", "4").toInt

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val total = emb.count()
    val cut = total / 2
    val ix = java.nio.file.Files
      .createTempDirectory("graft-probe-compact").toString + "/ix"

    var t0 = System.nanoTime()
    Similarity.buildIvfIndex(emb.where(col("vec_id") < cut), ix)
    println(f"[probecompact] build on $cut%d vectors: " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")

    // fragment: nBatches disjoint vec_id slices of the second half,
    // each an appendToIvfIndex (the StreamIndexAppend per-micro-batch
    // path: saved-quantizer assignment, one root-manifest commit)
    val per = math.max(1L, (total - cut) / nBatches)
    t0 = System.nanoTime()
    var appended = 0L
    var b = 0
    while (cut + b * per < total) {
      val lo = cut + b * per
      val hi = if (b == nBatches - 1) total else math.min(total, lo + per)
      appended += Similarity.appendToIvfIndex(
        emb.where(col("vec_id") >= lo && col("vec_id") < hi), ix)
      b += 1
      if (b % 10 == 0) println(s"[probecompact] ... $b appends")
      if (hi == total) b = Int.MaxValue - 1
    }
    println(f"[probecompact] $nBatches%d appends ($appended%d postings): " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")

    def postingsFiles: Int = Manifest.latest(spark, ix).get._2
      .count(_.startsWith("postings/"))
    def serve(tag: String): Seq[Double] = (1 to runs).map { i =>
      val s0 = System.nanoTime()
      Similarity.ivfTopKFromIndex(spark, ix, nQ, k, nProbe)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - s0) / 1e9
      println(f"[probecompact] serve $tag run $i: $dt%.2f s")
      dt
    }
    // answer checksum: identical pre/post is the whole contract
    def checksum: (Long, Long) = {
      val rows = Similarity.ivfTopKFromIndex(spark, ix, nQ, k, nProbe)
        .select("query_id", "rank", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      (rows.length.toLong,
        rows.foldLeft(17L) { case (h, (a, b2, c)) =>
          ((h * 31 + a) * 31 + b2) * 31 + c })
    }

    val filesPre = postingsFiles
    val servePre = serve("pre-compact")
    val sumPre = checksum
    println(s"[probecompact] pre-compact: files=$filesPre " +
      f"serve_median=${servePre.sorted.apply(runs / 2)}%.2f s " +
      s"answer=$sumPre")

    t0 = System.nanoTime()
    Manifest.compact(spark, ix, targetMb << 20)
    val tCompact = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    val reclaimed = Manifest.vacuum(spark, ix).size
    val tVacuum = (System.nanoTime() - t0) / 1e9
    println(f"[probecompact] compact: $tCompact%.1f s; " +
      f"vacuum: $tVacuum%.1f s ($reclaimed%d files reclaimed)")

    val filesPost = postingsFiles
    val servePost = serve("post-compact")
    val sumPost = checksum
    println(s"[probecompact] post-compact: files=$filesPost " +
      f"serve_median=${servePost.sorted.apply(runs / 2)}%.2f s " +
      s"answer=$sumPost")
    require(sumPre == sumPost,
      s"compaction changed the served answer: $sumPre vs $sumPost")
    println(s"[probecompact] HEADLINE files $filesPre -> $filesPost, " +
      f"serve ${servePre.sorted.apply(runs / 2)}%.2f -> " +
      f"${servePost.sorted.apply(runs / 2)}%.2f s, answers identical")
    spark.stop()
  }
}
