package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-box A/B for the r11 CC edge contraction: build the jaccard
  * candidate graph at the given SF, then run [[graft.operators.Dedup
  * .duplicateClusters]] twice — contraction ON (default threshold) vs
  * OFF (threshold = Long.MaxValue) — and print both wall times plus an
  * output-equality check (label sums + component counts). Usage:
  * `tools/run.sh graft.tools.ProbeCC <sfDir>`. */
object ProbeCC {
  def main(args: Array[String]): Unit = {
    graft.tools.Scratch.sweepStale() // drop crashed runs' dead scratch first
    val sfDir = if (args.length > 0) args(0) else "/root/repo/testdata-sf10"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probecc] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // DISK_ONLY for every probe-level checkpoint: the probe stacks
    // token sets + prefixes + the 842M-row sf100 candidate list +
    // endpoints in ONE JVM, and at MEMORY_AND_DISK those storage
    // blocks starved the CC aggregates' execution memory
    // (UNABLE_TO_ACQUIRE_MEMORY at both 32 and 256 shuffle partitions,
    // 80 g heap). A real cluster spreads these over executors; the
    // single-box probe reads them back from local disk instead.
    val disk = org.apache.spark.storage.StorageLevel.DISK_ONLY
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val toks = graft.operators.Dedup.tokenSets(docs).localCheckpoint(true, disk)
    val pfx = graft.operators.Dedup.prefixTokens(toks, 0.9).localCheckpoint(true, disk)
    // the exact operator path (shared with jaccardPairs — no drift)
    val cand = t("candidates")(
      graft.operators.Dedup.jaccardCandidates(pfx, 0.9).localCheckpoint(true, disk))
    println(s"[probecc] candidate pairs=${cand.count()}")
    val endpoints = cand.select(col("doc_a").as("doc_id"))
      .unionByName(cand.select(col("doc_b").as("doc_id"))).distinct()
      .localCheckpoint(true, disk)

    def summarize(tag: String, thr: Long): (Long, java.math.BigDecimal) = {
      val cc = t(s"duplicateClusters($tag)")(
        graft.operators.Dedup.duplicateClusters(cand, endpoints,
          maxRounds = 50, pairsMaterialized = true,
          contractAboveEdges = thr).localCheckpoint())
      val n = cc.select(countDistinct("cluster_id")).first().getLong(0)
      val s = cc.agg(sum(col("cluster_id")
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .first().getDecimal(0)
      (n, s)
    }
    val on = summarize("contraction-on", 10000000L)
    val off = summarize("contraction-off", Long.MaxValue)
    println(s"[probecc] components on=${on._1} off=${off._1} " +
      s"labelSum equal=${on._2.compareTo(off._2) == 0}")
    // compareTo, not tuple equality: BigDecimal.equals is scale-
    // sensitive (compareTo == 0 but equals false for differing scales)
    require(on._1 == off._1 && on._2.compareTo(off._2) == 0,
      "contraction changed the output!")
    spark.stop()
  }
}
