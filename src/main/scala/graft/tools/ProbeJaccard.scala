package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage diagnostic for the cluster-routed Jaccard verify at
  * scale: times candidate generation, the CC labeling, and the cogroup
  * verify separately, and prints the component-size histogram — the
  * number that decides whether component routing bounds per-group
  * memory (dup families) or percolates (one giant component). */
object ProbeJaccard {
  def main(args: Array[String]): Unit = {
    graft.tools.Scratch.sweepStale() // drop crashed runs' dead scratch first
    val sfDir = if (args.length > 0) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata-sf100")
    val threshold = if (args.length > 1) args(1).toDouble else 0.9
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val toks = t("tokenSets")(
      graft.operators.Dedup.tokenSets(docs).localCheckpoint())
    println(s"[probe] docs=${toks.count()}")
    val pfx = t("prefixTokens")(
      graft.operators.Dedup.prefixTokens(toks, threshold).localCheckpoint())
    println(s"[probe] prefix rows=${pfx.count()}")

    // SPARK_GRAFT_AB=1: also time the dedup-only candidate join
    // (positional bound OFF) for the like-for-like r12 ppjoin A/B
    if (sys.env.get("SPARK_GRAFT_AB").contains("1")) {
      val c0 = t("candidates(no positional bound)")(
        graft.operators.Dedup.jaccardCandidates(pfx, threshold,
          positional = false).localCheckpoint())
      println(s"[probe] candidate pairs (no bound)=${c0.count()}")
      c0.unpersist()
      System.gc()
    }
    // the exact operator path (shared with jaccardPairs — no drift)
    val cand = t("candidates")(
      graft.operators.Dedup.jaccardCandidates(pfx, threshold)
        .localCheckpoint())
    println(s"[probe] candidate pairs=${cand.count()}")
    System.gc()

    val endpoints = cand.select(col("doc_a").as("doc_id"))
      .unionByName(cand.select(col("doc_b").as("doc_id"))).distinct()
    val cm = t("duplicateClusters")(
      graft.operators.Dedup.duplicateClusters(cand, endpoints,
        maxRounds = 50, pairsMaterialized = true)
        .localCheckpoint())
    val sizes = cm.groupBy("cluster_id").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    println(s"[probe] components=${sizes.count()}")
    sizes.agg(max("n").as("max"), expr("percentile(n, 0.5)").as("p50"),
        expr("percentile(n, 0.99)").as("p99"), sum("n").as("docs"))
      .show(false)
    // pairs per component (the verify work distribution)
    cand.join(cm.withColumnRenamed("doc_id", "doc_a"), "doc_a")
      .groupBy("cluster_id").agg(count(lit(1)).as("pairs"))
      .agg(max("pairs").as("max_pairs"),
        expr("percentile(pairs, 0.99)").as("p99_pairs"),
        count(lit(1)).as("n_comp")).show(false)
    System.gc()

    val verified = t("cogroupVerify")(
      graft.operators.Dedup.clusterRoutedVerify(cand, toks, threshold))
    println(s"[probe] true pairs=${t("verifyCount")(verified.count())}")
    spark.stop()
  }
}
