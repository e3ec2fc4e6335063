package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level attribution for q_dedup_minhash_lsh — the #2 sf100
  * in-bench cost (616.9 s r12, envelope 446–617 on unchanged code since
  * r2) that never had the ProbeJaccard-style split which found
  * jaccard's three fixes.
  *
  * `stages` mode times the CUMULATIVE production pipeline prefixes
  * through the bench's noop sink, using the very frames production
  * composes ([[graft.operators.Dedup.minhashStages]] — not a probe
  * re-derivation that could drift):
  *
  *   sig        — tokenize + 64-perm signature UDF + sorted token-hash
  *                set + band hashes, localCheckpoint (eager)
  *   candidates — band-bucket self-join + canonical-occurrence dedup
  *                (payload: sig + htoks + bhs ride the bucket exchange,
  *                exactly as production ships them)
  *   gated      — + signature-agreement estimate gate
  *   verified   — + exact sorted-intersection Jaccard (= the operator)
  *   ordered    — + the registry entry's global orderBy(doc_a, doc_b)
  *                over the ~answer-sized pair set
  *
  * Deltas between consecutive lines attribute the cost; the run-to-run
  * envelope question is answered by `SPARK_GRAFT_RUNS` repeats of the
  * full ordered pipeline after the split. Legacy `cards` mode keeps the
  * old bucket-cardinality dump. Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_DRIVER_MEM=80g \
  *     tools/run.sh graft.tools.ProbeMinhash stages [bands rows]
  */
object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    graft.tools.Scratch.sweepStale() // drop crashed runs' dead scratch first
    val mode = args.headOption.getOrElse("stages")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata-sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bands = if (args.length > 1) args(1).toInt else 8
    val rows = if (args.length > 2) args(2).toInt else 8

    if (mode == "stages") {
      val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
      def time[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[probeminhash] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      def sink(label: String, df: org.apache.spark.sql.DataFrame): Unit =
        time(label)(df.write.format("noop").mode("overwrite").save())
      // production threshold 0.9, bands 8 × rows 8 (the registry entry)
      val st = time("sig (checkpoint, eager)")(
        graft.operators.Dedup.minhashStages(docs, 0.9, bands, rows))
      sink("candidates (cumulative)", st.candidates)
      sink("gated      (cumulative)", st.gated)
      sink("verified   (cumulative)", st.verified)
      sink("ordered    (cumulative)", st.verified.orderBy("doc_a", "doc_b"))
      println("[probeminhash] counts: candidates=" +
        time("candidates count")(st.candidates.count()) +
        " gated=" + time("gated count")(st.gated.count()) +
        " verified=" + time("verified count")(st.verified.count()))
      (1 to runs).foreach { i =>
        val full = time(s"full rebuild run $i")(
          graft.operators.Dedup.minhashStages(docs, 0.9, bands, rows))
        sink(s"full ordered run $i",
          full.verified.orderBy("doc_a", "doc_b"))
      }
    } else if (mode == "verify") {
      // A/B of the exact-verify kernel (plain merge vs threshold-bounded
      // early-abort), full production pipeline each way, one JVM
      val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
      def sink(label: String, df: org.apache.spark.sql.DataFrame): Unit = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[probeminhash] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      (1 to runs).foreach { i =>
        sink(s"verified plain   run $i", graft.operators.Dedup
          .minhashStages(docs, 0.9, bands, rows, boundedVerify = false).verified)
        sink(s"verified bounded run $i", graft.operators.Dedup
          .minhashStages(docs, 0.9, bands, rows, boundedVerify = true).verified)
      }
    } else { // legacy bucket-cardinality dump
      val numPerm = bands * rows
      val sigUdf = udf { (toks: Seq[String]) =>
        graft.operators.Dedup.minhashSignature(toks, numPerm) }
      val bandHashUdf = udf { (sig: Seq[Long]) =>
        (0 until bands).map { bd =>
          var h = 1125899906842597L
          var j = bd * rows
          while (j < (bd + 1) * rows) { h = h * 31 + sig(j); j += 1 }
          bd.toLong << 56 | (h & 0xffffffffffffL)
        }
      }
      val sigs = docs.select(col("doc_id"),
          graft.functions.TextAnalysis.tokenSet(col("text")).as("_ts"))
        .select(col("doc_id"), sigUdf(col("_ts")).as("sig"))
        .localCheckpoint()
      val buckets = sigs.select(col("doc_id"),
        explode(bandHashUdf(col("sig"))).as("bucket")).localCheckpoint()
      val sizes = buckets.groupBy("bucket").agg(count(lit(1)).as("n"))
        .localCheckpoint()
      println("bucket rows: " + buckets.count())
      sizes.agg(max("n"), sum(col("n") * (col("n") - 1) / 2).as("pairs_upper"))
        .show(false)
      sizes.where(col("n") > 1).groupBy("n").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("n")).show(20, false)
      val cand = buckets.as("x").join(buckets.as("y"), Seq("bucket"))
        .where(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      val t0 = System.nanoTime()
      println("distinct candidates: " + cand.distinct().count()
        + f" (${(System.nanoTime()-t0)/1e9}%.1f s)")
    }
    spark.stop()
  }
}
