package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SpanDedup

/** Hot-gram straggler measurement for the span-dedup window shape
  * (r15, the r14 verdict's #4): `Window.partitionBy(gh)` concentrates
  * ALL occurrences of one gram in one task's sort — spillable, so a
  * pathological gram (a whitespace run, a boilerplate token repeated
  * 10⁷×) degrades to a serialized single-task sort, not OOM. Nobody
  * had measured the degradation; this probe injects exactly that gram
  * and reports the wall-clock delta plus the straggler task's own
  * runtime.
  *
  * Injection: `SPARK_GRAFT_HOTDOCS` (default 13) documents of
  * `SPARK_GRAFT_HOTTOKS` (default 800000, kept under the operator's
  * 2²⁰ position contract) copies of one token — every l-window in
  * them is the SAME gram, so they contribute hotdocs·(hottoks-l+1)
  * ≈ 10⁷ occurrences of a single gh.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/repo/testdata-sf10 SPARK_GRAFT_CPUS=32 \
  *   SPARK_GRAFT_SHUFFLE=256 SPARK_DRIVER_MEM=80g \
  *   tools/run.sh graft.tools.ProbeSpanSkew
  */
object ProbeSpanSkew {
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
    val hotDocs = sys.env.getOrElse("SPARK_GRAFT_HOTDOCS", "13").toInt
    val hotToks = sys.env.getOrElse("SPARK_GRAFT_HOTTOKS", "800000").toInt
    require(hotToks < (1 << 20), "hot doc length must honor the 2^20 contract")

    // straggler witness: the longest single task of any stage in the run
    val maxTaskMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) maxTaskMs.updateAndGet(
          p => math.max(p, m.executorRunTime))
        ()
      }
    })

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    import spark.implicits._
    // SPARK_GRAFT_HOTMODE=concentrated (default): few giant docs that
    // are one token repeated — stresses the window sort AND the
    // per-document explode/rebuild (the rebuild cost is shape-
    // independent, so this mode UNDERSTATES any marking fix).
    // SPARK_GRAFT_HOTMODE=spread: the realistic boilerplate case —
    // many NORMAL-sized docs sharing one hot l-gram ("all rights
    // reserved …"), so per-doc costs parallelize and the single-task
    // window sort is the only straggler.
    val mode = sys.env.getOrElse("SPARK_GRAFT_HOTMODE", "concentrated")
    val hot =
      if (mode == "spread") {
        val nSpread = sys.env.getOrElse("SPARK_GRAFT_HOTSPREAD",
          "4000000").toInt
        val hotGram = (0 until 10).map(i => s"hz$i").mkString(" ")
        // 12-token docs: positions 2-3's grams carry the per-doc
        // unique suffix, so exactly ONE hot occurrence per doc
        spark.range(1, nSpread + 1)
          .select((col("id") + maxId).as("doc_id"),
            concat_ws(" ", lit(hotGram),
              concat(lit("u"), col("id")),
              concat(lit("w"), col("id"))).as("text"))
      } else {
        val hotText = Seq.fill(hotToks)("zq").mkString(" ")
        (1 to hotDocs).map(i => (maxId + i, hotText)).toDF("doc_id", "text")
      }
    val occ = if (mode == "spread")
        sys.env.getOrElse("SPARK_GRAFT_HOTSPREAD", "4000000").toLong
      else hotDocs.toLong * (hotToks - 10 + 1)
    println(s"[probespanskew] mode=$mode: ~$occ occurrences of ONE gram")

    def time(label: String)(df: => DataFrame): Unit = {
      maxTaskMs.set(0)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftprobe.ListenerDrain.drain(spark.sparkContext)
      println(f"[probespanskew] $label: $sec%.2f s " +
        f"maxTask=${maxTaskMs.get / 1000.0}%.1f s")
    }

    (1 to rounds).foreach { i =>
      time(s"window  baseline       run $i")(
        SpanDedup.removeDuplicateSpansShape(docs, 10, useWindow = true))
      // raw = guard disabled: the unprotected single-task sort
      time(s"window  hot-gram RAW   run $i")(
        SpanDedup.removeDuplicateSpansShape(docs.unionByName(hot), 10,
          useWindow = true, hotMinSampled = Long.MaxValue))
      // guarded (production defaults): the sampled heavy-hitter route
      time(s"window  hot-gram GUARD run $i")(
        SpanDedup.removeDuplicateSpansShape(docs.unionByName(hot), 10,
          useWindow = true))
      time(s"aggjoin baseline       run $i")(
        SpanDedup.removeDuplicateSpansShape(docs, 10, useWindow = false))
      time(s"aggjoin hot-gram       run $i")(
        SpanDedup.removeDuplicateSpansShape(docs.unionByName(hot), 10,
          useWindow = false))
      System.gc()
    }
    spark.stop()
  }
}
