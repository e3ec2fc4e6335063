package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Stage-split profiler for q_span_dedup ([[graft.operators.SpanDedup]])
  * — the r13 verdict's last unattributed >10× matched-mode superlinear
  * (25.3× in-bench / ~14× standalone sf10→sf100). Times the operator's
  * cumulative prefixes so each stage's own cost is the delta between
  * consecutive rows (the ProbeMinhash method), and counts the answer
  * sizes (duplicated grams, removed occurrences, covered tokens) so an
  * answer-growth superlinearity is separated from a plan one.
  *
  * Stages (mirrors SpanDedup.removeDuplicateSpans with l = 5, the
  * registry parameter):
  *   A tokenize        — toks localCheckpoint materialization
  *   B gram build      — map-only gram stream (slice+concat_ws+tok64),
  *                       partial-agg count/sum: no shuffle
  *   C stats shuffle   — grams → groupBy(gh) agg → cnt >= 2 (the only
  *                       corpus-sized shuffle)
  *   D marking join    — grams ⋈ dupStats, k != first_k, per-doc starts
  *                       (the CURRENT operator shape: note grams is
  *                       computed twice — agg side and join left — as
  *                       the two exchanges differ by the partial agg,
  *                       so ReuseExchange cannot kick in)
  *   D2 window shape   — the candidate: count/min over
  *                       Window.partitionBy(gh) then filter — ONE gram
  *                       build, ONE corpus-sized shuffle, no join
  *   E FULL            — current operator end-to-end (+ rebuild text)
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_CPUS=32 \
  *          SPARK_DRIVER_MEM=80g tools/run.sh graft.tools.ProbeSpan [l]
  */
object ProbeSpan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/testdata-sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "256")
    val l = if (args.nonEmpty) args(0).toInt else 5
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[probe] sfDir=$sfDir l=$l parts=$parts docs=${docs.count()}")

    // warmup: full operator on a slice primes codegen/JIT
    graft.operators.SpanDedup.removeDuplicateSpans(docs.limit(256), l)
      .agg(sum("n_removed")).collect()

    val PosStride = 1L << 20
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val toks = docs.select(col("doc_id"),
          TextAnalysis.tokens(coalesce(col("text"), lit(""))).as("t"))
        .localCheckpoint()
      time("A tokenize+checkpoint")(
        toks.agg(sum(size(col("t")))).collect()(0).getLong(0))
      def grams = toks
        .select(col("doc_id"), col("t"),
          explode(when(size(col("t")) >= l,
              sequence(lit(1), size(col("t")) - (l - 1)))
            .otherwise(array().cast("array<int>"))).as("p"))
        .select(col("doc_id"), col("p"),
          graft.plans.Tok64Hash.tok64Col(spark,
            concat_ws(" ", slice(col("t"), col("p"), lit(l)))).as("gh"))
        .withColumn("k", col("doc_id") * PosStride + col("p"))
      val dupStats = grams.groupBy("gh")
        .agg(count(lit(1)).as("cnt"), min(col("k")).as("first_k"))
        .where(col("cnt") >= 2)
        .select("gh", "first_k")
      val startsOld = grams.join(dupStats, Seq("gh"))
        .where(col("k") =!= col("first_k"))
        .groupBy("doc_id").agg(collect_list(col("p")).as("starts"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("gh")
      val starts2 = grams
        .withColumn("cnt", count(lit(1)).over(w))
        .withColumn("first_k", min(col("k")).over(w))
        .where(col("cnt") >= 2 && col("k") =!= col("first_k"))
        .groupBy("doc_id").agg(collect_list(col("p")).as("starts"))
      // per-stage timings (SPARK_GRAFT_STAGES=0 skips straight to the
      // full-operator A/B)
      if (sys.env.getOrElse("SPARK_GRAFT_STAGES", "1") == "1") {
        time("B gram build (map-only)")(
          grams.agg(count(lit(1)), sum(pmod(col("gh"), lit(1000))))
            .collect()(0).toSeq.mkString("/"))
        time("C stats shuffle (dup grams)")(dupStats.count())
        time("D marking join (docs-with-dups, occ)")(
          startsOld.agg(count(lit(1)), sum(size(col("starts"))))
            .collect()(0).toSeq.mkString("/"))
        time("D2 window-shape starts (docs-with-dups, occ)")(
          starts2.agg(count(lit(1)), sum(size(col("starts"))))
            .collect()(0).toSeq.mkString("/"))
      }
      // full-operator A/B in the same JVM: the pre-r14 agg+join shape
      // (inlined above, byte-identical to the r5–r13 operator) vs the
      // production window shape
      def rebuild(st: org.apache.spark.sql.DataFrame) = toks
        .join(st, Seq("doc_id"), "left")
        .withColumn("covered", array_distinct(flatten(transform(
          coalesce(col("starts"), array().cast("array<int>")),
          i => sequence(i, i + (l - 1))))))
        .withColumn("kept",
          array_except(sequence(lit(1), size(col("t"))), col("covered")))
        .select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"),
          size(col("covered")).cast("long").as("n_removed"),
          concat_ws(" ",
            transform(col("kept"), q => element_at(col("t"), q)))
            .as("deduped_text"))
      // noop force (the Bench convention): an agg consumer would let
      // Catalyst prune the deduped_text rebuild, the most expensive
      // map work. E-new pays its own tokenize+checkpoint inside the
      // operator (E-old reuses the probe's) — a handicap AGAINST the
      // new shape, so a win is a win a fortiori.
      time("E-old FULL (agg+join shape, noop)")(
        rebuild(startsOld).write.format("noop").mode("overwrite").save())
      time("E-new FULL (production window shape, noop)")(
        graft.operators.SpanDedup.removeDuplicateSpans(docs, l)
          .write.format("noop").mode("overwrite").save())
      toks.unpersist()
    }
    spark.stop()
  }
}
