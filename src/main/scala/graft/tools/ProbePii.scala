package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.plans.PiiRedact

/** Same-JVM A/B for the PII byte-gate ([[graft.plans.PiiRedact.run]])
  * — the r13 verdict's #5: `q_text_pii_redact` is the top map-only
  * sf100 cost (211 s standalone), and most real-corpus documents carry
  * no PII, so a raw-bytes pre-gate (no '@', no digit'.'digit, no
  * '+'digit ⇒ skip decode + every matcher) should cut the common case.
  *
  * Measures two corpus shapes, gated vs ungated alternating in ONE
  * session (the ungated arm flips [[PiiRedact.gateDisabledForProbe]] —
  * driver-local, valid under local[*] only):
  *   - "injected": the registry query's exact injection (every even
  *     doc gets an email+phone+ip appended) — 50% guaranteed-PII, the
  *     bench's own density;
  *   - "raw": documents.text as-is — the realistic density the gate is
  *     for (plus whatever digit-dot prose triggers it spuriously).
  * Also prints the gate hit-rate per shape so the A/B delta is
  * attributable to the skip rate.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_CPUS=32 \
  *          SPARK_DRIVER_MEM=80g tools/run.sh graft.tools.ProbePii
  */
object ProbePii {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/testdata-sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "256")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    PiiRedact.register(spark)

    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[probe] sfDir=$sfDir docs=${docs.count()}")

    val raw = docs.select(col("doc_id"),
      coalesce(col("text"), lit("")).as("text"))
    // the registry query's injection, verbatim (LlmQueries q_text_pii_redact)
    val injected = docs.select(col("doc_id"),
      when(col("doc_id") % 2 === 0,
        concat(col("text"), lit(" reach me at user"),
          col("doc_id").cast("string"),
          lit("@example.com or +1-555-0199 host 10."),
          (col("doc_id") % 256).cast("string"), lit(".0.1")))
        .otherwise(col("text")).as("text"))

    // consume every struct field so no matcher work is pruned away
    def scrub(df: DataFrame): String = {
      val r = df
        .withColumn("pii", TextAnalysis.redactPiiFused(col("text")))
        .agg(sum(length(col("pii.redacted_text"))),
          sum(col("pii.n_emails")), sum(col("pii.n_ips")),
          sum(col("pii.n_phones")))
        .collect()(0)
      r.toSeq.mkString("/")
    }

    // gate hit-rate: share of docs whose kernel output would take the
    // zero-scan path (witness = all three counts 0 AND text unchanged
    // is not observable cheaply; approximate with the gate predicate
    // itself spelled in SQL on the raw bytes' string form)
    def gateRate(df: DataFrame): Unit = {
      val gated = df.select(
        (col("text").contains("@") ||
          col("text").rlike("[0-9]\\.[0-9]") ||
          col("text").rlike("\\+[0-9]")).cast("long").as("hit"))
      val r = gated.agg(sum(col("hit")), count(lit(1))).collect()(0)
      println(s"[probe] gate-hit docs: ${r.getLong(0)} / ${r.getLong(1)}")
    }
    gateRate(raw); gateRate(injected)

    // warmup primes codegen/JIT on a slice
    scrub(injected.limit(1024)); scrub(raw.limit(1024))

    (1 to 3).foreach { round =>
      println(s"--- round $round ---")
      for (shape <- Seq("raw", "injected"); arm <- Seq("gated", "ungated")) {
        PiiRedact.gateDisabledForProbe = arm == "ungated"
        val df = if (shape == "raw") raw else injected
        time(s"$shape/$arm")(scrub(df))
      }
      PiiRedact.gateDisabledForProbe = false
    }
    spark.stop()
  }
}
