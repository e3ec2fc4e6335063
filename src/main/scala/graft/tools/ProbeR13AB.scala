package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{PortableHash, TextAnalysis}

/** r13 A/B probe for the two plan reshapes of this round, timed side
  * by side in ONE JVM with the bench's noop force (the ProbeTfidf
  * discipline — a cross-JVM or cross-day comparison confounds box
  * drift with the code change):
  *
  *  - `q_approx_distinct`: the r12 shape put two countDistincts over
  *    different columns in one aggregate → Catalyst plans an Expand ×3
  *    (every events row tripled through the shuffle; 683.6 s sf100
  *    in-bench, the top registry cost). New shape: per-column
  *    two-level pre-dedup aggregates, sketch riding the second pass.
  *  - `q_quality_classifier`: the r12 shape evaluated the
  *    `tokens(text)` split in three expression positions per row;
  *    new shape stages the token array through its own projection.
  *
  * The OLD shapes live here verbatim so the A/B survives the
  * production code moving on. Equality of old vs new is asserted for
  * the approx query (per-type rows, metadata-scale collect); quality's
  * 5M-row output is pinned by its unchanged DuckDB oracle instead.
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_DRIVER_MEM=80g \
  *     tools/run.sh graft.tools.ProbeR13AB [approx|quality|both]
  */
object ProbeR13AB {

  /** r12 shape: one aggregate, two countDistincts → Expand ×3. */
  def approxOld(e: DataFrame): DataFrame =
    e.groupBy("event_type").agg(
      approx_count_distinct("user_id", 0.02).as("au"),
      approx_count_distinct("event_id", 0.02).as("ae"),
      countDistinct(col("user_id")).as("exact_users"),
      countDistinct(col("event_id")).as("exact_events"))
      .select(col("event_type"), col("exact_users"), col("exact_events"),
        (abs(col("au") - col("exact_users")) * 100 <=
          col("exact_users") * 6).as("users_ok"),
        (abs(col("ae") - col("exact_events")) * 100 <=
          col("exact_events") * 6).as("events_ok"))
      .orderBy("event_type")

  /** r12 shape of q_text_pii_redact: six independent regexp
    * expressions (three size(regexp_extract_all) counts on the
    * original + three nested regexp_replace) — six UTF-8 decodes of
    * every document per row. */
  def piiOld(docs: DataFrame): DataFrame = {
    val injected = docs.select(col("doc_id"),
      when(col("doc_id") % 2 === 0,
        concat(col("text"), lit(" reach me at user"),
          col("doc_id").cast("string"),
          lit("@example.com or +1-555-0199 host 10."),
          (col("doc_id") % 256).cast("string"), lit(".0.1")))
        .otherwise(col("text")).as("text"))
    val (red, ne, ni, np) = TextAnalysis.redactPii(col("text"))
    injected.select(col("doc_id"), ne.as("n_emails"), ni.as("n_ips"),
        np.as("n_phones"), red.as("redacted_text"))
      .orderBy("doc_id")
  }

  /** r12 shape: tokens(text) inlined in three expression positions. */
  def qualityOld(docs: DataFrame): DataFrame = {
    val weights = (0 until 256).map(b =>
      ((b * 2654435761L % 4294967296L) % 2001 - 1000) / 1000.0)
    val nb = weights.size
    val toks = TextAnalysis.tokens(col("text"))
    val tokenWeight: Column => Column = t =>
      element_at(typedLit(weights),
        (PortableHash.cp31uCol(t) % nb).cast("int") + 1)
    val score = lit(0.1) +
      aggregate(toks, lit(0.0), (acc, t) => acc + tokenWeight(t)) /
        size(toks)
    docs.select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"),
        score.as("qscore"))
      .withColumn("keep", col("qscore") >= 0.0)
      .orderBy("doc_id")
  }

  def main(args: Array[String]): Unit = {
    Scratch.sweepStale()
    val which = args.headOption.getOrElse("both")
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
    def time(label: String, df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[prober13] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val events = graft.queries.Tables.events(spark, sfDir)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def approxNew = graft.SparkEntry.queries("q_approx_distinct")(spark, sfDir)
    def qualityNew = graft.SparkEntry.queries("q_quality_classifier")(spark, sfDir)

    if (which == "approx" || which == "both") {
      // equality first (metadata-scale collect: one row per event_type)
      val a = approxOld(events).collect().map(_.toString).sorted.toSeq
      val b = approxNew.collect().map(_.toString).sorted.toSeq
      require(a == b, s"approx old/new diverge:\nold=$a\nnew=$b")
      println(s"[prober13] approx equality OK (${a.size} rows)")
      (1 to runs).foreach { i =>
        time(s"approx_old(expand3) run $i", approxOld(events))
        time(s"approx_new(prededup) run $i", approxNew)
      }
    }
    if (which == "quality" || which == "both") {
      (1 to runs).foreach { i =>
        time(s"quality_old(3xsplit) run $i", qualityOld(docs))
        time(s"quality_new(staged) run $i", qualityNew)
      }
    }
    if (which == "pii") {
      def piiNew = graft.SparkEntry.queries("q_text_pii_redact")(spark, sfDir)
      // full-output equality at oracle scale (exceptAll both ways +
      // count): cheap below sf1, and PiiRedactSpec pins the adversarial
      // edge cases; at sf10/sf100 the unchanged DuckDB oracle is the
      // parity witness, so skip the in-probe join.
      if (sfDir.contains("sf0")) {
        val old = piiOld(docs)
        require(old.count() == piiNew.count() &&
          old.exceptAll(piiNew).isEmpty && piiNew.exceptAll(old).isEmpty,
          "pii old/new diverge")
        println("[prober13] pii equality OK")
      }
      (1 to runs).foreach { i =>
        time(s"pii_old(6xregex) run $i", piiOld(docs))
        time(s"pii_new(fused) run $i", piiNew)
      }
    }
    spark.stop()
  }
}
