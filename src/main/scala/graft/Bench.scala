package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    // reclaim dead blockmgr/spark-local dirs from crashed earlier runs
    // BEFORE allocating our own scratch (r11-late box note: 35 GB of
    // stale blockmgr starved the next run's page cache)
    graft.tools.Scratch.sweepStale()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // bounded-id fetches (ANN rerank: vec_id isin over ~nQ·rerankK
      // scattered ids) must push the real In SET to parquet: above this
      // threshold Spark degrades In to a [min,max] range, which prunes
      // no row group over scattered ids — measured at 20M vectors as a
      // full-corpus cold read per serve (6.7 GiB -> 2.4 GiB with the
      // set pushed; BASELINE.md r16)
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
      // ContextCleaner's own periodic driver GC (default 30 min): on a
      // >1 h at-scale sweep the explicit every-8-queries System.gc()
      // below still left enough un-reclaimed shuffle scratch on disk to
      // ENOSPC a 49 GB-headroom box mid-sweep (r14 sf100, the two
      // embed queries' sort spill landing on top of ~100 queries'
      // accumulated shuffle files). 2 min keeps reclamation ahead of
      // accumulation regardless of query cadence.
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/JIT/codegen/parquet-reader warmup so whichever query the map
    // happens to order first doesn't absorb one-time startup cost. The
    // r5 driver run showed the 64-row warmup alone is NOT enough: the
    // first ~10 timed queries of a cold JVM ran 4-30x their steady cost
    // (minhash median 39 s vs 7 s steady), so also touch every base
    // table at full sf and prime the heavy operator paths on real rows.
    // Warmup is best-effort: a missing table at a differently-populated
    // SF dir must not abort the bench before a single query is timed.
    locally {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      import graft.operators.{Dedup, Similarity}
      def warm(step: => Unit): Unit =
        try step catch { case t: Throwable =>
          System.err.println(s"[bench] warmup step skipped: ${t.getMessage}") }
      Seq("nation", "region", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
        warm(spark.read.parquet(s"$sfDir/$t.parquet").count())
      }
      warm(spark.read.parquet(s"$sfDir/nation.parquet")
        .withColumn("rn", row_number().over(
          Window.partitionBy("n_regionkey").orderBy("n_nationkey")))
        .agg(sum("rn")).collect())
      warm {
        val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(64)
        Dedup.minhashLshPairs(docs, 0.9, bands = 8, rows = 8).count()
        Dedup.jaccardPairs(docs, 0.9).count()
      }
      warm {
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(64)
        Similarity.exactTopK(emb, 2, 2).count()
      }
    }
    // The heavy candidate-pair queries swing ±30% run-to-run (GC timing
    // against a quadratic-ish true answer); report their MEDIAN of 3 so
    // round-over-round regressions are attributable to code, not noise.
    val heavy = Set("q_dedup_ngram_jaccard", "q_dedup_minhash_lsh",
      "q_dedup_simhash_pairs", "q_embed_ann_ivf", "q_dedup_clusters",
      "q_bloom_decontaminate", "q_text_lm_score", "q_neardup_prune",
      "q_embed_semdedup", "q_embed_ann_lsh", "q_x3_fuzzy_prefix_join")
    // Optional explicit skip list (comma-separated query names) for
    // above-sf0.1 scale runs: the two deliberately-quadratic CONTRAST
    // queries (see BASELINE.md r9) grow without bound and would bury the
    // linear-claimed operators' measurement. Skips are RECORDED in the
    // output JSON — nothing silently disappears; the driver never sets
    // this, so contract runs always time every query.
    val skip = sys.env.get("SPARK_GRAFT_SKIP")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    // SPARK_GRAFT_SINGLE=1: one timed run per query, no medians/primes —
    // for the very large scale factors (sf100's heavy queries run
    // minutes each; a median-of-3 + prime would take hours for numbers
    // whose purpose is order-of-magnitude scaling ratios). The driver
    // never sets this, so contract runs keep the median discipline.
    val single = sys.env.get("SPARK_GRAFT_SINGLE").contains("1")
    // SPARK_GRAFT_FORK: run the named queries (or the whole heavy set,
    // value "heavy") each in a FRESH FORKED JVM via BenchOne instead of
    // the shared session. The r14 sweep showed the shared 90-minute
    // JVM's per-query numbers swing 2-4x on byte-identical code
    // (accumulated scratch/GC/page-cache interference) — exactly how a
    // real regression hides. A forked number is a fresh-JVM steady
    // (the only per-query figure comparable round-over-round at sf100)
    // at the cost of ~30 s JVM+warmup overhead per forked query, which
    // is OUTSIDE the timed window. The driver never sets this, so
    // contract runs are unchanged.
    val forkSet: Set[String] = sys.env.get("SPARK_GRAFT_FORK") match {
      case Some("heavy") => heavy
      case Some(s) => s.split(",").map(_.trim).filter(_.nonEmpty).toSet
      case None => Set.empty
    }
    // a failing query must be VISIBLE in the output, not silently timed
    // as a fast success deflating the total
    val failed = scala.collection.mutable.SortedSet[String]()
    // failure MESSAGES ride the output JSON, not just stderr: the r12
    // sf10 incident (4 transient disk-pressure failures) cost a full
    // re-diagnosis because the launcher pipeline's `tail -1` dropped
    // the stderr lines that said why
    val failMsg = scala.collection.mutable.SortedMap[String, String]()
    // Force FULL output evaluation through the noop sink (r12): the
    // previous action was .count(), which lets Catalyst prune every
    // computed column not needed for row counting — map-only queries
    // (simhash signatures, rolling fingerprints, the quality
    // classifier) timed the parquet ROW COUNT instead of the operator
    // (sf100 read 0.12–0.3 s for 5M-doc signature passes), and even
    // agg queries dropped unreferenced aggregate expressions and
    // top-level sorts. The noop sink evaluates every output row
    // end-to-end (sorts included) at zero sink cost. The old action
    // stays behind SPARK_GRAFT_FORCE=count for like-for-like A/Bs
    // against pre-r12 artifacts; the config JSON records which ran.
    val force = sys.env.getOrElse("SPARK_GRAFT_FORCE", "noop")
    def once(name: String,
             fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sfDir)
        if (force == "count") { df.count(); () }
        else df.write.format("noop").mode("overwrite").save()
      }
      catch { case t: Throwable =>
        failed += name
        failMsg.getOrElseUpdate(name,
          s"${t.getClass.getSimpleName}: ${Option(t.getMessage).getOrElse("")}"
            .replaceAll("[\\x00-\\x1f\"\\\\]", " ").take(300))
        System.err.println(s"[bench] $name FAILED: ${t.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    // Run the heavy queries LAST (the light ~75 double as further JVM
    // warmup) and give each heavy one untimed priming run before its
    // timed median: C2 compilation of a heavy path only finishes during
    // its first real-scale execution, and a median of 3 cold runs is
    // still cold.
    val (lightQ, heavyQ) = SparkEntry.queries
      .filter { case (n, _) => !skip(n) }
      .partition { case (n, _) => !heavy(n) }
    // Light queries report a MEDIAN of 3 too (first run doubles as the
    // prime — the median discards it if slow): a single timed run in the
    // shared JVM eats whole stop-the-world GCs of its neighbors' garbage,
    // which the r9 sf10 study measured as phantom 20-26x "superlinear"
    // entries (q_join_anti benched 11.2 s vs 1-3 s standalone steady;
    // q_domain_gate 10.2 s vs 2.2 s) that vanish under a median.
    // A query that failed once is not re-run (re-timing a 4-minute OOM
    // three times would dominate the bench wall-clock with known noise).
    def median3(name: String,
                fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val r1 = once(name, fn)
      if (single || failed(name)) r1
      else Seq(r1, once(name, fn), once(name, fn))
        .sorted(Ordering.Double.TotalOrdering)(1)
    }
    // UNTIMED driver GC between queries: Spark reclaims shuffle files
    // and broadcasts only when the ContextCleaner sees their driver
    // objects collected, and a large mostly-empty heap can go the whole
    // bench without a single old-gen GC — hundreds of queries' shuffle
    // output then accumulates on local disk until writes throttle. The
    // r9 sf10 run measured the effect directly: q_text_tfidf (the
    // largest light-query shuffle) read 180 s in-bench vs 5-8 s
    // standalone. Periodic, not per-query: a full GC on a large heap
    // costs seconds itself.
    var sinceGc = 0
    def maybeGc(): Unit = { sinceGc += 1; if (sinceGc >= 8) { sinceGc = 0; System.gc() } }
    // fresh-JVM measurement of one query: fork BenchOne with this JVM's
    // exact flags/classpath/env, parse its per-run lines, median them.
    // A child failure is recorded like an in-process one.
    def forkOne(name: String): Double = {
      import scala.jdk.CollectionConverters._
      val javaBin = System.getProperty("java.home") + "/bin/java"
      val jvmArgs = java.lang.management.ManagementFactory
        .getRuntimeMXBean.getInputArguments.asScala.toSeq
      val cmd = Seq(javaBin) ++ jvmArgs ++
        Seq("-cp", System.getProperty("java.class.path"),
          "graft.BenchOne", name)
      val pb = new ProcessBuilder(cmd.asJava)
      pb.environment().put("SPARK_GRAFT_RUNS", if (single) "1" else "3")
      pb.redirectErrorStream(false)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val p = pb.start()
      val out = scala.io.Source.fromInputStream(p.getInputStream, "UTF-8")
        .getLines().toList
      val rc = p.waitFor()
      val times = out.flatMap { l =>
        val m = s"\\[benchone\\] \\Q$name\\E run \\d+: ([0-9.]+) s".r
          .findFirstMatchIn(l)
        m.map(_.group(1).toDouble)
      }
      if (rc != 0 || times.isEmpty) {
        failed += name
        failMsg.getOrElseUpdate(name,
          s"fork rc=$rc: ${out.lastOption.getOrElse("")}"
            .replaceAll("[\\x00-\\x1f\"\\\\]", " ").take(300))
        System.err.println(s"[bench] $name FORK FAILED rc=$rc")
        0.0
      } else times.sorted.apply(times.size / 2)
    }
    // per-query progress on stderr: a sweep cut by wall-clock (the r15
    // sf100 incident — ~75 min of a ~2.5 h sweep lost with no partial
    // data, Bench's JSON prints only at the end) still leaves every
    // completed query's steady in the log. The wall-clock stamp (r16
    // verdict #5) makes a contended window identifiable post-hoc: the
    // r16 sweep's first ~50 min overlapped concurrent test runs and
    // nothing in the log could date which queries were affected.
    def progress(name: String, v: Double): Double = {
      val now = java.time.Instant.now().toString
      System.err.println(f"[bench] done $name: $v%.2f s at $now")
      v
    }
    val lightResults = lightQ.map { case (name, fn) =>
      maybeGc()
      name -> progress(name,
        if (forkSet(name)) forkOne(name) else median3(name, fn))
    }
    val heavyResults = heavyQ.map { case (name, fn) =>
      maybeGc()
      if (forkSet(name)) name -> progress(name, forkOne(name))
      else {
        if (!single) once(name, fn) // untimed prime
        name -> progress(name,
          if (failed(name)) 0.0 else median3(name, fn))
      }
    }
    val results = lightResults ++ heavyResults
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val failMsgJson = failMsg
      .map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val skippedJson = skip.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // record the MEASUREMENT CONFIG in the artifact: the r11 sf100
    // sweep ran at 32 shuffle partitions (~19M rows/partition through
    // the sort-merge joins) and nothing in the JSON said so — the
    // in-bench numbers looked like plan regressions instead of a
    // measurement setting
    val shufp = spark.conf.get("spark.sql.shuffle.partitions")
    val heapGb = Runtime.getRuntime.maxMemory / (1 << 30)
    val forkJson = forkSet.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val config =
      s"""{"shuffle_partitions":$shufp,"cpus":"$cpus","heap_gb":$heapGb,"single":$single,"force":"$force","fork":$forkJson}"""
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"fail_msgs":$failMsgJson,"skipped":$skippedJson,"config":$config,"sf":"$sfDir"}"""
    val totalOnly =
      s"""{"metric":"total_only","value":$total,"unit":"sec","n_queries":${results.size},"failed":$failedJson}"""
    // The harness keeps only the TAIL of this process's output and the
    // full per-query map is one long line, so the r5 "total first" fix
    // was itself truncated away. Order matters: giant line first, short
    // headline line LAST so the tail always retains a parseable total.
    // The complete JSON also goes to bench_last.json as the canonical
    // record.
    println(json)
    println(totalOnly)
    // best-effort file copy: a read-only cwd must not cost the
    // per-query record
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_last.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: java.io.IOException =>
      System.err.println(s"[bench] bench_last.json not written: $e") }
    spark.stop()
  }
}
