package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.functions.TextAnalysis.{tokenCount, tokens}

/** A/B/C probe for the tfidf shape war (r12, BASELINE.md): the r12
  * "length rides the tf key" cut measured ~4.5× SLOWER at sf100 than
  * the three-pass r5 original it replaced, in every df-derivation
  * variant tried (raw-stream dedup, df-from-tf, DISK_ONLY-checkpointed
  * tf). This probe times the shapes side by side in ONE JVM with the
  * bench's noop force so the comparison can't be confounded by box
  * drift.
  *
  * r14 additions (the r13 verdict's #4 — the kept shape is ~19×
  * matched-mode sf10→sf100 and the residual was hypothesized, not
  * measured):
  *   - cumulative per-pass stages (explode consume → tf → +len →
  *     +df → full window) so the superlinear pass is attributable;
  *   - a task-metrics listener summing memory/disk spill bytes per
  *     timed run — the spill hypothesis becomes a number;
  *   - vHash: the one shape r12 did NOT cover — every corpus-sized
  *     shuffle carries tok64(word) instead of the string (the
  *     LineDedup trick), word strings recovered for the k·N winners
  *     from a vocab-sized dictionary join.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... tools/run.sh graft.tools.ProbeTfidf
  */
object ProbeTfidf {

  /** r5 original: one exploded stream, three aggregate consumers
    * (tf / per-doc len / distinct df), two joins back. */
  def vOld(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = docs.select(col("doc_id"),
      explode(tokens(col("text"))).as("word"))
    val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val len = words.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val dfreq = words.select("doc_id", "word").distinct()
      .groupBy("word").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val score = col("tf").cast("double") / col("len") *
      col("n_docs") / col("df")
    tf.join(len, "doc_id").join(dfreq, "word")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", score)
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(desc("score"), asc("word"))))
      .where(col("rn") <= k)
      .select(col("doc_id"), col("word"), col("score"),
        col("rn").cast("long").as("rn"))
  }

  /** r12 cut: len in the tf key, df from tf (no checkpoint). */
  def vKey(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = docs.select(col("doc_id"),
      tokenCount(col("text")).as("len"),
      explode(tokens(col("text"))).as("word"))
    val tf = words.groupBy("doc_id", "len", "word")
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val score = col("tf").cast("double") / col("len") *
      col("n_docs") / col("df")
    tf.join(dfreq, "word")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", score)
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(desc("score"), asc("word"))))
      .where(col("rn") <= k)
      .select(col("doc_id"), col("word"), col("score"),
        col("rn").cast("long").as("rn"))
  }

  /** r14 candidate: three-pass shape but every corpus-sized shuffle
    * keys on tok64(word) — the string never leaves the map side
    * (LineDedup's trick). Strings come back via a vocab-sized
    * dictionary (map-side partial agg collapses the 400M-row stream to
    * per-partition vocab before its shuffle); the dict join lands on
    * tf rows BEFORE the window so the (desc score, asc word) tie-break
    * is string-exact — AQE broadcasts the dict when vocab allows and
    * sort-merges when it doesn't. Hash ≡ string identity up to the
    * repo's documented 2⁻⁶⁴-scale collision trade. */
  def vHash(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    def wordsH = docs.select(col("doc_id"),
        explode(tokens(col("text"))).as("word"))
      .select(col("doc_id"),
        graft.plans.Tok64Hash.tok64Col(spark, col("word")).as("w64"))
    val tf = wordsH.groupBy("doc_id", "w64").agg(count(lit(1)).as("tf"))
    val len = wordsH.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val dfreq = wordsH.distinct()
      .groupBy("w64").agg(count(lit(1)).as("df"))
    val dict = docs.select(explode(tokens(col("text"))).as("word"))
      .select(graft.plans.Tok64Hash.tok64Col(spark, col("word")).as("w64"),
        col("word"))
      .groupBy("w64").agg(min("word").as("word"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val score = col("tf").cast("double") / col("len") *
      col("n_docs") / col("df")
    tf.join(len, "doc_id").join(dfreq, "w64").join(dict, "w64")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", score)
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(desc("score"), asc("word"))))
      .where(col("rn") <= k)
      .select(col("doc_id"), col("word"), col("score"),
        col("rn").cast("long").as("rn"))
  }

  /** r14 candidate, the shape the r12 war did NOT cover: keep the
    * three-aggregate structure but derive len and df FROM tf by plain
    * DAG reuse — no len-in-key (variant a's loss), no checkpoint
    * (variants b/c's loss). INTENT: the three consumers contain
    * byte-identical `Exchange(hash(doc_id, word),
    * partial_count(explode...))` subtrees, which ReuseExchange/AQE
    * stage reuse COULD unify into one corpus explode + one big
    * shuffle. MEASURED OUTCOME (BASELINE.md r14): reuse does NOT fire
    * — the post-execution adaptive plan shows three separate
    * exchanges and zero ReusedExchange/ReusedQueryStage nodes, and
    * the shape times at parity with the production three-pass. Kept
    * as a recorded negative so the hypothesis isn't re-tried. */
  def vTf(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = docs.select(col("doc_id"),
      explode(tokens(col("text"))).as("word"))
    val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val len = tf.groupBy("doc_id").agg(sum("tf").as("len"))
    // count(tf) not count(1): tf is a count output (never null) so the
    // value is identical, but referencing the column stops the
    // optimizer from PRUNING tf's count out of this branch's partial
    // agg — pruned, the subtree is no longer byte-identical to tf's
    // and AQE stage reuse cannot unify the exchanges (measured: the
    // count(1) spelling plans `functions=[]` in the df branch)
    val dfreq = tf.groupBy("word").agg(count(col("tf")).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val score = col("tf").cast("double") / col("len") *
      col("n_docs") / col("df")
    tf.join(len, "doc_id").join(dfreq, "word")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", score)
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(desc("score"), asc("word"))))
      .where(col("rn") <= k)
      .select(col("doc_id"), col("word"), col("score"),
        col("rn").cast("long").as("rn"))
  }

  /** r14 candidate: tf computed ONCE into an in-memory columnar cache
    * (MEMORY_AND_DISK), three consumers read it. Differs from r12's
    * measured losers: no len-in-key, and no serialized DISK round-trip
    * of a localCheckpoint — the cache is the narrow 3-column tf
    * (~116M rows ≈ a few GB at sf100). One corpus explode + one big
    * exchange; len/df become map-collapsed small shuffles over the
    * cached rows. Returns the result plus an unpersist cleanup the
    * caller MUST run in a finally block after its action — otherwise
    * the multi-GB cache leaks for the JVM lifetime (the SHAPES_ONLY
    * loop's clearCache() only covered the happy path). The probe
    * times with the cache's own materialization included. */
  def vCache(docs: DataFrame, k: Int): (DataFrame, () => Unit) = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.storage.StorageLevel
    val words = docs.select(col("doc_id"),
      explode(tokens(col("text"))).as("word"))
    val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val len = tf.groupBy("doc_id").agg(sum("tf").as("len"))
    val dfreq = tf.groupBy("word").agg(count(col("tf")).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val score = col("tf").cast("double") / col("len") *
      col("n_docs") / col("df")
    val res = tf.join(len, "doc_id").join(dfreq, "word")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", score)
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(desc("score"), asc("word"))))
      .where(col("rn") <= k)
      .select(col("doc_id"), col("word"), col("score"),
        col("rn").cast("long").as("rn"))
    (res, () => { tf.unpersist(); () })
  }

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

    val memSpill = new AtomicLong
    val diskSpill = new AtomicLong
    val peakMem = new AtomicLong
    val inBytes = new AtomicLong
    val shufWrite = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          peakMem.updateAndGet(p => math.max(p, m.peakExecutionMemory))
          inBytes.addAndGet(m.inputMetrics.bytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(label: String)(f: => Any): Unit = {
      memSpill.set(0); diskSpill.set(0); peakMem.set(0)
      inBytes.set(0); shufWrite.set(0)
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      // deterministic listener drain (was a racy fixed sleep)
      org.apache.spark.graftprobe.ListenerDrain.drain(spark.sparkContext)
      println(f"[probetfidf] $label: $sec%.2f s " +
        f"spill=${memSpill.get / (1 << 20)}MiB/mem " +
        f"${diskSpill.get / (1 << 20)}MiB/disk " +
        f"peakTask=${peakMem.get / (1 << 20)}MiB " +
        f"read=${inBytes.get / (1 << 20)}MiB " +
        f"shufW=${shufWrite.get / (1 << 20)}MiB ($r)")
    }
    def noop(label: String, df: => DataFrame): Unit =
      time(label)(df.write.format("noop").mode("overwrite").save())

    // current production shape first (whatever tfidfTopTerms is today)
    noop("warm (production)", TextAnalysis.tfidfTopTerms(docs, 3))

    // SPARK_GRAFT_SHAPES_ONLY=1: skip the stage-attribution rounds and
    // just steady-state the shape A/B (3 rounds) — for re-measuring a
    // candidate without re-paying ~15 min of stage table
    if (sys.env.contains("SPARK_GRAFT_SHAPES_ONLY")) {
      (1 to 3).foreach { i =>
        noop(s"old3pass run $i", vOld(docs, 3))
        noop(s"tfreuse run $i", vTf(docs, 3))
        val (c, unpersistTf) = vCache(docs, 3)
        try noop(s"tfcache run $i", c)
        finally unpersistTf()
      }
      // reuse is an AQE runtime decision: execute once, then read the
      // FINAL adaptive plan (the pre-execution initialPlan never shows
      // ReusedExchange/ReusedQueryStage nodes)
      val t = vTf(docs, 3)
      t.write.format("noop").mode("overwrite").save()
      val plan = t.queryExecution.executedPlan.toString
      println("[probetfidf] tfreuse post-exec reuse nodes: " +
        "ReusedExchange=" + "ReusedExchange".r.findAllIn(plan).length +
        " ReusedQueryStage=" + "ReusedQueryStage".r.findAllIn(plan).length +
        " Exchange=" + "Exchange".r.findAllIn(plan).length)
      if (sys.env.contains("SPARK_GRAFT_PLAN")) println(plan)
      spark.stop()
      return
    }

    // cumulative per-pass attribution of the production three-pass shape
    def words = docs.select(col("doc_id"),
      explode(tokens(col("text"))).as("word"))
    (1 to 2).foreach { round =>
      println(s"--- stage round $round ---")
      time("T1 explode consume (map-only)")(
        words.agg(count(lit(1)), sum(length(col("word"))))
          .collect()(0).toSeq.mkString("/"))
      time("T2 tf agg")(
        words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
          .agg(count(lit(1)), sum(col("tf"))).collect()(0).toSeq.mkString("/"))
      time("T3 len agg")(
        words.groupBy("doc_id").agg(count(lit(1)).as("len"))
          .agg(count(lit(1))).collect()(0).toSeq.mkString("/"))
      time("T4 df agg (distinct+count)")(
        words.select("doc_id", "word").distinct()
          .groupBy("word").agg(count(lit(1)).as("df"))
          .agg(count(lit(1)), sum(col("df"))).collect()(0).toSeq.mkString("/"))
      noop("T5 FULL production", TextAnalysis.tfidfTopTerms(docs, 3))
    }

    (1 to 2).foreach { i =>
      noop(s"old3pass run $i", vOld(docs, 3))
      noop(s"hash3pass run $i", vHash(docs, 3))
      noop(s"production run $i", TextAnalysis.tfidfTopTerms(docs, 3))
    }
    spark.stop()
  }
}
