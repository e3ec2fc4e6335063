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
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          peakMem.updateAndGet(p => math.max(p, m.peakExecutionMemory))
        }
      }
    })

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(label: String)(f: => Any): Unit = {
      memSpill.set(0); diskSpill.set(0); peakMem.set(0)
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; give the bus a beat
      Thread.sleep(300)
      println(f"[probetfidf] $label: $sec%.2f s " +
        f"spill=${memSpill.get / (1 << 20)}MiB/mem " +
        f"${diskSpill.get / (1 << 20)}MiB/disk " +
        f"peakTask=${peakMem.get / (1 << 20)}MiB ($r)")
    }
    def noop(label: String, df: => DataFrame): Unit =
      time(label)(df.write.format("noop").mode("overwrite").save())

    // current production shape first (whatever tfidfTopTerms is today)
    noop("warm (production)", TextAnalysis.tfidfTopTerms(docs, 3))

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
