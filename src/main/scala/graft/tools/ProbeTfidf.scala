package graft.tools

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
  * drift. Usage:
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
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(label: String, df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[probetfidf] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // current production shape first (whatever tfidfTopTerms is today)
    time("warm (production)", TextAnalysis.tfidfTopTerms(docs, 3))
    (1 to 2).foreach { i =>
      time(s"old3pass run $i", vOld(docs, 3))
      time(s"lenkey run $i", vKey(docs, 3))
      time(s"production run $i", TextAnalysis.tfidfTopTerms(docs, 3))
    }
    spark.stop()
  }
}
