package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.functions.TextAnalysis.tokens

/** Evidence probe for the q_text_lm_score residual (TextAnalysis
  * bigramLmScores) — the one steady >10× sf10→sf100 in-bench ratio not
  * tracking answer size. The standing explanation (r10–r12): GenScale's
  * per-replica suffix rewrite DIVERSIFIES vocabulary ×10 per level, so
  * the corpus-wide unigram/bigram count tables (c1/c2) grow linearly
  * with the corpus and their joins against the per-doc stream shuffle
  * ever-larger sides — eroding the occurrence-collapse the operator
  * was designed around, which assumes a ~Heaps-law vocabulary. This
  * probe MEASURES the claim on the distribution the operator targets:
  * the same corpus size with Zipfian fixed-vocab text (`GenScale
  * zipfdocs`) vs the suffix-rewritten original, one JVM, noop force —
  * plus the corpus stats (distinct unigrams/bigrams vs occurrences)
  * that are the mechanism itself. Usage:
  *   SPARK_GRAFT_SF_DIR=/root/repo/testdata-sf10 \
  *   SPARK_GRAFT_ZIPF_DIR=/root/repo/testdata-sf10-zipf \
  *   SPARK_DRIVER_MEM=80g tools/run.sh graft.tools.ProbeLmZipf
  */
object ProbeLmZipf {
  def main(args: Array[String]): Unit = {
    Scratch.sweepStale()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata-sf10")
    val zipfDir = sys.env.getOrElse("SPARK_GRAFT_ZIPF_DIR", "/root/repo/testdata-sf10-zipf")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt

    def stats(label: String, docs: DataFrame): Unit = {
      val t = docs.select(col("doc_id"), tokens(col("text")).as("t"))
      val occ = t.agg(sum(greatest(size(col("t")) - 1, lit(0))))
        .head().getLong(0)
      val uni = t.select(explode(col("t")).as("w"))
        .agg(countDistinct("w")).head().getLong(0)
      val bi = t.where(size(col("t")) >= 2)
        .select(explode(transform(sequence(lit(0), size(col("t")) - 2),
          i => concat_ws(" ", element_at(col("t"), i + 1),
            element_at(col("t"), i + 2)))).as("bg"))
        .agg(countDistinct("bg")).head().getLong(0)
      println(f"[probelm] $label: bigram_occurrences=$occ distinct_unigrams=$uni " +
        f"distinct_bigrams=$bi collapse=${occ.toDouble / bi}%.1fx")
    }
    def time(label: String, df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[probelm] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // the zipf corpus is regenerable scratch (not committed; see
    // .gitignore): fail with the recipe instead of a bare read error
    if (!new java.io.File(s"$zipfDir/documents.parquet").exists()) sys.error(
      s"$zipfDir/documents.parquet missing — regenerate with:\n" +
        s"  SPARK_DRIVER_MEM=80g tools/run.sh graft.tools.GenScale " +
        s"zipfdocs $sfDir $zipfDir")
    val suffix = spark.read.parquet(s"$sfDir/documents.parquet")
    val zipf = spark.read.parquet(s"$zipfDir/documents.parquet")
    stats("suffix", suffix)
    stats("zipf  ", zipf)
    (1 to runs).foreach { i =>
      time(s"lm suffix run $i", TextAnalysis.bigramLmScores(suffix))
      time(s"lm zipf   run $i", TextAnalysis.bigramLmScores(zipf))
    }
    spark.stop()
  }
}
