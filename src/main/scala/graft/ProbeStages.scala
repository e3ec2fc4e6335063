package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage-split profiler for the heavy dedup queries: times the
  * candidate/gate stages separately from the exact-verify stage so
  * optimization effort goes where the seconds are. Not part of the
  * driver contract. */
object ProbeStages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.TextAnalysis
    import graft.operators.Dedup

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // warmup
    Dedup.minhashLshPairs(docs.limit(64), 0.9, bands = 8, rows = 8).count()
    Dedup.jaccardPairs(docs.limit(64), 0.9).count()

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      // tokenization + signatures only
      val tk = docs.select(col("doc_id"),
        TextAnalysis.sortedTokenSet(col("text")).as("toks"))
      time("tokenSet count")(tk.select(sum(size(col("toks")))).collect())
      val sigUdf = udf { (toks: Seq[String]) =>
        Dedup.minhashSignature(toks, 64) }
      time("signatures")(tk.select(sigUdf(col("toks")).as("sig"))
        .select(sum(size(col("sig")))).collect())

      time("minhash FULL")(
        Dedup.minhashLshPairs(docs, 0.9, bands = 8, rows = 8).count())
      time("jaccard FULL")(Dedup.jaccardPairs(docs, 0.9).count())
    }
    spark.stop()
  }
}
