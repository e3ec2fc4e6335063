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

      // decontamination stage split
      val isBench = graft.operators.Sampling
        .portableBucket(col("doc_id"), 7) < 200
      val grams3 = explode(array_distinct(
        TextAnalysis.wordNgrams(col("text"), 3))).as("gram")
      time("decon: train grams only")(
        docs.where(!isBench).select(col("doc_id"), grams3).count())
      time("decon: bench grams distinct")(
        docs.where(isBench).select(grams3).distinct().count())
      val bg = docs.where(isBench)
        .select(explode(TextAnalysis.wordNgrams(col("text"), 3)).as("gram"))
        .distinct()
      time("decon: join only")(
        docs.where(!isBench).select(col("doc_id"), grams3)
          .join(broadcast(bg), "gram").count())
      time("decon: FULL")(graft.operators.Decontaminate.overlapReport(
        docs.where(!isBench), docs.where(isBench), 3).count())
      // explode-first alternative: generator emits indices, the gram is
      // built by codegen'd slice+concat_ws OUTSIDE any lambda
      time("decon: train grams explode-first")(
        docs.where(!isBench)
          .select(col("doc_id"),
            TextAnalysis.tokens(col("text")).as("t"))
          .select(col("doc_id"), col("t"),
            explode(when(size(col("t")) >= 3,
              sequence(lit(1), size(col("t")) - 2))
              .otherwise(typedLit(Seq.empty[Int]))).as("i"))
          .select(col("doc_id"),
            concat_ws(" ", slice(col("t"), col("i"), lit(3))).as("gram"))
          .count())
    }
    spark.stop()
  }
}
