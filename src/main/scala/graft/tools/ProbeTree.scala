package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Similarity

/** A/B profiler for the three-level tree quantizer vs the two-level
  * path at the SAME auto sizing (autoNLists) on a real corpus: times
  * the end-to-end ivfTopK and ivfTopKTree queries and reports answer
  * sizes so the recorded comparison is like-for-like. Driver-side
  * analysis tooling, not part of the library. */
object ProbeTree {
  def main(args: Array[String]): Unit = {
    graft.tools.Scratch.sweepStale() // drop crashed runs' dead scratch first
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata-sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe-tree] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    println(s"[probe-tree] n_vectors = $n, " +
      s"two-level nLists = ${Similarity.autoNLists(n)}, " +
      s"tree nLists = ${Similarity.autoNListsTree(n)}")

    // warmup both code paths on a slice
    Similarity.ivfTopK(emb.limit(2048), 5, 5).count()
    Similarity.ivfTopKTree(emb.limit(2048), 5, 5).count()

    (1 to 3).foreach { round =>
      println(s"--- round $round ---")
      val a = time("two-level ivfTopK   (auto lists)") {
        Similarity.ivfTopK(emb, 25, 5).count()
      }
      val b = time("three-level ivfTopKTree (auto lists)") {
        Similarity.ivfTopKTree(emb, 25, 5).count()
      }
      println(s"[probe-tree] rows two-level=$a tree=$b")
    }
    spark.stop()
  }
}
