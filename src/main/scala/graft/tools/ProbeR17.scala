package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r17 scratch probe: split q_dedup_clusters / q_neardup_prune cost into
  * pair generation vs CC vs accounting at the contract SF. */
object ProbeR17 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[prober17] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def sink(label: String, df: org.apache.spark.sql.DataFrame): Unit =
      t(label)(df.write.format("noop").mode("overwrite").save())
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val scoped = docs.where(col("lang") === "de")
    (1 to 2).foreach { i =>
      // construction is EAGER (checkpoints + the CC loop run inside the
      // operator), so time construction + sink together, like Bench does
      t(s"jaccardPairs(de) all-in run $i") {
        graft.operators.Dedup.jaccardPairs(scoped, 0.9)
          .write.format("noop").mode("overwrite").save()
      }
      t(s"clusters all-in run $i") {
        val pairs = graft.operators.Dedup.jaccardPairs(scoped, 0.9)
        graft.operators.Dedup.duplicateClusters(pairs, scoped)
          .orderBy("doc_id")
          .write.format("noop").mode("overwrite").save()
      }
      t(s"cc-only (pairs prebuilt) run $i") {
        val pairs = graft.operators.Dedup.jaccardPairs(scoped, 0.9)
          .localCheckpoint(true)
        t(s"  cc loop itself run $i") {
          graft.operators.Dedup.duplicateClusters(pairs, scoped,
            pairsMaterialized = true)
            .orderBy("doc_id")
            .write.format("noop").mode("overwrite").save()
        }
      }
    }
    spark.stop()
  }
}
