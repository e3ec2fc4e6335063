package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc: simhash chunk-bucket histogram + candidate-pair mass at the
  * configured SF dir — separates join-output volume (bucket skew) from
  * verify/distinct cost in q_dedup_simhash_pairs. Not driver contract. */
object ProbeSimhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sigs = Dedup.simhashSignatures(docs).select("doc_id", "simhash")
    val chunks = sigs.select(col("doc_id"),
      explode(array((0 until 4).map { i =>
        struct(lit(i).as("ci"),
          shiftrightunsigned(col("simhash"), i * 16)
            .bitwiseAND(lit(0xffffL)).as("cv"))
      }: _*)).as("c"))
      .select(col("c.ci"), col("c.cv"))
    val hist = chunks.groupBy("ci", "cv").count()
    hist.cache()
    val stats = hist.agg(
      count(lit(1)).as("n_buckets"),
      sum(col("count")).as("n_rows"),
      sum(col("count") * (col("count") - 1) / 2).as("cand_pairs"),
      max("count").as("max_bucket")).collect()(0)
    println(s"[probe] buckets=${stats.get(0)} rows=${stats.get(1)} " +
      s"candPairs=${stats.get(2)} maxBucket=${stats.get(3)}")
    println("[probe] top buckets:")
    hist.orderBy(desc("count")).show(12, false)
    val truePairs = Dedup.simhashNearDupPairs(docs, 3).count()
    println(s"[probe] truePairs=$truePairs")
    spark.stop()
  }
}
