package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off bench diagnostics for minhashLshPairs stage cardinalities —
  * bucket-size distribution, candidate count, estimate-gate survivor
  * count — to attribute above-linear scale growth to a stage. */
object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    graft.tools.Scratch.sweepStale() // drop crashed runs' dead scratch first
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata-sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bands = args.headOption.map(_.toInt).getOrElse(8)
    val rows = if (args.length > 1) args(1).toInt else 8
    val numPerm = bands * rows
    val sigUdf = udf { (toks: Seq[String]) =>
      graft.operators.Dedup.minhashSignature(toks, numPerm) }
    val bandHashUdf = udf { (sig: Seq[Long]) =>
      (0 until bands).map { bd =>
        var h = 1125899906842597L
        var j = bd * rows
        while (j < (bd + 1) * rows) { h = h * 31 + sig(j); j += 1 }
        bd.toLong << 56 | (h & 0xffffffffffffL)
      }
    }
    val sigs = docs.select(col("doc_id"),
        graft.functions.TextAnalysis.tokenSet(col("text")).as("_ts"))
      .select(col("doc_id"), sigUdf(col("_ts")).as("sig"))
      .localCheckpoint()
    val buckets = sigs.select(col("doc_id"),
      explode(bandHashUdf(col("sig"))).as("bucket")).localCheckpoint()
    val sizes = buckets.groupBy("bucket").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    println("bucket rows: " + buckets.count())
    sizes.agg(max("n"), sum(col("n") * (col("n") - 1) / 2).as("pairs_upper"))
      .show(false)
    sizes.where(col("n") > 1).groupBy("n").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("n")).show(20, false)
    val cand = buckets.as("x").join(buckets.as("y"), Seq("bucket"))
      .where(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val t0 = System.nanoTime()
    println("distinct candidates: " + cand.distinct().count()
      + f" (${(System.nanoTime()-t0)/1e9}%.1f s)")
    spark.stop()
  }
}
