package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/JIT/codegen/parquet-reader warmup so whichever query the map
    // happens to order first doesn't absorb one-time startup cost (the
    // UDF+explode+array_intersect path alone is ~25 s of JIT on first
    // execution at sf0.1).
    locally {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      import graft.operators.{Dedup, Similarity}
      spark.read.parquet(s"$sfDir/nation.parquet")
        .withColumn("rn", row_number().over(
          Window.partitionBy("n_regionkey").orderBy("n_nationkey")))
        .agg(sum("rn")).collect()
      val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(64)
      Dedup.minhashLshPairs(docs, 0.9, bands = 8, rows = 8).count()
      Dedup.jaccardPairs(docs, 0.9).count()
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(64)
      Similarity.exactTopK(emb, 2, 2).count()
    }
    // The heavy candidate-pair queries swing ±30% run-to-run (GC timing
    // against a quadratic-ish true answer); report their MEDIAN of 3 so
    // round-over-round regressions are attributable to code, not noise.
    val heavy = Set("q_dedup_ngram_jaccard", "q_dedup_minhash_lsh",
      "q_dedup_simhash_pairs", "q_embed_ann_ivf", "q_dedup_clusters")
    // a failing query must be VISIBLE in the output, not silently timed
    // as a fast success deflating the total
    val failed = scala.collection.mutable.SortedSet[String]()
    def once(name: String,
             fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case t: Throwable =>
        failed += name
        System.err.println(s"[bench] $name FAILED: ${t.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val secs =
        if (heavy(name)) Seq(once(name, fn), once(name, fn), once(name, fn)).sorted(Ordering.Double.TotalOrdering)(1)
        else once(name, fn)
      name -> secs
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    // The harness keeps only the TAIL of this process's output, and the
    // full per-query map is one long line — so emit the headline total on
    // its own short line FIRST (survives any truncation that still keeps
    // the JSON line) and persist the complete JSON to a file as the
    // canonical record.
    println(s"""{"metric":"total_only","value":$total,"unit":"sec","n_queries":${results.size},"failed":$failedJson}""")
    println(json)
    // best-effort file copy AFTER both stdout lines: a read-only cwd
    // must not cost the per-query record
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_last.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: java.io.IOException =>
      System.err.println(s"[bench] bench_last.json not written: $e") }
    spark.stop()
  }
}
