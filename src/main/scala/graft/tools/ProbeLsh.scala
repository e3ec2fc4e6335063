package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Stage-split profiler for the LSH ANN query (the most expensive
  * single query at sf10): separates bucket computation, candidate
  * generation, and re-rank so optimization lands where the seconds
  * are. Driver-side analysis tooling, not part of the library. */
object ProbeLsh {
  def main(args: Array[String]): Unit = {
    graft.tools.Scratch.sweepStale() // drop crashed runs' dead scratch first
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata-sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe-lsh] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    println(s"[probe-lsh] n_vectors = ${emb.count()}, dim = " +
      emb.select(size(col("embedding"))).first().getInt(0))

    // warmup
    Similarity.annTopK(emb.limit(256), 4, 5).count()

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val dim = emb.select(size(col("embedding"))).first().getInt(0)
      val planes = Similarity.hyperplanes(8, 8, dim)
      val ndot = graft.plans.DotProduct.dotCol(spark, _: org.apache.spark.sql.Column, _: org.apache.spark.sql.Column)
      def bucketCols(vec: org.apache.spark.sql.Column) =
        array((0 until 8).map { t =>
          (0 until 8).map { b =>
            when(ndot(typedLit(planes(t)(b).toSeq), vec) > 0.0, 1L << b)
              .otherwise(0L)
          }.reduce(_ + _) + lit(t.toLong << 32)
        }: _*)
      val v0 = emb.select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("vec"))
        .withColumn("nrm", sqrt(ndot(col("vec"), col("vec"))))
      val v = v0.withColumn("bucket", explode(bucketCols(col("vec"))))
      time("bucket computation, 64-node when/dot form (count only)") {
        v.select(count(lit(1))).first()
      }
      val planesLit = typedLit(planes.map(_.map(_.toSeq).toSeq).toSeq)
      time("bucket computation, fused graft_lsh_buckets (count only)") {
        v0.withColumn("bucket", explode(
            graft.plans.LshBuckets.bucketsCol(spark, planesLit, col("vec"))))
          .select(count(lit(1))).first()
      }
      time("bucket parity check (fused == 64-node, full corpus)") {
        val old = v.select(col("vec_id"), col("bucket"))
        val neu = v0.withColumn("bucket", explode(
            graft.plans.LshBuckets.bucketsCol(spark, planesLit, col("vec"))))
          .select(col("vec_id"), col("bucket"))
        val d1 = old.exceptAll(neu).count()
        val d2 = neu.exceptAll(old).count()
        require(d1 == 0 && d2 == 0, s"bucket mismatch: $d1 / $d2")
      }
      val q = v.where(col("vec_id") < 25)
        .select(col("vec_id").as("query_id"), col("bucket"))
      val c = v.where(col("vec_id") >= 25)
        .select(col("vec_id").as("neighbor_id"), col("bucket"))
      val cand = q.join(c, Seq("bucket"))
        .select("query_id", "neighbor_id").distinct()
      println(s"[probe-lsh] candidates = ${time("candidate join + distinct")(cand.count())}")
      time("full annTopK") {
        Similarity.annTopK(emb, 25, 10).count()
      }
    }
    spark.stop()
  }
}
