package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** IVF index persistence (Similarity.buildIvfIndex / ivfTopKFromIndex):
  * the save → load → serve path must answer bit-identically to the
  * fused ivfTopK on the same parameters (IEEE doubles round-trip
  * parquet exactly), rebuilds must be idempotent, and the serve plan
  * must be probe-only (pushed query filter, no refit). */
class IndexedIvfSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def ixDir = spark.conf.get("spark.sql.warehouse.dir")
    .stripSuffix("/") + "/graft_ivf_index_spec"

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("index-served top-k is bit-identical to the fused ivfTopK") {
    Similarity.buildIvfIndex(emb, ixDir)
    val served = Similarity.ivfTopKFromIndex(spark, ixDir, 5, 5)
      .orderBy("query_id", "rank").collect().toSeq
    val fused = Similarity.ivfTopK(emb, 5, 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(served.nonEmpty)
    assert(served === fused)
  }

  test("rebuild overwrites: serving after a second build is unchanged") {
    Similarity.buildIvfIndex(emb, ixDir)
    val first = Similarity.ivfTopKFromIndex(spark, ixDir, 5, 5)
      .orderBy("query_id", "rank").collect().toSeq
    Similarity.buildIvfIndex(emb, ixDir)
    val second = Similarity.ivfTopKFromIndex(spark, ixDir, 5, 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(first === second)
  }

  test("serve is probe-only: query lookup pushed to the postings scan, no refit aggregate") {
    Similarity.buildIvfIndex(emb, ixDir)
    val q = Similarity.ivfTopKFromIndex(spark, ixDir, 5, 5)
    q.collect() // finalize the adaptive plan before inspecting it
    val plan = q.queryExecution.executedPlan.toString
    // the bounded query side is a pushed point-lookup on the postings
    // parquet, and nothing in the serve path re-runs the fit (the
    // centroid means would show up as an aggregate over the corpus)
    assert(plan.contains("PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,5)]") ||
      plan.contains("PushedFilters: [LessThan(vec_id,5)"), plan.take(1200))
    assert(!plan.contains("HashAggregate"), plan.take(1200))
  }

  test("index layout: metadata-scale centroids, postings clustered by list_id") {
    val nl = Similarity.buildIvfIndex(emb, ixDir)
    val cents = spark.read.parquet(s"$ixDir/centroids")
    assert(cents.count() === nl.toLong)
    assert(cents.columns.sorted === Array("cc", "cvec", "list_id"))
    // every vector of the corpus that is indexable appears exactly once
    val post = spark.read.parquet(s"$ixDir/postings")
    assert(post.count() === emb.count())
    assert(post.groupBy("vec_id").count().where(col("count") > 1).count() === 0L)
    // clustering contract: each list's postings land in one file (the
    // build repartitions by list_id), so a probed list reads few files
    val spread = post.select(col("list_id"),
        input_file_name().as("f"))
      .groupBy("list_id").agg(countDistinct("f").as("nf"))
      .agg(max("nf")).collect().head.getLong(0)
    assert(spread === 1L)
  }
}
