package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse a sparse (BM25) and a dense (embedding-cosine)
  * ranking with reciprocal-rank fusion (Cormack, Clarke & Buettcher
  * 2009) — the standard combiner for lexical + semantic retrieval over
  * a training corpus (hard-negative mining, dedup-aware sampling,
  * eval-set construction all start from exactly this join).
  */
object Retrieval {

  /** RRF top-k: score(d) = Σ over rankings r containing d of
    * `1/(kRrf + rank_r(d))`, fused over
    *  - the BM25 top-`kEach` for `queryTerms`
    *    ([[graft.functions.TextAnalysis.bm25RawIdfTopK]]), and
    *  - the exact-cosine top-`kEach` against the `queryVecId` embedding
    *    (corpus = every other vector; `doc_id` ≡ `vec_id` by the data
    *    contract).
    *
    * Scale shape: each leg is corpus-linear ending in a TakeOrdered
    * (`kEach` rows); the fusion itself is a full-outer join of two
    * ≤ kEach-row frames — metadata-scale regardless of corpus size. On
    * a 100 TB corpus the dense leg would swap in [[Similarity.annTopK]]
    * / [[Similarity.ivfTopK]] candidates; the fusion join is unchanged.
    *
    * Engine parity: ranks are exact integers from identically-ordered
    * (score DESC, id ASC) windows; `1.0/(kRrf + rank)` and the fixed
    * two-term sum are deterministic IEEE ops both engines evaluate
    * bit-identically (the repo's no-libm/no-ROUND rule), so the emitted
    * `rrf` double hash-compares exactly.
    *
    * Returns (doc_id, rrf), the fused top `k`.
    */
  def rrfHybridTopK(docs: DataFrame, emb: DataFrame,
                    queryTerms: Seq[String], queryVecId: Long,
                    kEach: Int, k: Int, kRrf: Int = 60): DataFrame = {
    require(kEach >= 1 && k >= 1 && kRrf >= 1,
      s"kEach/k/kRrf must be >= 1, got $kEach/$k/$kRrf")
    val spark = docs.sparkSession
    val ndot = graft.plans.DotProduct.dotCol(spark, _: Column, _: Column)

    // sparse leg: the BM25 result is already (score DESC, doc_id)-sorted
    // and kEach rows — the single-partition rank window is metadata-scale
    val sparse = graft.functions.TextAnalysis
      .bm25RawIdfTopK(docs, queryTerms, kEach)
      .withColumn("r_sparse", row_number().over(
        Window.orderBy(desc("bm25_rsj_x8"), asc("doc_id"))))
      .select(col("doc_id"), col("r_sparse"))

    // dense leg: exact cosine vs the single query vector (broadcast), a
    // TakeOrdered top-kEach — never a full sort
    val v = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("vec"))
    val q = v.where(col("vec_id") === queryVecId)
      .select(col("vec").as("qvec"))
    val dense = v.where(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .withColumn("cos", ndot(col("qvec"), col("vec")) /
        (sqrt(ndot(col("qvec"), col("qvec"))) *
          sqrt(ndot(col("vec"), col("vec")))))
      .orderBy(desc("cos"), asc("vec_id")).limit(kEach)
      .withColumn("r_dense", row_number().over(
        Window.orderBy(desc("cos"), asc("vec_id"))))
      .select(col("vec_id").as("doc_id"), col("r_dense"))

    sparse.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(kRrf) + col("r_sparse")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("r_dense")), lit(0.0)))
      .orderBy(desc("rrf"), asc("doc_id")).limit(k)
      .select(col("doc_id"), col("rrf"))
  }
}
