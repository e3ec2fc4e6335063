package graft

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis
import graft.operators.{Retrieval, Sampling}

/** Behavior specs for BM25 top-k retrieval and temperature-scaled
  * mixture resampling. */
class RetrievalMixtureSpec extends SparkSpec {
  import spark.implicits._

  test("bm25: scores match the fixed-order formula and rank by density") {
    val d = Seq(
      (1L, "cat dog"),
      (2L, "cat cat mouse"),
      (3L, "bird bird bird bird")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25RawIdfTopK(d, Seq("cat"), 10)
      .as[(Long, Long)].collect().toSeq
    // mirror of the column expression in plain doubles (identical IEEE
    // operation order → identical bits)
    def s8(tf: Long, df: Long, len: Long, n: Long, totalLen: Double): Long =
      math.floor(1e8 * ((n - df + 0.5) / (df + 0.5) * (tf * 2.2) /
        (tf + 1.2 * (0.25 + 0.75 * len * n / totalLen))) + 0.5).toLong
    assert(out == Seq(
      2L -> s8(2, 2, 3, 3, 9.0),
      1L -> s8(1, 2, 2, 3, 9.0)))
    // doc 3 contains no query term and must be absent
    assert(!out.exists(_._1 == 3L))
  }

  test("bm25: multi-term scores sum per doc; k bounds the output") {
    val d = Seq(
      (1L, "alpha beta"),
      (2L, "alpha alpha"),
      (3L, "beta gamma"),
      (4L, "gamma gamma")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25RawIdfTopK(d, Seq("alpha", "beta"), 2)
      .as[(Long, Long)].collect()
    assert(out.length == 2)
    // doc 1 matches both terms — its two per-term scores sum, beating
    // the single-term docs at equal length
    assert(out.head._1 == 1L)
  }

  test("temperature mixture: sqrt-share targets, deterministic, layout-independent") {
    val d = ((0L until 400L).map(i => (i, "a")) ++
      (400L until 500L).map(i => (i, "b"))).toDF("doc_id", "lang")
    val kept = Sampling.temperatureResample(d, totalTarget = 300L)
      .select("doc_id").as[Long].collect().toSet
    // targets: w_a = 1000·√400 = 20000, w_b = 1000·√100 = 10000 →
    // t_a = 300·2/3 = 200 (frac 0.5), t_b = 100 (frac 1.0 → keep all)
    val keptB = kept.count(_ >= 400L)
    assert(keptB == 100, s"stratum below its target keeps every row, got $keptB")
    val keptA = kept.count(_ < 400L)
    // bucket granularity makes the realized count approximate
    assert(math.abs(keptA - 200) < 30, s"expected ~200 from stratum a, got $keptA")
    // deterministic and layout-independent
    val again = Sampling.temperatureResample(d.repartition(7), 300L)
      .select("doc_id").as[Long].collect().toSet
    assert(again == kept)
  }

  test("temperature mixture: upweights small strata vs proportional") {
    val d = ((0L until 900L).map(i => (i, "big")) ++
      (900L until 1000L).map(i => (i, "small"))).toDF("doc_id", "lang")
    val kept = Sampling.temperatureResample(d, totalTarget = 500L)
      .select("doc_id", "lang").as[(Long, String)].collect()
    val fracSmall = kept.count(_._2 == "small") / 100.0
    val fracBig = kept.count(_._2 == "big") / 900.0
    // T = 2 keeps a larger FRACTION of the small stratum
    assert(fracSmall > fracBig,
      s"small-stratum fraction $fracSmall should exceed big's $fracBig")
  }

  test("rrf hybrid: fuses known sparse and dense rankings by 1/(60+rank)") {
    // Sparse ranking by construction (same doc length, tf decides):
    // doc 1 > doc 2 > doc 3 on "vector"; docs 4/5 never match.
    val docs = Seq(
      (1L, "vector vector vector pad pad pad"),
      (2L, "vector vector filler pad pad pad"),
      (3L, "vector filler filler pad pad pad"),
      (4L, "other terms only here pad pad"),
      (5L, "more other terms here pad pad")
    ).toDF("doc_id", "text")
    // Dense ranking by construction vs query vec_id=0 (unit x-axis):
    // doc 2 (cos 1) > doc 4 > doc 1; docs 3/5 orthogonal.
    val emb = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.5, 0.5, 0.0, 0.0)),
      (2L, Seq(2.0, 0.0, 0.0, 0.0)),
      (3L, Seq(0.0, 1.0, 0.0, 0.0)),
      (4L, Seq(0.9, 0.1, 0.0, 0.0)),
      (5L, Seq(0.0, 0.0, 1.0, 0.0))
    ).toDF("vec_id", "embedding")
    val got = Retrieval
      .rrfHybridTopK(docs, emb, Seq("vector"), 0L, kEach = 3, k = 6)
      .as[(Long, Double)].collect().toSeq
    // expected ranks: sparse 1→1, 2→2, 3→3; dense 2→1, 4→2, 1→3
    def s(r: Int) = 1.0 / (60 + r)
    val expected = Seq(
      2L -> (s(2) + s(1)), // in both lists — fused to the top
      1L -> (s(1) + s(3)),
      3L -> (s(3) + 0.0),
      4L -> (0.0 + s(2))
    ).sortBy { case (id, sc) => (-sc, id) }
    assert(got === expected)
    // the both-lists doc outranks every single-list doc
    assert(got.head._1 === 2L)
  }

  test("rrf hybrid: missing or ambiguous queryVecId fails loudly") {
    val docs = Seq((1L, "vector pad")).toDF("doc_id", "text")
    val emb = Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    // absent id: previously degraded silently to a sparse-only ranking
    val e = intercept[IllegalArgumentException] {
      Retrieval.rrfHybridTopK(docs, emb, Seq("vector"), 999L, 3, 3)
    }
    assert(e.getMessage.contains("queryVecId=999"))
    // duplicated id: the 1-row contract is broken upstream — also loud
    val dup = Seq((1L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Retrieval.rrfHybridTopK(docs, dup, Seq("vector"), 1L, 3, 3)
    }
  }

  test("rrf hybrid LSH leg: recalls most of the exact dense fusion on real embeddings") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val terms = Seq("vector", "merge", "stream")
    val exact = Retrieval
      .rrfHybridTopK(docs, emb, terms, 0L, kEach = 25, k = 15)
      .select("doc_id").as[Long].collect().toSet
    // 16 tables × 5 bits: on this 500-vector corpus the default 8×8
    // grid yields ~2-vector buckets (≈16 candidates — fine for the
    // top-5 annTopK contract, far too shallow for a depth-25 leg);
    // recall at depth kEach needs the cohort ≫ kEach, which is a
    // PARAMETER choice, not an operator property — hence exposed
    val ann = Retrieval
      .rrfHybridTopK(docs, emb, terms, 0L, kEach = 25, k = 15,
        denseLeg = "lsh", tables = 16, bits = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(ann.size === 15)
    // the sparse leg is shared and the LSH cohort recalls most exact
    // top neighbors (the annTopK recall contract), so the fused lists
    // overlap heavily
    val overlap = exact.intersect(ann).size
    assert(overlap >= 11, s"only $overlap/15 fused ids shared: $exact vs $ann")
  }
}
