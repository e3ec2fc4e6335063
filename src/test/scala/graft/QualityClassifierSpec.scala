package graft

import graft.functions.PortableHash
import graft.operators.QualityClassifier

/** Pins the hashed-feature linear classifier: hand-computed scores on
  * a tiny vocabulary, the empty/whitespace-document edge, threshold
  * semantics, and the zero-shuffle plan shape (the operator's whole
  * scale story is that it is one map pass). The sf0.01 DuckDB oracle
  * (q_quality_classifier) replays the full hash/lookup/fold chain. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val nb = 8
  private val weights: Seq[Double] = (0 until nb).map(b => (b - 4) / 4.0)

  private def expected(text: String, bias: Double): Double = {
    val toks = text.trim.split("\\s+", -1).toSeq
    val s = toks.foldLeft(0.0) { (acc, t) =>
      acc + weights((PortableHash.cp31u(t) % nb).toInt)
    }
    bias + s / toks.size
  }

  test("score == hand-computed mean of hashed token weights") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha alpha alpha"),
      (3L, "  padded   tokens  ")
    ).toDF("doc_id", "text")
    val got = QualityClassifier.scoreDocs(docs, weights, 0.25, 0.0)
      .select("doc_id", "qscore").as[(Long, Double)].collect().toMap
    assert(got(1L) == expected("alpha beta gamma", 0.25))
    assert(got(2L) == expected("alpha alpha alpha", 0.25))
    assert(got(3L) == expected("  padded   tokens  ", 0.25))
  }

  test("empty and whitespace-only documents score bias + w[0] (the single-empty-token artifact)") {
    // split(trim(s), "\\s+") of "" is [""] in Spark AND DuckDB — one
    // empty token hashing to bucket 0, the repo-wide tokenization edge
    val docs = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val got = QualityClassifier.scoreDocs(docs, weights, 0.5, 0.0)
      .select("doc_id", "n_tokens", "qscore")
      .as[(Long, Long, Double)].collect()
    got.foreach { case (_, n, sc) =>
      assert(n == 1L)
      assert(sc == 0.5 + weights(0))
    }
  }

  test("keep is qscore >= threshold, inclusive") {
    val docs = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val rows = QualityClassifier.scoreDocs(docs, weights, 0.0, -10.0)
      .select("keep").as[Boolean].collect()
    assert(rows.forall(identity)) // threshold far below: everything kept
    val sc = QualityClassifier.scoreDocs(docs, weights, 0.0, 0.0)
      .select("doc_id", "qscore", "keep")
      .as[(Long, Double, Boolean)].collect()
    sc.foreach { case (_, q, k) => assert(k == (q >= 0.0)) }
  }

  test("fused graft_qscore == composable aggregate/cp31uCol spelling bit-for-bit " +
    "(ASCII, multibyte, supplementary-plane, single-token, repeated)") {
    import org.apache.spark.sql.functions.{col, split, trim}
    val docs = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "héllo wörld ünïcode"),
      (3L, "emoji 😀 mixed 😀x tail"),
      (4L, "single"),
      (5L, ("tok " * 200).trim),
      (6L, "")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
    val fused = docs.select(col("doc_id"),
        QualityClassifier.scoreFromToks(col("toks"), weights, 0.3).as("q"))
      .as[(Long, Double)].collect().toMap
    val composable = docs.select(col("doc_id"),
        QualityClassifier.scoreFromToksComposable(col("toks"), weights, 0.3).as("q"))
      .as[(Long, Double)].collect().toMap
    assert(fused.keySet == composable.keySet)
    fused.foreach { case (id, q) =>
      assert(java.lang.Double.doubleToLongBits(q) ==
        java.lang.Double.doubleToLongBits(composable(id)),
        s"doc $id: fused $q vs composable ${composable(id)}")
    }
  }

  test("plan is one map pass: zero exchanges, no UDF") {
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val plan = QualityClassifier.scoreDocs(docs, weights, 0.1, 0.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"unexpected UDF:\n$plan")
  }
}
