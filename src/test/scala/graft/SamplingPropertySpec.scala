package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling

/** Generator row for [[SamplingPropertySpec]] — top-level so the
  * product encoder can instantiate it. */
case class SamplingPropDoc(doc_id: Long, lang: String, source: String, text: String)

/** Property tests for the r7 selection operators: the invariants must
  * hold for ANY keyed/scored dataset, not just the documents corpus.
  * Plain ScalaCheck sampling from a fixed seed (the
  * scalatest-scalacheck bridge isn't in the offline cache).
  */
class SamplingPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private type Doc = SamplingPropDoc
  private def Doc(id: Long, lang: String, source: String, text: String): Doc =
    SamplingPropDoc(id, lang, source, text)

  private val docGen: Gen[List[Doc]] = for {
    n <- Gen.choose(30, 200)
    docs <- Gen.listOfN(n, for {
      id <- Gen.choose(0L, 100000L)
      lang <- Gen.oneOf("en", "fr", "zh")
      source <- Gen.oneOf("s0", "s1", "s2", "s3", "s4", "s5", "s6")
      nTok <- Gen.choose(1, 30)
    } yield Doc(id, lang, source, Seq.fill(nTok)("w").mkString(" ")))
  } yield docs.groupBy(_.doc_id).map(_._2.head).toList // ids unique

  private def samples[A](gen: Gen[A], rounds: Int): Seq[A] = {
    var seed = Seed(7L)
    (1 to rounds).map { r =>
      val v = gen.apply(Gen.Parameters.default, seed)
        .getOrElse(fail(s"no sample in round $r"))
      seed = seed.next
      v
    }
  }

  test("cappedPerKey: per-key bound is exactly min(k, group size); output ⊆ input") {
    for (docs <- samples(docGen, 8)) {
      val df = docs.toDF().repartition(3)
      val k = 1 + docs.size % 5
      val out = Sampling.cappedPerKey(df, "source", k).collect()
      val byKey = out.groupBy(_.getAs[String]("source")).view.mapValues(_.length)
      val inKey = docs.groupBy(_.source).view.mapValues(_.size)
      for ((key, n) <- inKey)
        assert(byKey.getOrElse(key, 0) == math.min(k, n),
          s"key $key: got ${byKey.getOrElse(key, 0)}, want min($k, $n)")
      val inIds = docs.map(_.doc_id).toSet
      assert(out.forall(r => inIds.contains(r.getAs[Long]("doc_id"))))
      // cap_rank is 1..count within each key
      for ((_, rows) <- out.groupBy(_.getAs[String]("source")))
        assert(rows.map(_.getAs[Long]("cap_rank")).sorted.toSeq ==
          (1L to rows.length).toSeq)
    }
  }

  test("topFractionGate: threshold is the largest tie-closed cut covering the fraction") {
    for (docs <- samples(docGen, 8)) {
      val scored = docs.toDF()
        .withColumn("score", (col("doc_id") % 7).cast("long"))
      val out = Sampling.topFractionGate(scored, col("score"), 3, 10).collect()
      val scores = docs.map(_.doc_id % 7)
      val total = scores.size
      // reference threshold: largest t with count(score >= t)·10 >= total·3
      val t = scores.distinct.sorted.reverse
        .find(c => scores.count(_ >= c) * 10 >= total * 3)
        .getOrElse(scores.min)
      assert(out.forall(_.getAs[Long]("gate_threshold") == t))
      assert(out.length == scores.count(_ >= t),
        s"kept ${out.length}, want ${scores.count(_ >= t)} at t=$t")
      // tie closure: every input row at or above t is present
      val keptIds = out.map(_.getAs[Long]("doc_id")).toSet
      assert(docs.filter(_.doc_id % 7 >= t).forall(d => keptIds.contains(d.doc_id)))
    }
  }

  test("selectToTokenBudget: kept set is the exact budget prefix of the priority order") {
    for (docs <- samples(docGen, 8)) {
      val df = docs.toDF().repartition(3)
      val budget = 50L
      val out = Sampling.selectToTokenBudget(df, budget)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cum_before")))
        .toMap
      // reference: per lang, walk (portableBucket, id) order accumulating
      // token counts; keep while cum < budget
      val pb = docs.map(d => d.doc_id -> portableBucketRef(d.doc_id, 42)).toMap
      for ((_, group) <- docs.groupBy(_.lang)) {
        var cum = 0L
        for (d <- group.sortBy(d => (pb(d.doc_id), d.doc_id))) {
          val nTok = d.text.split(" ").length.toLong
          if (cum < budget)
            assert(out.get(d.doc_id).contains(cum),
              s"doc ${d.doc_id}: want kept at cum $cum, got ${out.get(d.doc_id)}")
          else assert(!out.contains(d.doc_id), s"doc ${d.doc_id} past budget kept")
          cum += nTok
        }
      }
    }
  }

  /** Scala mirror of Sampling.portableBucket (Lehmer + xor fold). */
  private def portableBucketRef(id: Long, seed: Int, g: Long = 10000L): Long = {
    val p = 2147483647L
    val x = Math.floorMod(id + seed.toLong * 1103515245L, p)
    val h = Math.floorMod(x * 48271L, p)
    Math.floorMod(h ^ (h >> 16), g)
  }
}
