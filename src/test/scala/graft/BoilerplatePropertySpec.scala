package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Boilerplate

/** Generator row for [[BoilerplatePropertySpec]] — top-level so the
  * product encoder can instantiate it. */
case class BoilerPropDoc(doc_id: Long, text: String)

/** Property test for the boilerplate-removal operator: the distributed
  * joins-and-arrays formulation must equal a direct single-process
  * reference on ANY corpus, not just the documents table. A tiny
  * vocabulary forces heavy cross-document n-gram sharing, the regime
  * the operator exists for.
  */
class BoilerplatePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vocab = Vector("a", "b", "c", "d")
  private val docGen: Gen[List[BoilerPropDoc]] = for {
    n <- Gen.choose(5, 40)
    docs <- Gen.listOfN(n, for {
      id <- Gen.choose(0L, 100000L)
      nTok <- Gen.choose(1, 12)
      toks <- Gen.listOfN(nTok, Gen.oneOf(vocab))
    } yield BoilerPropDoc(id, toks.mkString(" ")))
  } yield docs.groupBy(_.doc_id).map(_._2.head).toList

  private def samples[A](gen: Gen[A], rounds: Int): Seq[A] = {
    var seed = Seed(11L)
    (1 to rounds).map { r =>
      val v = gen.apply(Gen.Parameters.default, seed)
        .getOrElse(fail(s"no sample in round $r"))
      seed = seed.next
      v
    }
  }

  /** Direct reference: brute-force document frequency and span cover. */
  private def reference(docs: List[BoilerPropDoc], n: Int, minDf: Int)
      : Map[Long, (Long, Long, String)] = {
    val toks = docs.map(d => d.doc_id -> d.text.trim.split("\\s+").toVector).toMap
    val df = toks.values
      .flatMap(t => t.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSet)
      .groupBy(identity).view.mapValues(_.size)
    val frequent = df.filter(_._2 >= minDf).keySet
    toks.map { case (id, t) =>
      val starts = (0 to t.size - n)
        .filter(i => t.size >= n && frequent(t.slice(i, i + n).mkString(" ")))
      val covered = starts.flatMap(i => i until i + n).toSet
      val kept = t.indices.filterNot(covered)
      id -> ((t.size.toLong, covered.size.toLong,
        kept.map(t).mkString(" ")))
    }
  }

  test("removeFrequentNgrams == brute-force reference on random corpora") {
    for ((docs, round) <- samples(docGen, 10).zipWithIndex) {
      val n = 1 + round % 3 + 1 // n in 2..4
      val minDf = 2 + round % 2
      val got = Boilerplate
        .removeFrequentNgrams(docs.toDF().repartition(3), n, minDf.toLong)
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got == reference(docs, n, minDf), s"round $round n=$n minDf=$minDf")
    }
  }

  test("DomainGate == brute-force reference on random corpora") {
    val gen = for {
      n <- Gen.choose(10, 60)
      rows <- Gen.listOfN(n, for {
        id <- Gen.choose(0L, 100000L)
        src <- Gen.oneOf("s0", "s1", "s2", "s3")
        nTok <- Gen.choose(1, 20)
        toks <- Gen.listOfN(nTok, Gen.oneOf("the", "of", "xyz", "qq", "data"))
      } yield (id, src, toks.mkString(" ")))
    } yield rows.groupBy(_._1).map(_._2.head).toList
    val stop = Set("the", "of") // within the generator vocab, \b-matched
    for ((rows, round) <- samples(gen, 8).zipWithIndex) {
      val (minDocs, minAvg, perMille) = (3L + round % 3, 8L, 150L)
      val byS = rows.groupBy(_._2)
      val expectKept = byS.collect { case (s, ds)
        if ds.size >= minDocs &&
          ds.map(_._3.split("\\s+").length.toLong).sum / ds.size >= minAvg &&
          ds.map(_._3.split("\\s+").count(stop)).sum * 1000L >=
            ds.map(_._3.split("\\s+").length.toLong).sum * perMille => s
      }.toSet
      val got = graft.operators.DomainGate
        .gatedReport(rows.toDF("doc_id", "source", "text").repartition(3),
          minDocs, minAvg, perMille)
        .select("source", "kept").as[(String, Boolean)].collect()
        .filter(_._2).map(_._1).toSet
      assert(got == expectKept, s"round $round")
    }
  }
}
