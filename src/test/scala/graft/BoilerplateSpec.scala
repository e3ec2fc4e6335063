package graft

import org.apache.spark.sql.functions._
import graft.operators.{Boilerplate, DomainGate}

/** Behavior specs for the corpus-rewrite operators: frequent-n-gram
  * boilerplate stripping and the domain-level quality gate. */
class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def strip(d: org.apache.spark.sql.DataFrame, n: Int, minDf: Long) =
    Boilerplate.removeFrequentNgrams(d, n, minDf)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("boilerplate: a 3-gram shared by >= minDf docs vanishes from ALL of them") {
    val d = docs(
      1L -> "alpha subscribe to our newsletter beta",
      2L -> "gamma subscribe to our newsletter",
      3L -> "subscribe to our newsletter delta epsilon",
      4L -> "completely unrelated words here")
    val out = strip(d, 3, 3)
    // "subscribe to our"/"to our newsletter" both hit df=3; their merged
    // cover is the 4-token phrase, in every document including the first
    assert(out(1L) == ((6L, 4L, "alpha beta")))
    assert(out(2L) == ((5L, 4L, "gamma")))
    assert(out(3L) == ((6L, 4L, "delta epsilon")))
    assert(out(4L) == ((4L, 0L, "completely unrelated words here")))
  }

  test("boilerplate: below-threshold grams survive; overlaps never double-count") {
    val d = docs(
      1L -> "x shared pair y",
      2L -> "z shared pair w")
    // df=2 < minDf=3 → untouched
    val keep = strip(d, 2, 3)
    assert(keep(1L)._3 == "x shared pair y" && keep(1L)._2 == 0L)
    // at minDf=2 both occurrences of the pair go, covered counted once
    val cut = strip(d, 2, 2)
    assert(cut(1L) == ((4L, 2L, "x y")) && cut(2L) == ((4L, 2L, "z w")))
  }

  test("boilerplate: short, empty and null docs pass through whole") {
    val d = Seq((1L, "ab cd"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = strip(d, 3, 2)
    assert(out(1L) == ((2L, 0L, "ab cd")))
    assert(out(2L) == ((1L, 0L, "")))   // empty splits to one empty token
    assert(out(3L) == ((1L, 0L, "")))
    assert(out.size == 3)               // every row survives the rewrite
  }

  test("boilerplate: layout-independent (same answer under repartition)") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = strip(d, 3, 3)
    val b = strip(d.repartition(17), 3, 3)
    assert(a == b && a.nonEmpty)
    // the pass removes something on the shared-vocab corpus but not all
    val removed = a.values.map(_._2).sum
    val total = a.values.map(_._1).sum
    assert(removed > 0 && removed < total)
  }

  test("boilerplate: 50k-token doc with near-total coverage stays linear") {
    // two copies of one 50k-token repeated phrase: every 3-gram has
    // df=2, so the covered set IS the whole document — the worst case
    // for a per-position membership scan (O(L·C) = 2.5e9 compares); the
    // array_except rebuild is O(L) and finishes with the suite
    val body = Array.fill(50000)("spam").mkString(" ")
    val out = strip(docs(1L -> body, 2L -> body), 3, 2)
    assert(out(1L) == ((50000L, 50000L, "")))
    assert(out(2L) == ((50000L, 50000L, "")))
    // and a partially-covered long doc keeps exactly the uncovered tail
    val half = Array.fill(49997)("spam").mkString(" ") + " unique tail here"
    val out2 = strip(docs(1L -> half, 2L -> body), 3, 2)
    assert(out2(1L) == ((50000L, 49997L, "unique tail here")))
  }

  test("domain gate: sources pass/fail together on aggregate signals") {
    def mk(src: String, id: Long, text: String) = (id, src, text)
    // srcA: long fluent docs (passes); srcB: short docs (fails avg);
    // srcC: long but stopword-free keyword spam (fails rate)
    val rows =
      (1L to 10L).map(i => mk("srcA", i, "the cat sat of the mat and it is in the hall to rest")) ++
      (11L to 20L).map(i => mk("srcB", i, "too short")) ++
      (21L to 30L).map(i => mk("srcC", i, "buy cheap pills buy cheap pills buy cheap pills now now"))
    val d = rows.toDF("doc_id", "source", "text")
    val rep = DomainGate.gatedReport(d, minDocs = 10, minAvgTokens = 5,
        minStopPerMille = 100)
      .select("source", "kept").as[(String, Boolean)].collect().toMap
    assert(rep == Map("srcA" -> true, "srcB" -> false, "srcC" -> false))
    val kept = DomainGate.filterDocs(d, 10, 5, 100)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == (1L to 10L).toSet)
    // below minDocs the same source fails
    assert(DomainGate.gatedReport(d.where(col("doc_id") <= 5), 10, 5, 100)
      .where(col("kept")).count() == 0)
  }
}
