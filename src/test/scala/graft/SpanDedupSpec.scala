package graft

import org.apache.spark.sql.functions._
import graft.operators.SpanDedup

/** Behavior specs for substring-level exact dedup: duplicated l-token
  * spans are removed from every occurrence except the globally-first
  * one (ordered by doc_id, then position). */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def run(d: org.apache.spark.sql.DataFrame, l: Int) =
    SpanDedup.removeDuplicateSpans(d, l)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("span dedup: the first occurrence survives, later copies vanish") {
    val d = docs(
      1L -> "intro one two three four five outro",
      2L -> "prefix one two three four five suffix",
      3L -> "one two three four five",
      4L -> "nothing shared at all here")
    val out = run(d, 5)
    // the 5-gram "one two three four five" occurs in docs 1, 2, 3 (plus
    // no other duplicated 5-gram). Doc 1 holds the first occurrence.
    assert(out(1L) == ((7L, 0L, "intro one two three four five outro")))
    assert(out(2L) == ((7L, 5L, "prefix suffix")))
    assert(out(3L) == ((5L, 5L, "")))
    assert(out(4L) == ((5L, 0L, "nothing shared at all here")))
  }

  test("span dedup: within-document repeats dedup against themselves") {
    val d = docs(
      1L -> "a b c d e x a b c d e",
      2L -> "unrelated tokens only in here")
    val out = run(d, 5)
    // positions 7..11 repeat the 5-gram at 1..5 → second copy removed
    assert(out(1L) == ((11L, 5L, "a b c d e x")))
    assert(out(2L)._2 == 0L)
  }

  test("span dedup: overlapping duplicated spans merge into one cover") {
    val d = docs(
      1L -> "p q r s t u end",
      2L -> "p q r s t u tail")
    val out = run(d, 5)
    // both 5-grams ("p q r s t", "q r s t u") duplicate; doc 1 owns the
    // first occurrence of each, doc 2 loses positions 1..6 exactly once
    assert(out(1L) == ((7L, 0L, "p q r s t u end")))
    assert(out(2L) == ((7L, 6L, "tail")))
  }

  test("span dedup: short, empty, and null docs pass through untouched") {
    val d = Seq((1L, "a b c"), (2L, ""), (3L, null: String))
      .toDF("doc_id", "text")
    val out = run(d, 5)
    assert(out(1L) == ((3L, 0L, "a b c")))
    assert(out(2L)._3 == "" && out(2L)._2 == 0L)
    assert(out(3L)._3 == "" && out(3L)._2 == 0L)
  }

  test("span dedup: the two marking shapes (window / agg-join) produce " +
    "the identical answer, so the cost-model switch is invisible") {
    // a corpus exercising every rule at once: cross-doc dup, within-doc
    // repeat, overlapping covers, a unique doc, a short doc
    val d = docs(
      1L -> "a b c d e f g h i j tail one",
      2L -> "x a b c d e f g h i j y",
      3L -> "m n o p q m n o p q m n o p q",
      4L -> (1 to 30).map(i => s"u$i").mkString(" "),
      5L -> "too short")
    val l = 5
    def collect(useWindow: Boolean) =
      SpanDedup.removeDuplicateSpansShape(d, l, useWindow)
        .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val w = collect(useWindow = true)
    val a = collect(useWindow = false)
    assert(w === a)
    // and the public auto-dispatching entry agrees (tiny corpus ->
    // agg-join branch)
    val auto = SpanDedup.removeDuplicateSpans(d, l)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(auto === w)
  }
}
