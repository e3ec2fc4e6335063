package graft

import org.apache.spark.sql.functions._
import graft.operators.LineDedup

/** Corpus-wide line dedup (LineDedup.dedupLines): cross-document
  * boilerplate lines removed everywhere, prose and unique lines kept,
  * blank lines never counted, within-doc repeats don't qualify on
  * their own, layout independence. */
class LineDedupSpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "lang", "text")

  test("a line shared by >= minDf docs is removed from every doc; unique lines survive") {
    val d = docs(
      (1L, "en", "alpha prose one\nsubscribe now\nbeta prose one"),
      (2L, "en", "subscribe now\ngamma prose two"),
      (3L, "en", "delta prose three\nsubscribe now"))
    val out = LineDedup.dedupLines(d, minDf = 2)
      .orderBy("doc_id")
      .select("doc_id", "n_lines", "n_removed", "cleaned_text")
      .as[(Long, Long, Long, String)].collect()
    assert(out === Seq(
      (1L, 3L, 1L, "alpha prose one\nbeta prose one"),
      (2L, 2L, 1L, "gamma prose two"),
      (3L, 2L, 1L, "delta prose three")))
  }

  test("df counts DISTINCT docs: a line repeated within ONE doc is kept") {
    val d = docs(
      (1L, "en", "echo echo line\necho echo line\nunique tail"),
      (2L, "en", "other content"))
    val out = LineDedup.dedupLines(d, minDf = 2)
      .orderBy("doc_id")
      .select("n_removed", "cleaned_text")
      .as[(Long, String)].collect()
    assert(out === Seq(
      (0L, "echo echo line\necho echo line\nunique tail"),
      (0L, "other content")))
  }

  test("matching is on the TRIMMED line but output preserves the raw line") {
    val d = docs(
      (1L, "en", "  shared footer  \nkeep a"),
      (2L, "en", "shared footer\nkeep b"),
      (3L, "en", "keep c\n shared footer"))
    val out = LineDedup.dedupLines(d, minDf = 3)
      .orderBy("doc_id").select("n_removed", "cleaned_text")
      .as[(Long, String)].collect()
    assert(out === Seq((1L, "keep a"), (1L, "keep b"), (1L, "keep c")))
    // below the threshold nothing moves, raw spacing intact
    val keep = LineDedup.dedupLines(d, minDf = 4)
      .orderBy("doc_id").select("cleaned_text").as[String].collect()
    assert(keep.head === "  shared footer  \nkeep a")
  }

  test("blank lines are never candidates and never removed; null text is one empty line") {
    val d = docs(
      (1L, "en", "a\n\nb"),
      (2L, "en", "c\n\nd"),
      (3L, "en", null))
    val out = LineDedup.dedupLines(d, minDf = 2)
      .orderBy("doc_id")
      .select("n_lines", "n_removed", "cleaned_text")
      .as[(Long, Long, String)].collect()
    assert(out === Seq(
      (3L, 0L, "a\n\nb"),
      (3L, 0L, "c\n\nd"),
      (1L, 0L, "")))
  }

  test("all lines removed yields an empty cleaned_text, not a missing row") {
    val d = docs(
      (1L, "en", "dup one\ndup two"),
      (2L, "en", "dup one\ndup two"))
    val out = LineDedup.dedupLines(d, minDf = 2)
      .orderBy("doc_id")
      .select("n_lines", "n_removed", "cleaned_text")
      .as[(Long, Long, String)].collect()
    assert(out === Seq((2L, 2L, ""), (2L, 2L, "")))
  }

  test("layout independence: same answer under repartition") {
    val d = docs(
      (1L, "en", "shared line\nalpha"),
      (2L, "en", "shared line\nbeta"),
      (3L, "fr", "gamma\nshared line"),
      (4L, "fr", "solo content"))
    val a = LineDedup.dedupLines(d, minDf = 2)
      .orderBy("doc_id").collect().toSeq
    val b = LineDedup.dedupLines(d.repartition(7), minDf = 2)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("minDf < 2 is rejected") {
    intercept[IllegalArgumentException] {
      LineDedup.dedupLines(docs((1L, "en", "x")), minDf = 1)
    }
  }
}
