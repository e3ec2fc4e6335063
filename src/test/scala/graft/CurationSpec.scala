package graft

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis
import graft.operators.{Chunking, Decontaminate, Sampling, SkewJoin}

/** Behavior specs for the corpus-curation operators: n-gram generation,
  * benchmark decontamination, overlapping chunking, mixture resampling
  * and the salted skew join. Properties over hand-built inputs plus
  * layout-independence checks (same result under any repartitioning —
  * the 100 TB determinism contract).
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("wordNgrams: overlapping n-grams; short docs give empty array") {
    val out = docs(1L -> "a b c d", 2L -> "x y", 3L -> "  a   b  ")
      .select(col("doc_id"), TextAnalysis.wordNgrams(col("text"), 3).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) == Seq("a b c", "b c d"))
    assert(out(2L) == Seq.empty)          // fewer than n tokens
    assert(out(3L) == Seq.empty)          // whitespace runs collapse
  }

  test("decontamination flags exactly the docs sharing an n-gram, distinct-counted") {
    val bench = docs(100L -> "the quick brown fox jumps")
    val train = docs(
      1L -> "lazy dogs avoid the quick brown fox",      // shares 2 distinct 3-grams
      2L -> "the quick brown fox the quick brown fox",  // repeats → still distinct count
      3L -> "entirely disjoint vocabulary here")
    val out = Decontaminate.overlapReport(train, bench, n = 3)
      .as[(Long, Long)].collect().toMap
    // doc 1: "the quick brown", "quick brown fox" (2); doc 2 additionally
    // contains them repeated plus cross-boundary grams not in bench
    assert(out == Map(1L -> 2L, 2L -> 2L))
  }

  test("chunking: boundaries, last-chunk length, full coverage") {
    val text40 = (1 to 40).map(i => s"t$i").mkString(" ")
    val text41 = (1 to 41).map(i => s"t$i").mkString(" ")
    val out = Chunking.chunk(docs(1L -> text40, 2L -> text41), 40, 30)
      .select("doc_id", "chunk_id", "start_tok", "n_tok")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 1L, 1L, 40L),                 // exactly one window → one chunk
      (2L, 1L, 1L, 40L), (2L, 2L, 31L, 11L))) // stride 30, remainder 11
    // chunk_text slices really are the token ranges
    val texts = Chunking.chunk(docs(2L -> text41), 40, 30)
      .select("chunk_id", "chunk_text").as[(Long, String)].collect().toMap
    assert(texts(2L) == (31 to 41).map(i => s"t$i").mkString(" "))
  }

  test("chunking is layout-independent") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Chunking.chunk(d, 40, 30).collect().toSet
    val b = Chunking.chunk(d.repartition(13), 40, 30).collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("mixtureResample: over-target strata shrink, under-target keep all, absent drop") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val before = d.groupBy("lang").count().as[(String, Long)].collect().toMap
    val kept = Sampling
      .mixtureResample(d, Map("en" -> 1, "fr" -> 9), weightDen = 10, seed = 42)
    val after = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    val total = before.values.sum
    // en: target 10% of corpus < its actual share → strictly downsampled
    assert(after("en") < before("en"))
    assert(math.abs(after("en") - 0.1 * total) < 0.05 * total,
      s"en kept ${after("en")} of $total")
    // fr: target 90% of corpus >> its share → keeps every row
    assert(after("fr") == before("fr"))
    // strata not in the mixture are dropped entirely
    assert(after.keySet == Set("en", "fr"))
    // layout-independence: identical kept set under repartition
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    val keptIds2 = Sampling
      .mixtureResample(d.repartition(17), Map("en" -> 1, "fr" -> 9),
        weightDen = 10, seed = 42)
      .select("doc_id").as[Long].collect().toSet
    assert(keptIds == keptIds2)
  }

  test("saltedInner equals the plain join and spreads a hot key over salts") {
    val fact = (1 to 2000).map(i => (if (i % 10 == 0) 7L else i.toLong % 50, i.toLong))
      .toDF("k", "v")
    val dim = (0L to 49L).map(k => (k, s"dim$k")).toDF("k", "name")
    val salted = SkewJoin.saltedInner(fact, dim, "k", salts = 8)
      .select("k", "v", "name").as[(Long, Long, String)].collect().sorted.toSeq
    val plain = fact.join(dim, "k")
      .select("k", "v", "name").as[(Long, Long, String)].collect().sorted.toSeq
    assert(salted == plain && plain.nonEmpty)
    // the hot key's fact rows really do land on several salt values
    val hotSalts = fact.where(col("k") === 7L)
      .withColumn("_salt", pmod(xxhash64(col("k"), col("v")), lit(8L)))
      .select("_salt").distinct().count()
    assert(hotSalts > 1, s"hot key used $hotSalts salt(s)")
  }

  test("pseudonymization is deterministic, collision-free on the key range, maskable") {
    import graft.functions.Anonymize
    val ids = spark.range(0, 20000).toDF("id")
    val tok = ids.select(Anonymize.pseudonymizeId(col("id"), 99).as("t"))
    // injective on a realistic key range (collisions would silently
    // merge customers after anonymization)
    assert(tok.distinct().count() == 20000)
    // deterministic across evaluations and layouts
    val a = tok.as[Long].collect().toSeq
    val b = ids.repartition(7)
      .select(Anonymize.pseudonymizeId(col("id"), 99).as("t"))
      .as[Long].collect().toSeq
    assert(a.toSet == b.toSet)
    // masking keeps only the last 4 characters
    val m = Seq("Customer#000000042", "abc").toDF("s")
      .select(Anonymize.maskAllButLast(col("s"), 4).as("m"))
      .as[String].collect().toSeq
    assert(m.contains("**************0042"))
    assert(m.contains("abc")) // shorter than keep → unmasked, not padded
  }

  test("repetition query flags a degenerate doc and not a diverse one") {
    val d = docs(
      1L -> Seq.fill(30)("spam ham").mkString(" "),       // one dominant bigram
      2L -> (1 to 60).map(i => s"w$i").mkString(" "))     // all-distinct tokens
      .withColumn("lang", when(col("doc_id") === 1, "rep").otherwise("div"))
    // run through the registry query itself against a scratch table dir
    val tmp = java.nio.file.Files.createTempDirectory("curation").toFile
    d.withColumn("source", lit("s")).withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("q_text_repetition")(spark, tmp.toString)
      .select("lang", "n_repetitive").as[(String, Long)].collect().toMap
    assert(out("rep") == 1L && out("div") == 0L)
  }
}
