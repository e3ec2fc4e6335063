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

  test("ngramStream == exploded wordNgrams on every doc shape") {
    val d = Seq((1L, "a b c d"), (2L, "x y"), (3L, "  a   b  "),
        (4L, null.asInstanceOf[String]), (5L, ""))
      .toDF("doc_id", "text")
    val viaArray = d.select(col("doc_id"),
        explode(TextAnalysis.wordNgrams(col("text"), 3)).as("gram"))
      .as[(Long, String)].collect().sorted.toSeq
    val viaStream = TextAnalysis.ngramStream(d, 3, Seq("doc_id"))
      .as[(Long, String)].collect().sorted.toSeq
    assert(viaStream == viaArray && viaStream.nonEmpty)
    // null/empty/short docs emit nothing from either formulation
    assert(!viaStream.exists(r => r._1 >= 2L))
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

  test("cappedPerKey: equals the single-window answer, bounded, layout-independent") {
    import org.apache.spark.sql.expressions.Window
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("source", "cap_rank", "doc_id")
        .as[(String, Long, Long)].collect().toSet
    val two = rows(Sampling.cappedPerKey(d, "source", 7, salts = 4))
    // the claim: the skew-safe two-stage top-k IS the plain window top-k
    val one = d
      .withColumn("cap_rank", row_number().over(
        Window.partitionBy("source").orderBy(
          Sampling.portableBucket(col("doc_id"), 42), col("doc_id")))
        .cast("long"))
      .where(col("cap_rank") <= 7)
    assert(two == rows(one) && two.nonEmpty)
    assert(two == rows(Sampling.cappedPerKey(d.repartition(13), "source", 7, salts = 4)))
    // bound holds per key; a key smaller than the cap keeps everything
    val perKey = two.groupBy(_._1).view.mapValues(_.size)
    assert(perKey.values.forall(_ <= 7))
    val small = Sampling.cappedPerKey(
      docs(1L -> "a", 2L -> "b").withColumn("source", lit("s")), "source", 7)
    assert(small.count() == 2)
  }

  test("assignShards: sharded rank == single global window; fixed shard sizes") {
    import org.apache.spark.sql.expressions.Window
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "train_rank", "shard_id")
        .as[(Long, Long, Long)].collect().toSet
    val sharded = rows(graft.operators.Sharding.assignShards(d, 7, nShards = 13))
    // the claim: range-shard window + offsets IS the plain global window
    val one = d.select(col("doc_id"))
      .withColumn("train_rank", row_number().over(Window.orderBy(
        Sampling.portableBucket(col("doc_id"), 42), col("doc_id"))).cast("long"))
      .withColumn("shard_id", expr("(train_rank - 1) div 7"))
    assert(sharded == rows(one) && sharded.nonEmpty)
    // layout independence + nShards independence (any count, same answer)
    assert(sharded == rows(
      graft.operators.Sharding.assignShards(d.repartition(17), 7, nShards = 1000)))
    // scale shape: the offset table is bounded by nShards, never by the
    // corpus — occupied range-shard count ≤ nShards regardless of n
    val cells = d.select(col("doc_id"))
      .select(Sampling.portableBucket(col("doc_id"), 42).as("pb"))
      .select(expr("(pb * 13) div 10000").as("rs")).distinct().count()
    assert(cells <= 13)
    // every shard is exactly recordsPerShard docs except the last
    val n = d.count()
    val sizes = sharded.groupBy(_._3).view.mapValues(_.size).toMap
    val last = sizes.keys.max
    assert(sizes.filter(_._1 != last).values.forall(_ == 7))
    assert(sizes(last) == (if (n % 7 == 0) 7 else n % 7))
    // ranks are a permutation of 1..n
    assert(sharded.map(_._2) == (1L to n).toSet)
  }

  test("epochUpsample: full copies exact, partial epoch is the hash subset") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Sampling.epochUpsample(d, Map("en" -> 5, "fr" -> 2, "es" -> 1), 2)
      .as[(Long, String, Long)].collect()
    val byLang = out.groupBy(_._2)
    val nEn = d.where(col("lang") === "en").count()
    val nFr = d.where(col("lang") === "fr").count()
    // en: 2 full copies of every doc + a ~half partial epoch, epoch ids 1..3
    val en = byLang("en")
    assert(en.count(_._3 <= 2) == 2 * nEn)
    val partial = en.count(_._3 == 3)
    assert(partial > 0 && partial < nEn)
    // the partial epoch is exactly the stratifiedByHash half (same seed)
    val half = Sampling.stratifiedByHash(
      d.where(col("lang") === "en"), lit(0.5)).select("doc_id")
      .as[Long].collect().toSet
    assert(en.filter(_._3 == 3).map(_._1).toSet == half)
    // fr: exactly one epoch, no partial; absent strata emit nothing
    assert(byLang("fr").forall(_._3 == 1L) && byLang("fr").length == nFr)
    assert(!byLang.contains("de") && !byLang.contains("zh"))
    // layout independence
    val out2 = Sampling.epochUpsample(d.repartition(13),
      Map("en" -> 5, "fr" -> 2, "es" -> 1), 2)
      .as[(Long, String, Long)].collect()
    assert(out.sorted.toSeq == out2.sorted.toSeq)
  }

  test("topFractionGate: threshold never splits a tie bucket; fraction honored") {
    // scores: 9×score-1, 1×score-5, 10×score-3 → hist {5:1, 3:10, 1:9}
    val d = ((1 to 9).map(i => (i.toLong, 1L)) ++ Seq((10L, 5L)) ++
      (11 to 20).map(i => (i.toLong, 3L))).toDF("doc_id", "s")
    // keep top 30% of 20 = 6: score 5 gives cum 1 < 6; score 3 gives cum
    // 11 ≥ 6 → threshold 3, ALL 11 rows with score ≥ 3 kept (tie bucket
    // never split)
    val kept = Sampling.topFractionGate(d, col("s"), 3, 10)
    assert(kept.count() == 11)
    assert(kept.select("gate_threshold").distinct().as[Long].collect().toSeq == Seq(3L))
    // fraction ≥ 1 keeps every row, threshold falls to the min score
    assert(Sampling.topFractionGate(d, col("s"), 1, 1).count() == 20)
    // empty input → empty output, no NPE
    assert(Sampling.topFractionGate(d.where(lit(false)), col("s"), 3, 10).count() == 0)
    // keep-top-0 keeps NOTHING (not the whole top bucket), schema intact
    val zero = Sampling.topFractionGate(d, col("s"), 0, 10)
    assert(zero.count() == 0)
    assert(zero.columns.toSeq == d.columns.toSeq :+ "gate_threshold")
  }

  test("selectToTokenBudget: sharded == single-window; quota reached, never undershot") {
    import org.apache.spark.sql.expressions.Window
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "lang", "n_tokens", "cum_before")
        .as[(Long, String, Long, Long)].collect().toSet
    val got = rows(Sampling.selectToTokenBudget(d, 500L))
    // the claim: the sharded composite-window shape IS the plain
    // stratum-window running-sum prefix
    val ref = d.select(col("doc_id"), col("lang"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        Sampling.portableBucket(col("doc_id"), 42).as("pb"))
      .withColumn("cum_before", coalesce(sum("n_tokens").over(
        Window.partitionBy("lang").orderBy("pb", "doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .where(col("cum_before") < 500L)
      .select("doc_id", "lang", "n_tokens", "cum_before")
    assert(got == rows(ref) && got.nonEmpty)
    assert(got == rows(Sampling.selectToTokenBudget(d.repartition(13), 500L)))
    // every stratum with >= budget tokens available reaches its quota
    val totals = d.groupBy("lang")
      .agg(sum(TextAnalysis.tokenCount(col("text"))).as("avail"))
      .as[(String, Long)].collect().toMap
    val keptTok = got.groupBy(_._2).view.mapValues(_.toSeq.map(_._3).sum)
    for ((lang, avail) <- totals)
      if (avail >= 500L) assert(keptTok(lang) >= 500L, s"$lang undershot")
      else assert(keptTok(lang) == avail, s"$lang should keep everything")
  }

  test("bigram LM score ranks fluent sequences above rare ones") {
    // NOTE an unsmoothed MLE scores a rare bigram over a rare CONTEXT at
    // p=1 (c2=c1=1) — the discriminating case is common words in a rare
    // ORDER, which is also what a perplexity filter actually catches
    val d = (Seq.fill(20)("the cat sat") ++ Seq("cat the sat"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val scores = TextAnalysis.bigramLmScores(d)
      .select("doc_id", "lm_score").as[(Long, Long)].collect().toMap
    assert(scores(0L) > scores(20L),
      s"fluent doc ${scores(0L)} should outrank scrambled ${scores(20L)}")
    // exact pins: fluent bigrams have c2=20 over c1=21 → s=floor(2e9/21);
    // scrambled bigrams are singletons over the same contexts → 1e8/21
    assert(scores(0L) == 95238095L && scores(20L) == 4761904L)
    // a sub-2-token doc has no bigrams and is absent
    val withShort = d.union(Seq((99L, "solo")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")))
    assert(!TextAnalysis.bigramLmScores(withShort)
      .where(col("doc_id") === 99L).as[(Long, String, Long, Long, Long)]
      .collect().exists(_ => true))
  }

  test("bigram LM: occurrence collapse shrinks join input on Zipfian multiplicities") {
    // A Zipfian-multiplicity corpus (each doc repeats a few bigrams many
    // times — the real-crawl shape where the r8 collapse pays ~13×; the
    // GenScale sf100 data eroded it by diversifying the vocabulary, see
    // BASELINE.md). This pins (a) the collapse stays IN THE PLAN — the
    // first join's bigram side aggregates to (doc, bigram, k) BEFORE
    // joining — and (b) the collapsed arithmetic still weights by the
    // full multiplicity, so a refactor can't silently drop either half.
    val d = (0 until 8).map { i =>
      val reps = 1 << (i % 4 + 3) // 8..64 repeats per doc of one phrase
      (i.toLong, (s"alpha beta " * reps).trim)
    }.toDF("doc_id", "text").withColumn("lang", lit("en"))
    val out = TextAnalysis.bigramLmScores(d)
    // (b) multiplicity preserved: per-doc n_bigrams == occurrence count
    val n = out.select("doc_id", "n_bigrams").as[(Long, Long)].collect().toMap
    (0 until 8).foreach { i =>
      val reps = 1 << (i % 4 + 3)
      assert(n(i.toLong) == 2L * reps - 1, s"doc $i multiplicity lost")
    }
    // (a) the collapse is structural: below the FIRST join of the plan
    // there is an aggregate keyed (doc_id, lang, bigram) — join input is
    // distinct-bigram rows (3 per doc here), not occurrence rows (~127)
    val plan = out.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
    val joins = plan.collect { case j: Join => j }
    assert(joins.nonEmpty)
    val bottomJoin = joins.last // innermost join (bgc ⋈ c2)
    def hasCollapse(p: LogicalPlan): Boolean = p.collectFirst {
      case a: Aggregate
        if a.groupingExpressions.size == 3 &&
          a.groupingExpressions.flatMap(_.references.map(_.name))
            .toSet == Set("doc_id", "lang", "bigram") => a
    }.isDefined
    assert(bottomJoin.children.exists(hasCollapse),
      s"per-(doc,bigram) collapse missing below the first join:\n$plan")
  }

  test("CDC chunking: edit-stable spans, full coverage, degenerate inputs") {
    val words = (1 to 200).map(i => s"w${i * 7919 % 997}")
    val orig = words.mkString(" ")
    val edited = (words.take(100) :+ "INSERTED").concat(words.drop(100)).mkString(" ")
    def chunks(text: String) = Chunking
      .chunkContentDefined(docs(1L -> text), divisor = 16)
      .select("chunk_text").as[String].collect().toSeq
    val (a, b) = (chunks(orig), chunks(edited))
    // coverage: chunks concatenate back to the document
    assert(a.mkString(" ") == orig && b.mkString(" ") == edited)
    // content-defined stability: one mid-document insertion disturbs only
    // the chunk(s) at the edit site — the shared chunk multiset stays
    // large. Fixed-window chunking shifts EVERY boundary after the edit.
    val sharedCdc = a.intersect(b).size
    assert(a.size - sharedCdc <= 2, s"CDC: ${a.size} chunks, only $sharedCdc shared")
    def fixedChunks(text: String) = Chunking.chunk(docs(1L -> text), 16, 16)
      .select("chunk_text").as[String].collect().toSeq
    val (fa, fb) = (fixedChunks(orig), fixedChunks(edited))
    assert(fa.intersect(fb).size < sharedCdc,
      "fixed-window chunking should lose more chunks to the same edit")
    // degenerate inputs keep the >= 1 chunk invariant
    val deg = Chunking.chunkContentDefined(
      docs(1L -> "", 2L -> "   ", 3L -> "one"), 16)
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(deg == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("bloom decontamination: no false negatives vs the exact join; FP mass visible") {
    import graft.operators.BloomFilter
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val isBench = Sampling.portableBucket(col("doc_id"), 7) < 2000 // ~20%
    val (train, bench) = (d.where(!isBench), d.where(isBench))
    val rep = BloomFilter.decontaminateReport(train, bench, n = 3)
      .as[(String, Long, Long, Long)].collect()
    assert(rep.nonEmpty)
    // bloom can only over-report: per lang, bloom grams >= true grams
    rep.foreach { case (lang, nd, nb, nt) =>
      assert(nb >= nt && nd >= 1, s"$lang: bloom=$nb true=$nt docs=$nd")
    }
    // no false negatives: the exact operator's true matches are all there
    // (per-lang true-gram totals equal the exact join's overlap counts)
    val exact = Decontaminate.overlapReport(train, bench, n = 3)
      .join(d.select("doc_id", "lang"), "doc_id")
      .groupBy("lang").agg(sum("n_shared").as("n"))
      .as[(String, Long)].collect().toMap
    val bloomTrue = rep.map(r => r._1 -> r._4).toMap
    assert(bloomTrue == exact,
      s"bloom true-gram counts $bloomTrue != exact $exact")
    // layout-independent
    val rep2 = BloomFilter
      .decontaminateReport(train.repartition(13), bench.coalesce(1), n = 3)
      .as[(String, Long, Long, Long)].collect()
    assert(rep.toSet == rep2.toSet)
  }

  test("dedupChunksGlobal: first occurrence owns; total kept = distinct chunks") {
    val text = (1 to 40).map(i => s"t$i").mkString(" ")
    val d = docs(1L -> text, 2L -> text, 3L -> "unique words only here")
    val out = Chunking.dedupChunksGlobal(d, 40, 30)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 1 and 2 are byte-identical single chunks: doc 1 keeps, doc 2 drops
    assert(out(1L) == ((1L, 1L)) && out(2L) == ((1L, 0L)) && out(3L) == ((1L, 1L)))
    // corpus-level conservation: Σ n_kept = # distinct chunk texts
    val full = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Chunking.dedupChunksGlobal(full, 40, 30)
    val kept = got.agg(sum("n_kept")).as[Long].head()
    val distinctChunks =
      Chunking.chunk(full, 40, 30).select("chunk_text").distinct().count()
    assert(kept == distinctChunks)
    assert(got.where(col("n_kept") > col("n_chunks")).count() == 0)
  }

  test("selectToTokenBudget rejects nShards > granularity (Sharding contract twin)") {
    val d = docs(1L -> "a b c")
    intercept[IllegalArgumentException] {
      Sampling.selectToTokenBudget(d, 10L, nShards = 64, granularity = 32)
    }
  }

  test("ngramStream rejects carry columns colliding with working columns") {
    val d = docs(1L -> "a b c d").withColumn("gram", lit("x"))
    intercept[IllegalArgumentException] {
      TextAnalysis.ngramStream(d, 2, Seq("doc_id", "gram"))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.ngramStream(d.withColumnRenamed("gram", "_t"), 2, Seq("_t"))
    }
  }
}
