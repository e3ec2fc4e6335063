package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.streaming.StreamNearDedup

/** Streaming near-dup suppression: the admitted set must equal the batch
  * prune rule (drop every doc_b of simhashNearDupPairs over the whole
  * corpus) regardless of batch chopping, and a replayed batch must be a
  * no-op (idempotent state + output partitions). */
class StreamNearDedupSpec extends SparkSpec {
  import spark.implicits._

  // ~40-token base texts drawn by a SEEDED RNG from a 64-word vocab:
  // different seeds give genuinely different token SETS (simhash is
  // order-independent, so a mere permutation of one multiset would make
  // every text a near-dup of every other), while a copy with one token
  // swapped stays within a few signature bits. The expected answer is
  // computed from the BATCH operator, not hand-predicted, so the spec
  // never guesses hamming.
  private val words = (0 until 64).map(i => s"w$i")
  private def text(seed: Int, swap: Option[(Int, String)] = None): String = {
    val rng = new scala.util.Random(seed)
    val toks = (0 until 40).map(_ => words(rng.nextInt(words.size)))
    swap.map { case (pos, w) => toks.updated(pos, w) }
      .getOrElse(toks).mkString(" ")
  }

  private val corpus = Seq(
    (1L, text(1)), (2L, text(2)), (3L, text(3)),
    (4L, text(1)),                      // exact dup of 1 (hamming 0)
    (5L, text(2, Some(17 -> "qux"))),   // near-copy of 2
    (6L, text(4)), (7L, text(5)),
    (8L, text(3)),                      // exact dup of 3 — guarantees the
                                        // CROSS-batch drop path (3 arrives
                                        // in drain 1, 8 in drain 2)
    (9L, text(6)))

  test("stream admission == batch prune rule across drains; replay is a no-op") {
    val base = Files.createTempDirectory("graft-sneardup").toString
    val inDir = s"$base/in"; Files.createDirectories(java.nio.file.Paths.get(inDir))
    val stateDir = s"$base/state"; val outDir = s"$base/out"

    val all = corpus.toDF("doc_id", "text")
    // batch rule: drop every doc with ANY smaller-id neighbor at hamming <= 3
    val droppedB = Dedup.simhashNearDupPairs(all, 3)
      .select("doc_b").distinct().as[Long].collect().toSet
    val expect = corpus.map(_._1).filterNot(droppedB).toSet
    assert(droppedB.contains(4L), "exact duplicate must be dropped (hamming 0)")
    assert(droppedB.contains(8L), "cross-batch exact duplicate must be dropped")
    assert(expect.contains(1L) && expect.contains(2L) && expect.contains(3L))

    def drain(): Unit = {
      val stream = spark.readStream.schema("doc_id BIGINT, text STRING").json(inDir)
      StreamNearDedup.admitted(stream, stateDir, outDir, s"$base/ckpt")
        .awaitTermination()
    }
    def admittedIds(): Set[Long] =
      spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet

    // drain 1: docs 1-5 (admission must drop 4, and 5 iff the batch rule does)
    corpus.filter(_._1 <= 5L).toDF("doc_id", "text")
      .write.mode("append").json(inDir)
    drain()
    assert(admittedIds() === expect.filter(_ <= 5L),
      s"drain-1 admissions diverge from batch rule")

    // drain 2: docs 6-9 — cross-batch neighbors (8 vs 3) must resolve
    // against drain-1 state
    corpus.filter(_._1 > 5L).toDF("doc_id", "text")
      .write.mode("append").json(inDir)
    drain()
    assert(admittedIds() === expect,
      s"stream admissions != batch prune rule (got ${admittedIds()}, want $expect)")

    // replay: re-running a batch against the same state must rewrite
    // identical partitions, not duplicate or flip anything
    val stateRows = spark.read.parquet(stateDir).count()
    val batch2 = corpus.filter(_._1 > 5L).toDF("doc_id", "text")
    val replay = StreamNearDedup.admitBatch(batch2, stateDir, batchId = 1L)
      .select("doc_id").as[Long].collect().toSet
    assert(replay === expect.filter(_ > 5L), "replayed batch changed its verdicts")
    assert(spark.read.parquet(stateDir).count() === stateRows,
      "replayed batch grew the state table")
    assert(admittedIds() === expect, "replay disturbed the admitted output")
  }

  test("chopping does not change the admitted set (one batch vs many)") {
    val base = Files.createTempDirectory("graft-sneardup1").toString
    val all = corpus.toDF("doc_id", "text")
    val droppedB = Dedup.simhashNearDupPairs(all, 3)
      .select("doc_b").distinct().as[Long].collect().toSet
    val oneShot = StreamNearDedup.admitBatch(all, s"$base/state", 0L)
      .select("doc_id").as[Long].collect().toSet
    assert(oneShot === corpus.map(_._1).filterNot(droppedB).toSet,
      "single-batch admission must equal the whole-corpus prune rule")
  }
}
