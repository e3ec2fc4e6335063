package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Par}

/** The r17 narrow-stage parallelism floor: result-invisible by
  * construction, partition-raising only when the input is below the
  * session's default parallelism, and a pass-through otherwise — the
  * three properties every floored operator (minhash, simhash pairs,
  * deletion-variant fuzzy join, q_x2) relies on. */
class ParSpec extends SparkSpec {

  import spark.implicits._

  test("floor raises a 1-partition frame to defaultParallelism and " +
    "preserves the exact row multiset") {
    val df = (1 to 1000).map(i => (i.toLong, s"t$i")).toDF("id", "s")
      .coalesce(1)
    assert(df.rdd.getNumPartitions === 1)
    val f = Par.floor(df)
    assert(f.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
    // multiset equality both ways (round-robin moves rows, never
    // drops/duplicates them)
    assert(f.exceptAll(df).count() === 0L)
    assert(df.exceptAll(f).count() === 0L)
  }

  test("floor is a pass-through when the input already meets the floor") {
    val wide = spark.sparkContext.defaultParallelism + 4
    val df = (1 to 100).map(i => (i, i)).toDF("a", "b").repartition(wide)
    val f = Par.floor(df)
    assert(f.rdd.getNumPartitions === wide) // no extra exchange inserted
  }

  test("minhash pairs are invariant under the input's partitioning " +
    "(the floored operator's output contract)") {
    val docs = (1L to 60L).map { i =>
      // 20 dup families of 3 near-identical docs
      val fam = i % 20
      val tail = if (i < 40) "" else s" x$i"
      (i, "en", (1 to 30).map(j => s"w${fam}_$j").mkString(" ") + tail)
    }.toDF("doc_id", "lang", "text")
    val one = Dedup.minhashLshPairs(docs.coalesce(1), 0.9, 8, 8)
      .orderBy("doc_a", "doc_b").collect().toSeq
    val many = Dedup.minhashLshPairs(docs.repartition(7), 0.9, 8, 8)
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(one.nonEmpty)
    assert(one === many)
  }
}
