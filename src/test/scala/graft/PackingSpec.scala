package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

/** Greedy sequence-packing invariants over the documents corpus. */
class PackingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val budget = 512L
  private val shardWidth = 100L

  test("packs are contiguous from 0 and overshoot by at most one document") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val assigned = Packing.assignPacks(docs, budget).cache()
    try {
      // every document assigned exactly once
      assert(assigned.count() === docs.count())

      // pack ids contiguous from 0 within each lang
      val perLang = assigned.groupBy("lang")
        .agg(min("pack_id").as("lo"), max("pack_id").as("hi"),
          countDistinct("pack_id").as("n"))
        .collect()
      perLang.foreach { r =>
        assert(r.getAs[Long]("lo") === 0L)
        assert(r.getAs[Long]("n") === r.getAs[Long]("hi") + 1)
      }

      // greedy invariant: a pack exceeds the budget by less than its
      // own largest document (the doc that crossed the boundary)
      val packs = Packing.packSummary(docs, budget).collect()
      val maxDoc = assigned.agg(max("n_tokens")).first().getLong(0)
      packs.foreach { r =>
        assert(r.getAs[Long]("pack_tokens") < budget + maxDoc,
          s"pack ${r.getAs[Long]("pack_id")} holds ${r.getAs[Long]("pack_tokens")} tokens")
      }

      // deterministic under repartitioning
      val again = Packing.assignPacks(docs.repartition(7), budget)
        .select("doc_id", "pack_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val first = assigned
        .select("doc_id", "pack_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(again === first)
    } finally assigned.unpersist()
  }

  test("sharded packing: window-key cardinality scales with the corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val n = docs.count()
    val nLangs = docs.select("lang").distinct().count()
    val keys = docs
      .select(col("lang"), expr(s"doc_id div $shardWidth").as("shard"))
      .distinct().count()
    // each (lang, shard) holds at most shardWidth docs ⇒ the window's
    // parallelism grows at least linearly with the corpus — this is the
    // property the unsharded per-lang window lacks (caps at nLangs)
    assert(keys >= n / shardWidth,
      s"$keys keys for $n docs at width $shardWidth")
    assert(keys > nLangs, s"composite key ($keys) must beat lang-only ($nLangs)")
  }

  test("sharded packing: same schema, every doc once, ids unique per shard") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plain = Packing.assignPacks(docs, budget)
    val sharded = Packing.assignPacksSharded(docs, budget,
      shardWidth = shardWidth).cache()
    try {
      // drop-in schema: identical columns/types to the unsharded form
      assert(sharded.schema === plain.schema)
      assert(sharded.count() === docs.count())
      assert(sharded.select("doc_id").distinct().count() === docs.count())

      // pack ids globally unique within lang: a (lang, pack_id) never
      // spans two shards (packs break at shard edges by construction)
      val spanning = sharded
        .withColumn("shard", expr(s"doc_id div $shardWidth"))
        .groupBy("lang", "pack_id")
        .agg(countDistinct("shard").as("n_shards"))
        .where(col("n_shards") > 1)
      assert(spanning.count() === 0L)

      // pack_id non-decreasing in doc order within each lang (order-
      // consistent ids, the property the offsets join must preserve)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang").orderBy("doc_id")
      val regressions = sharded
        .withColumn("prev", lag("pack_id", 1).over(w))
        .where(col("prev").isNotNull && col("pack_id") < col("prev"))
      assert(regressions.count() === 0L)

      // greedy overshoot bound holds per pack
      val maxDoc = sharded.agg(max("n_tokens")).first().getLong(0)
      Packing.packSummarySharded(docs, budget, shardWidth = shardWidth)
        .collect().foreach { r =>
          assert(r.getAs[Long]("pack_tokens") < budget + maxDoc)
        }

      // per-lang doc and token totals match the unsharded greedy (the
      // formulations repack the SAME corpus, only boundaries realign)
      def totals(df: org.apache.spark.sql.DataFrame) = df
        .groupBy("lang").agg(count(lit(1)).as("d"), sum("n_tokens").as("t"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      assert(totals(sharded) === totals(plain))
    } finally sharded.unpersist()
  }

  test("sharded packing: one shard per lang ⇒ identical to unsharded") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val n = docs.count()
    val one = Packing.assignPacksSharded(docs, budget, shardWidth = n + 1)
      .select("doc_id", "pack_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val plain = Packing.assignPacks(docs, budget)
      .select("doc_id", "pack_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(one === plain)
  }

  test("sharded packing: deterministic under repartitioning") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def run(d: org.apache.spark.sql.DataFrame) =
      Packing.assignPacksSharded(d, budget, shardWidth = shardWidth)
        .select("doc_id", "pack_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(run(docs.repartition(7)) === run(docs))
  }

  test("sharded packing: the offsets join is a broadcast") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = Packing.assignPacksSharded(docs, budget, shardWidth = shardWidth)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
    assert(!plan.contains("SortMergeJoin"), plan.take(1200))
  }
}
