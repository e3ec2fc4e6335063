package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

/** Greedy sequence-packing invariants over the documents corpus. */
class PackingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val budget = 512L

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
}
