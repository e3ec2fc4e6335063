package graft

import org.apache.spark.sql.functions._
import graft.io.Tables

/** Co-located joins via bucketed tables: after one write-time shuffle,
  * joins and aggregations on the bucket key run with ZERO exchanges —
  * asserted on the executed plan, not assumed. */
class BucketedJoinSpec extends SparkSpec {

  test("join of two bucketed tables is exchange-free") {
    val sf = "/root/testdata/sf0.001"
    Tables.writeBucketed(
      spark.read.parquet(s"$sf/orders.parquet"), "b_orders", "o_custkey", 8)
    Tables.writeBucketed(
      spark.read.parquet(s"$sf/customer.parquet")
        .withColumnRenamed("c_custkey", "o_custkey"), "b_customer", "o_custkey", 8)

    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), "o_custkey")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"))
      joined.collect() // force execution so the plan is final
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(600))
      assert(plan.contains("Bucketed: true"), plan.take(600))
      // the join itself needs no shuffle: both sides are pre-bucketed,
      // so NO exchange hash-partitions on the join key anywhere in the
      // plan (the groupBy on the non-bucket key c_mktsegment still
      // exchanges — that one is expected)
      assert(!plan.contains("Exchange hashpartitioning(o_custkey"),
        "join required a shuffle despite bucketing:\n" + plan.take(900))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
