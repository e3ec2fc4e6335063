package graft

import org.apache.spark.sql.functions._

/** Accuracy contracts for the sketch aggregates (no cross-engine oracle
  * exists for HLL/KLL internals — the contract is bounded error vs the
  * exact answer). */
class ApproxAggSpec extends SparkSpec {

  private lazy val events =
    graft.queries.Tables.events(spark, "/root/testdata/sf0.01")

  test("approx_count_distinct within 5% of exact") {
    val both = events.groupBy("event_type").agg(
        countDistinct("user_id").as("exact"),
        approx_count_distinct("user_id", 0.02).as("approx"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val (e, a) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e <= 0.05, s"${r.getString(0)}: $a vs $e")
    }
  }

  test("percentile_approx within 5% of the exact median") {
    val rows = events.groupBy("event_type").agg(
        expr("percentile(value, 0.5)").as("exact_p50"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("approx_p50"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (e, a) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(a - e) / math.max(e, 1e-9) <= 0.05,
        s"${r.getString(0)}: $a vs $e")
    }
  }
}
