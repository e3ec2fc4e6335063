package graft

import org.apache.spark.sql.functions._
import graft.gold.ConsumerQueries

/** Consumer top-k surface (the reference's Athena queries) over the
  * synthetic season's gold tables. */
class ConsumerQueriesSpec extends SparkSpec {

  private lazy val gold = {
    val (raw, meta) = Fixtures.rawSeason(spark)
    Pipeline.toGold(Pipeline.toSilver(spark, Pipeline.toBronze(raw), meta))
  }

  test("orange cap is ordered by total_runs desc and limited") {
    val top = ConsumerQueries.orangeCap(gold("gold_batsman_stats"), 5).collect()
    assert(top.length === 5)
    val runs = top.map(_.getAs[Long]("total_runs"))
    assert(runs.sameElements(runs.sortBy(-_)))
  }

  test("purple cap orders by wickets desc, economy asc") {
    val top = ConsumerQueries.purpleCap(gold("gold_bowler_stats"), 5).collect()
    assert(top.nonEmpty)
    val pairs = top.map(r => (r.getAs[Long]("wickets"), r.getAs[Double]("economy_rate")))
    assert(pairs.sameElements(pairs.sortBy { case (w, e) => (-w, e) }))
  }

  test("points table is in rank order and top-k plans avoid global sort") {
    val pt = ConsumerQueries.pointsTable(gold("gold_tournament_standings"))
    assert(pt.select("rank").collect().map(_.getInt(0)).toSeq === (1 to 4))
    // top-k = TakeOrderedAndProject, not Sort+Limit over an exchange
    val plan = ConsumerQueries.orangeCap(gold("gold_batsman_stats"), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
  }

  test("powerplay and boundary leaders return ranked rows") {
    assert(ConsumerQueries.powerplayLeaders(gold("gold_team_stats")).count() > 0)
    assert(ConsumerQueries.boundaryLeaders(gold("gold_batsman_stats")).count() > 0)
  }
}
