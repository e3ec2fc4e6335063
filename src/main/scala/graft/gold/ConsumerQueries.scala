package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's user-facing consumer SQL (Athena queries,
  * README.md:155-183) as library functions over the gold tables — the
  * surface a reference user actually runs every day. All are
  * top-k/ordered reads of pre-aggregated tables: `orderBy(...).limit(k)`
  * plans (TakeOrderedAndProject — no global sort at any scale).
  */
object ConsumerQueries {

  /** Orange Cap: top run-scorers (README.md:171-177). */
  def orangeCap(batsmanStats: DataFrame, k: Int = 10): DataFrame =
    batsmanStats
      .select("batsman", "matches", "total_runs", "strike_rate", "batting_avg")
      .orderBy(desc("total_runs"), asc("batsman")).limit(k)

  /** Purple Cap: top wicket-takers, economy tie-break (README.md:178-183). */
  def purpleCap(bowlerStats: DataFrame, k: Int = 10): DataFrame =
    bowlerStats
      .select("bowler", "matches", "wickets", "economy_rate", "bowling_avg")
      .orderBy(desc("wickets"), asc("economy_rate"), asc("bowler")).limit(k)

  /** Points table in rank order (README.md:156-168). */
  def pointsTable(standings: DataFrame): DataFrame =
    standings.orderBy(asc("rank"))

  /** Best powerplay sides: teams by powerplay run rate. */
  def powerplayLeaders(teamStats: DataFrame, k: Int = 10): DataFrame =
    teamStats
      .select("team", "matches", "pp_run_rate", "overall_run_rate")
      .orderBy(desc("pp_run_rate"), asc("team")).limit(k)

  /** Boundary hitters: most sixes then fours. */
  def boundaryLeaders(batsmanStats: DataFrame, k: Int = 10): DataFrame =
    batsmanStats
      .select("batsman", "sixes", "fours", "total_runs")
      .orderBy(desc("sixes"), desc("fours"), asc("batsman")).limit(k)
}
