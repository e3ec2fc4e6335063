package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gold analytics tables (reference: pipeline_2026/ex_match_sg.py:121-297).
  *
  * All four are single-pass hash aggregations over the silver deliveries;
  * the reference's driver-side Python loops (match winners, standings
  * fold) are re-expressed as window ranks + a second aggregation, so the
  * whole computation stays distributed — at 100 TB the only shuffles are
  * the groupBy keys (player / team / match), all low-cardinality.
  */
object GoldTables {

  /** The reference's ÷0→÷1 KPI guard (ex_match_sg.py:144-146,166-170):
    * a zero denominator divides by 1 instead of NULLing out. Reproduced
    * exactly — deviating drifts every 0-ball/0-wicket KPI.
    */
  private def div0to1(x: Column, y: Column): Column =
    x / when(y === 0, 1).otherwise(y)

  /** Cricket overs notation: completed overs + balls-in-over/10
    * (ex_match_sg.py:165). */
  private def oversNotation(balls: Column): Column =
    floor(balls / 6) + (balls % 6) / 10.0

  private def validName(c: Column): Column = c.isNotNull && c =!= "N/A"

  /** gold_batsman_stats (ex_match_sg.py:121-148). */
  def batsmanStats(silver: DataFrame): DataFrame = {
    val bat = silver.where(validName(col("batsman")))

    val stats = bat.groupBy("batsman").agg(
      countDistinct("match").as("matches"),
      sum("runs").as("total_runs"),
      sum("is_legal_delivery").as("legal_balls"),
      sum("is_four").as("fours"),
      sum("is_six").as("sixes"),
      sum("is_dot_ball").as("dot_balls"))

    // highest score: per-(batsman, match) run sum, then max — two-level agg
    // with map-side partials; no join back needed beyond the small result.
    val highest = bat.groupBy("batsman", "match")
      .agg(sum("runs").as("match_runs"))
      .groupBy("batsman").agg(max("match_runs").as("highest_score"))

    // dismissals counted over the FULL frame (ex_match_sg.py:138 uses df,
    // not the batsman-filtered slice).
    val outs = silver.where(validName(col("out_batsman")))
      .groupBy(col("out_batsman").as("batsman"))
      .agg(count(lit(1)).as("times_out"))

    stats
      .join(highest, Seq("batsman"), "left")
      .join(outs, Seq("batsman"), "left")
      .withColumn("times_out", coalesce(col("times_out"), lit(0L)))
      .withColumn("strike_rate", round(div0to1(col("total_runs") * 100.0, col("legal_balls")), 2))
      .withColumn("batting_avg", round(div0to1(col("total_runs").cast("double"), col("times_out")), 2))
      .withColumn("dot_ball_pct", round(div0to1(col("dot_balls") * 100.0, col("legal_balls")), 2))
      .orderBy(desc("total_runs"))
  }

  /** gold_bowler_stats (ex_match_sg.py:150-172). */
  def bowlerStats(silver: DataFrame): DataFrame =
    silver.where(validName(col("bowler")))
      .groupBy("bowler").agg(
        countDistinct("match").as("matches"),
        sum("total_runs").as("total_runs_conceded"),
        sum("is_legal_delivery").as("legal_balls"),
        sum("wicket").as("wickets"),
        sum("is_dot_ball").as("dot_balls"),
        sum("is_four").as("fours_conceded"),
        sum("is_six").as("sixes_conceded"))
      .withColumn("overs_bowled", oversNotation(col("legal_balls")))
      .withColumn("economy_rate",
        round(div0to1(col("total_runs_conceded").cast("double"), col("legal_balls") / 6.0), 2))
      .withColumn("bowling_avg",
        round(div0to1(col("total_runs_conceded").cast("double"), col("wickets")), 2))
      .withColumn("strike_rate",
        round(div0to1(col("legal_balls").cast("double"), col("wickets")), 2))
      .withColumn("dot_ball_pct",
        round(div0to1(col("dot_balls") * 100.0, col("legal_balls")), 2))
      .orderBy(desc("wickets"), asc("economy_rate"))

  /** gold_team_stats (ex_match_sg.py:174-208).
    *
    * The reference computes the powerplay run rate as a separate
    * filter+groupBy+merge (J3); here it is a conditional aggregate in the
    * SAME groupBy — one shuffle instead of two, identical results
    * (left-join-miss ⇔ all-null conditional sum).
    */
  def teamStats(silver: DataFrame): DataFrame = {
    val pp = col("innings_phase") === "Powerplay"
    silver.where(validName(col("batting_team")))
      .groupBy(col("batting_team").as("team")).agg(
        countDistinct("match").as("matches"),
        sum("total_runs").as("total_runs"),
        sum("wicket").as("total_wickets_lost"),
        sum("is_legal_delivery").as("legal_balls"),
        sum("is_four").as("fours"),
        sum("is_six").as("sixes"),
        sum(when(pp, col("total_runs"))).as("pp_runs"),
        sum(when(pp, col("is_legal_delivery"))).as("pp_balls"))
      .withColumn("overs_batted", oversNotation(col("legal_balls")))
      .withColumn("overall_run_rate",
        round(div0to1(col("total_runs").cast("double"), col("legal_balls") / 6.0), 2))
      .withColumn("pp_run_rate",
        round(div0to1(col("pp_runs").cast("double"), col("pp_balls") / 6.0), 2))
      .drop("pp_runs", "pp_balls")
      .orderBy(desc("total_runs"))
  }

  /** gold_tournament_standings (ex_match_sg.py:210-297).
    *
    * The reference folds standings in two driver loops (per match, per
    * team). Re-expressed distributed: per-(match, team) batting/bowling
    * sums (one shuffle), a 2-team self-pairing window to decide
    * winner/loser/tie, then a team-level aggregation.
    *
    * Two documented reference quirks handled intentionally:
    *  - ties: the reference compares `winner == None`, so tied matches
    *    never actually count (ex_match_sg.py:256-258); we implement the
    *    evident intent (tie ⇒ both sides played+1, tied_nr+1, 1 point,
    *    per :247-248,262).
    *  - matches whose delivery rows show ≠2 batting teams are silently
    *    excluded from win/loss (ex_match_sg.py:238) — reproduced.
    *  - run-rate guard here is `if overs > 0 else 0.0` (:273-275), NOT
    *    the ÷1 guard the leaderboards use.
    */
  def tournamentStandings(silver: DataFrame): DataFrame = {
    val clean = silver.where(
      validName(col("batting_team")) && validName(col("bowling_team")))

    val batted = clean.groupBy(col("match"), col("batting_team").as("team"))
      .agg(sum("total_runs").as("runs_scored"),
        sum("is_legal_delivery").as("legal_balls_batted"))

    val bowled = clean.groupBy(col("match"), col("bowling_team").as("team"))
      .agg(sum("total_runs").as("runs_conceded"),
        sum("is_legal_delivery").as("legal_balls_bowled"))

    val matchStats = batted.join(bowled, Seq("match", "team"), "outer")
      .na.fill(0)

    // Win/loss/tie per match, only for matches with exactly 2 batting
    // sides: rank teams within the match by runs.
    val wMatch = Window.partitionBy("match")
    val perMatch = batted
      .withColumn("n_teams", count(lit(1)).over(wMatch))
      .where(col("n_teams") === 2)
      .withColumn("max_runs", max("runs_scored").over(wMatch))
      .withColumn("min_runs", min("runs_scored").over(wMatch))
      .withColumn("is_tie", (col("max_runs") === col("min_runs")).cast("int"))
      .withColumn("won", (col("is_tie") === 0 && col("runs_scored") === col("max_runs")).cast("int"))
      .withColumn("lost", (col("is_tie") === 0 && col("runs_scored") === col("min_runs")).cast("int"))

    val results = perMatch.groupBy("team").agg(
      sum("won").as("won"), sum("lost").as("lost"), sum("is_tie").as("tied_nr"))

    val totals = matchStats.groupBy("team").agg(
      sum("runs_scored").as("runs_for"),
      sum("legal_balls_batted").as("balls_for"),
      sum("runs_conceded").as("runs_against"),
      sum("legal_balls_bowled").as("balls_against"))

    def rr(runs: Column, balls: Column): Column =
      when(balls > 0, round(runs.cast("double") / (balls / 6.0), 2)).otherwise(0.0)

    val allTeams = clean.select(col("batting_team").as("team")).distinct()

    val standings = allTeams
      .join(results, Seq("team"), "left")
      .join(totals, Seq("team"), "left")
      .na.fill(0)
      .withColumn("played", col("won") + col("lost") + col("tied_nr"))
      .withColumn("points", col("won") * 2 + col("tied_nr"))
      .withColumn("avg_run_rate", rr(col("runs_for"), col("balls_for")))
      .withColumn("conceded_run_rate", rr(col("runs_against"), col("balls_against")))
      // NRR from the already-rounded rates (ex_match_sg.py:273-275).
      .withColumn("net_run_rate", round(col("avg_run_rate") - col("conceded_run_rate"), 3))
      .withColumn("overs_for", round(oversNotation(col("balls_for")), 1))
      .withColumn("overs_against", round(oversNotation(col("balls_against")), 1))

    // Deterministic rank: reference tie-breaks by pandas sort stability;
    // we pin the residual tie-break to team name.
    val rankW = Window.orderBy(
      desc("points"), desc("net_run_rate"), desc("avg_run_rate"), asc("team"))

    standings
      .withColumn("rank", row_number().over(rankW))
      .select("rank", "team", "played", "won", "lost", "tied_nr", "points",
        "net_run_rate", "avg_run_rate", "runs_for", "overs_for",
        "runs_against", "overs_against")
      .orderBy("rank")
  }
}
