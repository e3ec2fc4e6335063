package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** End-to-end golden test: 2-match synthetic fixture → bronze → silver →
  * gold, compared against hand-computed values (FIXTURES.md §6).
  *
  * The fixture exercises: run decode incl. wide/no-ball/byes/leg-byes/
  * 5-wides, extras runs from event_info, bowled + run-out dismissals, the
  * rebowl-suppressed innings boundary (super-over edge), a tied match,
  * fuzzy toss-winner reconciliation, and the ÷0→÷1 KPI guard.
  */
class PipelineGoldenSpec extends SparkSpec {
  import spark.implicits._

  private def ball(m: String, o: Int, b: Int, bowler: String, bat: String,
                   ev: String, info: String = ""): Row =
    Row(m, "Apr 01", "19:30", "V", o.toString, b.toString, bowler, bat, ev, info, "t0")

  // Match 1: Alpha 15 (6 legal balls) vs Beta 17 (5 legal balls) — Beta wins.
  // Match 2: Alpha 14 (3 legal) vs Gamma 14 (3 legal) — tie.
  private lazy val rawRows = Seq(
    // 01 innings 1 (Alpha bats: toss won by Alpha, "bat first")
    ball("01_AAvsBB", 0, 1, "bow1", "bat1", "four"),
    ball("01_AAvsBB", 0, 2, "bow1", "bat1", "wide", "1 run"),
    ball("01_AAvsBB", 0, 2, "bow1", "bat1", "no run"),
    ball("01_AAvsBB", 0, 3, "bow1", "bat2", "out Bowled"),
    ball("01_AAvsBB", 0, 4, "bow1", "bat3", "six"),
    ball("01_AAvsBB", 0, 5, "bow1", "bat3", "1 run"),
    ball("01_AAvsBB", 0, 6, "bow1", "bat1", "leg byes", "2 runs"),
    // 01 innings 2 (Beta bats); first ball wide at (0,1), then re-bowled
    // (0,1) must NOT open a third innings (prev rebowl=1).
    ball("01_AAvsBB", 0, 1, "abow1", "bbat1", "wide"),
    ball("01_AAvsBB", 0, 1, "abow1", "bbat1", "no run"),
    ball("01_AAvsBB", 0, 2, "abow1", "bbat1", "5 wides"),
    ball("01_AAvsBB", 0, 3, "abow1", "bbat2", "out Bbat2 Run Out! direct hit"),
    ball("01_AAvsBB", 0, 4, "abow1", "bbat3", "six"),
    ball("01_AAvsBB", 0, 5, "abow1", "bbat3", "four"),
    ball("01_AAvsBB", 1, 1, "abow2", "bbat1", "1 run"),
    // 02 innings 1 (Alpha bats: toss won by Gamma ("Gama" misspelled), "bowl first")
    ball("02_AAvsCC", 0, 1, "gbow1", "bat1", "four"),
    ball("02_AAvsCC", 0, 2, "gbow1", "bat1", "no ball", "six"),
    ball("02_AAvsCC", 0, 2, "gbow1", "bat1", "2 runs"),
    ball("02_AAvsCC", 0, 3, "gbow1", "bat2", "byes", "1 run"),
    // 02 innings 2 (Gamma bats)
    ball("02_AAvsCC", 0, 1, "bow1", "gbat1", "six"),
    ball("02_AAvsCC", 0, 2, "bow1", "gbat1", "six"),
    ball("02_AAvsCC", 0, 3, "bow1", "gbat1", "2 runs"),
  )

  private lazy val metaRows = Seq(
    Row("1st Match", "01_AAvsBB", "Alpha", "Beta", "Apr 01", "19:30", "V1", "Alpha", "bat first"),
    Row("2nd Match", "02_AAvsCC", "Alpha", "Gamma", "Apr 02", "19:30", "V2", "Gama", "bowl first"),
  )

  private lazy val raw = spark.createDataFrame(
    spark.sparkContext.parallelize(rawRows, 1), Schemas.rawBall)
  private lazy val meta = spark.createDataFrame(
    spark.sparkContext.parallelize(metaRows, 1), Schemas.matchMeta)

  private lazy val bronze = Pipeline.toBronze(raw)
  private lazy val silver = Pipeline.toSilver(spark, bronze, meta)
  private lazy val gold = Pipeline.toGold(silver)

  test("bronze: innings segmentation with rebowl suppression") {
    val m1 = bronze.where($"match" === "01_AAvsBB").orderBy("seq")
      .select("innings", "score", "fallen_wickets").as[(Int, Int, Int)].collect()
    assert(m1.map(_._1).toSeq === Seq(1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 2, 2, 2))
    assert(m1.map(_._2).toSeq === Seq(4, 6, 6, 6, 12, 13, 15, 1, 1, 6, 6, 12, 16, 17))
    assert(m1.map(_._3).toSeq === Seq(0, 0, 0, 1, 1, 1, 1, 0, 0, 0, 1, 1, 1, 1))
  }

  test("bronze: run-out parse and total_runs invariant") {
    val ro = bronze.where($"wicket_method" === "Run Out").collect()
    assert(ro.length === 1)
    assert(ro.head.getAs[String]("out_batsman") === "bbat2")
    assert(bronze.where($"total_runs" =!= $"runs" + $"extra_runs").count() === 0)
  }

  test("silver: teams from toss (incl. fuzzy 'Gama' -> Gamma) and flags") {
    val m2i1 = silver.where($"match" === "02_AAvsCC" && $"innings" === 1)
    assert(m2i1.select("batting_team").distinct().as[String].collect().toSeq === Seq("Alpha"))
    assert(m2i1.select("bowling_team").distinct().as[String].collect().toSeq === Seq("Gamma"))
    val legal = silver.groupBy("match", "innings")
      .agg(sum("is_legal_delivery").as("lb")).orderBy("match", "innings")
      .select("lb").as[Long].collect().toSeq
    assert(legal === Seq(6, 5, 3, 3))
    assert(silver.where($"innings_phase" =!= "Powerplay").count() === 0)
  }

  test("gold: batsman leaderboard row (bat1)") {
    val r = gold("gold_batsman_stats").where($"batsman" === "bat1").collect().head
    assert(r.getAs[Long]("matches") === 2)
    assert(r.getAs[Long]("total_runs") === 19)
    assert(r.getAs[Long]("legal_balls") === 5)
    assert(r.getAs[Long]("fours") === 2)
    assert(r.getAs[Long]("sixes") === 1)
    assert(r.getAs[Long]("dot_balls") === 1)
    assert(r.getAs[Long]("highest_score") === 12)
    assert(r.getAs[Long]("times_out") === 0)
    assert(r.getAs[Double]("strike_rate") === 380.0)
    assert(r.getAs[Double]("batting_avg") === 19.0)  // ÷0→÷1 guard
    assert(r.getAs[Double]("dot_ball_pct") === 20.0)
  }

  test("gold: bowler leaderboard row (abow1)") {
    val r = gold("gold_bowler_stats").where($"bowler" === "abow1").collect().head
    assert(r.getAs[Long]("total_runs_conceded") === 16)
    assert(r.getAs[Long]("legal_balls") === 4)
    assert(r.getAs[Long]("wickets") === 1)
    assert(r.getAs[Long]("dot_balls") === 2)
    assert(r.getAs[Long]("fours_conceded") === 2)
    assert(r.getAs[Long]("sixes_conceded") === 1)
    assert(r.getAs[Double]("overs_bowled") === 0.4)
    assert(r.getAs[Double]("economy_rate") === 24.0)
    assert(r.getAs[Double]("bowling_avg") === 16.0)
    assert(r.getAs[Double]("strike_rate") === 4.0)
    assert(r.getAs[Double]("dot_ball_pct") === 50.0)
  }

  test("gold: team stats row (Alpha)") {
    val r = gold("gold_team_stats").where($"team" === "Alpha").collect().head
    assert(r.getAs[Long]("matches") === 2)
    assert(r.getAs[Long]("total_runs") === 29)
    assert(r.getAs[Long]("total_wickets_lost") === 1)
    assert(r.getAs[Long]("legal_balls") === 9)
    assert(r.getAs[Long]("fours") === 2)
    assert(r.getAs[Long]("sixes") === 2)
    assert(r.getAs[Double]("overs_batted") === 1.3)
    assert(r.getAs[Double]("overall_run_rate") === 19.33)
    assert(r.getAs[Double]("pp_run_rate") === 19.33)
  }

  test("gold: tournament standings (win / loss / tie, NRR, rank)") {
    val rows = gold("gold_tournament_standings").collect()
      .map(r => r.getAs[String]("team") -> r).toMap
    val beta = rows("Beta")
    assert(beta.getAs[Int]("rank") === 1)
    assert((beta.getAs[Long]("played"), beta.getAs[Long]("won"),
      beta.getAs[Long]("points")) === (1L, 1L, 2L))
    assert(beta.getAs[Double]("avg_run_rate") === 20.4)
    assert(beta.getAs[Double]("net_run_rate") === 5.4)
    val gamma = rows("Gamma")
    assert(gamma.getAs[Int]("rank") === 2)
    assert((gamma.getAs[Long]("tied_nr"), gamma.getAs[Long]("points")) === (1L, 1L))
    assert(gamma.getAs[Double]("net_run_rate") === 0.0)
    val alpha = rows("Alpha")
    assert(alpha.getAs[Int]("rank") === 3)
    assert((alpha.getAs[Long]("played"), alpha.getAs[Long]("won"),
      alpha.getAs[Long]("lost"), alpha.getAs[Long]("tied_nr"),
      alpha.getAs[Long]("points")) === (2L, 0L, 1L, 1L, 1L))
    assert(alpha.getAs[Double]("avg_run_rate") === 19.33)
    assert(alpha.getAs[Double]("net_run_rate") === -3.92)
    assert(alpha.getAs[Long]("runs_for") === 29)
    assert(alpha.getAs[Double]("overs_for") === 1.3)
    assert(alpha.getAs[Long]("runs_against") === 31)
    assert(alpha.getAs[Double]("overs_against") === 1.2)
  }

  test("silver: pipeline is idempotent (re-running dedup converges)") {
    val twice = Pipeline.toSilver(spark, bronze.unionByName(bronze), meta)
    assert(twice.count() === silver.count())
  }
}
