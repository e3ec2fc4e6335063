package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Schemas

/** Property tests over randomized raw seasons (SURVEY §5 test plan):
  * decode/segmentation/standings invariants that must hold for ANY
  * event stream, not just the golden fixture. ScalaCheck generators
  * driven from a fixed seed (the scalatest-scalacheck bridge isn't in
  * the offline cache, so sampling is explicit).
  */
class PipelinePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val events = Gen.oneOf(
    "no run", "1 run", "2 runs", "3 runs", "four", "six", "5 runs",
    "wide", "no ball", "byes", "leg byes", "5 wides",
    "out Bowled", "out Caught", "out Xx Run Out! direct",
    // garbage the scraper can produce: unknown text decodes to 0 runs
    "", "???", "rain delay", "OUT", "4")

  private val infoGen = Gen.oneOf("", "1 run", "2 runs", "no run")

  private case class RawBall(m: String, over: Int, ball: Int, ev: String, info: String)

  private val ballsGen: Gen[List[RawBall]] = for {
    nMatches <- Gen.choose(1, 3)
    balls <- Gen.listOfN(60, for {
      m <- Gen.choose(1, nMatches)
      over <- Gen.choose(0, 4)
      ball <- Gen.choose(1, 6)
      ev <- events
      info <- infoGen
    } yield RawBall(s"m$m", over, ball, ev, info))
  } yield balls

  private def toDf(balls: List[RawBall]) = {
    val rows = balls.zipWithIndex.map { case (b, i) =>
      Row(b.m, "Apr 01", "19:30", "V", b.over.toString, b.ball.toString,
        "bow", "bat", b.ev, b.info, "t0", i.toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Schemas.rawBall.fields :+ StructField("seq", LongType)))
  }

  test("bronze invariants hold for arbitrary event streams") {
    var seed = Seed(42L)
    (1 to 15).foreach { round =>
      val balls = ballsGen.apply(Gen.Parameters.default, seed)
        .getOrElse(fail(s"generator produced no sample in round $round"))
      seed = seed.next
      val bronze = Pipeline.toBronze(toDf(balls)).cache()
      try {
        assert(bronze.count() > 0, s"round $round: empty bronze")
        // total_runs = runs + extra_runs (ex_match_rb.py:119)
        assert(bronze.where(col("total_runs") =!= col("runs") + col("extra_runs"))
          .count() === 0, s"round $round: total_runs invariant")
        // innings ids positive and non-decreasing in seq order per match
        assert(bronze
          .withColumn("prev", lag("innings", 1).over(
            org.apache.spark.sql.expressions.Window.partitionBy("match").orderBy("seq")))
          .where(col("innings") < 1 ||
            (col("prev").isNotNull && col("innings") < col("prev")))
          .count() === 0, s"round $round: innings monotonicity")
        // running score at least the current ball's contribution
        assert(bronze.where(col("score") < col("total_runs")).count() === 0,
          s"round $round: running score")
        // wicket rows have a method; non-wicket rows say Not Out
        assert(bronze.where(
          (col("wicket") === 1 && col("wicket_method") === "Not Out") ||
            (col("wicket") === 0 && col("wicket_method") =!= "Not Out"))
          .count() === 0, s"round $round: wicket method")
      } finally bronze.unpersist()
    }
  }

  test("standings invariants hold for the synthetic season") {
    val (raw, meta) = Fixtures.rawSeason(spark)
    val silver = Pipeline.toSilver(spark, Pipeline.toBronze(raw), meta)
    val st = Pipeline.toGold(silver)("gold_tournament_standings").cache()
    try {
      val rows = st.collect()
      // rank is a permutation of 1..n
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq === (1 to rows.length))
      // points = 2*won + tied_nr (ex_match_sg.py:262)
      assert(st.where(col("points") =!= col("won") * 2 + col("tied_nr")).count() === 0)
      // played = won + lost + tied_nr
      assert(st.where(col("played") =!= col("won") + col("lost") + col("tied_nr")).count() === 0)
      // J4 symmetry: total runs_for == total runs_against across teams
      val sums = st.agg(sum("runs_for"), sum("runs_against")).first()
      assert(sums.getLong(0) === sums.getLong(1))
    } finally st.unpersist()
  }
}
