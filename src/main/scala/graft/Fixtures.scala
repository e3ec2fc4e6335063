package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.model.Schemas

/** Deterministic synthetic cricket season (no RNG state — a fixed LCG),
  * used by the flagship entry and the streaming/incremental tests.
  * Schema-identical to the reference's raw scrape output
  * (reference: pipeline_2026/ex_match_raw.py:222).
  */
object Fixtures {

  private val teams = Seq("Alpha", "Beta", "Gamma", "Delta")
  private def squad(team: String): Seq[String] =
    (1 to 6).map(i => s"${team.toLowerCase.take(3)}_p$i")

  private final class Lcg(seed0: Long) {
    private var s = seed0
    def next(n: Int): Int = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (((s >>> 33) % n).toInt + n) % n
    }
  }

  private val ballEvents = Seq(
    "no run", "no run", "no run", "1 run", "1 run", "1 run", "2 runs",
    "four", "six", "wide", "leg byes", "out Bowled", "3 runs")

  /** All (raw, meta) rows for a round-robin season between the 4 teams. */
  def seasonRows: (Seq[Row], Seq[Row]) = {
    val raw = Seq.newBuilder[Row]
    val meta = Seq.newBuilder[Row]
    var matchNo = 0
    for {
      i <- teams.indices
      j <- teams.indices if i < j
    } {
      matchNo += 1
      val (home, away) = (teams(i), teams(j))
      val id = f"$matchNo%02d_${home.take(2).toUpperCase}vs${away.take(2).toUpperCase}"
      val rng = new Lcg(matchNo * 7919L)
      val tossWinner = if (rng.next(2) == 0) home else away
      val decision = if (rng.next(2) == 0) "bat first" else "bowl first"
      meta += Row(s"Match $matchNo", id, home, away, s"Apr $matchNo", "19:30",
        s"Stadium ${matchNo % 3}", tossWinner, decision)
      val batsFirst =
        if (decision == "bat first") tossWinner
        else (if (tossWinner == home) away else home)
      for (innings <- 1 to 2) {
        val batting = if (innings == 1) batsFirst
          else (if (batsFirst == home) away else home)
        val bowling = if (batting == home) away else home
        val bats = squad(batting)
        val bowls = squad(bowling)
        for (over <- 0 until 5) {
          var ball = 1
          var legal = 0
          var attempt = 0
          while (legal < 6 && ball <= 9) {
            val ev = ballEvents(rng.next(ballEvents.length))
            // vary extras info by attempt: two consecutive wides to the
            // same batsman would otherwise emit byte-identical raw rows,
            // which the re-scrape dedup would (correctly) collapse —
            // deleting a real delivery from the generated season
            val info =
              if (ev == "wide" || ev == "leg byes")
                Seq("1 run", "no run", "2 runs")(attempt % 3)
              else ""
            attempt += 1
            raw += Row(id, s"Apr $matchNo", "19:30", s"Stadium ${matchNo % 3}",
              over.toString, ball.toString,
              bowls(over % bowls.length), bats(rng.next(bats.length)),
              ev, info, "t0")
            if (ev != "wide") { legal += 1; ball += 1 }
          }
        }
      }
    }
    (raw.result(), meta.result())
  }

  /** Raw frame carries an explicit `seq` ingest ordinal (generation
    * order) so the stateful bronze windows are deterministic under any
    * downstream repartitioning — the scale-safe ordering contract
    * (EventDecode preserves a pre-existing seq). */
  def rawSeason(spark: SparkSession): (DataFrame, DataFrame) = {
    val (rawRows, metaRows) = seasonRows
    val withSeq = rawRows.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i.toLong)
    }
    val schema = StructType(Schemas.rawBall.fields :+ StructField("seq", LongType))
    (spark.createDataFrame(
        spark.sparkContext.parallelize(withSeq, 4), schema),
      spark.createDataFrame(
        spark.sparkContext.parallelize(metaRows, 1), Schemas.matchMeta))
  }
}
