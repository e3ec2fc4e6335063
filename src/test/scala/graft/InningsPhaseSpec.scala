package graft

import org.apache.spark.sql.functions._
import graft.silver.Enrich

/** Innings-phase bucketing (F11, ex_match_bs.py:261-274) over every
  * branch, incl. the Super Over bucket no fixture reaches. */
class InningsPhaseSpec extends SparkSpec {
  import spark.implicits._

  test("phase buckets incl. Super Over and null") {
    val overs = Seq[Option[Int]](Some(0), Some(5), Some(6), Some(14),
      Some(15), Some(19), Some(20), Some(33), None).toDF("over")
    val got = overs.select(Enrich.inningsPhase(col("over")).as("p"))
      .as[String].collect().toSeq
    assert(got === Seq("Powerplay", "Powerplay", "Middle Overs", "Middle Overs",
      "Death Overs", "Death Overs", "Super Over", "Super Over", "Unknown"))
  }
}
