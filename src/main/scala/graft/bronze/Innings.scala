package graft.bronze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Innings segmentation + running score as window functions.
  *
  * The reference threads this state through a sequential row loop
  * (reference: pipeline_2026/ex_match_rb.py:127-154): a new innings starts
  * at `over==0 AND ball==1 AND prev.rebowl==0` (a wide/no-ball re-bowl
  * suppresses the boundary — the super-over edge case), and score /
  * fallen_wickets accumulate within the innings.
  *
  * Spark-first formulation: the "new innings" indicator is a lag
  * comparison, and the innings id is the running sum of indicators — the
  * classic sessionization shape. Running score is a cumulative window sum
  * within (match, innings). This is a single shuffle by `match` and scales
  * per-match; matches are independent, so a season (or 100 TB of seasons)
  * parallelizes across executors.
  *
  * Semantics note: we use the local-pipeline accumulation (first ball of
  * every innings contributes to its running score,
  * pipeline_local/to_bronze/brnz_match.py:100-126). The cloud variant
  * zeroes the first ball of innings ≥ 2 (ex_match_rb.py:147-152) — an
  * asymmetry with innings 1 that we treat as a bug, not a feature.
  */
object Innings {

  /** Requires bronze columns (match, over, ball, rebowl, total_runs,
    * wicket, seq); adds innings, score, fallen_wickets.
    */
  def addInnings(df: DataFrame): DataFrame = {
    val byMatch = Window.partitionBy("match").orderBy("seq")
    val cum = byMatch.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val boundary =
      (col("over") === 0 && col("ball") === 1 &&
        lag(col("rebowl"), 1).over(byMatch) === 0).cast("int")

    val withInnings = df
      .withColumn("innings",
        (coalesce(sum(coalesce(boundary, lit(0))).over(cum), lit(0)) + 1).cast("int"))

    val byInnings = Window.partitionBy("match", "innings").orderBy("seq")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    withInnings
      .withColumn("score", sum(col("total_runs")).over(byInnings).cast("int"))
      .withColumn("fallen_wickets", sum(col("wicket")).over(byInnings).cast("int"))
  }
}
