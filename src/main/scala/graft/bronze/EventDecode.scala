package graft.bronze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Raw ball CSV → typed bronze delivery columns, as pure column
  * expressions (no UDF, fully codegen'd).
  *
  * Semantics derive from the reference's text-event decoder
  * (reference: pipeline_2026/ex_match_rb.py:44-125):
  *   - `run_map`: no run→0, 1 run→1, 2 runs→2, 3 runs→3, four→4,
  *     5 runs→5, six→6 (ex_match_rb.py:46-54)
  *   - `extras_map`: wide/no ball/no-ball → extra_runs=1 & rebowl=1;
  *     byes/leg byes/leg-byes → extra_runs=0 & rebowl=0
  *     (ex_match_rb.py:55-62). For extras, batter runs come from the
  *     first `;`-token of event_info when it is a run phrase (:83-85).
  *   - `5 wides` special case: runs=4, extra_runs=1, extra=1,
  *     extra_type='wide', rebowl=1 (ex_match_rb.py:87-92)
  *   - `out ...` events: wicket=1; "Run Out" gives method='Run Out' and
  *     the out batsman parsed from the event text, otherwise the method
  *     is the second token and the striker is out (ex_match_rb.py:94-101).
  *     Documented deviation: the reference compares the literal
  *     'Run Out!' against an already-lowercased string, so its run-out
  *     branch is unreachable; we match case-insensitively, implementing
  *     the evident intent.
  *   - invariant total_runs = runs + extra_runs (ex_match_rb.py:119)
  *
  * Everything derived from the event text is lowercase, mirroring the
  * reference's up-front `.lower()` (ex_match_rb.py:73-74).
  */
object EventDecode {

  private val runMap: Map[String, Int] = Map(
    "no run" -> 0, "1 run" -> 1, "2 runs" -> 2, "3 runs" -> 3,
    "four" -> 4, "5 runs" -> 5, "six" -> 6)

  /** extra_runs (== rebowl flag) per extras vocabulary. */
  private val extrasMap: Map[String, Int] = Map(
    "wide" -> 1, "no ball" -> 1, "no-ball" -> 1,
    "byes" -> 0, "leg byes" -> 0, "leg-byes" -> 0)

  private def decodeRuns(c: org.apache.spark.sql.Column) =
    runMap.foldLeft(lit(0)) { case (acc, (k, v)) => when(c === k, v).otherwise(acc) }

  /** df: raw ball schema (Schemas.rawBall). Output adds the typed delivery
    * columns and `seq` (explicit ingest order — the reference depends on
    * physical file order; see SURVEY §2.5 note).
    *
    * If the input already carries a `seq` column it is preserved — the
    * scale-safe path: pin the ordinal at TRUE ingest time, before any
    * shuffle, and downstream repartitioning can never reorder the
    * stateful windows. The `monotonically_increasing_id` fallback encodes
    * the partitioning at decode time and is only deterministic when
    * decode runs directly on the unshuffled source read.
    */
  def decode(df: DataFrame): DataFrame = {
    val dfSeq =
      if (df.columns.contains("seq")) df
      else df.withColumn("seq", monotonically_increasing_id())
    val ev  = lower(col("ball_event"))
    val info = lower(col("event_info"))

    val isExtra  = ev.isin(extrasMap.keys.toSeq: _*)
    val isFiveWides = ev === "5 wides"
    val isOut    = ev.startsWith("out")
    val isRunOut = ev.contains("run out!")

    // extras: batter runs may be encoded in the first `;`-token of event_info
    val extraEvent = split(info, ";").getItem(0)
    val extrasRebowl = extrasMap.foldLeft(lit(0)) {
      case (acc, (k, v)) => when(ev === k, v).otherwise(acc)
    }

    val runs =
      when(isExtra, decodeRuns(extraEvent))
        .when(isFiveWides, 4)
        .otherwise(decodeRuns(ev))

    val extraRuns = when(isExtra, extrasRebowl).when(isFiveWides, 1).otherwise(0)
    val extra     = when(isExtra || isFiveWides, 1).otherwise(0)
    val extraType = when(isExtra, ev).when(isFiveWides, "wide").otherwise("N/A")
    val rebowl    = when(isExtra, extrasRebowl).when(isFiveWides, 1).otherwise(0)

    val wicket = when(isOut, 1).otherwise(0)
    // `get` (not getItem): a bare "out" event has no method token — the
    // reference IndexErrors there (ex_match_rb.py:97); under ANSI mode
    // getItem would likewise throw. Null-safe lookup + "Unknown".
    val wicketMethod =
      when(isOut && isRunOut, "Run Out")
        .when(isOut, coalesce(get(split(ev, " "), lit(1)), lit("Unknown")))
        .otherwise("Not Out")
    val outBatsman =
      when(isOut && isRunOut, regexp_extract(ev, "^out (.*?) run out!", 1))
        .when(isOut, col("batsman"))
        .otherwise("N/A")

    dfSeq.select(
      col("match"), col("date"), col("time"),
      col("over").cast("int").as("over"),
      col("ball").cast("int").as("ball"),
      col("bowler"), col("batsman"),
      runs.as("runs"),
      extraRuns.as("extra_runs"),
      extra.as("extra"),
      extraType.as("extra_type"),
      rebowl.as("rebowl"),
      wicket.as("wicket"),
      wicketMethod.as("wicket_method"),
      outBatsman.as("out_batsman"),
      (runs + extraRuns).as("total_runs"),
      col("seq"),
    )
  }
}
