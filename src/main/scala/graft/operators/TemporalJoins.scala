package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively — built by composing
  * existing operators (SURVEY preference (a)) into shapes that hold at
  * scale:
  *
  *  - [[asofBackward]]: union + carry-forward window — ONE shuffle on
  *    the join key, state is a single struct per row; never builds the
  *    (left × right-history) product a naive theta join would.
  *  - [[withinRange]]: time-bucketed self-join — each right row
  *    replicates to its 3 neighboring gap-buckets, the join is a pure
  *    equi-join on (key, bucket), and every qualifying pair matches
  *    exactly once (the left row's own bucket is unique), so no
  *    dedup pass is needed.
  */
object TemporalJoins {

  /** Backward (most-recent) as-of join: for each left row, attach the
    * latest right row whose `rightTime` ≤ the left row's `leftTime`
    * (inclusive), per `key`. `payload` maps right columns to output
    * names; left rows with no prior right row get nulls.
    */
  def asofBackward(left: DataFrame, right: DataFrame, key: Seq[String],
                   leftTime: String, rightTime: String,
                   payload: Map[String, String]): DataFrame = {
    val rpay = struct(payload.toSeq.map { case (c, n) => col(c).as(n) }: _*)
    val r = right.select(key.map(col) :+ col(rightTime).as("_t") :+
      rpay.as("_rpay"): _*).withColumn("_side", lit(0))
    val l = left.withColumn("_t", col(leftTime)).withColumn("_side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows at equal time ⇒ inclusive (≤);
    // ties among right rows at the same time resolve deterministically
    // to the greatest payload struct (field-order comparison) — without
    // the payload in the sort key, `last` would pick a partition-order-
    // dependent row.
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("_t"), col("_side"), col("_rpay"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val outCols: Seq[Column] =
      left.columns.toSeq.map(col) ++
        payload.values.toSeq.map(n => col(s"_carried.$n").as(n))
    u.withColumn("_carried", last(col("_rpay"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(outCols: _*)
  }

  /** All same-key pairs (a, b) with `a.<idCol> < b.<idCol>` and
    * |a.time − b.time| ≤ gap. Bucketing: left pins bucket
    * floor(t / gap); right replicates to {b−1, b, b+1}; a qualifying
    * pair's time delta ≤ gap means their buckets differ by at most 1,
    * so the equi-join on (key, bucket) finds it — exactly once, in the
    * left row's unique bucket. */
  def withinRange(events: DataFrame, key: Seq[String], timeCol: String,
                  idCol: String, gap: Long): DataFrame = {
    val a = events.select(key.map(col) :+ col(idCol).as("id_a") :+
        col(timeCol).as("t_a"): _*)
      .withColumn("bucket", floor(col("t_a") / gap))
    val b = events.select(key.map(col) :+ col(idCol).as("id_b") :+
        col(timeCol).as("t_b"): _*)
      .withColumn("bucket", explode(array(
        floor(col("t_b") / gap) - 1, floor(col("t_b") / gap),
        floor(col("t_b") / gap) + 1)))
    a.join(b, key :+ "bucket")
      .where(col("id_a") < col("id_b") &&
        abs(col("t_a") - col("t_b")) <= gap)
      .select(key.map(col) :+ col("id_a") :+ col("id_b") :+
        (col("t_b") - col("t_a")).as("delta"): _*)
  }
}
