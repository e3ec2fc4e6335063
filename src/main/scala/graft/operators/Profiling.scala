package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the `ANALYZE TABLE`-style statistics pass a data
  * engineer runs before trusting a new 100 TB drop: per-column null
  * counts and exact distinct cardinalities plus the row count, in ONE
  * aggregation over one scan, emitted long-format (a row per column) so
  * downstream checks can join on `col_name`.
  *
  * Exact `COUNT(DISTINCT)` over several columns expands the input once
  * per distinct aggregate (Spark's Expand) — the deliberate,
  * oracle-verifiable choice here; the sketch-based one-pass variant for
  * routine production profiling is `approx_count_distinct`
  * (`q_approx_distinct`). Null counts ride the same aggregate for free;
  * `COUNT(DISTINCT)` ignores nulls on every engine, so the two numbers
  * are independent signals.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_n_$c"),
      countDistinct(col(c)).as(s"_d_$c"))) :+ count(lit(1)).as("_rows")
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
          lit(c).as("col_name"),
          col(s"_n_$c").as("n_nulls"),
          col(s"_d_$c").as("n_distinct"))): _*)).as("p"),
        col("_rows").as("n_rows"))
      .select(col("p.col_name"), col("p.n_nulls"), col("p.n_distinct"),
        col("n_rows"))
  }

  /** The oracle-side spelling: one UNION ALL branch per column. */
  def profileSql(table: String, cols: Seq[String]): String =
    cols.map(c =>
      s"""SELECT '$c' AS col_name,
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  COUNT(*) AS n_rows FROM $table""".stripMargin)
      .mkString("\n", "\nUNION ALL\n", "\nORDER BY col_name")
}
