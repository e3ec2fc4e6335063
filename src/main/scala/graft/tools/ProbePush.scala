package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic: is the shipdate range predicate pushed to the
  * parquet scan of a Z-ordered table, and which literal spelling keeps
  * it pushable? (ProbeZorder r13 finding.) */
object ProbePush {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = spark.read.parquet("/tmp/graft-zorder-probe/z")
    val sdType = t.schema("l_shipdate").dataType
    println(s"shipdate type: $sdType")
    val q = t.where(col("l_shipdate").between(
      lit("1996-01-01").cast(sdType), lit("1996-12-31").cast(sdType)))
    q.explain("formatted")
    spark.stop()
  }
}
