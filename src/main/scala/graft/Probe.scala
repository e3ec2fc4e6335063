package graft
import org.apache.spark.sql.SparkSession

/** Scratch probe — deleted before end of round. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    println("FLAGSHIP rows=" + df.count())
    df.show(12, false)
    spark.stop()
  }
}
