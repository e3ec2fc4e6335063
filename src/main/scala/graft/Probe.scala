package graft
import org.apache.spark.sql.SparkSession
import graft.plans.DotProduct

/** Scratch probe — deleted before end of round. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // via extensions-injected SQL function (no runtime register call)
    spark.sql("SELECT graft_dot(array(1.0d,2.0d,3.0d), array(4.0d,5.0d,6.0d)) AS d").show()
    // probe: wrong types
    try spark.sql("SELECT graft_dot(array('a'), array(1.0d))").show()
    catch { case e: Exception => println("TYPE-ERROR => " + e.getMessage.linesIterator.next()) }
    // probe: wrong arity
    try spark.sql("SELECT graft_dot(array(1.0d))").show()
    catch { case e: Exception => println("ARITY-ERROR => " + e.getMessage.linesIterator.next()) }
    spark.stop()
  }
}
