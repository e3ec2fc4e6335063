package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** At-scale A/B for the Z-order layout operator (operators/Layout
  * .scala): writes lineitem twice to scratch — Z-ordered on
  * (l_orderkey, l_partkey) vs range-sorted on l_orderkey alone, same
  * file count — then drives two pruning workloads over both layouts
  * in ONE JVM (the ProbeTfidf discipline):
  *
  *  - `partkey slice`: a ~1.5 % l_partkey range with l_orderkey
  *    unconstrained — the query a single-column sort CANNOT serve;
  *  - `2-D box`: the q_layout_zorder box (1/16 of the key plane) —
  *    selective on both dimensions, where even the sorted layout
  *    prunes on orderkey and z-order must still win or tie.
  *
  * Per (layout, workload): files holding matches (locality), the
  * scan's numOutputRows (row groups the pushed filter could NOT
  * prune — the realized-IO witness), and the noop-forced wall time
  * of the filtered scan, RUNS×. Both probes are scan→filter→project
  * with no exchange, so no AQE wrapper hides the scan node (the
  * adaptive fallback is handled anyway).
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=testdata-sf10 SPARK_DRIVER_MEM=80g \
  *     tools/run.sh graft.tools.ProbeZorder
  */
object ProbeZorder {

  private def scanOutputRows(df: DataFrame): Long = {
    val p = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case x => x
    }
    p.collect { case s: FileSourceScanExec => s }
      .map(_.metrics("numOutputRows").value).sum
  }

  def main(args: Array[String]): Unit = {
    Scratch.sweepStale()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "testdata-sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_ZFILES", "256").toInt
    val scratch = sys.env.getOrElse("SPARK_GRAFT_SCRATCH",
      "/tmp/graft-zorder-probe")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "256"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cols = Seq("l_orderkey", "l_partkey", "l_quantity",
      "l_extendedprice", "l_returnflag")
    val li = graft.queries.Tables.lineitem(spark, sfDir)
      .select(cols.map(col): _*)
    val zDir = s"$scratch/z"
    val lDir = s"$scratch/linear"

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probez] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    timed(s"write zorder(l_orderkey,l_partkey) nFiles=$nFiles") {
      Layout.zorderWrite(li, Seq("l_orderkey", "l_partkey"), zDir, nFiles)
    }
    timed(s"write linear(l_orderkey) nFiles=$nFiles") {
      li.repartitionByRange(nFiles, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite").parquet(lDir)
    }

    val mx = li.agg(max("l_orderkey"), max("l_partkey")).head()
    val (mo, mp) = (mx.getLong(0), mx.getLong(1))
    val total = li.count()
    println(s"[probez] rows=$total mo=$mo mp=$mp")

    val workloads: Seq[(String, Column)] = Seq(
      ("partkey_slice(~1.5%)",
        col("l_partkey").between(mp / 4, mp / 4 + mp / 64)),
      ("box_2d(1/16)",
        col("l_orderkey").between(mo / 4, mo / 2) &&
          col("l_partkey").between(mp / 4, mp / 2)))

    for ((wname, pred) <- workloads; (lname, dir) <- Seq(("zorder", zDir),
        ("linear", lDir))) {
      val t = spark.read.parquet(dir)
      val touched = Layout.filesTouched(t, pred)
      val matches = t.where(pred).count()
      println(s"[probez] $wname/$lname: filesTouched=$touched matches=$matches")
      (1 to runs).foreach { i =>
        val q = t.where(pred).select(cols.map(col): _*)
        val t0 = System.nanoTime()
        q.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[probez] $wname/$lname run $i: $dt%.2f s scanRows=${scanOutputRows(q)}")
      }
    }
    spark.stop()
  }
}
