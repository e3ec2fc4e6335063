package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** At-scale A/B for the Z-order layout operator (operators/Layout
  * .scala): writes lineitem twice to scratch — Z-ordered on
  * (l_orderkey, l_shipdate) vs range-sorted on l_orderkey alone, same
  * file count — then drives two pruning workloads over both layouts
  * in ONE JVM (the ProbeTfidf discipline):
  *
  *  - `shipdate slice`: one year of the ~7-year range with l_orderkey
  *    unconstrained — the query a single-column orderkey sort CANNOT
  *    serve;
  *  - `2-D box`: the q_layout_zorder box (orderkey quartile × one
  *    year) — selective on both dimensions, where the sorted layout
  *    prunes on orderkey too and z-order must win or tie.
  *
  * Why shipdate and not l_partkey: GenScale replication strides EVERY
  * key by replica, so at sf10+ l_orderkey↔l_partkey correlate at
  * 0.9999 cross-replica and a single-key sort accidentally serves
  * both (measured: the first probe cut showed partkey slices touching
  * 9/256 linear files). Time is not strided — corr(l_orderkey,
  * l_shipdate) = −1e−5 at sf10 — so the 2-D independence the operator
  * exists for actually holds, at every SF.
  *
  * Per (layout, workload): files holding matches (locality), the
  * scan's numOutputRows (rows the pushed filter could NOT prune at
  * the row-group level — the realized-IO witness), and wall time.
  * Forced via queryExecution.toRdd.count() so the metrics belong to
  * the very plan that executed (a .write re-plans in its own
  * QueryExecution and leaves the probed plan's metrics at zero —
  * the first cut's bug).
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

    // time dimension stored as DATE (lossless here — all shipdates are
    // midnight): pushed TimestampNTZ predicates never row-group-skip
    // in this Spark build (first-cut finding: scanRows stayed 60M with
    // the filter PUSHED), while INT32 DATE stats skip cleanly
    val cols = Seq("l_orderkey", "l_shipdate", "l_quantity",
      "l_extendedprice", "l_returnflag")
    val li = graft.queries.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"),
        col("l_shipdate").cast("date").as("l_shipdate"),
        col("l_quantity"), col("l_extendedprice"), col("l_returnflag"))
    val zDir = s"$scratch/z"
    val lDir = s"$scratch/linear"

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probez] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    timed(s"write zorder(l_orderkey,l_shipdate) nFiles=$nFiles") {
      Layout.zorderWrite(li, Seq("l_orderkey", "l_shipdate"), zDir, nFiles)
      // plain-read probes below need the dir listing == the snapshot
      graft.io.Manifest.vacuum(spark, zDir)
    }
    timed(s"write linear(l_orderkey) nFiles=$nFiles") {
      li.repartitionByRange(nFiles, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite").parquet(lDir)
    }

    val mo = li.agg(max("l_orderkey")).head().getLong(0)
    val total = li.count()
    println(s"[probez] rows=$total mo=$mo")

    def year(y: Int): Column = col("l_shipdate").between(
      lit(s"$y-01-01").cast("date"), lit(s"$y-12-31").cast("date"))
    val workloads: Seq[(String, Column)] = Seq(
      ("shipdate_slice(1996)", year(1996)),
      ("box_2d(okeyQ2 x 1996)",
        col("l_orderkey").between(mo / 4, mo / 2) && year(1996)))

    for ((wname, pred) <- workloads; (lname, dir) <- Seq(("zorder", zDir),
        ("linear", lDir))) {
      val t = spark.read.parquet(dir)
      val touched = Layout.filesTouched(t, pred)
      val matches = t.where(pred).count()
      println(s"[probez] $wname/$lname: filesTouched=$touched matches=$matches")
      (1 to runs).foreach { i =>
        val q = t.where(pred).select(cols.map(col): _*)
        val t0 = System.nanoTime()
        val n = q.queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[probez] $wname/$lname run $i: $dt%.2f s " +
          s"scanRows=${scanOutputRows(q)} out=$n")
      }
    }
    spark.stop()
  }
}
