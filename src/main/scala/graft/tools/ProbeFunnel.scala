package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Serve-only A/B for the persisted-index ANN ladder (r14): the
  * registry queries rebuild their index per run (that IS the operator
  * — the build dominates and the paths read statistically equal,
  * BenchOne medians 23.6 s int8 vs 24.7 s funnel at sf100). The
  * funnel's reason to exist is the SERVE regime — a standing index
  * queried repeatedly — so this probe builds the int8 index ONCE and
  * times only the serves, with task-metric bytes-read per run: the
  * coarse tier's claim is that scanning (vec_id, list_id, sig) over
  * the probed lists reads ~32× fewer bytes than the float vectors and
  * ~4× fewer than q8, which matters exactly when the postings scan is
  * the bound (100 TB, cold storage) rather than this box's page cache.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_DRIVER_MEM=80g \
  *     tools/run.sh graft.tools.ProbeFunnel
  */
object ProbeFunnel {
  def main(args: Array[String]): Unit = {
    Scratch.sweepStale()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "256"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val inBytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) inBytes.addAndGet(m.inputMetrics.bytesRead)
      }
    })
    def time(label: String)(df: => DataFrame): Unit = {
      inBytes.set(0)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // deterministic drain: a fixed sleep can miss late TaskEnd
      // events on a loaded box (r14 advice) and skew the MiB compare
      org.apache.spark.graftprobe.ListenerDrain.drain(spark.sparkContext)
      println(f"[probefunnel] $label: $sec%.2f s " +
        f"read=${inBytes.get / (1 << 20)}MiB")
    }

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val ix = spark.conf.get("spark.sql.warehouse.dir")
      .stripSuffix("/") + "/graft_probe_funnel_ix"
    val t0 = System.nanoTime()
    Similarity.buildIvfIndexInt8(emb, ix)
    println(f"[probefunnel] index build (once): ${(System.nanoTime()-t0)/1e9}%.2f s")

    (1 to 3).foreach { i =>
      time(s"serve int8   run $i")(
        Similarity.ivfTopKFromIndexInt8(spark, ix, emb, 5, 5,
          nProbe = 4, rerankK = 32))
      time(s"serve funnel run $i")(
        Similarity.ivfTopKFromIndexFunnel(spark, ix, emb, 5, 5,
          nProbe = 4, coarseK = 64, rerankK = 32))
    }
    spark.stop()
  }
}
