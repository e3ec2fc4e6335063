package graft

import org.apache.spark.sql.SparkSession
import graft.io.Tables

/** Operational batch entry point — the one-command replacement for the
  * reference's script chain (raw extractor → bronze Lambda → silver Glue
  * job → gold Glue job):
  *
  * {{{
  *   runMain graft.RunPipeline <rawCsvDirOrFile> <metaJson> <outDir> [playersNdjson]
  * }}}
  *
  * Writes `outDir/silver` (partitioned by match, innings) and the four
  * `outDir/gold_*` tables. Incremental/event-driven operation is
  * [[graft.streaming.Incremental.run]] over the same transforms.
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: RunPipeline <rawCsvDirOrFile> <metaJson> <outDir> [playersNdjson]")
    val Array(rawPath, metaPath, outDir) = args.take(3)
    // SPARK_GRAFT_CPUS means the same here as in Verify/Bench: local
    // cores AND shuffle partitions (SPARK_MASTER overrides the master
    // for cluster submission)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    try {
      val raw = Tables.readRawBallCsv(spark, rawPath)
      val meta = Tables.readMetaJson(spark, metaPath)
      val players = args.lift(3).map(p => Tables.readPlayers(spark, p))
      val silver = Pipeline.toSilver(spark, Pipeline.toBronze(raw), meta, players)
      Tables.writeSilver(silver, s"$outDir/silver")
      // read back with the pinned schema: partition-column inference
      // would retype numeric-looking match ids (merging '01' with '1')
      // and an empty write has no footers to infer from
      val stored = spark.read.schema(silver.schema).parquet(s"$outDir/silver")
      Pipeline.toGold(stored).foreach {
        case (name, df) => Tables.writeGold(df, s"$outDir/$name")
      }
      println(s"[graft] pipeline complete -> $outDir")
    } finally spark.stop()
  }
}
