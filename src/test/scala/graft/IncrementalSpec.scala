package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.streaming.Incremental

/** Streaming/incremental contract (SURVEY §2.10): draining the raw
  * directory in two AvailableNow passes produces the same silver table as
  * one batch run, and re-delivered duplicate snapshots are idempotent.
  */
class IncrementalSpec extends SparkSpec {

  private def writeMatchCsvs(dir: String, matchIds: Seq[String]): Unit = {
    val (rawRows, _) = Fixtures.seasonRows
    val header = "match,date,time,venue,over,ball,bowler,batsman,ball_event,event_info,extract_time"
    matchIds.foreach { m =>
      val lines = rawRows.filter(_.getString(0) == m).map { r =>
        (0 until 11).map(i => Option(r.getString(i)).getOrElse("")).mkString(",")
      }
      Files.write(Paths.get(s"$dir/$m.csv"),
        (header +: lines).mkString("\n").getBytes("UTF-8"))
    }
  }

  private def silverSummary(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select("match", "innings", "over", "ball", "rebowl", "runs",
        "total_runs", "score", "fallen_wickets", "batting_team",
        "bowling_team", "wicket_method")
      .collect().map(_.mkString("|")).sorted.toSeq

  test("two incremental drains == one batch run; duplicate redelivery is a no-op") {
    val base = Files.createTempDirectory("graft-incr").toString
    val rawDir = s"$base/raw"; Files.createDirectories(Paths.get(rawDir))
    val bronzePath = s"$base/bronze"; val silverPath = s"$base/silver"
    val ckpt = s"$base/ckpt"

    val (_, meta) = Fixtures.rawSeason(spark)
    val allMatches = meta.select("short_name").collect().map(_.getString(0)).toSeq
    val (firstHalf, secondHalf) = allMatches.splitAt(allMatches.size / 2)

    // drain 1: first half of the season
    writeMatchCsvs(rawDir, firstHalf)
    Incremental.run(spark, rawDir, meta, bronzePath, silverPath, ckpt)
      .awaitTermination()
    val afterFirst = spark.read.parquet(silverPath)
    assert(afterFirst.select("match").distinct().count() === firstHalf.size.toLong)

    // drain 2: rest of the season + a re-delivered duplicate of match 1
    writeMatchCsvs(rawDir + "/", secondHalf)
    val dup = Paths.get(s"$rawDir/${firstHalf.head}.csv")
    Files.copy(dup, Paths.get(s"$rawDir/${firstHalf.head}_redelivery.csv"))
    Incremental.run(spark, rawDir, meta, bronzePath, silverPath, ckpt)
      .awaitTermination()

    val incremental = spark.read.parquet(silverPath)
    val (rawAll, _) = Fixtures.rawSeason(spark)
    val batch = Pipeline.toSilver(spark, Pipeline.toBronze(rawAll), meta)

    assert(silverSummary(incremental) === silverSummary(batch))

    // drain 3: nothing new → silver unchanged (idempotence)
    Incremental.run(spark, rawDir, meta, bronzePath, silverPath, ckpt)
      .awaitTermination()
    assert(silverSummary(spark.read.parquet(silverPath)) === silverSummary(batch))
  }

  test("keyed MERGE upsert: re-delivered MODIFIED row updates in place") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-merge").toString + "/t"

    // initial table: 2 partitions, 2 rows each, keyed by (part, id)
    val initial = Seq(
      ("p1", 1L, "a", 10), ("p1", 2L, "b", 20),
      ("p2", 3L, "c", 30), ("p2", 4L, "d", 40))
      .toDF("part", "id", "name", "value")
    graft.io.Tables.mergeUpsertKeyed(spark, initial, path,
      keys = Seq("part", "id"), partitionCols = Seq("part"))

    val untouchedFiles = Files.list(Paths.get(s"$path/part=p2")).toArray.toSet

    // merge batch: id=1 re-delivered MODIFIED + id=9 brand new, both p1
    val batch = Seq(("p1", 1L, "a2", 11), ("p1", 9L, "z", 90))
      .toDF("part", "id", "name", "value")
    graft.io.Tables.mergeUpsertKeyed(spark, batch, path,
      keys = Seq("part", "id"), partitionCols = Seq("part"))

    val after = spark.read.parquet(path)
      .select("part", "id", "name", "value").as[(String, Long, String, Int)]
      .collect().sortBy(_._2).toSeq
    assert(after === Seq(
      ("p1", 1L, "a2", 11), // updated in place, not duplicated
      ("p1", 2L, "b", 20),
      ("p2", 3L, "c", 30), ("p2", 4L, "d", 40),
      ("p1", 9L, "z", 90)).sortBy(_._2))

    // the untouched partition's files were not rewritten
    assert(Files.list(Paths.get(s"$path/part=p2")).toArray.toSet === untouchedFiles)

    // idempotence: re-merging the identical batch is a no-op
    graft.io.Tables.mergeUpsertKeyed(spark, batch, path,
      keys = Seq("part", "id"), partitionCols = Seq("part"))
    assert(spark.read.parquet(path).count() === 5)

    // an EMPTY batch is a no-op, not a crash
    graft.io.Tables.mergeUpsertKeyed(spark, batch.limit(0), path,
      keys = Seq("part", "id"), partitionCols = Seq("part"))
    assert(spark.read.parquet(path).count() === 5)

    // a key shape that could silently duplicate moved rows is rejected
    intercept[IllegalArgumentException] {
      graft.io.Tables.mergeUpsertKeyed(spark, batch, path,
        keys = Seq("id"), partitionCols = Seq("part"))
    }

    // duplicate SOURCE keys fail fast (Delta MERGE multi-match
    // semantics) — the union would otherwise store BOTH rows
    val dupBatch = Seq(("p1", 1L, "first", 1), ("p1", 1L, "second", 2))
      .toDF("part", "id", "name", "value")
    intercept[IllegalArgumentException] {
      graft.io.Tables.mergeUpsertKeyed(spark, dupBatch, path,
        keys = Seq("part", "id"), partitionCols = Seq("part"))
    }
    // and the failed merge left the table untouched
    assert(spark.read.parquet(path).count() === 5)
  }

  test("keyed MERGE upsert: null key/partition values update, not duplicate") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-merge-null").toString + "/t"
    val initial = Seq((Option("p1"), 1L, 10), (Option.empty[String], 2L, 20))
      .toDF("part", "id", "value")
    graft.io.Tables.mergeUpsertKeyed(spark, initial, path,
      keys = Seq("part", "id"), partitionCols = Seq("part"))
    // re-deliver the null-partition row modified
    val batch = Seq((Option.empty[String], 2L, 99)).toDF("part", "id", "value")
    graft.io.Tables.mergeUpsertKeyed(spark, batch, path,
      keys = Seq("part", "id"), partitionCols = Seq("part"))
    val after = spark.read.parquet(path).select("id", "value")
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    assert(after === Seq((1L, 10), (2L, 99)),
      s"null-keyed row must update in place, got $after")
  }

  test("merge-mode incremental drain converges to the overwrite mode") {
    // the alternative T2/T3 formulation — keyed MERGE upsert instead of
    // dynamic partition overwrite — must produce the SAME stored bronze
    // and silver tables over the same batch sequence, including a
    // re-delivered duplicate
    val base = Files.createTempDirectory("graft-incr-merge").toString
    val rawDir = s"$base/raw"; Files.createDirectories(Paths.get(rawDir))
    val (_, meta) = Fixtures.rawSeason(spark)
    val allMatches = meta.select("short_name").collect().map(_.getString(0)).toSeq
    val (firstHalf, secondHalf) = allMatches.splitAt(allMatches.size / 2)

    def drainAll(mergeMode: Boolean, tag: String): (String, String) = {
      val bronzePath = s"$base/bronze_$tag"; val silverPath = s"$base/silver_$tag"
      val ckpt = s"$base/ckpt_$tag"
      writeMatchCsvs(rawDir, firstHalf)
      Incremental.run(spark, rawDir, meta, bronzePath, silverPath, ckpt,
        mergeMode = mergeMode).awaitTermination()
      writeMatchCsvs(rawDir, secondHalf)
      Files.copy(Paths.get(s"$rawDir/${firstHalf.head}.csv"),
        Paths.get(s"$rawDir/${firstHalf.head}_redelivery.csv"))
      Incremental.run(spark, rawDir, meta, bronzePath, silverPath, ckpt,
        mergeMode = mergeMode).awaitTermination()
      Files.delete(Paths.get(s"$rawDir/${firstHalf.head}_redelivery.csv"))
      (bronzePath, silverPath)
    }

    val (bronzeA, silverA) = drainAll(mergeMode = false, "overwrite")
    val (bronzeB, silverB) = drainAll(mergeMode = true, "merge")

    def bronzeSummary(path: String): Seq[String] =
      spark.read.parquet(path)
        .select("match", "innings", "over", "ball", "rebowl", "runs",
          "total_runs", "wicket", "wicket_method")
        .collect().map(_.mkString("|")).sorted.toSeq
    assert(bronzeSummary(bronzeB) === bronzeSummary(bronzeA))
    assert(silverSummary(spark.read.parquet(silverB)) ===
      silverSummary(spark.read.parquet(silverA)))

    // and the merge mode agrees with the one-shot batch pipeline
    val (rawAll, _) = Fixtures.rawSeason(spark)
    assert(silverSummary(spark.read.parquet(silverB)) ===
      silverSummary(Pipeline.toSilver(spark, Pipeline.toBronze(rawAll), meta)))
  }

  test("bronze dedup is deterministic under input repartitioning") {
    val (raw, _) = Fixtures.rawSeason(spark)
    // duplicate every row (re-scrape overlap), shuffle partitioning
    val doubled = raw.unionByName(raw)
    def summarize(df: org.apache.spark.sql.DataFrame): Seq[String] =
      Pipeline.toBronze(df)
        .select("match", "innings", "over", "ball", "score", "fallen_wickets")
        .collect().map(_.mkString("|")).sorted.toSeq
    val a = summarize(doubled.repartition(8))
    val b = summarize(doubled.repartition(3))
    val c = summarize(raw)
    assert(a === b)
    assert(a === c)
  }
}
