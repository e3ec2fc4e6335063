package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SaveMode

import graft.io.Manifest

/** Manifest-gated atomic publish (graft.io.Manifest) — the
  * harness-local analogue of Delta's commit protocol. Pins the four
  * contract points: snapshot reads resolve the last COMMIT (files on
  * disk but uncommitted are invisible — the torn-read closure),
  * overwrite flips snapshots atomically while superseded files remain
  * until vacuum, a pre-manifest table is adopted before its first
  * append lands, and an accidental second writer fails loudly on the
  * version CAS. */
class ManifestSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-manifest-$tag").toString + "/t"

  private def rows(dir: String): Set[Long] =
    Manifest.read(spark, dir).select("id").collect().map(_.getLong(0)).toSet

  private def df(ids: Range) = ids.map(_.toLong).toDF("id")

  test("append publishes atomically: a reader mid-append (files moved " +
    "in, commit not yet renamed) sees exactly the previous snapshot") {
    val dir = freshDir("midappend")
    Manifest.publishOverwrite(df(0 until 10), dir)
    Manifest.publishAppend(df(10 until 20), dir)
    assert(rows(dir) === (0L until 20L).toSet)
    // simulate the mid-append window of a THIRD append: data files
    // present top-level but no commit naming them — exactly what the
    // directory holds between stageIn's moves and the commit rename
    df(20 until 30).write.mode(SaveMode.Append).parquet(dir)
    assert(rows(dir) === (0L until 20L).toSet,
      "uncommitted files leaked into a manifest-resolved read")
    // a plain directory read (the pre-manifest contract) DOES see the
    // torn state — the delta this module exists to close
    assert(spark.read.parquet(dir).count() === 30L)
    // vacuum reclaims the orphans of the simulated crashed append
    val deleted = Manifest.vacuum(spark, dir)
    assert(deleted.nonEmpty)
    assert(rows(dir) === (0L until 20L).toSet)
    assert(spark.read.parquet(dir).count() === 20L)
  }

  test("overwrite flips the snapshot atomically; superseded files stay " +
    "readable-by-old-manifest until vacuum") {
    val dir = freshDir("overwrite")
    val v1 = Manifest.publishOverwrite(df(0 until 5), dir)
    val v2 = Manifest.publishOverwrite(df(100 until 103), dir)
    assert(v2 === v1 + 1)
    assert(rows(dir) === Set(100L, 101L, 102L))
    // both generations' files coexist on disk (no delete inside a
    // publish — readers of the superseded snapshot are not broken)
    assert(spark.read.parquet(dir).count() === 8L)
    Manifest.vacuum(spark, dir)
    assert(spark.read.parquet(dir).count() === 3L)
    assert(rows(dir) === Set(100L, 101L, 102L))
  }

  test("pre-manifest table is adopted BEFORE its first append moves " +
    "files in (the first append is already torn-proof)") {
    val dir = freshDir("adopt")
    df(0 until 7).write.parquet(dir) // plain, no manifest
    assert(rows(dir) === (0L until 7L).toSet) // fallback read
    val v = Manifest.publishAppend(df(7 until 9), dir)
    // version 1 = the adopted base alone, version 2 = base + append:
    // a reader that resolved between the two commits saw exactly the
    // pre-append table
    assert(v === 2L)
    assert(rows(dir) === (0L until 9L).toSet)
    val mdir = Paths.get(dir, "_manifests")
    assert(Files.exists(mdir.resolve("manifest-000000001")))
    assert(Files.exists(mdir.resolve("manifest-000000002")))
  }

  test("a writer that lost the version race fails loudly on the CAS; " +
    "the winner's commit is not corrupted") {
    val dir = freshDir("cas")
    Manifest.publishOverwrite(df(0 until 4), dir)
    // the RACING writer commits version 2 first...
    val winner = Manifest.publishAppend(df(4 until 6), dir)
    assert(winner === 2L)
    // ...and the loser, whose `latest` read predates that rename,
    // targets the same version
    val e = intercept[IllegalStateException] {
      Manifest.commitAt(spark, dir, 2L, Seq("phantom.parquet"))
    }
    assert(e.getMessage.contains("concurrent commit"))
    // the winner's snapshot resolves untouched
    assert(Manifest.latest(spark, dir).get._1 === 2L)
    assert(rows(dir) === (0L until 6L).toSet)
  }

  test("partition upsert replaces exactly the incoming partitions in one " +
    "commit; a mid-upsert reader sees the whole old table") {
    val dir = freshDir("upsert")
    val t0 = Seq((1L, "p1"), (2L, "p1"), (3L, "p2"), (4L, "p2"))
      .toDF("id", "part")
    // adopt a PLAIN partitioned table (pre-manifest) on first upsert
    t0.write.partitionBy("part").parquet(dir)
    val v = Manifest.publishPartitionUpsert(
      Seq((30L, "p2"), (50L, "p3")).toDF("id", "part"), dir, Seq("part"))
    assert(v === 2L) // v1 = adoption, v2 = the upsert
    def snap(): Map[String, Set[Long]] =
      Manifest.read(spark, dir).collect()
        .groupBy(_.getString(1)).view
        .mapValues(_.map(_.getLong(0)).toSet).toMap
    // p1 untouched, p2 replaced (3,4 -> 30), p3 new
    assert(snap() === Map("p1" -> Set(1L, 2L), "p2" -> Set(30L),
      "p3" -> Set(50L)))
    // mid-upsert simulation: files of a THIRD upsert land on disk
    // (plain append into the partition dir) with no commit — the
    // manifested reader still sees the committed snapshot
    Seq((99L, "p1")).toDF("id", "part")
      .write.mode(SaveMode.Append).partitionBy("part").parquet(dir)
    assert(snap() === Map("p1" -> Set(1L, 2L), "p2" -> Set(30L),
      "p3" -> Set(50L)))
    // vacuum reclaims both the replaced p2 files and the orphan
    Manifest.vacuum(spark, dir)
    assert(spark.read.parquet(dir).count() === 4L)
    assert(snap() === Map("p1" -> Set(1L, 2L), "p2" -> Set(30L),
      "p3" -> Set(50L)))
  }

  test("readTable resolves manifests; writeGoldAtomic publishes through " +
    "one") {
    val dir = freshDir("gold")
    graft.io.Tables.writeGoldAtomic(df(0 until 6), dir)
    assert(graft.io.Tables.readTable(spark, dir)
      .count() === 6L)
    // an uncommitted straggler file is invisible through readTable
    df(6 until 9).write.mode(SaveMode.Append).parquet(dir)
    assert(graft.io.Tables.readTable(spark, dir).count() === 6L)
  }
}
