package graft.io

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-gated atomic publish for multi-file parquet sinks — the
  * harness-local analogue of the reference's Delta Lake commit
  * protocol (the reference writes real Delta: pipeline_2026/
  * ex_match_bs.py:464-482, ex_match_sg.py:299-315; Delta is not on
  * this classpath).
  *
  * Problem closed: every multi-file sink here (gold overwrites,
  * partition upserts, IVF postings appends) publishes part-files
  * non-atomically — a reader listing the directory mid-write sees a
  * TORN snapshot (some new files, or new files next to rows they
  * replace). Parquet gives file-level atomicity (a half-written file
  * is invisible behind its rename), but nothing gave a multi-file
  * SNAPSHOT.
  *
  * Protocol (single writer, many readers — the contract
  * [[graft.streaming.StreamIndexAppend]] states):
  *
  *  - data files are written STAGED under `<dir>/.stage-<uuid>/`
  *    (dot-prefixed: invisible to Spark's path filter, so even plain
  *    directory readers never see an in-flight publish), then moved
  *    into `<dir>` by per-file rename — Spark part names carry a
  *    per-job UUID, so moves never clobber;
  *  - a commit is one file: `<dir>/_manifests/manifest-<version>`
  *    listing the relative data paths of the complete snapshot. It is
  *    written to a dot-tmp name and RENAMED into place — readers see
  *    a whole manifest or none, never a partial list;
  *  - readers ([[read]]) resolve the HIGHEST committed version and
  *    read exactly its files. A concurrent append flips them from
  *    snapshot N to N+1 atomically; files of superseded snapshots
  *    stay on disk (and stay readable) until [[vacuum]];
  *  - writer mutual exclusion is the single-writer CONTRACT, enforced
  *    as far as the filesystem allows: the commit rename targets a
  *    version-numbered name, so on HDFS (rename fails onto an
  *    existing path) a lost race fails loudly; on a raw local FS
  *    (POSIX rename overwrites) the pre-rename existence check makes
  *    detection best-effort. Either way a detected conflict throws —
  *    recovery is [[vacuum]] then retry, never silent.
  *
  * Scale: the manifest is metadata (one line per file — at 100 TB and
  * 1 GB files, ~10⁵ lines); commit is one rename; readers pay one
  * small-file read + the same parquet scan they always paid. No data
  * movement is added to any publish.
  *
  * A directory that has never been published through here has no
  * `_manifests`; [[read]] then falls back to the plain directory scan
  * and [[publishAppend]] ADOPTS the current committed listing as the
  * base snapshot — so existing tables upgrade on their first
  * manifested write with no rewrite.
  */
object Manifest {

  private val ManifestDir = "_manifests"
  private val NamePrefix = "manifest-"

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Latest committed (version, relative data paths), if any commit
    * exists. */
  def latest(spark: SparkSession, dir: String): Option[(Long, Seq[String])] = {
    val (fs, root) = fsOf(spark, dir)
    val mdir = new Path(root, ManifestDir)
    if (!fs.exists(mdir)) return None
    val versions = fs.listStatus(mdir).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith(NamePrefix) &&
        n.stripPrefix(NamePrefix).forall(_.isDigit))
      .map(n => n.stripPrefix(NamePrefix).toLong)
    if (versions.isEmpty) return None
    val v = versions.max
    val in = fs.open(new Path(mdir, f"$NamePrefix$v%09d"))
    val body =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    Some((v, body.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)))
  }

  /** Committed snapshot of `dir`: the latest manifest's files if one
    * exists, else the plain directory (file-level atomicity only —
    * the pre-manifest contract). `basePath` makes partition-dir
    * values (`k=v` path components of a [[publishPartitionUpsert]]
    * table) resolve into columns exactly as a plain directory read
    * would. */
  def read(spark: SparkSession, dir: String): DataFrame =
    latest(spark, dir) match {
      case Some((_, files)) if files.nonEmpty =>
        spark.read.option("basePath", dir)
          .parquet(files.map(f => s"$dir/$f"): _*)
      case Some((_, _)) => // committed-empty snapshot: zero files
        spark.emptyDataFrame
      case None => spark.read.parquet(dir)
    }

  /** Visible (non-hidden, recursively) data files of `dir`, as
    * `dir`-relative paths — the set a plain `spark.read.parquet(dir)`
    * would scan, partition subdirs included. Used to adopt a
    * pre-manifest table on its first manifested publish. */
  private def plainListing(fs: FileSystem, root: Path): Seq[String] =
    if (!fs.exists(root)) Seq.empty
    else {
      val base = fs.makeQualified(root).toUri.getPath.stripSuffix("/")
      val out = Seq.newBuilder[String]
      val it = fs.listFiles(root, true)
      while (it.hasNext) {
        val rel = it.next().getPath.toUri.getPath
          .stripPrefix(base).stripPrefix("/")
        if (rel.split("/").forall(c =>
          !c.startsWith("_") && !c.startsWith("."))) out += rel
      }
      out.result()
    }

  /** Stage `df`'s part files into `<dir>/.stage-<uuid>`, move them to
    * the top level, return their names. */
  private def stageIn(df: DataFrame, dir: String): Seq[String] = {
    val spark = df.sparkSession
    val (fs, root) = fsOf(spark, dir)
    val stage = new Path(root,
      ".stage-" + java.util.UUID.randomUUID().toString)
    df.write.parquet(stage.toString)
    val parts = fs.listStatus(stage).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .map(_.getPath)
    fs.mkdirs(root)
    val moved = parts.map { p =>
      val dst = new Path(root, p.getName)
      require(fs.rename(p, dst), s"Manifest: staging move failed: $p -> $dst")
      p.getName
    }
    fs.delete(stage, true)
    moved
  }

  /** Atomically commit `files` as snapshot version `v`. Throws on a
    * detected concurrent commit of the same version. */
  private def commit(fs: FileSystem, root: Path, v: Long,
                     files: Seq[String]): Unit = {
    val mdir = new Path(root, ManifestDir)
    fs.mkdirs(mdir)
    val target = new Path(mdir, f"$NamePrefix$v%09d")
    val tmp = new Path(mdir, ".tmp-" + java.util.UUID.randomUUID().toString)
    val out = fs.create(tmp, false)
    try out.write((files.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // HDFS: rename onto an existing path FAILS -> true CAS. Local FS:
    // POSIX rename overwrites, so the exists() probe is the (best-
    // effort) conflict detector. Single-writer is the contract; this
    // turns an accidental violation into a loud error where the
    // filesystem can see it.
    if (fs.exists(target) || !fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"Manifest: concurrent commit detected at $target — " +
          "single-writer contract violated; vacuum and retry")
    }
  }

  /** Test seam: drive [[commit]] at an explicit version, as a writer
    * that lost the version race would (its `latest` read predates the
    * winner's rename). */
  private[graft] def commitAt(spark: SparkSession, dir: String, v: Long,
                              files: Seq[String]): Unit = {
    val (fs, root) = fsOf(spark, dir)
    commit(fs, root, v, files)
  }

  /** Publish `df` as an APPEND: the new snapshot is the current
    * committed set plus `df`'s files. Returns the committed version.
    * A reader concurrent with this call sees the old snapshot until
    * the commit rename, the new one after — never a mix. On a
    * pre-manifest table the current plain listing is ADOPTED as its
    * own commit FIRST — before any new file lands — so readers are
    * manifest-resolved (and therefore torn-proof) from the first
    * appended byte onward, not just from the second append. */
  def publishAppend(df: DataFrame, dir: String): Long = {
    val spark = df.sparkSession
    val (fs, root) = fsOf(spark, dir)
    val (v0, base) = latest(spark, dir) match {
      case Some((v, files)) => (v, files)
      case None =>
        val adopted = plainListing(fs, root)
        commit(fs, root, 1L, adopted)
        (1L, adopted)
    }
    val moved = stageIn(df, dir)
    commit(fs, root, v0 + 1, base ++ moved)
    v0 + 1
  }

  /** Publish `df` as a PARTITION UPSERT (the dynamic
    * `partitionOverwriteMode` / Delta `replaceWhere` analogue,
    * atomically): the new snapshot keeps every committed file EXCEPT
    * those under the partition directories `df` carries rows for,
    * which are replaced by `df`'s files — and the swap is one
    * manifest rename, so a concurrent reader sees the whole table
    * before or the whole table after, never a half-replaced
    * partition. Superseded files remain until [[vacuum]]. Returns
    * the committed version. */
  def publishPartitionUpsert(df: DataFrame, dir: String,
                             cols: Seq[String]): Long = {
    require(cols.nonEmpty, "publishPartitionUpsert needs partition columns")
    val spark = df.sparkSession
    val (fs, root) = fsOf(spark, dir)
    val (v0, base) = latest(spark, dir) match {
      case Some((v, files)) => (v, files)
      case None =>
        val adopted = plainListing(fs, root)
        commit(fs, root, 1L, adopted)
        (1L, adopted)
    }
    val stage = new Path(root,
      ".stage-" + java.util.UUID.randomUUID().toString)
    df.write.partitionBy(cols: _*).parquet(stage.toString)
    val stageBase = fs.makeQualified(stage).toUri.getPath.stripSuffix("/")
    val moved = Seq.newBuilder[String]
    val replaced = scala.collection.mutable.Set[String]()
    val it = fs.listFiles(stage, true)
    while (it.hasNext) {
      val p = it.next().getPath
      val rel = p.toUri.getPath.stripPrefix(stageBase).stripPrefix("/")
      if (rel.split("/").forall(c =>
        !c.startsWith("_") && !c.startsWith("."))) {
        replaced += rel.split("/").init.mkString("/")
        val dst = new Path(root, rel)
        fs.mkdirs(dst.getParent)
        require(fs.rename(p, dst),
          s"Manifest: staging move failed: $p -> $dst")
        moved += rel
      }
    }
    fs.delete(stage, true)
    val kept = base.filterNot(f =>
      replaced.exists(pre => f.startsWith(pre + "/")))
    commit(fs, root, v0 + 1, kept ++ moved.result())
    v0 + 1
  }

  /** Publish `df` as a full OVERWRITE: the new snapshot is exactly
    * `df`'s files; superseded files remain until [[vacuum]]. Returns
    * the committed version. */
  def publishOverwrite(df: DataFrame, dir: String): Long = {
    val spark = df.sparkSession
    val (fs, root) = fsOf(spark, dir)
    val v0 = latest(spark, dir).map(_._1).getOrElse(0L)
    val moved = stageIn(df, dir)
    commit(fs, root, v0 + 1, moved)
    v0 + 1
  }

  /** Delete top-level data files not referenced by the latest
    * manifest, plus abandoned `.stage-*` dirs. Returns what was
    * deleted. Requires at least one commit (without a manifest there
    * is no authority on what is garbage). NOT safe concurrent with a
    * reader of a SUPERSEDED snapshot — same caveat as Delta VACUUM. */
  def vacuum(spark: SparkSession, dir: String): Seq[String] = {
    val (fs, root) = fsOf(spark, dir)
    val live = latest(spark, dir) match {
      case Some((_, files)) => files.toSet
      case None => throw new IllegalStateException(
        s"Manifest.vacuum: no manifest at $dir")
    }
    val deadFiles = plainListing(fs, root).filterNot(live.contains)
    deadFiles.foreach(f => fs.delete(new Path(root, f), false))
    val deadStages =
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(".stage-"))
        .map(_.getPath)
    deadStages.foreach(fs.delete(_, true))
    deadFiles ++ deadStages.map(_.getName)
  }
}
