package graft.tools

import java.io.File

/** Stale Spark scratch sweeper for the bench/probe entry points.
  *
  * A crashed heavy run leaves its `blockmgr-*` / `spark-*` local dirs
  * on /tmp forever (the r11-late box note: ~35 GB of dead blockmgr
  * files starved the NEXT run's page cache and skewed its numbers).
  * This sweeps scratch dirs that are BOTH older than the current JVM's
  * start and untouched for `minIdleMinutes`. Mtime alone is NOT proof
  * of death — reads don't update mtime, so a long-lived concurrent
  * Spark JVM re-reading DISK_ONLY blocks it wrote >30 min ago would
  * still look "idle". The sweep therefore also requires that NO other
  * live java process exists on the box (checked via /proc/<pid>/comm):
  * if one does, the sweep skips entirely rather than guess which dirs
  * are its. Guarded by SPARK_GRAFT_NO_SWEEP=1. Best-effort: an
  * undeletable file must not abort a bench.
  */
object Scratch {

  /** True iff a java process other than this JVM is alive (Linux
    * /proc scan; conservatively true on any read error). */
  private def otherJavaAlive(): Boolean = {
    val self = ProcessHandle.current().pid()
    val proc = new File("/proc")
    if (!proc.isDirectory) return true // unknown platform: never sweep
    Option(proc.listFiles()).getOrElse(Array.empty).exists { d =>
      d.getName.forall(_.isDigit) && d.getName.toLong != self && {
        try {
          val comm = new String(java.nio.file.Files.readAllBytes(
            d.toPath.resolve("comm"))).trim
          comm == "java"
        } catch { case _: Exception => false } // raced exit: not alive
      }
    }
  }

  def sweepStale(minIdleMinutes: Long = 30): Unit = {
    if (sys.env.get("SPARK_GRAFT_NO_SWEEP").contains("1")) return
    if (otherJavaAlive()) {
      System.err.println(
        "[scratch] another java process is live — sweep skipped")
      return
    }
    val jvmStart = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getStartTime
    val cutoff = math.min(jvmStart,
      System.currentTimeMillis() - minIdleMinutes * 60000L)
    val tmp = new File(sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    val stale = Option(tmp.listFiles()).getOrElse(Array.empty).filter { d =>
      d.isDirectory &&
        (d.getName.startsWith("blockmgr-") || d.getName.startsWith("spark-")) &&
        newestMtime(d) < cutoff
    }
    if (stale.nonEmpty) {
      val freed = stale.map { d =>
        val bytes = treeSize(d)
        deleteTree(d)
        bytes
      }.sum
      System.err.println(
        f"[scratch] swept ${stale.length} stale spark dirs, ${freed / 1e9}%.1f GB")
    }
  }

  /** Newest mtime in the tree (bounded walk): a live run's dir counts
    * recent even if the root dir entry itself is old. */
  private def newestMtime(f: File): Long = {
    var newest = f.lastModified()
    val kids = f.listFiles()
    if (kids != null) kids.foreach { k =>
      val m = if (k.isDirectory) newestMtime(k) else k.lastModified()
      if (m > newest) newest = m
    }
    newest
  }

  private def treeSize(f: File): Long =
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).map(treeSize).sum
    else f.length()

  private def deleteTree(f: File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteTree)
    if (!f.delete())
      System.err.println(s"[scratch] could not delete $f")
  }
}
