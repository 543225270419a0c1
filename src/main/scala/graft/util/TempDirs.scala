package graft.util

import java.nio.file.{Files, Path, Paths}

/** Process-scoped temp-dir factory with cleanup.
  *
  * Fixture queries (MERGE targets, streaming stage/checkpoint dirs,
  * table-log roots) need scratch directories; `Files.createTempDirectory`
  * alone leaks one dir per call per JVM forever — across a day of
  * verify/bench/test runs that compounded to thousands of stale
  * `/tmp/graft_*` trees, which both wastes disk and degrades every
  * later run's temp-file I/O (the blown-up driver-bench tail queries
  * were exactly the temp-dir-heavy ones). Two defenses:
  *
  *  - every dir from [[create]] lives under ONE per-JVM root that a
  *    shutdown hook removes recursively — a normal exit leaves nothing;
  *  - [[sweepStale]] (called at bench/verify startup) removes
  *    `graft_*` roots left by crashed or killed earlier JVMs, gated on
  *    BOTH age and an `owner.pid` liveness marker, so a concurrent
  *    session that has been idle or inside one long query for hours
  *    keeps its checkpoints and table logs.
  *
  * Deletion is best-effort by design: a failure to delete must never
  * fail the work that created the dir.
  */
object TempDirs {

  /** The per-JVM scratch root; created lazily, removed on JVM exit.
    * Carries an `owner.pid` marker so [[sweepStale]] in ANOTHER JVM
    * can tell a live session's root from a crashed one's — root mtime
    * alone can't (it only refreshes when a direct child is created,
    * so a session idle or inside one long query for 2h+ would look
    * stale by age). */
  lazy val root: Path = {
    val r = Files.createTempDirectory("graft_run_")
    try Files.write(r.resolve("owner.pid"),
      ProcessHandle.current().pid().toString.getBytes("UTF-8"))
    catch { case _: Throwable => () }
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      deleteRecursively(r)))
    r
  }

  /** True when `p` carries an `owner.pid` marker naming a live
    * process (checked via /proc). Pid reuse can keep a crashed root
    * alive spuriously — best-effort, errs toward NOT deleting. */
  private def ownerAlive(p: Path): Boolean =
    try {
      val marker = p.resolve("owner.pid")
      Files.exists(marker) && {
        val pid = new String(Files.readAllBytes(marker), "UTF-8").trim
        pid.nonEmpty && pid.forall(_.isDigit) &&
          Files.exists(Paths.get("/proc", pid))
      }
    } catch { case _: Throwable => false }

  /** A fresh directory under the JVM root — drop-in for
    * `Files.createTempDirectory(prefix)`, plus exit-time cleanup. */
  def create(prefix: String): Path = Files.createTempDirectory(root, prefix)

  /** Remove stale top-level `/tmp/graft_*` trees older than
    * `maxAgeMillis` (by last-modified time of the root entry), except
    * roots whose `owner.pid` marker names a live process — age alone
    * is not proof of staleness (see [[root]]). Returns how many roots
    * were removed. */
  def sweepStale(maxAgeMillis: Long = 2L * 60 * 60 * 1000): Int = {
    val tmp = Paths.get(System.getProperty("java.io.tmpdir", "/tmp"))
    val cutoff = System.currentTimeMillis() - maxAgeMillis
    var removed = 0
    try {
      val it = Files.newDirectoryStream(tmp, "graft_*")
      try {
        it.forEach { p =>
          try {
            if (Files.getLastModifiedTime(p).toMillis < cutoff &&
              p != root && !ownerAlive(p)) {
              deleteRecursively(p)
              removed += 1
            }
          } catch { case _: Throwable => () }
        }
      } finally it.close()
    } catch { case _: Throwable => () }
    removed
  }

  /** Best-effort recursive delete; never throws. */
  def deleteRecursively(p: Path): Unit =
    try {
      if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
        val it = Files.newDirectoryStream(p)
        try it.forEach(deleteRecursively) finally it.close()
      }
      Files.deleteIfExists(p)
    } catch { case _: Throwable => () }
}
