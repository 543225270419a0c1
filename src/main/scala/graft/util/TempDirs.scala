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
  *    `graft_*` roots left by crashed or killed earlier JVMs, age-gated
  *    so it can never touch a concurrently-running session's dirs.
  *
  * Deletion is best-effort by design: a failure to delete must never
  * fail the work that created the dir.
  */
object TempDirs {

  /** The per-JVM scratch root; created lazily, removed on JVM exit. */
  lazy val root: Path = {
    val r = Files.createTempDirectory("graft_run_")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      deleteRecursively(r)))
    r
  }

  /** A fresh directory under the JVM root — drop-in for
    * `Files.createTempDirectory(prefix)`, plus exit-time cleanup. */
  def create(prefix: String): Path = Files.createTempDirectory(root, prefix)

  /** Remove stale top-level `/tmp/graft_*` trees older than
    * `maxAgeMillis` (by last-modified time of the root entry).
    * Returns how many roots were removed. */
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
              p != root) {
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
