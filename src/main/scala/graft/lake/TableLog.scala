package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal versioned table log — the transactional core of a table
  * format (what Delta/Iceberg provide), built from first principles
  * because no table-format jar ships in this environment.
  *
  * Layout under the table root:
  * {{{
  *   _graft_log/v00000001.manifest   # line 1: action; then one data-dir per line
  *   data/c00000001-<uuid>/          # immutable parquet directory per commit
  * }}}
  *
  * The manifest IS the snapshot: a reader resolves a version to its
  * directory list once, then reads only those directories — so readers
  * NEVER see a half-written commit (data lands fully before the
  * manifest appears), concurrent readers of version v are untouched by
  * later commits, and time travel is "read an older manifest".
  * Commit = write data dirs → write manifest to a temp name → atomic
  * `rename` into the log. Rename-if-absent is the optimistic
  * concurrency check: on HDFS/local rename is atomic; on S3-class
  * stores swap in a conditional-put (documented contract, same as
  * delta-on-S3 needing a lock client).
  *
  * This solves the non-atomicity the overwrite-based writers accept:
  * dynamic partition overwrite commits partition-by-partition, but a
  * log commit is all-or-nothing at the manifest rename.
  *
  * History is immutable: rollback APPENDS a version that points at the
  * old snapshot's directories (never deletes), and `vacuum` is the only
  * destructive operation (drops data dirs unreferenced by the retained
  * manifests).
  */
object TableLog {

  final case class Commit(version: Int, action: String, dirs: Seq[String],
      stats: Seq[TableStats.FileStats] = Seq.empty)

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(path: String) = new Path(path, "_graft_log")
  private def manifestPath(path: String, v: Int) =
    new Path(logDir(path), f"v$v%08d.manifest")

  /** All commits, oldest first. */
  def history(spark: SparkSession, path: String): Seq[Commit] = {
    val f = fs(spark, path)
    if (!f.exists(logDir(path))) return Seq.empty
    f.listStatus(logDir(path)).toSeq
      .map(_.getPath.getName)
      .filter(_.matches("v\\d{8}\\.manifest"))
      .sorted
      .map { name =>
        val v = name.stripPrefix("v").stripSuffix(".manifest").toInt
        val in = f.open(manifestPath(path, v))
        val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().toList finally in.close()
        // '#'-prefixed lines are file-level column stats (TableStats);
        // manifests written before stats existed simply have none
        Commit(v, lines.head,
          lines.tail.filter(l => l.nonEmpty && !l.startsWith("#")),
          TableStats.fromLines(lines.tail))
      }
  }

  def latestVersion(spark: SparkSession, path: String): Option[Int] =
    history(spark, path).lastOption.map(_.version)

  private def resolve(spark: SparkSession, path: String,
      version: Option[Int]): Commit = {
    val commits = history(spark, path)
    require(commits.nonEmpty, s"no commits at $path")
    version match {
      case Some(v) => commits.find(_.version == v)
        .getOrElse(throw new IllegalArgumentException(
          s"version $v not found (have ${commits.map(_.version).mkString(",")})"))
      case None => commits.last
    }
  }

  /** Snapshot read. `version = None` reads the latest commit.
    *
    * `mergeSchema` because a snapshot's directories may span a schema
    * change: `commitAppend` after an evolved-schema merge carries the
    * pre-evolution directories forward verbatim (that's the point — no
    * rewrite), so the snapshot's schema is the UNION of its files'
    * schemas, with absent columns null-backfilled — the
    * `sync_all_columns` read contract (reference
    * `dbt/dbt_project.yml:15`). Without it Spark takes one file's
    * footer as the schema and silently drops the evolved columns. */
  def read(spark: SparkSession, path: String,
      version: Option[Int] = None): DataFrame = {
    val commit = resolve(spark, path, version)
    require(commit.dirs.nonEmpty, s"version ${commit.version} is an empty snapshot")
    spark.read.option("mergeSchema", "true")
      .parquet(commit.dirs.map(d => s"$path/$d"): _*)
  }

  /** Metadata-only row count from manifest stats — `SELECT count(*)`
    * without opening a single data file. `None` when the snapshot
    * predates stats collection (then count the ordinary way). */
  def countRows(spark: SparkSession, path: String,
      version: Option[Int] = None): Option[Long] = {
    val commit = resolve(spark, path, version)
    if (commit.stats.isEmpty) None else Some(commit.stats.map(_.rows).sum)
  }

  /** Data-skipping scan: `read(...).filter(col BETWEEN lo AND hi)`, but
    * files whose manifest [min, max] bounds exclude the interval are
    * never OPENED — at 100 TB with range-clustered layout (ingestion
    * time, [[commitOptimize]] Z-order) this is the difference between
    * scanning a day and scanning the table. The residual filter is
    * still applied, so results are exact regardless of stats quality;
    * snapshots without stats degrade to an ordinary filtered scan. */
  def readWhere(spark: SparkSession, path: String, colName: String,
      lo: Any, hi: Any, version: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val commit = resolve(spark, path, version)
    require(commit.dirs.nonEmpty, s"version ${commit.version} is an empty snapshot")
    val residual = col(colName).between(lit(lo), lit(hi))
    if (commit.stats.isEmpty)
      return read(spark, path, version).where(residual)
    val kept = commit.stats
      .filter(TableStats.mightMatch(_, colName, lo, hi))
      .map(f => s"$path/${f.file}")
    if (kept.isEmpty) read(spark, path, version).where(lit(false))
    else {
      // same union-schema contract as read(): the kept files may span a
      // schema evolution, and a column present only in PRUNED files must
      // still appear (null-backfilled) or readWhere != read().filter()
      val snapshot = read(spark, path, version).schema
      val pruned = spark.read.option("mergeSchema", "true").parquet(kept: _*)
      val present = pruned.columns.toSet
      val aligned = pruned.select(snapshot.fields.map { fld =>
        if (present(fld.name)) col(fld.name)
        else lit(null).cast(fld.dataType).as(fld.name)
      }.toIndexedSeq: _*)
      aligned.where(residual)
    }
  }

  /** Set-valued data skipping: `read(...).filter(col IN values)`, but a
    * file is OPENED only when its [min, max] bounds admit at least one
    * of the values — the scan shape for inverted-file probes (a search
    * touching nprobe of k cells over cell-clustered layout reads
    * ~nprobe/k of the files). Same union-schema alignment and residual
    * exactness as [[readWhere]]. */
  def readWhereIn(spark: SparkSession, path: String, colName: String,
      values: Seq[Any], version: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    require(values.nonEmpty, "readWhereIn needs at least one value")
    val commit = resolve(spark, path, version)
    require(commit.dirs.nonEmpty, s"version ${commit.version} is an empty snapshot")
    val residual = col(colName).isin(values: _*)
    if (commit.stats.isEmpty)
      return read(spark, path, version).where(residual)
    val kept = commit.stats
      .filter(f => values.exists(v => TableStats.mightMatch(f, colName, v, v)))
      .map(f => s"$path/${f.file}")
    if (kept.isEmpty) read(spark, path, version).where(lit(false))
    else {
      val snapshot = read(spark, path, version).schema
      val pruned = spark.read.option("mergeSchema", "true").parquet(kept: _*)
      val present = pruned.columns.toSet
      val aligned = pruned.select(snapshot.fields.map { fld =>
        if (present(fld.name)) col(fld.name)
        else lit(null).cast(fld.dataType).as(fld.name)
      }.toIndexedSeq: _*)
      aligned.where(residual)
    }
  }

  /** (files kept, files total) that [[readWhereIn]] would open. */
  def pruneReportIn(spark: SparkSession, path: String, colName: String,
      values: Seq[Any], version: Option[Int] = None): (Int, Int) = {
    val commit = resolve(spark, path, version)
    (commit.stats.count(f =>
      values.exists(v => TableStats.mightMatch(f, colName, v, v))),
      commit.stats.size)
  }

  /** (files kept, files total) that [[readWhere]] would open — the
    * observability hook the pruning spec asserts on. */
  def pruneReport(spark: SparkSession, path: String, colName: String,
      lo: Any, hi: Any, version: Option[Int] = None): (Int, Int) = {
    val commit = resolve(spark, path, version)
    val total = commit.stats.size
    (commit.stats.count(TableStats.mightMatch(_, colName, lo, hi)), total)
  }

  private def writeData(spark: SparkSession, path: String, df: DataFrame,
      v: Int): (String, Seq[TableStats.FileStats]) = {
    val rel = f"data/c$v%08d-${java.util.UUID.randomUUID().toString.take(8)}"
    // table data is written as INT64-micros timestamps, never INT96:
    // INT96 (Spark's legacy session default) carries NO footer
    // statistics, which would blind both parquet row-group skipping and
    // TableStats file pruning on every timestamp column. Scoped here —
    // not session-wide — so ordinary result dumps keep the session's
    // format; restored in finally because the SQL conf is session-shared.
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try df.write.parquet(s"$path/$rel")
    finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None    => spark.conf.unset(key)
    }
    // footer-only stats collection: zero data pages read (see TableStats)
    val stats = TableStats.collectDir(
      spark.sparkContext.hadoopConfiguration, s"$path/$rel", rel)
    (rel, stats)
  }

  /** Append a manifest for `dirs`; an atomic create-if-absent publish
    * enforces one winner per version (losers retry on the next version
    * number via [[commit]]).
    *
    * Publish is scheme-aware because POSIX `rename` OVERWRITES an
    * existing destination — an exists-then-rename check is a TOCTOU
    * race that silently drops a concurrent writer's commit (caught by
    * the concurrent-appenders spec). On `file:` the atomic primitive
    * is a hard link (fails with FileAlreadyExistsException if the
    * destination exists); on HDFS-like stores rename itself refuses an
    * existing destination atomically at the NameNode. S3-class stores
    * need a conditional put / lock client — same contract as
    * delta-on-S3, documented in the class scaladoc. */
  private def writeManifest(spark: SparkSession, path: String, v: Int,
      action: String, dirs: Seq[String],
      stats: Seq[TableStats.FileStats] = Seq.empty): Boolean = {
    val f = fs(spark, path)
    f.mkdirs(logDir(path))
    val tmp = new Path(logDir(path),
      s".tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = f.create(tmp, false)
    try out.write(((action +: dirs) ++ TableStats.toLines(stats))
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val dest = manifestPath(path, v)
    val won =
      if (f.getScheme == "file") {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(dest.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } else {
        !f.exists(dest) && f.rename(tmp, dest)
      }
    if (f.getScheme == "file" || !won) f.delete(tmp, false)
    won
  }

  /** Commit retry budget: each loss re-reads the log and retries on the
    * next version, so the budget bounds tolerated writer contention,
    * not correctness. */
  private val MaxCommitAttempts = 20

  /** Optimistic-concurrency commit loop. Each attempt RE-DERIVES the
    * snapshot via `mkDf` against the then-latest version — a merge that
    * loses the race must be recomputed on top of the winner's snapshot,
    * or the winner's rows silently vanish (lost update). A losing
    * attempt's data directory is deleted before retrying, so race
    * losers leak nothing. */
  private def commit(spark: SparkSession, path: String, action: String,
      carryPrevious: Boolean)(mkDf: () => DataFrame): Commit = {
    var attempts = 0
    while (attempts < MaxCommitAttempts) {
      val prev = history(spark, path)
      val v = prev.lastOption.map(_.version + 1).getOrElse(1)
      val (dir, dirStats) = writeData(spark, path, mkDf(), v)
      val carried = if (carryPrevious) prev.lastOption else None
      val dirs = Seq(dir) ++ carried.map(_.dirs).getOrElse(Seq.empty)
      // append carries the previous snapshot's stats forward verbatim —
      // file paths are table-root-relative and files are immutable
      val stats = dirStats ++ carried.map(_.stats).getOrElse(Seq.empty)
      if (writeManifest(spark, path, v, action, dirs, stats))
        return Commit(v, action, dirs, stats)
      fs(spark, path).delete(new Path(path, dir), true)
      attempts += 1
    }
    throw new IllegalStateException(
      s"lost the commit race $MaxCommitAttempts times at $path — writer contention")
  }

  /** Add `df`'s rows to the table (new snapshot = previous dirs + one
    * new dir; no data rewrite at all). `action` labels the manifest —
    * idempotent writers (streaming foreachBatch) tag it with their
    * batch id and skip the commit when history already carries it. */
  def commitAppend(spark: SparkSession, path: String, df: DataFrame,
      action: String = "append"): Commit =
    commit(spark, path, action, carryPrevious = true)(() => df)

  private def commitReplace(spark: SparkSession, path: String, df: DataFrame,
      action: String): Commit =
    commit(spark, path, action, carryPrevious = false)(() => df)

  /** Replace the table contents with `df`. Old versions remain
    * readable until vacuumed. */
  def commitOverwrite(spark: SparkSession, path: String, df: DataFrame): Commit =
    commitReplace(spark, path, df, "overwrite")

  /** MERGE upsert as a log commit: read the latest snapshot, apply
    * [[MergeWriter.upsertSyncSchema]], write the result as the new
    * snapshot — all-or-nothing at the manifest rename (unlike dynamic
    * partition overwrite, which commits partition-by-partition). The
    * merge recomputes inside the commit loop, so losing a race means
    * merging onto the winner's snapshot, never over it. */
  def commitMerge(spark: SparkSession, path: String, updates: DataFrame,
      keys: Seq[String]): Commit =
    commit(spark, path, "merge", carryPrevious = false) { () =>
      if (history(spark, path).isEmpty) updates
      else MergeWriter.upsertSyncSchema(read(spark, path), updates, keys)
    }

  /** Expectation-gated MERGE: evaluate the data-quality suite on the
    * would-be snapshot BEFORE its data or manifest is written — a
    * failed contract leaves the table untouched at its prior version
    * (the table-format form of the reference's validate-before-publish
    * gate). Validation re-runs per attempt against the freshly merged
    * snapshot. */
  def commitMergeValidated(spark: SparkSession, path: String,
      updates: DataFrame, keys: Seq[String],
      suite: graft.quality.Expectations.Suite): Commit =
    commit(spark, path, "merge", carryPrevious = false) { () =>
      val merged =
        if (history(spark, path).isEmpty) updates
        else MergeWriter.upsertSyncSchema(read(spark, path), updates, keys)
      graft.quality.Expectations.validateOrThrow(merged, suite)
      merged
    }

  /** OPTIMIZE as a log commit: rewrite the latest snapshot into
    * `numFiles` Z-ordered files ([[ZOrder.cluster]]) and commit the
    * result atomically. Readers of the pre-optimize version are
    * untouched; the optimize is pure layout (same rows), which the
    * spec asserts. This is the table-format pairing of
    * [[Compaction]]: compaction targets file COUNT under overwrite
    * semantics, optimize targets file count + clustering under
    * snapshot semantics. */
  def commitOptimize(spark: SparkSession, path: String,
      zorderCols: (String, String), numFiles: Int): Commit = {
    val clustered = ZOrder.cluster(
      read(spark, path), zorderCols._1, zorderCols._2, numFiles)
    commitReplace(spark, path, clustered, "optimize")
  }

  /** DELETE as a log commit with data skipping: rows where
    * `colName BETWEEN lo AND hi` are removed, but a data directory whose
    * manifest file stats prove NO row can match is carried into the new
    * snapshot verbatim — zero read, zero rewrite. At 100 TB with
    * range-clustered layout (per-day ingestion commits,
    * [[commitOptimize]]) a targeted delete (GDPR erasure, bad-batch
    * retraction) rewrites one directory, not the table. Directories
    * without stats (pre-stats commits) are conservatively rewritten.
    *
    * Rows where `colName` is NULL never match a range predicate and are
    * always kept. Like every commit, a lost race recomputes against the
    * winner's snapshot. Old versions stay readable until vacuumed. */
  def commitDelete(spark: SparkSession, path: String, colName: String,
      lo: Any, hi: Any): Commit = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, not}
    var attempts = 0
    while (attempts < MaxCommitAttempts) {
      val last = resolve(spark, path, None)
      val v = last.version + 1
      val statsByDir = last.stats.groupBy(f =>
        last.dirs.find(d => f.file.startsWith(d + "/")).getOrElse(""))
      val (touched, carried) = last.dirs.partition { d =>
        val fileStats = statsByDir.getOrElse(d, Seq.empty)
        fileStats.isEmpty ||
          fileStats.exists(TableStats.mightMatch(_, colName, lo, hi))
      }
      if (touched.isEmpty)
        return last // stats prove nothing matches: delete is a no-op
      val carriedStats = last.stats.filter(f =>
        carried.exists(d => f.file.startsWith(d + "/")))
      // mergeSchema: touched dirs can span a schema evolution (appends
      // carry pre-evolution dirs forward), and inferring one file's
      // footer schema here would silently DROP evolved columns from the
      // rewritten rows — permanent loss in the post-delete snapshot
      val remaining = spark.read.option("mergeSchema", "true")
        .parquet(touched.map(d => s"$path/$d"): _*)
        .where(not(coalesce(col(colName).between(lit(lo), lit(hi)), lit(false))))
      val (dir, dirStats) = writeData(spark, path, remaining, v)
      val dirs = Seq(dir) ++ carried
      if (writeManifest(spark, path, v, "delete", dirs,
          dirStats ++ carriedStats))
        return Commit(v, "delete", dirs, dirStats ++ carriedStats)
      fs(spark, path).delete(new Path(path, dir), true)
      attempts += 1
    }
    throw new IllegalStateException(
      s"lost the delete race $MaxCommitAttempts times at $path — writer contention")
  }

  /** Append a version that restores snapshot `v` (history stays
    * intact; nothing is deleted). */
  def rollback(spark: SparkSession, path: String, v: Int): Commit = {
    val target = history(spark, path).find(_.version == v)
      .getOrElse(throw new IllegalArgumentException(s"version $v not found"))
    var attempts = 0
    while (attempts < MaxCommitAttempts) {
      val next = latestVersion(spark, path).get + 1
      if (writeManifest(spark, path, next, "rollback", target.dirs,
          target.stats))
        return Commit(next, "rollback", target.dirs, target.stats)
      attempts += 1
    }
    throw new IllegalStateException(
      s"lost the rollback race $MaxCommitAttempts times")
  }

  /** Destructive retention: keep the newest `retain` manifests, delete
    * older manifests and any data dir no retained manifest references.
    * Returns the deleted data dirs. */
  def vacuum(spark: SparkSession, path: String, retain: Int = 1): Seq[String] = {
    require(retain >= 1, "must retain at least the latest version")
    val f = fs(spark, path)
    val commits = history(spark, path)
    val (drop, keep) = commits.splitAt(math.max(0, commits.size - retain))
    val referenced = keep.flatMap(_.dirs).toSet
    val doomed = drop.flatMap(_.dirs).distinct.filterNot(referenced.contains)
    doomed.foreach(d => f.delete(new Path(path, d), true))
    drop.foreach(c => f.delete(manifestPath(path, c.version), false))
    doomed
  }
}
