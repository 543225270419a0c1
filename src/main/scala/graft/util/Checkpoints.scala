package graft.util

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators (PageRank, HITS,
  * k-core, label propagation, BPE rounds, dup-cluster pointer
  * jumping): every iteration MUST cut the logical plan or Catalyst
  * re-analysis of the unrolled tree dominates the run (measured 41 s
  * of driver CPU for 5 unrolled PageRank iterations on a 100-node
  * graph vs 4.5 s checkpointed).
  *
  * Two durability modes, selected by the session conf
  * `graft.checkpoint.dir`:
  *
  *  - UNSET (default): `localCheckpoint(eager = true)` — blocks are
  *    written to executor local disk/memory. Fastest, and exactly
  *    right for single-JVM and short jobs, but a lost executor loses
  *    its blocks and the job fails UNRECOVERABLY (no lineage left to
  *    recompute from).
  *  - SET to a reliable path (HDFS / object store / shared FS):
  *    `checkpoint(eager = true)` — blocks go to the named directory
  *    and survive executor loss, which is the fault-tolerance story
  *    a multi-hour 1000-executor iteration needs. The path is
  *    installed as the SparkContext checkpoint dir on first use.
  *
  * The conf is read per call, so a session can flip modes between
  * queries; the SparkContext-level dir, once set, is reused unless
  * the conf names a different path.
  *
  * Retention: Spark does NOT delete reliable checkpoint data when the
  * frame is garbage-collected unless
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` — a
  * long-running session that checkpoints every iteration otherwise
  * accumulates data under the directory without bound. Set the
  * cleaner conf alongside [[ConfKey]] (or point [[ConfKey]] at a
  * per-run directory and remove it when the run ends, which also
  * covers data orphaned by a crashed driver — the cleaner only runs
  * in a live JVM).
  */
object Checkpoints {

  /** The session conf key naming the reliable checkpoint directory. */
  val ConfKey = "graft.checkpoint.dir"

  /** Eagerly truncate `df`'s lineage — local (fast, non-fault-
    * tolerant) by default, reliable when [[ConfKey]] is set. */
  def truncate(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey).map(_.trim).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // install / switch the context dir only when needed.
        // setCheckpointDir installs <dir>/<uuid> fs-qualified, so the
        // installed dir matches iff it IS the qualified conf dir or
        // sits directly under it — a path-boundary prefix test, not a
        // substring test (".../ckpt" must not match ".../ckpt-a/uuid")
        val hp = new org.apache.hadoop.fs.Path(dir)
        val qualified = hp
          .getFileSystem(sc.hadoopConfiguration)
          .makeQualified(hp).toString
        val installed = sc.getCheckpointDir.exists(d =>
          d == qualified || d.startsWith(qualified + "/"))
        if (!installed) sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None =>
        df.localCheckpoint(eager = true)
    }
  }

  /** `df.truncateLineage()` syntax for call sites. */
  implicit class TruncateOps(private val df: DataFrame) extends AnyVal {
    def truncateLineage(): DataFrame = Checkpoints.truncate(df)
  }
}
