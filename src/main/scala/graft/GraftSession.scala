package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session factory: the configuration this engine is
  * designed to run under, local or cluster.
  *
  *  - AQE on (runtime re-plan: skew-join split, partition coalescing,
  *    dynamic broadcast)
  *  - shuffle partitions sized to the parallelism at hand, not the
  *    legacy 200 default
  *  - UTC session timezone (oracle parity + sane date semantics)
  *  - the engine's native SQL functions registered via GraftExtensions
  */
object GraftSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)

  /** Local session with `cpus` worker threads. */
  def local(cpus: Int): SparkSession = {
    val s = builder(s"local[$cpus]", cpus).getOrCreate()
    // when an earlier builder already created the JVM session,
    // withExtensions is skipped — register directly so vec_dot & co.
    // are always available
    GraftExtensions.register(s)
    s
  }
}
