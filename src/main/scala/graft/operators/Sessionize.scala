package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Gap-based sessionization over an event stream: a new session starts
  * when the gap to the previous event of the same key exceeds
  * `gapSeconds`.
  *
  * Classic two-window formulation (lag → boundary flag → running sum =
  * session id): one shuffle on the key, everything else is sorted
  * window work within partitions. Gap arithmetic is integer
  * microseconds (`unix_micros`), not float seconds, so session
  * boundaries are exact and engine-independent.
  */
object Sessionize {

  /** Per-event session ids. */
  def assignSessions(events: DataFrame, key: String, ts: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts))
    val gapUs = gapSeconds * 1000000L
    events
      .withColumn("__prev_us", lag(unix_micros(col(ts)), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev_us").isNull ||
          unix_micros(col(ts)) - col("__prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("__new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev_us", "__new_session")
  }

  /** Session-level rollup: events per session, duration, value sum. */
  def sessionStats(events: DataFrame, key: String, ts: String,
      gapSeconds: Long, valueCol: String): DataFrame =
    assignSessions(events, key, ts, gapSeconds)
      .groupBy(col(key), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(unix_micros(col(ts))) - min(unix_micros(col(ts))))
          .as("duration_us"),
        round(sum(col(valueCol)), 2).as("total_value"))
      .orderBy(col(key), col("session_id"))

  /** First-order Markov transition matrix over each key's event
    * sequence: count and probability of event type B immediately
    * following type A — the behavioral-analytics view of a clickstream
    * (and the feature table a next-event model trains on).
    *
    * `tieBreak` columns make ordering total when timestamps collide, so
    * the matrix is deterministic. Scale shape: the lead() window
    * shuffles once on the user key (sequences are per-user by
    * definition); the transition agg and its normalization then run
    * over |types|² rows, not the event stream. */
  def transitionMatrix(events: DataFrame, key: String = "user_id",
      ts: String = "ts", typeCol: String = "event_type",
      tieBreak: Seq[String] = Seq("event_id")): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts) +: tieBreak.map(col): _*)
    events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("prob",
        round(col("n") / sum("n").over(Window.partitionBy("from_type")), 6))
      .orderBy("from_type", "to_type")
  }

  /** Top `k`-step navigation paths: every window of `steps` consecutive
    * event types in a user's sequence, counted corpus-wide — the
    * higher-order extension of [[transitionMatrix]] (path mining, the
    * "what do users actually do" table behind funnel design).
    *
    * Same scale shape as the matrix: ONE shuffle on the user key for
    * the lead() windows (a `steps`-wide slide adds columns, not
    * shuffles), then an aggregation over path strings whose
    * cardinality is |types|^steps at worst — vocabulary-sized, not
    * event-sized. Deterministic top-k: (n desc, path asc). */
  def topPaths(events: DataFrame, steps: Int = 3, topK: Int = 20,
      key: String = "user_id", ts: String = "ts",
      typeCol: String = "event_type",
      tieBreak: Seq[String] = Seq("event_id")): DataFrame = {
    require(steps >= 2, "a path needs at least 2 steps")
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts) +: tieBreak.map(col): _*)
    val withLeads = (1 until steps).foldLeft(events) { (df, i) =>
      df.withColumn(s"__s$i", lead(col(typeCol), i).over(w))
    }
    withLeads
      // windows truncated at the sequence tail have a null FINAL lead
      // (earlier leads are then non-null by construction) — drop them
      // rather than emit short paths
      .filter(col(s"__s${steps - 1}").isNotNull)
      .withColumn("__path", concat_ws(">",
        col(typeCol) +: (1 until steps).map(i => col(s"__s$i")): _*))
      .groupBy(col("__path").as("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(topK)
  }
}
