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

  /** Session-quality report by ENTRY event type: session counts,
    * bounce rate (single-event sessions), mean depth, exact median
    * duration, and the share of sessions exiting on their entry type
    * — the landing-page health table every web-analytics engine
    * ships, over the same gap sessions as [[sessionStats]]. Entry and
    * exit are made deterministic under timestamp ties by the
    * `tieBreak` column (ranking windows, not stacked unbounded aggs).
    *
    * One key-shuffle for sessionization, session-cardinality rollup,
    * entry-type-cardinality report. */
  def sessionSummary(events: DataFrame, key: String = "user_id",
      ts: String = "ts", gapSeconds: Long = 1800,
      typeCol: String = "event_type",
      tieBreak: String = "event_id"): DataFrame = {
    val s = assignSessions(events, key, ts, gapSeconds)
    val us = unix_micros(col(ts))
    val wF = Window.partitionBy(col(key), col("session_id"))
      .orderBy(us.asc, col(tieBreak).asc)
    val wL = Window.partitionBy(col(key), col("session_id"))
      .orderBy(us.desc, col(tieBreak).desc)
    val perSession = s
      .withColumn("__rf", row_number().over(wF))
      .withColumn("__rl", row_number().over(wL))
      .groupBy(col(key), col("session_id"))
      .agg(
        count(lit(1)).as("__n"),
        ((max(us) - min(us)).cast("double") / 1e6).as("__dur"),
        max(when(col("__rf") === 1, col(typeCol))).as("__entry"),
        max(when(col("__rl") === 1, col(typeCol))).as("__exit"))
    perSession
      .groupBy(col("__entry").as("entry_type"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(when(col("__n") === 1L, 1L).otherwise(0L)).as("bounces"),
        round(avg(col("__n").cast("double")), 4).as("avg_events"),
        round(expr("percentile(__dur, 0.5)"), 6).as("p50_duration_s"),
        sum(when(col("__exit") === col("__entry"), 1L).otherwise(0L))
          .as("__same"))
      .select(col("entry_type"), col("n_sessions"), col("bounces"),
        round(col("bounces").cast("double") / col("n_sessions"), 6)
          .as("bounce_rate"),
        col("avg_events"), col("p50_duration_s"),
        round(col("__same").cast("double") / col("n_sessions"), 6)
          .as("exit_same_share"))
      .orderBy("entry_type")
  }

  /** DuckDB oracle for [[sessionSummary]] on events (gap 1800 s). */
  val sessionSummaryOracleSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    epoch_ns(ts) // 1000 AS us FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN LAG(us) OVER w IS NULL
      |      OR us - LAG(us) OVER w > 1800000000 THEN 1 ELSE 0 END
      |    AS new_session
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
      |sess AS (
      |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id
      |    ORDER BY us ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS session_id
      |  FROM flagged),
      |rk AS (
      |  SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, session_id
      |      ORDER BY us ASC, event_id ASC) AS rf,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, session_id
      |      ORDER BY us DESC, event_id DESC) AS rl
      |  FROM sess),
      |per AS (
      |  SELECT user_id, session_id, COUNT(*) AS n,
      |    (MAX(us) - MIN(us)) / 1e6 AS dur,
      |    MAX(CASE WHEN rf = 1 THEN event_type END) AS entry,
      |    MAX(CASE WHEN rl = 1 THEN event_type END) AS ex
      |  FROM rk GROUP BY 1, 2)
      |SELECT entry AS entry_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_sessions,
      |  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS bounces,
      |  ROUND(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS bounce_rate,
      |  ROUND(AVG(CAST(n AS DOUBLE)), 4) AS avg_events,
      |  ROUND(quantile_cont(dur, 0.5), 6) AS p50_duration_s,
      |  ROUND(SUM(CASE WHEN ex = entry THEN 1 ELSE 0 END)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS exit_same_share
      |FROM per GROUP BY 1 ORDER BY 1""".stripMargin

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

  /** Markov entropy rate of the navigation chain — how PREDICTABLE
    * the event stream is, in bits per step: H = −Σ_s π(s) Σ_t p(t|s)
    * log₂ p(t|s) with π estimated from the from-state transition
    * shares (Cover & Thomas ch. 4; Song et al., Science 2010 use
    * exactly this family to bound human-behavior predictability). A
    * rate near 0 means a deterministic loop (scripted traffic); near
    * log₂|types| means navigation is indistinguishable from uniform
    * noise — the chain-level complement to [[graft.operators.EventTime
    * .burstiness]]'s timing screen.
    *
    * Dataflow: everything reduces over [[transitionMatrix]]'s
    * (from, to) count table — type²-cardinality whatever the corpus.
    * Per-state rows carry the conditional entropy; the rate is in
    * every row. */
  def entropyRate(events: DataFrame): DataFrame = {
    val tm = transitionMatrix(events)
      .select(col("from_type"), col("to_type"), col("n"))
    val wFrom = Window.partitionBy("from_type")
    val perState = tm
      .withColumn("__ns", sum("n").over(wFrom))
      .withColumn("__p", col("n") / col("__ns"))
      .groupBy("from_type")
      .agg(first("__ns").as("n_from"),
        (-sum(col("__p") * log2(col("__p")))).as("__h"))
    val total = perState.agg(sum("n_from").as("__tot"))
    perState
      .crossJoin(broadcast(total))   // 1-row stat factor
      .withColumn("pi", round(col("n_from") / col("__tot"), 6))
      .withColumn("h_cond_bits", round(col("__h"), 6))
      .withColumn("entropy_rate_bits",
        round(sum(col("n_from") * col("__h")).over(
          Window.partitionBy(lit(1))) / col("__tot"), 6))
      .select("from_type", "n_from", "pi", "h_cond_bits",
        "entropy_rate_bits")
      .orderBy("from_type")
  }

  /** DuckDB oracle for [[entropyRate]]. */
  val entropyOracleSql: String =
    """WITH seq AS (
      |  SELECT event_type AS ft, LEAD(event_type) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS tt
      |  FROM events),
      |tm AS (
      |  SELECT ft, tt, COUNT(*) AS n FROM seq
      |  WHERE tt IS NOT NULL GROUP BY 1, 2),
      |tp AS (
      |  SELECT ft, n,
      |    CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY ft) AS p
      |  FROM tm),
      |ps AS (
      |  SELECT ft, SUM(n) AS n_from, -SUM(p * log2(p)) AS h
      |  FROM tp GROUP BY ft),
      |tot AS (SELECT SUM(n_from) AS t FROM ps),
      |rate AS (
      |  SELECT SUM(n_from * h) / (SELECT t FROM tot) AS er FROM ps)
      |SELECT ft AS from_type,
      |  CAST(n_from AS BIGINT) AS n_from,
      |  ROUND(CAST(n_from AS DOUBLE) / (SELECT t FROM tot), 6) AS pi,
      |  ROUND(h, 6) AS h_cond_bits,
      |  ROUND((SELECT er FROM rate), 6) AS entropy_rate_bits
      |FROM ps ORDER BY ft""".stripMargin

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
