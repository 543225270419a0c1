package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Ordered multi-step funnel analysis: how many users performed step 1,
  * then step 2 STRICTLY AFTER their first step-1 event, then step 3
  * strictly after that, … — the conversion query every product-
  * analytics engine ships, here in terms the events table of SURVEY
  * §2.8 already has (user, timestamp, event type).
  *
  * Semantics: a user converts step i+1 at the EARLIEST step-i+1 event
  * that follows their step-i conversion time. Using the earliest
  * qualifying event per step is the standard greedy funnel — it
  * maximizes the number of downstream conversions (any later choice of
  * step-i time only shrinks the step-i+1 candidate window).
  *
  * Scale shape, two tiers:
  *  - [[funnel]] (counts only): ONE user-partitioned pass — chained
  *    same-spec window mins, a single hash exchange of the event
  *    stream, no caches;
  *  - [[stepFrames]]/[[conversions]]/[[stepLatency]] (drill-down):
  *    one filtered aggregate per step, each step's (user →
  *    first-conversion ts) frame MATERIALIZED once (eager persist,
  *    same recipe as [[Dedup.minHashCandidates]]'s signature table) so
  *    the next step builds on the cached frame — at 100 TB with N
  *    funnel steps the event stream is scanned exactly N times, each
  *    scan pre-filtered to one event type (the selective predicate
  *    reaches the parquet scan), never the N(N+1)/2 a naive
  *    re-derivation would pay. The per-step frames stay
  *    join-broadcastable for deep funnels over niche steps.
  */
object Funnel {

  /** The per-step (user, first-conversion ts) frames for `steps` in
    * order, each persisted EAGERLY so frame i+1 joins the cached frame
    * i instead of re-deriving the whole prefix: events is scanned once
    * per step, N scans total for an N-step funnel. The caches live
    * until the caller drops them (`spark.catalog.clearCache()` between
    * unrelated jobs, as Bench does) — the returned plans reference
    * them lazily, the same contract as
    * [[Dedup.minHashCandidates]]'s `spillTo = None` mode. */
  def stepFrames(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // fold: frame of (user, first conversion ts) per completed prefix
    steps.scanLeft(Option.empty[DataFrame]) {
      case (prev, step) =>
        val matching = events
          .filter(col(typeCol) === step)
          .select(col(userCol), col(tsCol))
        val qualified = prev match {
          case None => matching
          case Some(p) =>
            matching.join(p.withColumnRenamed("__t", "__prev_t"), userCol)
              .filter(col(tsCol) > col("__prev_t"))
              .select(col(userCol), col(tsCol))
        }
        val frame = qualified.groupBy(userCol).agg(min(tsCol).as("__t"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // eager: a lazy persist would let step i+1's job race the cold
        // cache and recompute the whole prefix itself
        frame.count()
        Some(frame)
    }.flatten
  }

  /** Per-step conversion counts for `steps` in order. Returns
    * (step, event_type, users), step 1-based.
    *
    * ONE user-partitioned pass: step i+1's first-conversion time is a
    * min-over-user window gated strictly after step i's — the chained
    * windows share one partition spec, so the whole funnel costs a
    * single shuffle of events plus a same-keyed per-user collapse
    * (exchange reused), instead of the N filter-join-agg chains (plus
    * N eager persists) [[stepFrames]] materializes for the drill-down
    * tier. Same-spec chained windows are the SAFE shape per the
    * round-9 Spark window finding (the corruption needs two DIFFERENT
    * partition specs stacked). At 100 TB this is one hash exchange of
    * (user, ts, type), nothing driver-side, no caches to manage. */
  def funnel(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col(userCol))
    var df = events.select(col(userCol), col(tsCol), col(typeCol))
    steps.zipWithIndex.foreach { case (s, i) =>
      // null t_i propagates: ts > null is null, the when() yields
      // null, min() ignores it — a user who never reached step i
      // cannot reach step i+1
      val gate =
        if (i == 0) col(typeCol) === s
        else col(typeCol) === s && col(tsCol) > col(s"__t$i")
      df = df.withColumn(s"__t${i + 1}",
        min(when(gate, col(tsCol))).over(w))
    }
    val perUser = df.groupBy(col(userCol)).agg(
      steps.indices.map(i => max(col(s"__t${i + 1}")).as(s"__t${i + 1}")).head,
      steps.indices.drop(1)
        .map(i => max(col(s"__t${i + 1}")).as(s"__t${i + 1}")): _*)
    val counts = perUser.agg(
      steps.indices.map(i => count(col(s"__t${i + 1}")).as(s"__c${i + 1}")).head,
      steps.indices.drop(1)
        .map(i => count(col(s"__t${i + 1}")).as(s"__c${i + 1}")): _*)
    counts.select(explode(array(steps.indices.map { i =>
        struct(lit(i + 1).as("step"), lit(steps(i)).as("event_type"),
          col(s"__c${i + 1}").as("users"))
      }: _*)).as("__r"))
      .select(col("__r.step"), col("__r.event_type"), col("__r.users"))
      .orderBy("step")
  }

  /** The per-user conversion table for the FULL funnel: users who
    * completed every step, with each step's conversion timestamp —
    * the drill-down behind [[funnel]]'s counts. Columns:
    * userCol, t_1 … t_N (one per step, in order). */
  def conversions(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    steps.zipWithIndex.foldLeft(Option.empty[DataFrame]) {
      case (prev, (step, i)) =>
        val matching = events
          .filter(col(typeCol) === step)
          .select(col(userCol), col(tsCol))
        val qualified = prev match {
          case None => matching
          case Some(p) =>
            matching.join(p, userCol)
              .filter(col(tsCol) > col(s"t_$i"))   // strictly after step i
              .select(col(userCol) +: (1 to i).map(j => col(s"t_$j")) :+ col(tsCol): _*)
        }
        val keys = col(userCol) +: (1 to i).map(j => col(s"t_$j"))
        Some(qualified
          .groupBy(keys: _*)
          .agg(min(tsCol).as(s"t_${i + 1}")))
    }.get
  }

  /** Time-to-convert between adjacent funnel steps: count plus
    * mean/median/p90 of (first step-i+1 conversion − first step-i
    * conversion) in seconds, over the users who reached step i+1 —
    * the latency table behind [[funnel]]'s counts ("conversion is
    * fine, it just takes three days"). Differences use integer
    * microseconds like [[graft.operators.Sessionize]], so both
    * engines agree exactly; exact percentiles are the oracle pin.
    *
    * Reuses the persisted [[stepFrames]] — user-cardinality joins of
    * cached frames, zero extra event scans. */
  def stepLatency(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.size >= 2, "latency needs at least two steps")
    val frames = stepFrames(events, steps, userCol, tsCol, typeCol)
    frames.sliding(2).toSeq.zipWithIndex.map { case (pair, i) =>
      val dt = ((unix_micros(col("__tb")) - unix_micros(col("__ta")))
        .cast("double") / 1e6).as("__dt")
      pair(0).select(col(userCol), col("__t").as("__ta"))
        .join(pair(1).select(col(userCol), col("__t").as("__tb")),
          userCol)
        .select(dt)
        .agg(
          count(lit(1)).as("n_users"),
          round(avg("__dt"), 6).as("mean_s"),
          round(expr("percentile(__dt, 0.5)"), 6).as("p50_s"),
          round(expr("percentile(__dt, 0.9)"), 6).as("p90_s"))
        .select(lit(i + 1).as("step_from"),
          lit(steps(i)).as("from_type"),
          lit(steps(i + 1)).as("to_type"),
          col("n_users"), col("mean_s"), col("p50_s"), col("p90_s"))
    }.reduce(_ unionByName _).orderBy("step_from")
  }

  /** DuckDB oracle for the registered view→click→purchase latency. */
  val stepLatencyOracleSql: String =
    """WITH s1 AS (
      |  SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (
      |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
      |  JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > s1.t1
      |  GROUP BY e.user_id),
      |s3 AS (
      |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
      |  JOIN s2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      |  GROUP BY e.user_id),
      |d12 AS (
      |  SELECT (epoch_ns(t2) // 1000 - epoch_ns(t1) // 1000) / 1e6
      |    AS dt
      |  FROM s2 JOIN s1 USING (user_id)),
      |d23 AS (
      |  SELECT (epoch_ns(t3) // 1000 - epoch_ns(t2) // 1000) / 1e6
      |    AS dt
      |  FROM s3 JOIN s2 USING (user_id))
      |SELECT CAST(1 AS INTEGER) AS step_from, 'view' AS from_type,
      |  'click' AS to_type, CAST(COUNT(*) AS BIGINT) AS n_users,
      |  ROUND(AVG(dt), 6) AS mean_s,
      |  ROUND(quantile_cont(dt, 0.5), 6) AS p50_s,
      |  ROUND(quantile_cont(dt, 0.9), 6) AS p90_s
      |FROM d12
      |UNION ALL
      |SELECT CAST(2 AS INTEGER), 'click', 'purchase',
      |  CAST(COUNT(*) AS BIGINT),
      |  ROUND(AVG(dt), 6),
      |  ROUND(quantile_cont(dt, 0.5), 6),
      |  ROUND(quantile_cont(dt, 0.9), 6)
      |FROM d23
      |ORDER BY step_from""".stripMargin
}
