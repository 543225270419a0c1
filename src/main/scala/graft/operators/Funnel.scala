package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * Scale shape: one filtered aggregate per step, each a map-side
  * partial `min` shuffled on the user key only — no window over the
  * whole event stream, no per-user event-list materialization. Each
  * step's (user → first-conversion ts) frame is MATERIALIZED once
  * (eager persist, same recipe as [[Dedup.minHashCandidates]]'s
  * signature table) and the next step builds on the cached frame, so
  * at 100 TB with N funnel steps the event stream is scanned exactly N
  * times — each scan pre-filtered to one event type (the selective
  * predicate reaches the parquet scan) — never the N(N+1)/2 a naive
  * re-derivation would pay. The per-step frames stay
  * join-broadcastable for deep funnels over niche steps.
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
    * (step, event_type, users) — step is 1-based: a union of one
    * single-row count per materialized [[stepFrames]] frame, so the
    * final plan holds N cached-frame counts and zero event scans. */
  def funnel(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    stepFrames(events, steps, userCol, tsCol, typeCol)
      .zipWithIndex.map { case (f, i) =>
        f.agg(count(lit(1)).as("users"))
          .select(lit(i + 1).as("step"), lit(steps(i)).as("event_type"),
            col("users"))
      }.reduce(_ unionByName _).orderBy("step")
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
}
