package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention and RFM segmentation — the two canonical
  * user-lifecycle reports over an event stream, completing the
  * behavioral-analytics tier (funnels: [[Funnel]], transitions:
  * [[Sessionize.transitionMatrix]]).
  *
  * Both are deterministic given the data (week truncation, ntile with
  * explicit tie-breaks), hence fully oracle-checkable.
  */
object Retention {

  /** Weekly cohort retention: users grouped by the week of their FIRST
    * event; for each cohort × week-offset, how many were active and
    * what fraction of the cohort that is. The classic retention
    * triangle.
    *
    * Scale shape: one (user → first ts) agg, one distinct over
    * (user, cohort, offset) — both shuffle on the user key — then the
    * report agg runs over cohorts × offsets (weeks², tiny). The
    * cohort-size join is broadcast-sized by construction. */
  def cohortRetention(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val firsts = events.groupBy(userCol)
      .agg(date_trunc("week", min(tsCol)).cast("date").as("cohort_week"))
    val activity = events.join(firsts, userCol)
      .select(col(userCol), col("cohort_week"),
        (datediff(date_trunc("week", col(tsCol)).cast("date"),
          col("cohort_week")) / 7).cast("bigint").as("week_offset"))
      .distinct()
    val sizes = firsts.groupBy("cohort_week").agg(count(lit(1)).as("cohort_size"))
    activity
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("active_users"))
      .join(broadcast(sizes), "cohort_week")
      .withColumn("retention",
        round(col("active_users").cast("double") / col("cohort_size"), 6))
      .orderBy("cohort_week", "week_offset")
  }

  /** RFM segmentation: per-user Recency (latest event), Frequency
    * (event count), Monetary (value sum), each quartiled into 1..n
    * (n = best: most recent / most frequent / highest value), then the
    * population rolled up per (r, f, m) cell — the marketing-standard
    * customer grid. Ntile ties break on the user key, so the grid is
    * deterministic.
    *
    * Scale note: the three ntile windows are global sorts over the
    * per-USER aggregate (one row per user, not per event); for
    * user-counts beyond a single sort task, swap ntile for
    * percentile_approx thresholds exactly like
    * [[Sampling.quantileKeepApprox]]. */
  def rfmSegments(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", valueCol: String = "value",
      nTiles: Int = 4): DataFrame = {
    val perUser = events.groupBy(userCol).agg(
      max(tsCol).as("__last"),
      count(lit(1)).as("__freq"),
      sum(valueCol).as("__mon"))
    def tile(orderCol: String) = ntile(nTiles).over(
      Window.orderBy(col(orderCol).asc, col(userCol).asc))
    perUser
      .withColumn("r", tile("__last"))
      .withColumn("f", tile("__freq"))
      .withColumn("m", tile("__mon"))
      .groupBy("r", "f", "m")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("r", "f", "m")
  }

  /** Scale path of [[rfmSegments]]: quartile THRESHOLDS from one
    * `percentile_approx` agg (mergeable sketch — no global sort, no
    * single-task window), broadcast back as three tiny arrays, each
    * user bucketed map-side by counting thresholds strictly below its
    * value. At 100 TB the per-user pre-agg still leaves hundreds of
    * millions of rows; this shape never sorts them — the only shuffle
    * is the per-user groupBy that [[rfmSegments]] needs anyway.
    *
    * Tie semantics differ from ntile on purpose: equal values land in
    * the SAME bucket (thresholds can't split ties the way a
    * tie-broken sort can), so bucket populations are only
    * approximately equal under ties. On tie-free inputs whose count is
    * below `accuracy` the sketch is exact and the grid equals
    * [[rfmSegments]] exactly (spec-pinned): Spark's exact-path
    * percentile at p=k/n is the value at ascending rank ceil(p·count),
    * which is precisely ntile's tile-k upper boundary. */
  def rfmSegmentsApprox(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", valueCol: String = "value",
      nTiles: Int = 4, accuracy: Int = 10000): DataFrame = {
    require(nTiles >= 1, "need at least one tile")
    val perUser = events.groupBy(userCol).agg(
      max(tsCol).cast("double").as("__last"),
      count(lit(1)).cast("double").as("__freq"),
      sum(valueCol).cast("double").as("__mon"))
    val probs = Sampling.tileProbs(nTiles)
    if (nTiles == 1) {
      perUser.select(lit(1).as("r"), lit(1).as("f"), lit(1).as("m"))
        .groupBy("r", "f", "m").agg(count(lit(1)).as("n_users"))
    } else {
      val thr = perUser.agg(
        percentile_approx(col("__last"), probs, lit(accuracy)).as("__tr"),
        percentile_approx(col("__freq"), probs, lit(accuracy)).as("__tf"),
        percentile_approx(col("__mon"), probs, lit(accuracy)).as("__tm"))
      perUser.crossJoin(broadcast(thr))
        .select(
          Sampling.tileBucket(col("__last"), col("__tr")).as("r"),
          Sampling.tileBucket(col("__freq"), col("__tf")).as("f"),
          Sampling.tileBucket(col("__mon"), col("__tm")).as("m"))
        .groupBy("r", "f", "m")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("r", "f", "m")
    }
  }
}
