package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift report between two frames: PSI (population
  * stability index), the standard score for "did this feature's
  * distribution move between the baseline snapshot and today" — the
  * monitoring companion to [[graft.lake.SnapshotDiff]], which reports
  * row-level changes; PSI reports DISTRIBUTION-level change even when
  * no individual row is comparable.
  *
  * Values are binned with deterministic fixed-width buckets, shares are
  * floored so an empty bucket never yields ±∞, and each bucket
  * contributes `(cur_p − base_p) · ln(cur_p / base_p)` (all terms
  * ≥ 0); the conventional reading of the summed index: < 0.1 stable,
  * 0.1–0.25 moderate drift, > 0.25 major drift.
  *
  * Scale shape: one grouped count per side (map-side partials), a
  * full-outer join on bucket ids, and window normalization — all over
  * the BUCKET table, whose size is value-range/width, not row count.
  * Pairing with [[graft.lake.TableLog.readAsOf]] gives "drift between
  * yesterday's snapshot and now" without retaining either frame.
  */
object Drift {

  /** Per-bucket PSI report: (bucket, base_n, cur_n, base_p, cur_p,
    * psi_term), ordered by bucket. Total PSI = sum(psi_term). */
  def psiReport(base: DataFrame, current: DataFrame, valueCol: String,
      bucketWidth: Double, floorP: Double = 1e-6): DataFrame = {
    require(bucketWidth > 0.0, "bucket width must be positive")
    def counts(df: DataFrame, as: String) = df
      .select(floor(col(valueCol) / bucketWidth).cast("bigint").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as(as))
    val w = Window.partitionBy()
    counts(base, "base_n")
      .join(counts(current, "cur_n"), Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("base_n", "cur_n"))
      .withColumn("__bp",
        greatest(col("base_n") / sum("base_n").over(w), lit(floorP)))
      .withColumn("__cp",
        greatest(col("cur_n") / sum("cur_n").over(w), lit(floorP)))
      .select(col("bucket"), col("base_n"), col("cur_n"),
        round(col("__bp"), 6).as("base_p"),
        round(col("__cp"), 6).as("cur_p"),
        round((col("__cp") - col("__bp")) * log(col("__cp") / col("__bp")), 6)
          .as("psi_term"))
      .orderBy("bucket")
  }
}
