package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Differentially-private publication of aggregate statistics — the
  * release-side companion to [[Privacy]]'s k-anonymity gate: where
  * k-anonymity protects the PUBLISHED ROWS, DP protects repeated
  * AGGREGATE releases (the reference publishes Athena views on a
  * 6-hourly cadence — `terraform/main.tf` Athena publication +
  * `airflow/dags/lakehouse_pipelines.py:105` — exactly the repeated-
  * release setting where un-noised counts leak membership; Dwork &
  * Roth 2014, "The Algorithmic Foundations of Differential Privacy").
  *
  * Two tiers, split the way this repo always splits oracle-able
  * arithmetic from engine-specific randomness (q29/q52 precedent):
  *   - [[releaseAccounting]]: the privacy LEDGER — per release ×
  *     event_type: the true count (sensitivity-1 statistic), the
  *     per-release ε, the Laplace scale b = 1/ε it implies, the
  *     basic-composition cumulative ε, and the budget gate.
  *     Deterministic arithmetic → DuckDB-oracled.
  *   - [[noisedRelease]]: the actual noised counts, with Laplace
  *     noise derived from a SEEDED HASH inverse-CDF (xxhash64 →
  *     uniform → −b·sgn(u)·ln(1−2|u|)) so the mechanism is
  *     reproducible run-to-run and audit-friendly. Hash-seeded ⇒
  *     rows-only vs the oracle; the distributional contract lives
  *     in DifferentialPrivacySpec. (A production deployment would
  *     swap the seeded hash for a CSPRNG; determinism is the
  *     property under test here, the pipeline shape is identical.)
  *
  * Scale shape (100 TB events): ONE partial-aggregated shuffle to a
  * (event_type × day)-sized table; every release is then a filtered
  * sum over that tiny table — k releases never re-scan the corpus.
  * Noise is a map-side expression on the release table. */
object DifferentialPrivacy {

  /** (release id, max day-of-month included) — release r publishes
    * the running count through day d, the reference's periodic
    * re-publication cadence compressed to three checkpoints. */
  val releases: Seq[(Int, Int)] = Seq((1, 10), (2, 20), (3, 31))

  def releaseAccounting(events: DataFrame,
      epsilonPerRelease: Double = 0.5,
      totalBudget: Double = 2.0): DataFrame = {
    val byDay = events
      .groupBy(col("event_type"), dayofmonth(col("ts")).as("__d"))
      .agg(count(lit(1)).as("__dn"))
    val parts = releases.map { case (r, d) =>
      byDay.where(col("__d") <= d)
        .groupBy("event_type")
        .agg(sum(col("__dn")).as("n"))
        .withColumn("release", lit(r))
    }.reduce(_ unionAll _)
    parts
      .withColumn("epsilon", round(lit(epsilonPerRelease), 6))
      .withColumn("noise_scale_b", round(lit(1.0 / epsilonPerRelease), 6))
      .withColumn("cum_epsilon",
        round(col("release") * lit(epsilonPerRelease), 6))
      .withColumn("within_budget",
        col("release") * lit(epsilonPerRelease) <= lit(totalBudget))
      .select(col("release"), col("event_type"), col("n"),
        col("epsilon"), col("noise_scale_b"), col("cum_epsilon"),
        col("within_budget"))
      .orderBy("release", "event_type")
  }

  /** DuckDB oracle for [[releaseAccounting]] — generated from the
    * same release table so the schedule can never drift. */
  def accountingOracleSql(epsilonPerRelease: Double = 0.5,
      totalBudget: Double = 2.0): String = {
    val e = epsilonPerRelease
    val branches = releases.map { case (r, d) =>
      s"""SELECT $r AS release, event_type, COUNT(*) AS cnt
         |  FROM events WHERE day(ts) <= $d GROUP BY 2""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH c AS (
       |  $branches)
       |SELECT release, event_type, CAST(cnt AS BIGINT) AS n,
       |  ROUND($e, 6) AS epsilon,
       |  ROUND(1.0 / $e, 6) AS noise_scale_b,
       |  ROUND(release * $e, 6) AS cum_epsilon,
       |  (release * $e) <= $totalBudget AS within_budget
       |FROM c ORDER BY release, event_type""".stripMargin
  }

  /** Seeded-hash Laplace mechanism over the final release's counts:
    * `noised_n = max(0, round(n + Lap(1/ε)))`. The uniform is
    * `xxhash64(release, event_type, seed)` scaled into
    * (−0.5, 0.5), clamped away from the endpoints so the inverse
    * CDF stays finite (|noise| ≤ b·ln(1/2⁻⁵²) ≈ 36b). */
  def noisedRelease(events: DataFrame, epsilon: Double = 0.5,
      seed: Long = 42L): DataFrame = {
    val b = 1.0 / epsilon
    val ledger = releaseAccounting(events, epsilon)
    val denom = math.pow(2.0, 52)
    val u0 = pmod(xxhash64(col("release"), col("event_type"), lit(seed)),
      lit(1L << 52)).cast("double") / lit(denom) - lit(0.5)
    val u = least(greatest(u0, lit(-0.5 + 1e-15)), lit(0.5 - 1e-15))
    ledger
      .withColumn("__noise",
        lit(-b) * signum(u) * log(lit(1.0) - lit(2.0) * abs(u)))
      .withColumn("noised_n",
        greatest(lit(0L), round(col("n") + col("__noise")).cast("long")))
      .withColumn("noise_abs_bound", round(lit(b * 36.05), 4))
      .select(col("release"), col("event_type"), col("noised_n"),
        col("epsilon"), col("cum_epsilon"), col("within_budget"),
        col("noise_abs_bound"))
      .orderBy("release", "event_type")
  }
}
