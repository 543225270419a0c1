package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Coarsened exact matching for observational effect estimates
  * (Iacus, King & Porro, Political Analysis 2012) — the causal step
  * past the experiment suite: q267's DiD needs a before/after panel
  * and the A/B tests (q248+) need a randomized split; CEM answers
  * "did exposure X move outcome Y" when treatment was NOT assigned —
  * match treated and control units exactly on a coarsened covariate,
  * estimate the effect inside each stratum, and weight by the treated
  * distribution (ATT). Unmatched strata (treated units with no
  * control twin, or vice versa) are dropped and REPORTED — the
  * honest-overlap accounting that separates matching from a naive
  * mean difference.
  *
  * Scale shape: one corpus pass to unit grain, one grouped agg to
  * the stratum table (covariate-cardinality), single-row arithmetic
  * after — the experiment-suite budget exactly. */
object Matching {

  /** ATT of `treated` on `outcome` over unit-grain frame `units`
    * with coarsened stratum column `stratum`. One row:
    * `(n_treated, n_control, n_strata, n_strata_matched,
    * n_treated_matched, att, naive_diff)` — `naive_diff` is the
    * unmatched mean difference, the bias the matching removed. */
  def cemAtt(units: DataFrame, stratum: Column, treated: Column,
      outcome: Column): DataFrame = {
    val u = units.select(stratum.as("__s"), treated.as("__t"),
      outcome.cast("double").as("__y"))
    val strata = u.groupBy("__s").agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("__nt"),
      sum(when(!col("__t"), 1L).otherwise(0L)).as("__nc"),
      avg(when(col("__t"), col("__y"))).as("__yt"),
      avg(when(!col("__t"), col("__y"))).as("__yc"))
    val matched = col("__nt") > 0L && col("__nc") > 0L
    strata.agg(
        sum("__nt").as("n_treated"),
        sum("__nc").as("n_control"),
        count(lit(1)).as("n_strata"),
        sum(when(matched, 1L).otherwise(0L)).as("n_strata_matched"),
        sum(when(matched, col("__nt")).otherwise(0L))
          .as("n_treated_matched"),
        sum(when(matched,
          col("__nt") * (col("__yt") - col("__yc"))).otherwise(0.0))
          .as("__eff"),
        sum(col("__nt") * col("__yt")).as("__syt"),
        sum(col("__nc") * col("__yc")).as("__syc"))
      .select(
        col("n_treated"), col("n_control"), col("n_strata"),
        col("n_strata_matched"), col("n_treated_matched"),
        round(when(col("n_treated_matched") > 0L,
          col("__eff") / col("n_treated_matched")).otherwise(0.0), 6)
          .as("att"),
        round(col("__syt") / col("n_treated") -
          col("__syc") / col("n_control"), 6).as("naive_diff"))
  }

  /** The q312 registration's unit build: per user, treated = saw ≥ 1
    * 'error' event, outcome = total purchase value, stratum = count
    * of distinct active days (an exact small-integer covariate — no
    * float binning to disagree across engines). */
  def errorImpactAtt(events: DataFrame): DataFrame = {
    val units = events.groupBy("user_id").agg(
      countDistinct(to_date(col("ts"))).as("active_days"),
      max(when(col("event_type") === "error", true).otherwise(false))
        .as("treated"),
      sum(when(col("event_type") === "purchase", col("value"))
        .otherwise(0.0)).as("purchase_value"))
    cemAtt(units, col("active_days"), col("treated"),
      col("purchase_value"))
  }

  /** DuckDB oracle for [[errorImpactAtt]] on events. */
  val errorImpactOracleSql: String =
    """WITH units AS (
      |  SELECT user_id,
      |    COUNT(DISTINCT CAST(ts AS DATE)) AS s,
      |    MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) = 1
      |      AS t,
      |    SUM(CASE WHEN event_type = 'purchase' THEN value
      |      ELSE 0.0 END) AS y
      |  FROM events GROUP BY 1),
      |strata AS (
      |  SELECT s,
      |    SUM(CASE WHEN t THEN 1 ELSE 0 END) AS nt,
      |    SUM(CASE WHEN NOT t THEN 1 ELSE 0 END) AS nc,
      |    AVG(CASE WHEN t THEN y END) AS yt,
      |    AVG(CASE WHEN NOT t THEN y END) AS yc
      |  FROM units GROUP BY 1),
      |a AS (
      |  SELECT SUM(nt) AS n_treated, SUM(nc) AS n_control,
      |    COUNT(*) AS n_strata,
      |    SUM(CASE WHEN nt > 0 AND nc > 0 THEN 1 ELSE 0 END)
      |      AS n_strata_matched,
      |    SUM(CASE WHEN nt > 0 AND nc > 0 THEN nt ELSE 0 END)
      |      AS n_treated_matched,
      |    SUM(CASE WHEN nt > 0 AND nc > 0
      |      THEN nt * (yt - yc) ELSE 0.0 END) AS eff,
      |    SUM(nt * yt) AS syt, SUM(nc * yc) AS syc
      |  FROM strata)
      |SELECT n_treated, n_control, n_strata, n_strata_matched,
      |  n_treated_matched,
      |  ROUND(CASE WHEN n_treated_matched > 0
      |    THEN eff / n_treated_matched ELSE 0.0 END, 6) AS att,
      |  ROUND(CAST(syt AS DOUBLE) / n_treated
      |    - CAST(syc AS DOUBLE) / n_control, 6) AS naive_diff
      |FROM a""".stripMargin
}
