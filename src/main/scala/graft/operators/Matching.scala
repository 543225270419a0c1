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

  /** Inverse-propensity-weighted ATT (Rosenbaum & Rubin, Biometrika
    * 1983; the Hirano–Imbens odds-weighting form) — the WEIGHTED
    * counterpart of [[cemAtt]]'s stratify-and-difference: instead of
    * averaging within-stratum differences, every control unit is
    * up-weighted by the treatment odds of its stratum e/(1−e), which
    * reweights the control population to the treated covariate
    * distribution. Same estimand, different variance/bias trade —
    * reading both (q313 vs this) is the standard robustness check:
    * agreement says the stratum model carries the confounding;
    * divergence says extreme-propensity strata dominate one of them.
    * Propensities are exact per-stratum empirical shares, so both
    * engines compute identical weights (no fitted model to diverge).
    *
    * Same one-pass stratum-table shape as CEM. One row `(n_treated,
    * n_control, n_strata, n_strata_matched, att_ipw, naive_diff)`;
    * strata with no treated or no control units drop (weight 0 /
    * undefined odds — the CEM matched-set convention). */
  def ipwAtt(units: DataFrame, stratum: Column, treated: Column,
      outcome: Column): DataFrame = {
    val u = units.select(stratum.as("__s"), treated.as("__t"),
      outcome.cast("double").as("__y"))
    val strata = u.groupBy("__s").agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("__nt"),
      sum(when(!col("__t"), 1L).otherwise(0L)).as("__nc"),
      sum(when(col("__t"), col("__y")).otherwise(0.0)).as("__syt"),
      sum(when(!col("__t"), col("__y")).otherwise(0.0)).as("__syc"))
    val matched = col("__nt") > 0L && col("__nc") > 0L
    // odds weight per control unit in stratum s: e/(1−e) = nt/nc —
    // guarded rather than relying on the when() branch, because ANSI
    // mode faults the division eagerly under codegen
    val w = when(col("__nc") > 0L,
      col("__nt").cast("double") / col("__nc").cast("double"))
      .otherwise(lit(0.0))
    strata.agg(
        sum("__nt").as("n_treated"),
        sum("__nc").as("n_control"),
        count(lit(1)).as("n_strata"),
        sum(when(matched, 1L).otherwise(0L)).as("n_strata_matched"),
        sum(when(matched, col("__nt")).otherwise(0L)).as("__ntm"),
        sum(when(matched, col("__syt")).otherwise(0.0)).as("__sytm"),
        sum(when(matched, w * col("__syc")).otherwise(0.0)).as("__wyc"),
        sum(when(matched, w * col("__nc").cast("double"))
          .otherwise(0.0)).as("__wn"),
        sum("__syt").as("__asyt"), sum("__syc").as("__asyc"))
      .select(
        col("n_treated"), col("n_control"), col("n_strata"),
        col("n_strata_matched"),
        // fully degenerate designs (no matched stratum) are NULL,
        // not a confident 0.0 effect — mirrors naive_diff below
        round(when(col("__ntm") > 0L && col("__wn") > 0.0,
          col("__sytm") / col("__ntm").cast("double") -
            col("__wyc") / col("__wn")), 6)
          .as("att_ipw"),
        // one-armed designs (every unit treated, or none) have no
        // naive contrast — NULL, mirroring cemAtt's null propagation
        round(when(col("n_treated") > 0L && col("n_control") > 0L,
          col("__asyt") / col("n_treated").cast("double") -
            col("__asyc") / col("n_control").cast("double")), 6)
          .as("naive_diff"))
  }

  /** The q395 registration's unit build — q313's outcome and stratum
    * (purchase value, active days) with a treatment that actually
    * SPLITS this corpus: q313's "saw ≥1 error" saturates (every
    * synthetic user errors), so the IPW contrast uses heavy-error
    * exposure (> 13 error events, around the per-user median) as the
    * treatment. A fixed integer cutoff — no computed quantile to
    * float-diverge between engines. */
  def errorImpactIpw(events: DataFrame): DataFrame = {
    val units = events.groupBy("user_id").agg(
      countDistinct(to_date(col("ts"))).as("active_days"),
      (sum(when(col("event_type") === "error", 1L).otherwise(0L))
        > 13L).as("treated"),
      sum(when(col("event_type") === "purchase", col("value"))
        .otherwise(0.0)).as("purchase_value"))
    ipwAtt(units, col("active_days"), col("treated"),
      col("purchase_value"))
  }

  /** DuckDB oracle for [[errorImpactIpw]] on events. */
  val errorImpactIpwOracleSql: String =
    """WITH units AS (
      |  SELECT user_id,
      |    COUNT(DISTINCT CAST(ts AS DATE)) AS s,
      |    SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) > 13
      |      AS t,
      |    SUM(CASE WHEN event_type = 'purchase' THEN value
      |      ELSE 0.0 END) AS y
      |  FROM events GROUP BY 1),
      |strata AS (
      |  SELECT s,
      |    SUM(CASE WHEN t THEN 1 ELSE 0 END) AS nt,
      |    SUM(CASE WHEN NOT t THEN 1 ELSE 0 END) AS nc,
      |    SUM(CASE WHEN t THEN y ELSE 0.0 END) AS syt,
      |    SUM(CASE WHEN NOT t THEN y ELSE 0.0 END) AS syc
      |  FROM units GROUP BY 1),
      |a AS (
      |  SELECT SUM(nt) AS n_treated, SUM(nc) AS n_control,
      |    COUNT(*) AS n_strata,
      |    SUM(CASE WHEN nt > 0 AND nc > 0 THEN 1 ELSE 0 END)
      |      AS n_strata_matched,
      |    SUM(CASE WHEN nt > 0 AND nc > 0 THEN nt ELSE 0 END) AS ntm,
      |    SUM(CASE WHEN nt > 0 AND nc > 0 THEN syt ELSE 0.0 END)
      |      AS sytm,
      |    SUM(CASE WHEN nt > 0 AND nc > 0 THEN
      |      (CAST(nt AS DOUBLE) / nc) * syc ELSE 0.0 END) AS wyc,
      |    SUM(CASE WHEN nt > 0 AND nc > 0 THEN
      |      (CAST(nt AS DOUBLE) / nc) * nc ELSE 0.0 END) AS wn,
      |    SUM(syt) AS asyt, SUM(syc) AS asyc
      |  FROM strata)
      |SELECT CAST(n_treated AS BIGINT) AS n_treated,
      |  CAST(n_control AS BIGINT) AS n_control,
      |  CAST(n_strata AS BIGINT) AS n_strata,
      |  CAST(n_strata_matched AS BIGINT) AS n_strata_matched,
      |  ROUND(CASE WHEN ntm > 0 AND wn > 0
      |    THEN sytm / ntm - wyc / wn END, 6) AS att_ipw,
      |  ROUND(CASE WHEN n_treated > 0 AND n_control > 0
      |    THEN CAST(asyt AS DOUBLE) / n_treated
      |      - CAST(asyc AS DOUBLE) / n_control END, 6) AS naive_diff
      |FROM a""".stripMargin
}
