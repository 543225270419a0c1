package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two classical stratified/instrumented effect estimators that
  * complete the causal panel (q267 DiD, q313 CEM, q342 RDD, q344
  * Simpson's audit):
  *
  *  - the Wald instrumental-variable estimator (Wald, Ann. Math.
  *    Stat. 1940; the LATE of Imbens & Angrist 1994): when exposure
  *    is self-selected but an ASSIGNMENT is random, effect =
  *    ITT / first-stage — the intent-to-treat lift rescaled by how
  *    much the instrument actually moved exposure.
  *  - the Mantel–Haenszel pooled odds ratio (Mantel & Haenszel,
  *    JNCI 1959) with the CMH χ²: the stratum-weighted 2×2 pooling
  *    that answers the q344 Simpson's audit — "after the paradox is
  *    flagged, what IS the within-stratum effect?"
  *
  * Both are one grouped-count pass plus closed-form scalar algebra —
  * no joins beyond 1-row stat factors. */
object CausalPanel {

  /** One row `(n_z0, n_z1, itt, first_stage, late)` for instrument
    * `z`, exposure `xCol`, outcome `yCol` over a unit frame. LATE is
    * NULL when the first stage is (numerically) zero — a dead
    * instrument divides by nothing. */
  def ivWald(units: DataFrame, z: Column, xCol: Column,
      yCol: Column): DataFrame = {
    val g = units.select(z.as("__z"),
        xCol.cast("double").as("__x"), yCol.cast("double").as("__y"))
      .where(col("__z").isNotNull && col("__x").isNotNull &&
        col("__y").isNotNull)
      .agg(
        sum(when(!col("__z"), 1L).otherwise(0L)).as("n_z0"),
        sum(when(col("__z"), 1L).otherwise(0L)).as("n_z1"),
        avg(when(!col("__z"), col("__y"))).as("__y0"),
        avg(when(col("__z"), col("__y"))).as("__y1"),
        avg(when(!col("__z"), col("__x"))).as("__x0"),
        avg(when(col("__z"), col("__x"))).as("__x1"))
    val itt = col("__y1") - col("__y0")
    val fs = col("__x1") - col("__x0")
    g.select(col("n_z0"), col("n_z1"),
      round(itt, 6).as("itt"),
      round(fs, 6).as("first_stage"),
      round(when(abs(fs) > 1e-12, itt / fs), 6).as("late"))
  }

  /** DuckDB oracle for [[ivWald]] on per-user events: instrument =
    * odd user id, exposure = clicked, outcome = total purchase
    * value. */
  val ivWaldOracleSql: String =
    """WITH u AS (
      |  SELECT user_id % 2 = 1 AS z,
      |    CAST(MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS DOUBLE) AS x,
      |    CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
      |      THEN value END), 0.0) AS DOUBLE) AS y
      |  FROM events GROUP BY user_id),
      |g AS (
      |  SELECT
      |    SUM(CASE WHEN NOT z THEN 1 ELSE 0 END) AS n_z0,
      |    SUM(CASE WHEN z THEN 1 ELSE 0 END) AS n_z1,
      |    AVG(CASE WHEN NOT z THEN y END) AS y0,
      |    AVG(CASE WHEN z THEN y END) AS y1,
      |    AVG(CASE WHEN NOT z THEN x END) AS x0,
      |    AVG(CASE WHEN z THEN x END) AS x1
      |  FROM u)
      |SELECT CAST(n_z0 AS BIGINT) AS n_z0,
      |  CAST(n_z1 AS BIGINT) AS n_z1,
      |  ROUND(y1 - y0, 6) AS itt,
      |  ROUND(x1 - x0, 6) AS first_stage,
      |  ROUND(CASE WHEN ABS(x1 - x0) > 1e-12
      |    THEN (y1 - y0) / (x1 - x0) END, 6) AS late
      |FROM g""".stripMargin

  /** One row `(n, k_strata, or_mh, cmh_chi2, sig_95)` — the
    * Mantel–Haenszel common odds ratio over per-stratum 2×2 tables
    * (treated × success) and the Cochran–Mantel–Haenszel 1-df χ²
    * (no continuity correction). Strata where any margin is zero
    * contribute nothing to the ratio terms (their a·d/n and b·c/n
    * are zero) and zero variance — the standard behavior. */
  def mantelHaenszel(units: DataFrame, stratum: Column,
      treated: Column, success: Column): DataFrame = {
    val cells = units.select(stratum.as("__s"),
        treated.as("__t"), success.as("__y"))
      .where(col("__s").isNotNull && col("__t").isNotNull &&
        col("__y").isNotNull)
      .groupBy("__s")
      .agg(
        sum(when(col("__t") && col("__y"), 1L).otherwise(0L))
          .as("a"),
        sum(when(col("__t") && !col("__y"), 1L).otherwise(0L))
          .as("b"),
        sum(when(!col("__t") && col("__y"), 1L).otherwise(0L))
          .as("c"),
        sum(when(!col("__t") && !col("__y"), 1L).otherwise(0L))
          .as("d"))
    val ni = (col("a") + col("b") + col("c") + col("d"))
      .cast("double")
    val r1 = (col("a") + col("b")).cast("double")
    val c1 = (col("a") + col("c")).cast("double")
    val ea = r1 * c1 / ni
    val va = r1 * (ni - r1) * c1 * (ni - c1) /
      (ni * ni * (ni - 1.0))
    val s = cells.agg(
      sum(ni).as("__n"), count(lit(1)).as("k"),
      sum(col("a").cast("double") * col("d") / ni).as("__num"),
      sum(col("b").cast("double") * col("c") / ni).as("__den"),
      sum(col("a") - ea).as("__dev"),
      sum(va).as("__var"))
    val chi2 = col("__dev") * col("__dev") / col("__var")
    s.select(
      col("__n").cast("bigint").as("n"),
      col("k").cast("bigint").as("k_strata"),
      round(when(col("__den") > 0.0, col("__num") / col("__den")), 6)
        .as("or_mh"),
      round(when(col("__var") > 0.0, chi2), 6).as("cmh_chi2"),
      when(col("__var") > 0.0, chi2 > 3.841459)
        .otherwise(lit(false)).as("sig_95"))
  }

  /** DuckDB oracle for [[mantelHaenszel]] on the q344 fixture:
    * strata = per-user event-count bands, treated = odd user id,
    * success = ever purchased. */
  val mantelHaenszelOracleSql: String =
    """WITH pu AS (
      |  SELECT user_id, COUNT(*) AS n_ev,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      = 1 AS y,
      |    user_id % 2 = 1 AS t
      |  FROM events GROUP BY 1),
      |cells AS (
      |  SELECT CASE WHEN n_ev <= 62 THEN 'low'
      |           WHEN n_ev <= 70 THEN 'mid' ELSE 'high' END AS s,
      |    SUM(CASE WHEN t AND y THEN 1 ELSE 0 END) AS a,
      |    SUM(CASE WHEN t AND NOT y THEN 1 ELSE 0 END) AS b,
      |    SUM(CASE WHEN NOT t AND y THEN 1 ELSE 0 END) AS c,
      |    SUM(CASE WHEN NOT t AND NOT y THEN 1 ELSE 0 END) AS d
      |  FROM pu GROUP BY 1),
      |f AS (
      |  SELECT *, CAST(a + b + c + d AS DOUBLE) AS ni,
      |    CAST(a + b AS DOUBLE) AS r1,
      |    CAST(a + c AS DOUBLE) AS c1
      |  FROM cells),
      |s AS (
      |  SELECT SUM(ni) AS n, COUNT(*) AS k,
      |    SUM(CAST(a AS DOUBLE) * d / ni) AS num,
      |    SUM(CAST(b AS DOUBLE) * c / ni) AS den,
      |    SUM(a - r1 * c1 / ni) AS dev,
      |    SUM(r1 * (ni - r1) * c1 * (ni - c1) /
      |        (ni * ni * (ni - 1.0))) AS var
      |  FROM f)
      |SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k_strata,
      |  ROUND(CASE WHEN den > 0 THEN num / den END, 6) AS or_mh,
      |  ROUND(CASE WHEN var > 0 THEN dev * dev / var END, 6)
      |    AS cmh_chi2,
      |  CASE WHEN var > 0 THEN dev * dev / var > 3.841459
      |    ELSE FALSE END AS sig_95
      |FROM s""".stripMargin
}
