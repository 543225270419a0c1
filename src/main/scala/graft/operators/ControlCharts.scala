package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Shewhart-family control charts the EWMA/CUSUM/Page–Hinkley shelf
  * (q300, q29x) doesn't cover: the ImR (individuals + moving range)
  * chart — the no-subgroup chart whose sigma comes from SHORT-TERM
  * variation (the moving range), so a slow drift inflates neither
  * the limits nor the false-negative rate the way a global stddev
  * would — and the p-chart for proportion-defective with per-day
  * varying binomial limits (daily volumes differ, so each day gets
  * its own ±3σ width).
  *
  * Both are one corpus aggregate to the calendar table, one lag
  * window, one 1-row center-line factor — the Bartels dataflow. */
object ControlCharts {

  /** ImR chart over daily revenue (Shewhart 1931; constants d₂ =
    * 1.128, D₄ = 3.267 for n = 2): center line x̄, control limits
    * x̄ ± 2.66·M̄R (= 3σ̂ with σ̂ = M̄R/d₂), MR chart upper limit
    * D₄·M̄R. One row `(n_days, mean_x, mr_bar, ucl, lcl,
    * x_violations, mr_violations)`. */
  def imrChart(events: DataFrame): DataFrame = {
    val w = Window.orderBy("d")
    val daily = events.groupBy(to_date(col("ts")).as("d"))
      .agg(sum("value").as("y"))
      .withColumn("__mr", abs(col("y") - lag("y", 1).over(w)))
    val center = daily.agg(
      count(lit(1)).as("__n"), avg("y").as("__xbar"),
      avg("__mr").as("__mrbar"))
    val j = daily.crossJoin(broadcast(center))   // 1-row CL factor
    val ucl = col("__xbar") + col("__mrbar") * 2.66
    val lcl = col("__xbar") - col("__mrbar") * 2.66
    j.agg(
      first("__n").as("__n2"), first("__xbar").as("__xb"),
      first("__mrbar").as("__mb"),
      sum(when(col("y") > ucl || col("y") < lcl, 1L).otherwise(0L))
        .as("__xv"),
      sum(when(col("__mr") > col("__mrbar") * 3.267, 1L)
        .otherwise(0L)).as("__mv"))
      .select(
        col("__n2").cast("bigint").as("n_days"),
        round(col("__xb"), 6).as("mean_x"),
        round(col("__mb"), 6).as("mr_bar"),
        round(col("__xb") + col("__mb") * 2.66, 6).as("ucl"),
        round(col("__xb") - col("__mb") * 2.66, 6).as("lcl"),
        col("__xv").cast("bigint").as("x_violations"),
        col("__mv").cast("bigint").as("mr_violations"))
  }

  /** p-chart on the daily error-event share with VARYING limits
    * (Shewhart; Montgomery, Intro to SQC §7.3.1): p̄ pooled over all
    * days, each day tested against p̄ ± 3·√(p̄(1−p̄)/nᵢ) for ITS
    * volume nᵢ — a small day needs a wilder proportion to signal
    * than a big one. One row `(n_days, p_bar, total_events,
    * violations_hi, violations_lo)`. */
  def pChart(events: DataFrame): DataFrame = {
    val daily = events.groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("__ni"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("__di"))
    val pool = daily.agg(
      count(lit(1)).as("__days"), sum("__ni").as("__tot"),
      (sum("__di").cast("double") / sum("__ni").cast("double"))
        .as("__pbar"))
    val j = daily.crossJoin(broadcast(pool))   // 1-row CL factor
    val niD = col("__ni").cast("double")
    val p = col("__di").cast("double") / niD
    val half =
      sqrt(col("__pbar") * (lit(1.0) - col("__pbar")) / niD) * 3.0
    j.agg(
      first("__days").as("__nd"), first("__pbar").as("__pb"),
      first("__tot").as("__t"),
      sum(when(p > col("__pbar") + half, 1L).otherwise(0L)).as("__hi"),
      sum(when(p < col("__pbar") - half, 1L).otherwise(0L)).as("__lo"))
      .select(
        col("__nd").cast("bigint").as("n_days"),
        round(col("__pb"), 6).as("p_bar"),
        col("__t").cast("bigint").as("total_events"),
        col("__hi").cast("bigint").as("violations_hi"),
        col("__lo").cast("bigint").as("violations_lo"))
  }

  /** DuckDB oracle for [[imrChart]]. */
  val imrOracleSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d, SUM(value) AS y
      |  FROM events GROUP BY 1),
      |mr AS (
      |  SELECT y, ABS(y - LAG(y) OVER (ORDER BY d)) AS m FROM daily),
      |c AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(y) AS xbar,
      |    AVG(m) AS mrbar
      |  FROM mr),
      |v AS (
      |  SELECT ANY_VALUE(c.n) AS n, ANY_VALUE(c.xbar) AS xbar,
      |    ANY_VALUE(c.mrbar) AS mrbar,
      |    SUM(CASE WHEN mr.y > c.xbar + 2.66 * c.mrbar
      |      OR mr.y < c.xbar - 2.66 * c.mrbar THEN 1 ELSE 0 END) AS xv,
      |    SUM(CASE WHEN mr.m > 3.267 * c.mrbar THEN 1 ELSE 0 END) AS mv
      |  FROM mr CROSS JOIN c)
      |SELECT n AS n_days, ROUND(xbar, 6) AS mean_x,
      |  ROUND(mrbar, 6) AS mr_bar,
      |  ROUND(xbar + 2.66 * mrbar, 6) AS ucl,
      |  ROUND(xbar - 2.66 * mrbar, 6) AS lcl,
      |  CAST(xv AS BIGINT) AS x_violations,
      |  CAST(mv AS BIGINT) AS mr_violations
      |FROM v""".stripMargin

  /** DuckDB oracle for [[pChart]]. */
  val pChartOracleSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS ni,
      |    SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS di
      |  FROM events GROUP BY 1),
      |pool AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS days,
      |    CAST(SUM(ni) AS BIGINT) AS tot,
      |    CAST(SUM(di) AS DOUBLE) / SUM(ni) AS pbar
      |  FROM daily),
      |v AS (
      |  SELECT ANY_VALUE(pool.days) AS days,
      |    ANY_VALUE(pool.pbar) AS pbar, ANY_VALUE(pool.tot) AS tot,
      |    SUM(CASE WHEN CAST(di AS DOUBLE) / ni > pool.pbar +
      |      3.0 * SQRT(pool.pbar * (1.0 - pool.pbar) / ni)
      |      THEN 1 ELSE 0 END) AS hi,
      |    SUM(CASE WHEN CAST(di AS DOUBLE) / ni < pool.pbar -
      |      3.0 * SQRT(pool.pbar * (1.0 - pool.pbar) / ni)
      |      THEN 1 ELSE 0 END) AS lo
      |  FROM daily CROSS JOIN pool)
      |SELECT days AS n_days, ROUND(pbar, 6) AS p_bar,
      |  tot AS total_events,
      |  CAST(hi AS BIGINT) AS violations_hi,
      |  CAST(lo AS BIGINT) AS violations_lo
      |FROM v""".stripMargin

  /** c-chart on the daily error-event COUNT (Montgomery, Intro to
    * SQC §7.3.3): Poisson limits c̄ ± 3·√c̄ with the LCL floored at
    * 0 (a count can't go negative, and for c̄ < 9 the naive LCL is
    * — the classic textbook trap this chart family documents).
    * Where [[pChart]] watches the error SHARE (volume-normalized),
    * the c-chart watches the raw defect count per equal-sized
    * inspection unit (here: a day). One row `(n_days, c_bar, ucl,
    * lcl, violations_hi, violations_lo)`.
    *
    * Scale shape: one corpus agg to the calendar table, one 1-row
    * center-line factor — [[imrChart]]'s dataflow. */
  def cChart(events: DataFrame): DataFrame = {
    val daily = events.groupBy(to_date(col("ts")).as("d"))
      .agg(sum(when(col("event_type") === "error", 1L).otherwise(0L))
        .cast("double").as("__c"))
    val pool = daily.agg(
      count(lit(1)).as("__days"), avg("__c").as("__cbar"))
    val j = daily.crossJoin(broadcast(pool))   // 1-row CL factor
    val ucl = col("__cbar") + sqrt(col("__cbar")) * 3.0
    val lcl = greatest(lit(0.0),
      col("__cbar") - sqrt(col("__cbar")) * 3.0)
    j.agg(
      first("__days").as("__nd"), first("__cbar").as("__cb"),
      sum(when(col("__c") > ucl, 1L).otherwise(0L)).as("__hi"),
      sum(when(col("__c") < lcl, 1L).otherwise(0L)).as("__lo"))
      .select(
        col("__nd").cast("bigint").as("n_days"),
        round(col("__cb"), 6).as("c_bar"),
        round(col("__cb") + sqrt(col("__cb")) * 3.0, 6).as("ucl"),
        round(greatest(lit(0.0),
          col("__cb") - sqrt(col("__cb")) * 3.0), 6).as("lcl"),
        col("__hi").cast("bigint").as("violations_hi"),
        col("__lo").cast("bigint").as("violations_lo"))
  }

  /** DuckDB oracle for [[cChart]]. */
  val cChartOracleSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d,
      |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
      |      AS DOUBLE) AS c
      |  FROM events GROUP BY 1),
      |pool AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS days, AVG(c) AS cbar
      |  FROM daily),
      |v AS (
      |  SELECT ANY_VALUE(pool.days) AS days,
      |    ANY_VALUE(pool.cbar) AS cbar,
      |    SUM(CASE WHEN c > pool.cbar + 3.0 * SQRT(pool.cbar)
      |      THEN 1 ELSE 0 END) AS hi,
      |    SUM(CASE WHEN c < GREATEST(0.0,
      |      pool.cbar - 3.0 * SQRT(pool.cbar))
      |      THEN 1 ELSE 0 END) AS lo
      |  FROM daily CROSS JOIN pool)
      |SELECT days AS n_days, ROUND(cbar, 6) AS c_bar,
      |  ROUND(cbar + 3.0 * SQRT(cbar), 6) AS ucl,
      |  ROUND(GREATEST(0.0, cbar - 3.0 * SQRT(cbar)), 6) AS lcl,
      |  CAST(hi AS BIGINT) AS violations_hi,
      |  CAST(lo AS BIGINT) AS violations_lo
      |FROM v""".stripMargin

  /** u-chart on errors PER ACTIVE USER with per-day varying limits
    * (Montgomery §7.3.4): uᵢ = dᵢ/nᵢ with nᵢ = that day's distinct
    * active users, pooled ū = Σd/Σn, each day tested against
    * ū ± 3·√(ū/nᵢ). The Poisson cousin of [[pChart]]: p charts a
    * bounded proportion, u charts a rate whose exposure (the day's
    * user base) varies — a quiet Sunday needs a wilder error rate
    * to signal than a peak weekday. One row `(n_days, u_bar,
    * total_errors, violations_hi, violations_lo)`.
    *
    * Scale shape: one corpus agg (count + count-distinct per day —
    * a single shuffle), 1-row pooled factor. */
  def uChart(events: DataFrame): DataFrame = {
    val daily = events.groupBy(to_date(col("ts")).as("d"))
      .agg(countDistinct(col("user_id")).cast("double").as("__ni"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .cast("double").as("__di"))
    val pool = daily.agg(
      count(lit(1)).as("__days"), sum("__di").as("__errs"),
      (sum("__di") / sum("__ni")).as("__ubar"))
    val j = daily.crossJoin(broadcast(pool))   // 1-row CL factor
    val u = col("__di") / col("__ni")
    val half = sqrt(col("__ubar") / col("__ni")) * 3.0
    j.agg(
      first("__days").as("__nd"), first("__ubar").as("__ub"),
      first("__errs").as("__e"),
      sum(when(u > col("__ubar") + half, 1L).otherwise(0L))
        .as("__hi"),
      sum(when(u < col("__ubar") - half, 1L).otherwise(0L))
        .as("__lo"))
      .select(
        col("__nd").cast("bigint").as("n_days"),
        round(col("__ub"), 6).as("u_bar"),
        col("__e").cast("bigint").as("total_errors"),
        col("__hi").cast("bigint").as("violations_hi"),
        col("__lo").cast("bigint").as("violations_lo"))
  }

  /** DuckDB oracle for [[uChart]]. */
  val uChartOracleSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d,
      |    CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS ni,
      |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
      |      AS DOUBLE) AS di
      |  FROM events GROUP BY 1),
      |pool AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS days,
      |    SUM(di) AS errs, SUM(di) / SUM(ni) AS ubar
      |  FROM daily),
      |v AS (
      |  SELECT ANY_VALUE(pool.days) AS days,
      |    ANY_VALUE(pool.ubar) AS ubar, ANY_VALUE(pool.errs) AS errs,
      |    SUM(CASE WHEN di / ni > pool.ubar +
      |      3.0 * SQRT(pool.ubar / ni) THEN 1 ELSE 0 END) AS hi,
      |    SUM(CASE WHEN di / ni < pool.ubar -
      |      3.0 * SQRT(pool.ubar / ni) THEN 1 ELSE 0 END) AS lo
      |  FROM daily CROSS JOIN pool)
      |SELECT days AS n_days, ROUND(ubar, 6) AS u_bar,
      |  CAST(errs AS BIGINT) AS total_errors,
      |  CAST(hi AS BIGINT) AS violations_hi,
      |  CAST(lo AS BIGINT) AS violations_lo
      |FROM v""".stripMargin

  /** Western Electric run rules over the daily-revenue individuals
    * chart (Western Electric SQC Handbook 1956, rules 1–4): beyond
    * the single-point ±3σ test, runs of MODERATE deviations signal
    * too — (1) |z| > 3; (2) ≥2 of 3 consecutive beyond 2σ on the
    * SAME side; (3) ≥4 of 5 beyond 1σ same side; (4) 8 consecutive
    * on one side of the center line. σ̂ is the moving-range estimate
    * M̄R/1.128 ([[imrChart]]'s short-term sigma, not the
    * drift-inflated global stddev). A day fires a rule when ITS
    * trailing window completes the pattern; early days whose window
    * is short cannot fire (counts require the full 3/5/8 rows).
    * One row `(n_days, x_bar, sigma_hat, r1_days, r2_days, r3_days,
    * r4_days)`.
    *
    * Scale shape: one corpus agg to the calendar table, one lag +
    * three bounded trailing windows over day-cardinality rows,
    * 1-row sigma factor. */
  def wecoRules(events: DataFrame): DataFrame = {
    val wOrd = Window.orderBy("d")
    val daily = events.groupBy(to_date(col("ts")).as("d"))
      .agg(sum("value").as("y"))
      .withColumn("__mr", abs(col("y") - lag("y", 1).over(wOrd)))
    val center = daily.agg(
      count(lit(1)).as("__n"), avg("y").as("__xbar"),
      (avg("__mr") / 1.128).as("__sig"))
    // σ̂ > 0 guarded inside the expression: ANSI mode faults /0 even
    // in a dead when() branch under codegen
    val z = when(col("__sig") > 0.0,
      (col("y") - col("__xbar")) / col("__sig"))
    val w3 = wOrd.rowsBetween(-2, 0)
    val w5 = wOrd.rowsBetween(-4, 0)
    val w8 = wOrd.rowsBetween(-7, 0)
    def beyond(side: Double, k: Double) =
      when(lit(side) * col("__z") > k, 1L).otherwise(0L)
    val flagged = daily.crossJoin(broadcast(center))
      .withColumn("__z", z)
      .withColumn("__rows3", count(lit(1)).over(w3))
      .withColumn("__rows5", count(lit(1)).over(w5))
      .withColumn("__rows8", count(lit(1)).over(w8))
      .withColumn("__r1",
        coalesce(abs(col("__z")) > 3.0, lit(false)))
      .withColumn("__r2", col("__rows3") === 3L &&
        (sum(beyond(1.0, 2.0)).over(w3) >= 2L ||
         sum(beyond(-1.0, 2.0)).over(w3) >= 2L))
      .withColumn("__r3", col("__rows5") === 5L &&
        (sum(beyond(1.0, 1.0)).over(w5) >= 4L ||
         sum(beyond(-1.0, 1.0)).over(w5) >= 4L))
      .withColumn("__r4", col("__rows8") === 8L &&
        (sum(beyond(1.0, 0.0)).over(w8) === 8L ||
         sum(beyond(-1.0, 0.0)).over(w8) === 8L))
    flagged.agg(
      first("__n").as("__nd"), first("__xbar").as("__xb"),
      first("__sig").as("__s"),
      sum(when(col("__r1"), 1L).otherwise(0L)).as("__c1"),
      sum(when(col("__r2"), 1L).otherwise(0L)).as("__c2"),
      sum(when(col("__r3"), 1L).otherwise(0L)).as("__c3"),
      sum(when(col("__r4"), 1L).otherwise(0L)).as("__c4"))
      .select(
        col("__nd").cast("bigint").as("n_days"),
        round(col("__xb"), 6).as("x_bar"),
        round(col("__s"), 6).as("sigma_hat"),
        col("__c1").cast("bigint").as("r1_days"),
        col("__c2").cast("bigint").as("r2_days"),
        col("__c3").cast("bigint").as("r3_days"),
        col("__c4").cast("bigint").as("r4_days"))
  }

  /** DuckDB oracle for [[wecoRules]]. */
  val wecoOracleSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d, SUM(value) AS y
      |  FROM events GROUP BY 1),
      |mr AS (
      |  SELECT d, y, ABS(y - LAG(y) OVER (ORDER BY d)) AS m
      |  FROM daily),
      |c AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(y) AS xbar,
      |    AVG(m) / 1.128 AS sig
      |  FROM mr),
      |z AS (
      |  SELECT d,
      |    CASE WHEN c.sig > 0.0 THEN (y - c.xbar) / c.sig END AS z,
      |    c.n, c.xbar, c.sig
      |  FROM mr CROSS JOIN c),
      |w AS (
      |  SELECT n, xbar, sig, z,
      |    COUNT(*) OVER w3 AS rows3, COUNT(*) OVER w5 AS rows5,
      |    COUNT(*) OVER w8 AS rows8,
      |    SUM(CASE WHEN z > 2.0 THEN 1 ELSE 0 END) OVER w3 AS hi3,
      |    SUM(CASE WHEN -z > 2.0 THEN 1 ELSE 0 END) OVER w3 AS lo3,
      |    SUM(CASE WHEN z > 1.0 THEN 1 ELSE 0 END) OVER w5 AS hi5,
      |    SUM(CASE WHEN -z > 1.0 THEN 1 ELSE 0 END) OVER w5 AS lo5,
      |    SUM(CASE WHEN z > 0.0 THEN 1 ELSE 0 END) OVER w8 AS hi8,
      |    SUM(CASE WHEN -z > 0.0 THEN 1 ELSE 0 END) OVER w8 AS lo8
      |  FROM z
      |  WINDOW
      |    w3 AS (ORDER BY d ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
      |    w5 AS (ORDER BY d ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
      |    w8 AS (ORDER BY d ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
      |SELECT ANY_VALUE(n) AS n_days,
      |  ROUND(ANY_VALUE(xbar), 6) AS x_bar,
      |  ROUND(ANY_VALUE(sig), 6) AS sigma_hat,
      |  CAST(SUM(CASE WHEN COALESCE(ABS(z) > 3.0, FALSE)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS r1_days,
      |  CAST(SUM(CASE WHEN rows3 = 3 AND (hi3 >= 2 OR lo3 >= 2)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS r2_days,
      |  CAST(SUM(CASE WHEN rows5 = 5 AND (hi5 >= 4 OR lo5 >= 4)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS r3_days,
      |  CAST(SUM(CASE WHEN rows8 = 8 AND (hi8 = 8 OR lo8 = 8)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS r4_days
      |FROM w""".stripMargin
}
