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
}
