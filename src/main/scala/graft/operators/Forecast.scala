package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Simple exponential smoothing over the daily event-count series,
  * with its own one-step-ahead backtest — the capacity-planning
  * baseline (Brown 1956; Hyndman & Athanasopoulos ch. 8): before
  * anyone reaches for a heavier model, SES answers "what does
  * tomorrow look like and how wrong has that guess been historically".
  * The recursion s_t = α·y_t + (1−α)·s_{t−1} unrolls to the closed
  * form s_t = (1−α)^t · Σ_{i≤t} w_i·y_i (w_1 = (1−α)^{−1}, w_i =
  * α·(1−α)^{−i}), which is ONE cumulative window over the day table —
  * no driver recursion, and the DuckDB oracle computes the identical
  * expression.
  *
  * Scale shape: one shuffle to daily counts; everything after is
  * day-cardinality windows with a single ordering. The weight scale
  * (1−α)^{−t} grows exponentially in t — fine for dashboard horizons
  * (≈10⁴ at t = 60, α = 0.15), and a production monitor re-anchors
  * per window anyway. */
object Forecast {

  /** `(d, y, level, forecast, abs_pct_err)` per day: the smoothed
    * level after observing day d, the ONE-STEP forecast for d (the
    * previous level — the first day has none), and the absolute
    * percentage error of that forecast. */
  def sesBacktest(events: DataFrame, alpha: Double = 0.3): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, "alpha must be in (0,1)")
    val daily = events
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).cast("double").as("y"))
    val wOrd = Window.orderBy("d")
    val wCum = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, 0)
    val b = 1.0 - alpha
    val t = row_number().over(wOrd).cast("double")
    val withT = daily.withColumn("__t", t)
    val weight = when(col("__t") === 1.0, pow(lit(b), lit(-1.0)))
      .otherwise(lit(alpha) * pow(lit(b), -col("__t")))
    val level = pow(lit(b), col("__t")) *
      sum(weight * col("y")).over(wCum)
    val withLevel = withT.withColumn("__lvl", level)
    val fc = lag("__lvl", 1).over(wOrd)
    withLevel
      .withColumn("__fc", fc)
      .select(col("d"), col("y"),
        round(col("__lvl"), 6).as("level"),
        round(col("__fc"), 6).as("forecast"),
        round(when(col("__fc").isNotNull && col("y") > 0.0,
          abs(col("y") - col("__fc")) / col("y") * 100.0)
          .otherwise(lit(null).cast("double")), 6).as("abs_pct_err"))
      .orderBy("d")
  }

  /** DuckDB oracle for [[sesBacktest]] on events. */
  def sesOracleSql(alpha: Double = 0.3): String = {
    val b = 1.0 - alpha
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS DOUBLE) AS y
       |  FROM events GROUP BY 1),
       |t AS (
       |  SELECT d, y,
       |    CAST(ROW_NUMBER() OVER (ORDER BY d) AS DOUBLE) AS tt
       |  FROM daily),
       |lv AS (
       |  SELECT d, y, tt,
       |    pow($b, tt) * SUM(CASE WHEN tt = 1.0 THEN pow($b, -1.0)
       |      ELSE $alpha * pow($b, -tt) END * y) OVER (ORDER BY d
       |      ROWS UNBOUNDED PRECEDING) AS lvl
       |  FROM t),
       |f AS (
       |  SELECT d, y, lvl,
       |    LAG(lvl) OVER (ORDER BY d) AS fc
       |  FROM lv)
       |SELECT d, y,
       |  ROUND(lvl, 6) AS level,
       |  ROUND(fc, 6) AS forecast,
       |  ROUND(CASE WHEN fc IS NOT NULL AND y > 0
       |    THEN abs(y - fc) / y * 100.0 ELSE NULL END, 6)
       |    AS abs_pct_err
       |FROM f ORDER BY d""".stripMargin
  }
}
