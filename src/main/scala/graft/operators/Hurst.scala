package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rescaled-range Hurst exponent (Hurst 1951; Mandelbrot & Wallis
  * 1969) — the long-memory diagnostic the ACF/PACF pair (q213/q314)
  * can't give: split the daily series into blocks of size s, compute
  * each block's R/S (range of cumulative mean-deviations over the
  * block's σ), and read H as the slope of ln E[R/S] against ln s.
  * H ≈ 0.5 is a random walk (forecast with [[Forecast]]'s SES and
  * stop), H → 1 is persistent trending (Holt's trend term earns its
  * keep), H < 0.5 is mean-reverting (yesterday's spike argues for a
  * dip — the capacity-planning regime).
  *
  * Scale shape: the corpus collapses to the calendar in one grouped
  * agg; every window after that partitions by (block) over
  * calendar-sized rows; the fit is a |sizes|-row moment reduction. */
object Hurst {

  /** `(s, n_blocks, mean_rs, hurst)` per block size, ordered by s,
    * with the shared ln-ln OLS slope repeated per row (the Friedman
    * convention). Only COMPLETE blocks with σ > 0 contribute. */
  def rescaledRange(orders: DataFrame,
      sizes: Seq[Int] = Seq(8, 16, 32, 64)): DataFrame = {
    require(sizes.forall(_ >= 2), "block sizes must be >= 2")
    val daily = orders
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(col("o_totalprice").cast("double")).as("x"))
    val d0 = daily.agg(min("d").as("__d0"))
    val t = daily.crossJoin(broadcast(d0))   // 1-row stat factor
      .select(datediff(col("d"), col("__d0")).cast("long").as("t"),
        col("x"))
    val bySize = t.withColumn("s", explode(lit(sizes.toArray)))
      .withColumn("blk", floor(col("t") / col("s")))
    val wBlk = Window.partitionBy("s", "blk")
    val wCum = wBlk.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, 0)
    val rs = bySize
      .withColumn("__n", count(lit(1)).over(wBlk))
      .where(col("__n") === col("s"))   // complete blocks only
      .withColumn("__mu", avg("x").over(wBlk))
      .withColumn("__cum", sum(col("x") - col("__mu")).over(wCum))
      .groupBy("s", "blk")
      .agg((max("__cum") - min("__cum")).as("__r"),
        stddev_pop(col("x")).as("__sd"))
      .where(col("__sd") > 0.0)
      .groupBy("s")
      .agg(count(lit(1)).as("n_blocks"),
        avg(col("__r") / col("__sd")).as("__rs"))
    // |sizes|-row fit: H = cov(ln s, ln rs)/var(ln s)
    val fit = rs.agg(
      (covar_pop(log(col("s")), log(col("__rs"))) /
        var_pop(log(col("s")))).as("__h"))
    rs.crossJoin(broadcast(fit))   // 1-row stat factor
      .select(col("s").cast("bigint").as("s"), col("n_blocks"),
        round(col("__rs"), 6).as("mean_rs"),
        round(col("__h"), 6).as("hurst"))
      .orderBy("s")
  }

  /** DuckDB oracle for [[rescaledRange]] (default sizes). */
  val rescaledRangeOracleSql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    SUM(CAST(o_totalprice AS DOUBLE)) AS x
      |  FROM orders GROUP BY 1),
      |t AS (
      |  SELECT CAST(d - (SELECT MIN(d) FROM daily) AS BIGINT) AS t, x
      |  FROM daily),
      |by_size AS (
      |  SELECT s, t.t, t.x, CAST(FLOOR(t.t / s) AS BIGINT) AS blk
      |  FROM t CROSS JOIN (SELECT UNNEST([8, 16, 32, 64]) AS s)),
      |complete AS (
      |  SELECT * FROM (
      |    SELECT *, COUNT(*) OVER (PARTITION BY s, blk) AS n
      |    FROM by_size) WHERE n = s),
      |cum AS (
      |  SELECT s, blk, x,
      |    SUM(x - mu) OVER (PARTITION BY s, blk ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      |  FROM (SELECT *, AVG(x) OVER (PARTITION BY s, blk) AS mu
      |    FROM complete)),
      |rs AS (
      |  SELECT s, blk, MAX(c) - MIN(c) AS r, STDDEV_POP(x) AS sd
      |  FROM cum GROUP BY 1, 2),
      |per_s AS (
      |  SELECT s, COUNT(*) AS n_blocks, AVG(r / sd) AS rs
      |  FROM rs WHERE sd > 0 GROUP BY 1),
      |fit AS (
      |  SELECT COVAR_POP(LN(s), LN(rs)) / VAR_POP(LN(s)) AS h
      |  FROM per_s)
      |SELECT CAST(s AS BIGINT) AS s, n_blocks,
      |  ROUND(rs, 6) AS mean_rs, ROUND(fit.h, 6) AS hurst
      |FROM per_s CROSS JOIN fit ORDER BY s""".stripMargin
}
