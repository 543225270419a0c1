package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Periodogram scan of the daily revenue series (Schuster 1898; the
  * classical DFT-power view of [[graft.operators.Anomaly]]'s ACF-side
  * seasonality checks): for each candidate period p the normalized
  * spectral amplitude r(p) = √(C² + S²) / (n·σ̂), with C/S the
  * cos/sin-projections of the CENTERED series at frequency 2π/p.
  * r ≈ 1 means the series is a pure sinusoid at that period; the
  * argmax is the dominant cycle the seasonal operators
  * ([[Forecast.seasonalHolt]], q231's decomposition) should be
  * configured with — this query is how that period is DISCOVERED
  * rather than assumed.
  *
  * Scale shape: one shuffle to the day table, then an explode over
  * the |periods|-sized literal grid (a map-side constant, not a
  * join) and one grouped agg of day×period rows. The phase argument
  * uses (t mod p) with t the epoch-day integer, so both engines feed
  * trig the same small exact doubles. */
object Spectral {

  /** `(period, amplitude_ratio, power_share)` for day periods
    * `minP..maxP`: r(p) as above, and the share of total series
    * variance the single frequency explains, (C²+S²)/(n²σ̂²) —
    * ordered by period. */
  def periodogram(events: DataFrame, minP: Int = 2,
      maxP: Int = 14): DataFrame = {
    require(minP >= 2 && maxP >= minP, "need 2 <= minP <= maxP")
    val daily = events
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum("value").as("x"))
      .withColumn("__t",
        datediff(col("d"), lit(java.sql.Date.valueOf("1970-01-01")))
          .cast("double"))
    val stats = daily.agg(avg("x").as("__mu"),
      stddev_pop(col("x")).as("__sd"),
      count(lit(1)).cast("double").as("__n"))
    val twoPi = 2.0 * math.Pi
    daily.crossJoin(broadcast(stats))   // 1-row stat factor
      .withColumn("period",
        explode(lit((minP to maxP).toArray)))
      .withColumn("__ang",
        lit(twoPi) * pmod(col("__t"), col("period").cast("double")) /
          col("period").cast("double"))
      .groupBy("period")
      .agg(
        sum((col("x") - col("__mu")) * cos(col("__ang"))).as("__c"),
        sum((col("x") - col("__mu")) * sin(col("__ang"))).as("__s"),
        first(col("__n")).as("__n"), first(col("__sd")).as("__sd"))
      .select(col("period"),
        round(sqrt(col("__c") * col("__c") + col("__s") * col("__s")) /
          (col("__n") * col("__sd")), 6).as("amplitude_ratio"),
        round((col("__c") * col("__c") + col("__s") * col("__s")) /
          (col("__n") * col("__n") * col("__sd") * col("__sd")), 6)
          .as("power_share"))
      .orderBy("period")
  }

  /** DuckDB oracle for [[periodogram]] (defaults). The 2π literal is
    * interpolated from the SAME Scala double so both engines use a
    * bit-identical constant. */
  def periodogramOracleSql(minP: Int = 2, maxP: Int = 14): String = {
    val twoPi = 2.0 * math.Pi
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS d, SUM(value) AS x
       |  FROM events GROUP BY 1),
       |t AS (
       |  SELECT x,
       |    CAST(d - DATE '1970-01-01' AS DOUBLE) AS tt
       |  FROM daily),
       |st AS (SELECT AVG(x) AS mu, stddev_pop(x) AS sd,
       |  CAST(COUNT(*) AS DOUBLE) AS n FROM t),
       |g AS (
       |  SELECT x, tt, mu, sd, n, unnest(range($minP, ${maxP + 1}))
       |    AS period
       |  FROM t, st),
       |agg AS (
       |  SELECT period,
       |    SUM((x - mu) * cos($twoPi * (tt % period) / period)) AS c,
       |    SUM((x - mu) * sin($twoPi * (tt % period) / period)) AS s,
       |    ANY_VALUE(n) AS n, ANY_VALUE(sd) AS sd
       |  FROM g GROUP BY 1)
       |SELECT CAST(period AS INTEGER) AS period,
       |  ROUND(sqrt(c * c + s * s) / (n * sd), 6) AS amplitude_ratio,
       |  ROUND((c * c + s * s) / (n * n * sd * sd), 6) AS power_share
       |FROM agg ORDER BY period""".stripMargin
  }
}
