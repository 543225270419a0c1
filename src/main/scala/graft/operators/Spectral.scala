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

  /** One-row whole-spectrum verdict over the [[periodogram]] grid:
    * is the series' periodic energy CONCENTRATED (one dominant cycle
    * — schedule a seasonal baseline) or FLAT (no cycle worth
    * modeling)? `spectral_entropy` is the Shannon entropy of the
    * normalized power distribution over periods, scaled to [0,1] by
    * ln(K); `flatness` is the Wiener geometric-mean/arithmetic-mean
    * ratio (1 = white, →0 = tonal). Both are computed from the
    * 6-ROUNDED `power_share` column, so the two engines reduce
    * identical inputs — parity by construction (the CKA rule).
    * Output: `(n_periods, dominant_period, dominant_share,
    * spectral_entropy, flatness)`; zero-power rows carry no entropy
    * and are excluded from the geometric mean (standard convention).
    * Scale shape: the periodogram's grouped agg, then arithmetic on
    * a K-row frame. */
  def spectralSummary(events: DataFrame, minP: Int = 2,
      maxP: Int = 14): DataFrame = {
    val pg = periodogram(events, minP, maxP)
      .select(col("period"), col("power_share").as("p"))
    val tot = pg.agg(sum("p").as("__tot"),
      count(lit(1)).cast("double").as("__k"),
      max(struct(col("p"), col("period"))).as("__dom"))
    pg.crossJoin(broadcast(tot))   // 1-row stat factor
      .withColumn("__q", col("p") / col("__tot"))
      .agg(
        first("__k").cast("bigint").as("n_periods"),
        first(col("__dom.period")).as("dominant_period"),
        round(first(col("__dom.p")) / first("__tot"), 6)
          .as("dominant_share"),
        round(-sum(when(col("__q") > 0.0,
          col("__q") * log(col("__q"))).otherwise(0.0)) /
          log(first("__k")), 6).as("spectral_entropy"),
        round(
          exp(avg(when(col("p") > 0.0, log(col("p"))))) /
            avg(when(col("p") > 0.0, col("p"))), 6).as("flatness"))
  }

  /** DuckDB oracle for [[spectralSummary]] (defaults) — the
    * periodogram oracle as a CTE, then the same K-row arithmetic. */
  def spectralSummaryOracleSql(minP: Int = 2, maxP: Int = 14): String =
    s"""WITH pg AS (${periodogramOracleSql(minP, maxP)}),
       |p AS (SELECT period, power_share AS p FROM pg),
       |tot AS (
       |  SELECT SUM(p) AS tot, CAST(COUNT(*) AS DOUBLE) AS k FROM p),
       |dom AS (
       |  SELECT period AS dom_period, p AS dom_p FROM p
       |  ORDER BY p DESC, period DESC LIMIT 1)
       |SELECT CAST(tot.k AS BIGINT) AS n_periods,
       |  dom.dom_period AS dominant_period,
       |  ROUND(dom.dom_p / tot.tot, 6) AS dominant_share,
       |  ROUND(-SUM(CASE WHEN p.p / tot.tot > 0
       |    THEN (p.p / tot.tot) * LN(p.p / tot.tot) ELSE 0 END) /
       |    LN(tot.k), 6) AS spectral_entropy,
       |  ROUND(EXP(AVG(CASE WHEN p.p > 0 THEN LN(p.p) END)) /
       |    AVG(CASE WHEN p.p > 0 THEN p.p END), 6) AS flatness
       |FROM p CROSS JOIN tot CROSS JOIN dom
       |GROUP BY tot.k, dom.dom_period, dom.dom_p, tot.tot""".stripMargin
}
