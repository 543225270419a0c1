package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Jarque–Bera normality test (Jarque & Bera, Economics Letters
  * 1980): JB = n/6 · (S² + (K−3)²/4) from the sample skewness S and
  * kurtosis K — the moment-based normality check that gates every
  * "±1.96σ" readout this engine emits (control charts, Welch
  * intervals, z-scored anomaly flags assume the tails are roughly
  * Gaussian; JB is the one-row audit that says whether they are).
  * Asymptotically χ²(2) under normality; sig_95 against 5.991465.
  *
  * Scale shape: ONE aggregate pass collecting Σx..Σx⁴ (map-side
  * combined), central moments by the standard raw-moment expansion —
  * no second scan, no sort. One row
  * `(n, mean, skewness, kurtosis, jb, sig_95)`. */
object Normality {

  def jarqueBera(df: DataFrame, metric: Column): DataFrame = {
    val g = df.select(metric.cast("double").as("x"))
      .where(col("x").isNotNull)
      .agg(count(lit(1)).as("n"), sum("x").as("__s1"),
        sum(col("x") * col("x")).as("__s2"),
        sum(col("x") * col("x") * col("x")).as("__s3"),
        sum(col("x") * col("x") * col("x") * col("x")).as("__s4"))
    val n = col("n").cast("double")
    val mu = col("__s1") / n
    // central moments via the raw-moment expansion, one pass
    val m2 = col("__s2") / n - mu * mu
    val m3 = col("__s3") / n - mu * (col("__s2") / n) * 3.0 +
      mu * mu * mu * 2.0
    val m4 = col("__s4") / n - mu * (col("__s3") / n) * 4.0 +
      mu * mu * (col("__s2") / n) * 6.0 - mu * mu * mu * mu * 3.0
    val skew = m3 / pow(m2, 1.5)
    val kurt = m4 / (m2 * m2)
    val jb = n / 6.0 * (skew * skew +
      (kurt - 3.0) * (kurt - 3.0) / 4.0)
    g.select(
      col("n"),
      round(mu, 6).as("mean"),
      round(when(m2 > 0.0, skew), 6).as("skewness"),
      round(when(m2 > 0.0, kurt), 6).as("kurtosis"),
      round(when(m2 > 0.0, jb), 6).as("jb"),
      when(m2 > 0.0, jb > 5.991465).otherwise(lit(false))
        .as("sig_95"))
  }

  /** DuckDB oracle for [[jarqueBera]] on a named table/metric. */
  def jarqueBeraOracleSql(table: String, metric: String): String =
    s"""WITH g AS (
       |  SELECT COUNT(*) AS n, SUM(x) AS s1, SUM(x * x) AS s2,
       |    SUM(x * x * x) AS s3, SUM(x * x * x * x) AS s4
       |  FROM (SELECT CAST($metric AS DOUBLE) AS x FROM $table
       |        WHERE $metric IS NOT NULL)),
       |f AS (
       |  SELECT CAST(n AS BIGINT) AS n, CAST(n AS DOUBLE) AS nd,
       |    s1, s2, s3, s4, s1 / n AS mu
       |  FROM g),
       |m AS (
       |  SELECT n, nd, mu,
       |    s2 / nd - mu * mu AS m2,
       |    s3 / nd - mu * (s2 / nd) * 3.0 + mu * mu * mu * 2.0
       |      AS m3,
       |    s4 / nd - mu * (s3 / nd) * 4.0 +
       |      mu * mu * (s2 / nd) * 6.0 - mu * mu * mu * mu * 3.0
       |      AS m4
       |  FROM f),
       |s AS (
       |  SELECT n, mu, m2,
       |    m3 / POW(m2, 1.5) AS skew,
       |    m4 / (m2 * m2) AS kurt
       |  FROM m),
       |j AS (
       |  SELECT *, CAST(n AS DOUBLE) / 6.0 * (skew * skew +
       |    (kurt - 3.0) * (kurt - 3.0) / 4.0) AS jb
       |  FROM s)
       |SELECT n, ROUND(mu, 6) AS mean,
       |  ROUND(CASE WHEN m2 > 0 THEN skew END, 6) AS skewness,
       |  ROUND(CASE WHEN m2 > 0 THEN kurt END, 6) AS kurtosis,
       |  ROUND(CASE WHEN m2 > 0 THEN jb END, 6) AS jb,
       |  CASE WHEN m2 > 0 THEN jb > 5.991465 ELSE FALSE END
       |    AS sig_95
       |FROM j""".stripMargin
}
