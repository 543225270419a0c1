package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Simpson's-paradox audit (Simpson, JRSS-B 1951; the aggregation
  * trap behind most "the dashboard says X but every segment says
  * not-X" incidents): compare a treated-vs-control rate difference in
  * the AGGREGATE against the same difference within every stratum,
  * and flag strata whose sign disagrees with the pooled readout. A
  * pooled effect that reverses in every stratum is a composition
  * artifact — acting on it targets the wrong lever.
  *
  * Scale shape: one per-unit aggregate, one stratum-cardinality rate
  * table (plus its 1-row pooled factor), scalar comparisons. */
object Simpsons {

  /** Per-stratum rows plus an 'ALL' pooled row:
    * `(stratum, n_treated, n_control, rate_treated, rate_control,
    * diff, agrees_with_pooled)` ordered with 'ALL' first (it sorts
    * before the stratum labels by construction). `agrees` compares
    * the SIGN of the stratum diff (at 6-decimal resolution) with the
    * pooled diff; the pooled row agrees with itself. */
  def audit(units: DataFrame, stratum: Column, treated: Column,
      converted: Column): DataFrame = {
    val u = units.select(stratum.cast("string").as("s"),
      treated.cast("boolean").as("t"),
      converted.cast("double").as("y"))
      .where(col("s").isNotNull && col("t").isNotNull)
    def rates(df: DataFrame, label: Column) = df
      .groupBy(label.as("stratum"))
      .agg(
        sum(when(col("t"), 1L).otherwise(0L)).as("n_treated"),
        sum(when(!col("t"), 1L).otherwise(0L)).as("n_control"),
        avg(when(col("t"), col("y"))).as("__rt"),
        avg(when(!col("t"), col("y"))).as("__rc"))
      .withColumn("rate_treated", round(col("__rt"), 6))
      .withColumn("rate_control", round(col("__rc"), 6))
      .withColumn("diff", round(col("__rt") - col("__rc"), 6))
    val per = rates(u, col("s"))
    val all = rates(u, lit("ALL"))
    val pooled = all.select(col("diff").as("__pd"))
    per.unionByName(all)
      .crossJoin(broadcast(pooled))   // 1-row stat factor
      .select(col("stratum"), col("n_treated"), col("n_control"),
        col("rate_treated"), col("rate_control"), col("diff"),
        (signum(coalesce(col("diff"), lit(0.0))) ===
          signum(coalesce(col("__pd"), lit(0.0))))
          .as("agrees_with_pooled"))
      .orderBy("stratum")
  }

  /** DuckDB oracle for the q344 registration: events units, strata by
    * fixed activity bands, treated = odd user_id, converted = any
    * purchase. */
  val auditOracleSql: String =
    """WITH pu AS (
      |  SELECT user_id, COUNT(*) AS n_ev,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END)
      |      AS y,
      |    user_id % 2 = 1 AS t
      |  FROM events GROUP BY 1),
      |su AS (
      |  SELECT CASE WHEN n_ev <= 62 THEN 'low'
      |    WHEN n_ev <= 70 THEN 'mid' ELSE 'high' END AS s, t, y
      |  FROM pu),
      |rates AS (
      |  SELECT s AS stratum,
      |    SUM(CASE WHEN t THEN 1 ELSE 0 END) AS n_treated,
      |    SUM(CASE WHEN NOT t THEN 1 ELSE 0 END) AS n_control,
      |    AVG(CASE WHEN t THEN y END) AS rt,
      |    AVG(CASE WHEN NOT t THEN y END) AS rc
      |  FROM su GROUP BY 1
      |  UNION ALL
      |  SELECT 'ALL',
      |    SUM(CASE WHEN t THEN 1 ELSE 0 END),
      |    SUM(CASE WHEN NOT t THEN 1 ELSE 0 END),
      |    AVG(CASE WHEN t THEN y END),
      |    AVG(CASE WHEN NOT t THEN y END)
      |  FROM su),
      |pooled AS (
      |  SELECT ROUND(rt - rc, 6) AS pd FROM rates
      |  WHERE stratum = 'ALL')
      |SELECT stratum, n_treated, n_control,
      |  ROUND(rt, 6) AS rate_treated, ROUND(rc, 6) AS rate_control,
      |  ROUND(rt - rc, 6) AS diff,
      |  SIGN(COALESCE(ROUND(rt - rc, 6), 0.0)) =
      |    SIGN(COALESCE(pooled.pd, 0.0)) AS agrees_with_pooled
      |FROM rates CROSS JOIN pooled
      |ORDER BY stratum""".stripMargin
}
