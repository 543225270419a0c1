package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation over user lifetimes (Kaplan &
  * Meier, JASA 1958) — the censoring-aware retention curve: q121's
  * cohort retention counts users active at day k, but users whose
  * observation window ends while STILL ACTIVE are not churners, and
  * ignoring that right-censoring biases every lifetime statistic
  * downward. KM is the standard fix: at each observed lifetime t,
  * S(t) ← S(t−)·(1 − d_t/n_t) over the users still at risk.
  *
  * Scale shape: one grouped agg to per-user (first, last) lifetimes,
  * then ALL survival arithmetic happens on the lifetime-cardinality
  * risk table (≤ observation-window days) with ordered-frame windows
  * — same-partition, explicitly framed, NOT the stacked-unbounded
  * corruption shape. The corpus is touched exactly once. */
object Survival {

  /** KM curve `(t_days, n_risk, n_events, survival)` at every
    * lifetime with ≥ 1 uncensored end. A user is censored when their
    * last event falls within `horizonDays` of the corpus max date
    * (still active at the edge of observation). The terminal
    * all-remaining-users-exit point (d = n) pins S to 0 explicitly —
    * both engines would otherwise disagree on log(0). */
  def kaplanMeier(events: DataFrame, horizonDays: Int = 3): DataFrame = {
    val per = events.groupBy("user_id").agg(
      min(to_date(col("ts"))).as("__f"),
      max(to_date(col("ts"))).as("__l"))
    val mx = per.agg(max("__l").as("__mx"), count(lit(1)).as("__n"))
    val obs = per.crossJoin(broadcast(mx))   // 1-row stat factor
      .select(
        datediff(col("__l"), col("__f")).cast("double").as("t"),
        (datediff(col("__mx"), col("__l")) < horizonDays).as("__cens"),
        col("__n"))
    val tbl = obs.groupBy("t").agg(
      sum(when(!col("__cens"), 1L).otherwise(0L)).as("d"),
      count(lit(1)).as("__ended"),
      first("__n").as("__n"))
    val wBefore = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, 0)
    val withRisk = tbl
      .withColumn("n_risk",
        col("__n") - coalesce(sum("__ended").over(wBefore), lit(0L)))
      .where(col("d") > 0)
    val term = lit(1.0) - col("d").cast("double") / col("n_risk")
    withRisk
      .withColumn("__hit0", max(when(col("d") === col("n_risk"), 1)
        .otherwise(0)).over(wCum))
      .withColumn("survival",
        round(when(col("__hit0") === 1, lit(0.0))
          .otherwise(exp(sum(log(term)).over(wCum))), 6))
      .select(col("t").cast("bigint").as("t_days"),
        col("n_risk"), col("d").as("n_events"), col("survival"))
      .orderBy("t_days")
  }

  /** DuckDB oracle for [[kaplanMeier]] on events. */
  def kmOracleSql(horizonDays: Int = 3): String =
    s"""WITH per AS (
       |  SELECT user_id, MIN(CAST(ts AS DATE)) AS f,
       |    MAX(CAST(ts AS DATE)) AS l
       |  FROM events GROUP BY 1),
       |mx AS (SELECT MAX(l) AS m, COUNT(*) AS n FROM per),
       |obs AS (
       |  SELECT CAST(date_diff('day', f, l) AS DOUBLE) AS t,
       |    date_diff('day', l, (SELECT m FROM mx)) < $horizonDays
       |      AS cens
       |  FROM per),
       |tbl AS (
       |  SELECT t,
       |    SUM(CASE WHEN NOT cens THEN 1 ELSE 0 END) AS d,
       |    COUNT(*) AS ended
       |  FROM obs GROUP BY 1),
       |r AS (
       |  SELECT t, d,
       |    (SELECT n FROM mx) - COALESCE(SUM(ended) OVER (ORDER BY t
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS n_risk
       |  FROM tbl),
       |k AS (
       |  SELECT t, d, n_risk,
       |    MAX(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER (ORDER BY t
       |      ROWS UNBOUNDED PRECEDING) AS hit0,
       |    SUM(ln(1.0 - CAST(d AS DOUBLE) / n_risk)) OVER (ORDER BY t
       |      ROWS UNBOUNDED PRECEDING) AS lsum
       |  FROM r WHERE d > 0)
       |SELECT CAST(t AS BIGINT) AS t_days,
       |  CAST(n_risk AS BIGINT) AS n_risk,
       |  CAST(d AS BIGINT) AS n_events,
       |  ROUND(CASE WHEN hit0 = 1 THEN 0.0 ELSE exp(lsum) END, 6)
       |    AS survival
       |FROM k ORDER BY t_days""".stripMargin
}
