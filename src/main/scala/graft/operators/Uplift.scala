package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Uplift (incremental-response) evaluation — the Qini curve
  * (Radcliffe, "Using control groups to target on predicted lift",
  * Direct Marketing Journal 2007): given a targeting score, a
  * treatment flag, and an outcome, how much INCREMENTAL conversion
  * does targeting the top-scored slice buy over the randomized
  * control? This is the readout that separates "the model finds
  * converters" (plain AUC) from "the model finds people the
  * treatment actually moves" — the only question an intervention
  * budget cares about.
  *
  * The curve is computed at every distinct score threshold ("treat
  * everyone scoring ≥ s"), not at row-level ntiles: thresholds are
  * the deployable policies, and the distinct-score table keeps every
  * window SCORE-cardinality-bounded — at 100 TB the cumulative pass
  * runs over thousands of rows, not billions (the q274
  * value-histogram discipline).
  */
object Uplift {

  /** Qini curve over per-user rows `(score, treated, converted)`:
    * one row per distinct score threshold, descending-score
    * cumulative counts, with
    * `uplift = conv_t/n_t − conv_c/n_c` (rate difference among the
    * targeted) and `qini = conv_t − conv_c·(n_t/n_c)` (incremental
    * conversions, control scaled to the treated population). NULL
    * guards when a side is empty at the threshold. */
  def qiniCurve(perUnit: DataFrame, score: Column, treated: Column,
      converted: Column): DataFrame = {
    val u = perUnit.select(score.cast("double").as("s"),
      treated.cast("boolean").as("t"),
      converted.cast("long").as("y"))
      .where(col("s").isNotNull && col("t").isNotNull)
    val perScore = u.groupBy("s").agg(
      sum(when(col("t"), 1L).otherwise(0L)).as("bt"),
      sum(when(!col("t"), 1L).otherwise(0L)).as("bc"),
      sum(when(col("t"), col("y")).otherwise(0L)).as("byt"),
      sum(when(!col("t"), col("y")).otherwise(0L)).as("byc"))
    // score-cardinality frame: the single-partition window is bounded
    val w = Window.orderBy(desc("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perScore
      .select(col("s").as("score_ge"),
        sum("bt").over(w).as("n_t"), sum("bc").over(w).as("n_c"),
        sum("byt").over(w).as("conv_t"),
        sum("byc").over(w).as("conv_c"))
      .select(col("score_ge"), col("n_t"), col("n_c"),
        col("conv_t"), col("conv_c"),
        round(when(col("n_t") > 0 && col("n_c") > 0,
          col("conv_t").cast("double") / col("n_t") -
            col("conv_c").cast("double") / col("n_c")), 6).as("uplift"),
        round(when(col("n_c") > 0,
          col("conv_t").cast("double") - col("conv_c").cast("double") *
            col("n_t") / col("n_c")), 6).as("qini"))
      .orderBy(desc("score_ge"))
  }

  /** The q328 fixture: users from events — score = pre-purchase
    * engagement (view+click count), treated = odd user_id (the
    * synthetic holdout), converted = any purchase. */
  def qiniFromEvents(events: DataFrame): DataFrame = {
    val perUser = events.groupBy("user_id").agg(
      sum(when(col("event_type").isin("view", "click"), 1L)
        .otherwise(0L)).as("score"),
      max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("converted"))
      .withColumn("treated", col("user_id") % 2 === 1)
    qiniCurve(perUser, col("score"), col("treated"), col("converted"))
  }

  /** DuckDB oracle for [[qiniFromEvents]]. */
  val qiniOracleSql: String =
    """WITH per_user AS (
      |  SELECT user_id,
      |    SUM(CASE WHEN event_type IN ('view', 'click')
      |      THEN 1 ELSE 0 END) AS score,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS y,
      |    user_id % 2 = 1 AS t
      |  FROM events GROUP BY 1),
      |per_score AS (
      |  SELECT CAST(score AS DOUBLE) AS s,
      |    SUM(CASE WHEN t THEN 1 ELSE 0 END) AS bt,
      |    SUM(CASE WHEN NOT t THEN 1 ELSE 0 END) AS bc,
      |    SUM(CASE WHEN t THEN y ELSE 0 END) AS byt,
      |    SUM(CASE WHEN NOT t THEN y ELSE 0 END) AS byc
      |  FROM per_user GROUP BY 1),
      |cum AS (
      |  SELECT s AS score_ge,
      |    SUM(bt) OVER w AS n_t, SUM(bc) OVER w AS n_c,
      |    SUM(byt) OVER w AS conv_t, SUM(byc) OVER w AS conv_c
      |  FROM per_score
      |  WINDOW w AS (ORDER BY s DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT score_ge, n_t, n_c, conv_t, conv_c,
      |  ROUND(CASE WHEN n_t > 0 AND n_c > 0 THEN
      |    CAST(conv_t AS DOUBLE) / n_t - CAST(conv_c AS DOUBLE) / n_c
      |    END, 6) AS uplift,
      |  ROUND(CASE WHEN n_c > 0 THEN
      |    CAST(conv_t AS DOUBLE) - CAST(conv_c AS DOUBLE) * n_t / n_c
      |    END, 6) AS qini
      |FROM cum ORDER BY score_ge DESC""".stripMargin
}
