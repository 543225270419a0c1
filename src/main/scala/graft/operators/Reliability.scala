package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cronbach's alpha internal-consistency coefficient (Cronbach,
  * Psychometrika 1951): do the k "items" measure ONE underlying
  * trait? α = k/(k−1) · (1 − Σᵢ var(itemᵢ) / var(total)). Here the
  * items are per-user event-type counts and the trait is "overall
  * engagement" — α ≳ 0.7 says a single engagement score is a faithful
  * summary (the justification behind q69's composite user profiles);
  * a low α says the event types move independently and a composite
  * hides structure. The same readout a labeling pipeline runs over
  * annotator scores before averaging them.
  *
  * Exactness: the unit×item matrix is COUNTS — absent cells are true
  * zeros, and zeros contribute nothing to Σx/Σx², so the item
  * variances come from the observed (unit, item) aggregate alone
  * with n = |units|; no dense grid is ever materialized. All moments
  * are integer sums; only the final ratios are floating.
  *
  * Scale shape: one grouped count at |units × items| observed-cell
  * cardinality, one item-cardinality reduction, one per-unit total
  * variance pass. */
object Reliability {

  /** One row `(n_units, k_items, sum_item_var, total_var, alpha)`
    * over `df` with unit/item columns; item variances and the
    * total-score variance are sample (n−1) variances computed from
    * exact integer moments. α is NULL for k < 2 or zero total
    * variance. */
  def cronbachAlpha(df: DataFrame, unit: Column,
      item: Column): DataFrame =
    cronbachFromCells(df
      .where(unit.isNotNull && item.isNotNull)
      .groupBy(unit.as("u"), item.as("i"))
      .agg(count(lit(1)).as("c")))

  /** [[cronbachAlpha]] from a pre-aggregated `(u, i, c)` cell frame —
    * the entry point the STREAMING face re-aggregates into (cell
    * counts are additive across micro-batches, so the incremental
    * table replays to exactly this input and the batch oracle
    * applies verbatim). */
  def cronbachFromCells(cellsIn: DataFrame): DataFrame = {
    val cells = cellsIn
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nUnits = cells.select(countDistinct("u").as("n"))
    // per-item moments over the OBSERVED cells; absent = 0 adds
    // nothing to either sum, so n rides in from the unit count
    val perItem = cells.groupBy("i")
      .agg(sum("c").as("sx"),
        sum(col("c") * col("c")).as("sxx"))
      .crossJoin(broadcast(nUnits))   // 1-row stat factor
      .select(((col("sxx") - col("sx").cast("double") * col("sx") /
        col("n")) / (col("n") - 1.0)).as("v"))
      .agg(count(lit(1)).as("k"), sum("v").as("__sv"))
    val totals = cells.groupBy("u").agg(sum("c").as("t"))
      .agg(count(lit(1)).as("__nu"), sum("t").as("__st"),
        sum(col("t") * col("t")).as("__stt"))
    val one = perItem.crossJoin(totals)   // two 1-row stat factors
    val n = col("__nu").cast("double")
    val vt = (col("__stt") - col("__st").cast("double") *
      col("__st") / n) / (n - 1.0)
    val k = col("k").cast("double")
    val alpha = (k / (k - 1.0)) * (lit(1.0) - col("__sv") / vt)
    one.select(
      col("__nu").cast("bigint").as("n_units"),
      col("k").cast("bigint").as("k_items"),
      round(col("__sv"), 6).as("sum_item_var"),
      round(vt, 6).as("total_var"),
      round(when(col("k") >= 2 && vt > 0.0, alpha), 6).as("alpha"))
  }

  /** DuckDB oracle for [[cronbachAlpha]] on events
    * (unit = user_id, item = event_type). */
  val cronbachOracleSql: String =
    """WITH cells AS (
      |  SELECT user_id AS u, event_type AS i, COUNT(*) AS c
      |  FROM events
      |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
      |  GROUP BY 1, 2),
      |nu AS (SELECT COUNT(DISTINCT u) AS n FROM cells),
      |per_item AS (
      |  SELECT COUNT(*) AS k,
      |    SUM((sxx - CAST(sx AS DOUBLE) * sx / n) / (n - 1.0))
      |      AS sv
      |  FROM (
      |    SELECT i, SUM(c) AS sx, SUM(c * c) AS sxx
      |    FROM cells GROUP BY 1) CROSS JOIN nu),
      |totals AS (
      |  SELECT COUNT(*) AS nu2, SUM(t) AS st,
      |    SUM(t * t) AS stt
      |  FROM (SELECT u, SUM(c) AS t FROM cells GROUP BY 1)),
      |f AS (
      |  SELECT per_item.*, totals.*,
      |    CAST(nu2 AS DOUBLE) AS n,
      |    (stt - CAST(st AS DOUBLE) * st / CAST(nu2 AS DOUBLE)) /
      |      (CAST(nu2 AS DOUBLE) - 1.0) AS vt
      |  FROM per_item CROSS JOIN totals)
      |SELECT CAST(nu2 AS BIGINT) AS n_units,
      |  CAST(k AS BIGINT) AS k_items,
      |  ROUND(sv, 6) AS sum_item_var,
      |  ROUND(vt, 6) AS total_var,
      |  ROUND(CASE WHEN k >= 2 AND vt > 0
      |    THEN (CAST(k AS DOUBLE) / (k - 1.0)) * (1.0 - sv / vt)
      |    END, 6) AS alpha
      |FROM f""".stripMargin
}
