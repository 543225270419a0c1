package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) — the multi-criteria selection
  * operator (Börzsönyi/Kossmann/Stocker, "The Skyline Operator",
  * ICDE 2001) Spark has no built-in for: keep exactly the rows no
  * other row strictly dominates (≥ on the maximized dimension, ≤ on
  * the minimized one, strict somewhere). The curation use is "best
  * documents per cost": the quality-vs-length frontier is what a
  * token-budgeted corpus fill actually wants to rank against; the
  * analytics use is the value-vs-effort customer frontier.
  *
  * The naive formulation is the quadratic NOT-EXISTS self-join. In
  * 2-D the frontier collapses to ORDER STATISTICS: a point is on the
  * frontier iff its min-dim value beats the best (smallest) min-dim
  * value among all STRICTLY higher max-dim points. The engine
  * evaluates that in two passes so no corpus-wide single-task window
  * ever runs (the [[Concentration]] lesson):
  *
  *  1. GRID PRUNE — bucket the maximize dim into B=1024 fixed-width
  *     cells (1-row min/max stat factor), take each cell's min of the
  *     minimized dim (one distributed grouped agg), running
  *     strict-prefix min over the B-row cell table (bounded window).
  *     Any row already beaten by a strictly-higher CELL's min is
  *     dominated by a real point in that cell (cell index strictly
  *     higher ⟹ max-dim strictly higher) — discard. Survivors are a
  *     superset of the frontier, typically O(frontier) sized.
  *  2. EXACT — the level-table strict-prefix-min window over the
  *     SURVIVORS only (one row per distinct level), which is now a
  *     pruned, near-frontier-sized frame, not the corpus.
  *
  * Ties (equal on both dims) are mutually non-dominating and all
  * kept. Degenerate worst case (all rows share one cell — a constant
  * maximize dim) falls back to the exact pass over that one level
  * table, which is then a single-level grouped agg, still not
  * quadratic.
  */
object Skyline {

  private val Cells = 1024

  /** Rows of `df` on the (maximize `maxCol`, minimize `minCol`)
    * frontier. Both columns must be non-null. */
  def frontier2d(df: DataFrame, maxCol: Column, minCol: Column): DataFrame = {
    val tagged = df
      .withColumn("__hi", maxCol.cast("double"))
      .withColumn("__lo", minCol.cast("double"))
    // -- pass 1: fixed-width grid prune --------------------------------
    val span = tagged.agg(min("__hi").as("__h0"), max("__hi").as("__h1"))
    val celled = tagged.crossJoin(broadcast(span))   // 1-row stat factor
      .withColumn("__cell",
        when(col("__h1") > col("__h0"),
          least(floor((col("__hi") - col("__h0")) /
            (col("__h1") - col("__h0")) * Cells), lit(Cells - 1L)))
          .otherwise(lit(0L)))
    val cellMin = celled.groupBy("__cell").agg(min("__lo").as("__cmin"))
    val wCell = Window.orderBy(desc("__cell"))
      .rowsBetween(Window.unboundedPreceding, -1)   // ≤1024 rows
    val cellBest = cellMin
      .withColumn("__cell_above", min("__cmin").over(wCell))
      .select("__cell", "__cell_above")
    val survivors = celled
      .join(broadcast(cellBest), Seq("__cell"))
      .where(col("__cell_above").isNull ||
        col("__lo") < col("__cell_above"))
    // -- pass 2: exact strict-prefix-min over survivor levels ----------
    val levels = survivors.groupBy("__hi").agg(min("__lo").as("__lvl_lo"))
    val w = Window.orderBy(desc("__hi"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontierLevels = levels
      .withColumn("__best_above", min("__lvl_lo").over(w))
      .where(col("__best_above").isNull ||
        col("__lvl_lo") < col("__best_above"))
      .select(col("__hi").as("__f_hi"), col("__lvl_lo").as("__f_lo"))
    // no broadcast hint: frontier size is data-dependent (an
    // anti-correlated worst case puts everything on it) — AQE picks
    survivors
      .join(frontierLevels,
        col("__hi") === col("__f_hi") && col("__lo") === col("__f_lo"))
      .select(df.columns.map(col): _*)
  }

  /** Customer value-vs-effort frontier: maximize lifetime revenue,
    * minimize order count — `(c_custkey, revenue, n_orders)` for the
    * non-dominated customers, ordered by revenue desc then key.
    * Revenue is rounded to cents BEFORE the frontier test so the
    * dominance comparisons are FP-stable across engines. */
  def customerFrontier(orders: DataFrame): DataFrame = {
    val per = orders.groupBy(col("o_custkey").as("c_custkey"))
      .agg(round(sum("o_totalprice"), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
    frontier2d(per, col("revenue"), col("n_orders"))
      .orderBy(desc("revenue"), asc("c_custkey"))
  }

  /** DuckDB oracle for [[customerFrontier]] — the same level-table
    * window formulation (identical tie semantics by construction). */
  val customerFrontierOracleSql: String =
    """WITH per AS (
      |  SELECT o_custkey AS c_custkey,
      |    ROUND(SUM(o_totalprice), 2) AS revenue,
      |    COUNT(*) AS n_orders
      |  FROM orders GROUP BY 1),
      |lv AS (
      |  SELECT revenue, MIN(n_orders) AS lvl_lo
      |  FROM per GROUP BY 1),
      |fr AS (
      |  SELECT revenue, lvl_lo,
      |    MIN(lvl_lo) OVER (ORDER BY revenue DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS best_above
      |  FROM lv)
      |SELECT p.c_custkey, p.revenue, CAST(p.n_orders AS BIGINT) AS n_orders
      |FROM per p
      |JOIN fr ON p.revenue = fr.revenue AND p.n_orders = fr.lvl_lo
      |WHERE fr.best_above IS NULL OR fr.lvl_lo < fr.best_above
      |ORDER BY p.revenue DESC, p.c_custkey""".stripMargin
}
