package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordinal-by-ordinal association: Goodman–Kruskal γ, Somers' D and
  * Goodman–Kruskal λ over a k×m contingency table (Goodman &
  * Kruskal, JASA 1954; Somers, ASR 1962). Pearson correlation
  * assumes interval scales and χ² ignores order entirely; these are
  * the measures for "does HIGHER priority come with HIGHER spend"
  * when both sides are ordered categories — γ from concordant vs
  * discordant pairs ignoring all ties, Somers' d_yx penalizing ties
  * on the dependent side, λ as the proportional-reduction-in-error
  * of predicting Y from X (order-free, reported as the contrast).
  *
  * Scale shape: ONE corpus pass builds the k×m contingency (one
  * shuffle at category-pair cardinality, tiny); the concordance
  * sums are a self-join OF THE CONTINGENCY TABLE (k·m × k·m cells,
  * e.g. 25×25 — a deliberate broadcast nested-loop over a
  * postcard), never a pair join over rows. Pair counts are exact
  * longs (C, D ≤ n²/2 ≈ 1.1e10 at bench scale — well inside
  * int64). */
object Ordinal {

  /** One row `(n, c_pairs, d_pairs, gamma, somers_d, lambda)` for
    * ordinal levels `x` and `y` (both integer-coded, small
    * cardinality). */
  def ordinalAssociation(df: DataFrame, x: Column, y: Column)
      : DataFrame = {
    val cells = df.select(x.cast("int").as("__x"),
        y.cast("int").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
      .groupBy("__x", "__y").agg(count(lit(1)).as("__n"))
    val c2 = cells.select(col("__x").as("__x2"),
      col("__y").as("__y2"), col("__n").as("__n2"))
    // concordant / discordant pair sums over the cell grid — each
    // unordered pair counted once via the strict i'<i ordering
    val pairs = cells.join(broadcast(c2),
        col("__x2") > col("__x"), "inner")
      .agg(
        sum(when(col("__y2") > col("__y"),
          col("__n") * col("__n2")).otherwise(0L)).as("__c"),
        sum(when(col("__y2") < col("__y"),
          col("__n") * col("__n2")).otherwise(0L)).as("__d"))
    val margins = cells.agg(sum("__n").as("__nn"))
    val xm = cells.groupBy("__x").agg(sum("__n").as("__nx"))
      .agg(sum(col("__nx") * (col("__nx") - 1L) / 2L).as("__tx"))
    val ym = cells.groupBy("__y").agg(sum("__n").as("__ny"))
      .agg(sum(col("__ny") * (col("__ny") - 1L) / 2L).as("__ty"),
        max("__ny").as("__maxy"))
    // λ_Y|X: within-row modes vs the global Y mode
    val rowModes = cells.groupBy("__x").agg(max("__n").as("__mx"))
      .agg(sum("__mx").as("__summx"))
    val j = pairs
      .crossJoin(broadcast(margins))   // 1-row stat factors
      .crossJoin(broadcast(xm))
      .crossJoin(broadcast(ym))
      .crossJoin(broadcast(rowModes))
    val cD = col("__c").cast("double")
    val dD = col("__d").cast("double")
    val nD = col("__nn").cast("double")
    val totalPairs = nD * (nD - 1.0) / 2.0
    j.select(
      col("__nn").cast("bigint").as("n"),
      col("__c").cast("bigint").as("c_pairs"),
      col("__d").cast("bigint").as("d_pairs"),
      round((cD - dD) / (cD + dD), 6).as("gamma"),
      round((cD - dD) / (totalPairs - col("__tx").cast("double")), 6)
        .as("somers_d"),
      round((col("__summx") - col("__maxy")).cast("double") /
        (nD - col("__maxy").cast("double")), 6).as("lambda"))
  }

  /** The q408 registration: order priority rank (1-URGENT … 5-LOW,
    * REVERSED so level 5 = most urgent and a positive γ reads
    * "urgency travels with spend") against fixed total-price bands
    * (100k steps — fixed cutoffs, no computed quantile to diverge
    * between engines). */
  def priceUrgencyAssociation(orders: DataFrame): DataFrame =
    ordinalAssociation(orders,
      lit(6) - substring(col("o_orderpriority"), 1, 1).cast("int"),
      least(floor(col("o_totalprice") / 100000.0).cast("int"), lit(4)))

  /** DuckDB oracle for [[priceUrgencyAssociation]]. */
  val ordinalAssocOracleSql: String =
    """WITH cells AS (
      |  SELECT 6 - CAST(substr(o_orderpriority, 1, 1) AS INT) AS x,
      |    LEAST(CAST(FLOOR(o_totalprice / 100000.0) AS INT), 4) AS y,
      |    COUNT(*) AS n
      |  FROM orders GROUP BY 1, 2),
      |p AS (
      |  SELECT
      |    SUM(CASE WHEN b.y > a.y THEN a.n * b.n ELSE 0 END) AS c,
      |    SUM(CASE WHEN b.y < a.y THEN a.n * b.n ELSE 0 END) AS d
      |  FROM cells a JOIN cells b ON b.x > a.x),
      |tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS nn FROM cells),
      |tx AS (
      |  SELECT SUM(nx * (nx - 1) / 2) AS t FROM (
      |    SELECT SUM(n) AS nx FROM cells GROUP BY x)),
      |ym AS (
      |  SELECT MAX(ny) AS maxy FROM (
      |    SELECT SUM(n) AS ny FROM cells GROUP BY y)),
      |rm AS (
      |  SELECT SUM(mx) AS summx FROM (
      |    SELECT MAX(n) AS mx FROM cells GROUP BY x))
      |SELECT CAST(tot.nn AS BIGINT) AS n,
      |  CAST(p.c AS BIGINT) AS c_pairs,
      |  CAST(p.d AS BIGINT) AS d_pairs,
      |  ROUND((p.c - p.d) / CAST(p.c + p.d AS DOUBLE), 6) AS gamma,
      |  ROUND((p.c - p.d) /
      |    (tot.nn * (tot.nn - 1.0) / 2.0 - tx.t), 6) AS somers_d,
      |  ROUND((rm.summx - ym.maxy) / (tot.nn - ym.maxy), 6) AS lambda
      |FROM p, tot, tx, ym, rm""".stripMargin
}
