package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fisher's exact test for a 2×2 contingency table (Fisher 1935) —
  * the small-cell regime where the χ² approximation (q286/q346/q351)
  * is invalid: exact hypergeometric tail probabilities, two-sided by
  * the standard minimum-likelihood rule (sum every table whose point
  * probability ≤ the observed one, with the 1+1e-7 slack R uses).
  *
  * No lgamma in either engine's SQL surface, so the pmf is built from
  * the LOG-RATIO RECURRENCE p(k+1)/p(k) = (r1−k)(c1−k) /
  * ((k+1)(r2−c1+k+1)): cumulative-sum the log ratios over the support,
  * stabilize by the max (log-sum-exp), normalize — identical
  * elementary operations on both sides, no factorial ever
  * materialized.
  *
  * Scale shape: one corpus aggregate produces the four cells; the
  * support spine `k ∈ [max(0, c1−r2), min(r1, c1)]` is generated from
  * that 1-row frame and is bounded by the SMALLER MARGIN — the test's
  * own applicability regime (exact tests are for tables with a small
  * margin; a billion-row margin belongs to χ²/G-test territory and
  * costs a billion-row spine here, deliberately). */
object ExactTests {

  /** One row `(n11, n10, n01, n00, odds_ratio, p_obs, p_left,
    * p_right, p_two_sided)` for the 2×2 of two boolean columns.
    * odds_ratio is the sample (n11·n00)/(n10·n01), NULL on a zero
    * denominator. */
  def fisherExact(df: DataFrame, aCol: Column,
      bCol: Column): DataFrame = {
    val cts = df
      .where(aCol.isNotNull && bCol.isNotNull)
      .agg(
        sum(when(aCol && bCol, 1L).otherwise(0L)).as("n11"),
        sum(when(aCol && !bCol, 1L).otherwise(0L)).as("n10"),
        sum(when(!aCol && bCol, 1L).otherwise(0L)).as("n01"),
        sum(when(!aCol && !bCol, 1L).otherwise(0L)).as("n00"))
      .withColumn("r1", col("n11") + col("n10"))
      .withColumn("r2", col("n01") + col("n00"))
      .withColumn("c1", col("n11") + col("n01"))
      .withColumn("kmin",
        greatest(lit(0L), col("c1") - col("r2")))
      .withColumn("kmax", least(col("r1"), col("c1")))
    val sup = cts.select(col("*"),
      explode(sequence(col("kmin"), col("kmax"))).as("k"))
    // ln of the pmf ratio p(k)/p(k−1); 0 at the support's left edge
    val r1 = col("r1").cast("double"); val c1 = col("c1").cast("double")
    val r2 = col("r2").cast("double"); val k = col("k").cast("double")
    val lr = when(col("k") === col("kmin"), 0.0)
      .otherwise(log(((r1 - k + 1.0) * (c1 - k + 1.0)) /
        (k * (r2 - c1 + k))))
    val wCum = Window.orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lq = sup.withColumn("__lq", sum(lr).over(wCum))
    val norm = lq.agg(max("__lq").as("__m"))
    val p = lq.crossJoin(broadcast(norm))   // 1-row stat factor
      .withColumn("__e", exp(col("__lq") - col("__m")))
    val z = p.agg(sum("__e").as("__z"))
    val probs = p.crossJoin(broadcast(z))   // 1-row stat factor
      .withColumn("__p", col("__e") / col("__z"))
    val obs = probs.filter(col("k") === col("n11"))
      .select(col("__p").as("__pobs"))
    probs.crossJoin(broadcast(obs))   // 1-row stat factor
      .agg(
        first("n11").as("n11"), first("n10").as("n10"),
        first("n01").as("n01"), first("n00").as("n00"),
        first("__pobs").as("__po"),
        sum(when(col("k") <= col("n11"), col("__p"))
          .otherwise(0.0)).as("__pl"),
        sum(when(col("k") >= col("n11"), col("__p"))
          .otherwise(0.0)).as("__pr"),
        sum(when(col("__p") <= col("__pobs") * (1.0 + 1e-7),
          col("__p")).otherwise(0.0)).as("__p2"))
      .select(col("n11"), col("n10"), col("n01"), col("n00"),
        round(when(col("n10") * col("n01") > 0,
          (col("n11") * col("n00")).cast("double") /
            (col("n10") * col("n01"))), 6).as("odds_ratio"),
        round(col("__po"), 6).as("p_obs"),
        round(least(col("__pl"), lit(1.0)), 6).as("p_left"),
        round(least(col("__pr"), lit(1.0)), 6).as("p_right"),
        round(least(col("__p2"), lit(1.0)), 6).as("p_two_sided"))
  }

  /** DuckDB oracle for [[fisherExact]] on customer
    * (a = c_acctbal < 0, b = c_mktsegment = 'BUILDING'). */
  val fisherExactOracleSql: String =
    """WITH cts AS (
      |  SELECT
      |    SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS n11,
      |    SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS n10,
      |    SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS n01,
      |    SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS n00
      |  FROM (SELECT c_acctbal < 0 AS a,
      |          c_mktsegment = 'BUILDING' AS b
      |        FROM customer
      |        WHERE c_acctbal IS NOT NULL
      |          AND c_mktsegment IS NOT NULL)),
      |mg AS (
      |  SELECT *, n11 + n10 AS r1, n01 + n00 AS r2,
      |    n11 + n01 AS c1,
      |    GREATEST(0, (n11 + n01) - (n01 + n00)) AS kmin,
      |    LEAST(n11 + n10, n11 + n01) AS kmax
      |  FROM cts),
      |sup AS (
      |  SELECT mg.*, UNNEST(generate_series(CAST(kmin AS BIGINT),
      |    CAST(kmax AS BIGINT))) AS k
      |  FROM mg),
      |lq0 AS (
      |  SELECT *, CASE WHEN k = kmin THEN 0.0
      |    ELSE LN(((CAST(r1 AS DOUBLE) - k + 1.0) *
      |              (CAST(c1 AS DOUBLE) - k + 1.0)) /
      |             (CAST(k AS DOUBLE) *
      |              (CAST(r2 AS DOUBLE) - c1 + k))) END AS lr
      |  FROM sup),
      |lq AS (
      |  SELECT *, SUM(lr) OVER (ORDER BY k
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lqv
      |  FROM lq0),
      |m AS (SELECT MAX(lqv) AS mx FROM lq),
      |p AS (
      |  SELECT lq.*, EXP(lqv - m.mx) AS e FROM lq CROSS JOIN m),
      |z AS (SELECT SUM(e) AS z FROM p),
      |probs AS (SELECT p.*, p.e / z.z AS pr FROM p CROSS JOIN z),
      |obs AS (SELECT pr AS pobs FROM probs WHERE k = n11)
      |SELECT CAST(ANY_VALUE(n11) AS BIGINT) AS n11,
      |  CAST(ANY_VALUE(n10) AS BIGINT) AS n10,
      |  CAST(ANY_VALUE(n01) AS BIGINT) AS n01,
      |  CAST(ANY_VALUE(n00) AS BIGINT) AS n00,
      |  ROUND(CASE WHEN ANY_VALUE(n10) * ANY_VALUE(n01) > 0
      |    THEN CAST(ANY_VALUE(n11) * ANY_VALUE(n00) AS DOUBLE) /
      |      (ANY_VALUE(n10) * ANY_VALUE(n01)) END, 6) AS odds_ratio,
      |  ROUND(ANY_VALUE(pobs), 6) AS p_obs,
      |  ROUND(LEAST(SUM(CASE WHEN k <= n11 THEN pr ELSE 0 END),
      |    1.0), 6) AS p_left,
      |  ROUND(LEAST(SUM(CASE WHEN k >= n11 THEN pr ELSE 0 END),
      |    1.0), 6) AS p_right,
      |  ROUND(LEAST(SUM(CASE WHEN pr <= pobs * (1.0 + 1e-7)
      |    THEN pr ELSE 0 END), 1.0), 6) AS p_two_sided
      |FROM probs CROSS JOIN obs""".stripMargin
}
