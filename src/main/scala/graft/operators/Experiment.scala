package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-sample experiment readout — Welch's unequal-variance t-test
  * (Welch, Biometrika 1947) on a per-unit metric between two variant
  * groups: the A/B answer sheet ("is the observed lift real") with the
  * variance-pooling mistake Student's t makes under unequal group
  * variances designed out. Degrees of freedom via Welch–Satterthwaite;
  * significance is reported against fixed two-sided z thresholds
  * (1.96/2.576) — at experiment-scale df the t quantiles are
  * indistinguishable from normal, and this keeps the output closed-
  * form in both engines (no incomplete-beta CDF).
  *
  * Scale shape: per-unit metrics from one grouped agg, then ONE
  * two-group conditional-sum pass; output is a single row. The
  * per-unit frame is unit-cardinality, never event-cardinality. */
object Experiment {

  /** `(n_a, n_b, mean_a, mean_b, lift, t_stat, df, sig_95, sig_99)`
    * for `metric` between `variant` = false (A) and true (B) rows.
    * Sample variances (n − 1); groups need ≥ 2 units each. */
  def welchTTest(units: DataFrame, variant: Column,
      metric: Column): DataFrame = {
    val g = units.select(variant.as("__b"), metric.cast("double").as("__m"))
      .where(col("__b").isNotNull && col("__m").isNotNull)
      .groupBy()
      .agg(
        sum(when(!col("__b"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__b"), 1L).otherwise(0L)).as("n_b"),
        avg(when(!col("__b"), col("__m"))).as("__ma"),
        avg(when(col("__b"), col("__m"))).as("__mb"),
        var_samp(when(!col("__b"), col("__m"))).as("__va"),
        var_samp(when(col("__b"), col("__m"))).as("__vb"))
    val sa = col("__va") / col("n_a")
    val sb = col("__vb") / col("n_b")
    val t = (col("__mb") - col("__ma")) / sqrt(sa + sb)
    val df = pow(sa + sb, 2) /
      (pow(sa, 2) / (col("n_a") - 1) + pow(sb, 2) / (col("n_b") - 1))
    g.select(
      col("n_a"), col("n_b"),
      round(col("__ma"), 6).as("mean_a"),
      round(col("__mb"), 6).as("mean_b"),
      round(col("__mb") - col("__ma"), 6).as("lift"),
      round(t, 6).as("t_stat"),
      round(df, 6).as("df"),
      (abs(t) > 1.96).as("sig_95"),
      (abs(t) > 2.576).as("sig_99"))
  }

  /** DuckDB oracle for the registered fixture: per-user summed
    * purchase value, variant = user_id parity. */
  val welchOracleSql: String =
    """WITH u AS (
      |  SELECT user_id, user_id % 2 = 1 AS b,
      |    SUM(value) AS m
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |g AS (
      |  SELECT
      |    SUM(CASE WHEN NOT b THEN 1 ELSE 0 END) AS n_a,
      |    SUM(CASE WHEN b THEN 1 ELSE 0 END) AS n_b,
      |    AVG(CASE WHEN NOT b THEN m END) AS ma,
      |    AVG(CASE WHEN b THEN m END) AS mb,
      |    var_samp(CASE WHEN NOT b THEN m END) AS va,
      |    var_samp(CASE WHEN b THEN m END) AS vb
      |  FROM u)
      |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
      |  ROUND(ma, 6) AS mean_a, ROUND(mb, 6) AS mean_b,
      |  ROUND(mb - ma, 6) AS lift,
      |  ROUND((mb - ma) / sqrt(va / n_a + vb / n_b), 6) AS t_stat,
      |  ROUND(pow(va / n_a + vb / n_b, 2) /
      |    (pow(va / n_a, 2) / (n_a - 1) +
      |     pow(vb / n_b, 2) / (n_b - 1)), 6) AS df,
      |  abs((mb - ma) / sqrt(va / n_a + vb / n_b)) > 1.96 AS sig_95,
      |  abs((mb - ma) / sqrt(va / n_a + vb / n_b)) > 2.576 AS sig_99
      |FROM g""".stripMargin
}
