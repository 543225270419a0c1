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

  /** Mann–Whitney U (Wilcoxon rank-sum) between the two variant
    * groups — the DISTRIBUTION-FREE complement to [[welchTTest]]:
    * Welch asks "did the mean move" and is entitled to heavy-tail
    * trouble; U asks "does one group stochastically dominate" and
    * ignores every outlier beyond its rank. Normal approximation with
    * the standard tie correction (Mann & Whitney 1947; σ²_U =
    * n_a·n_b/12·[(n+1) − Σ(t³−t)/(n(n−1))]).
    *
    * Scale shape: ranks come from the pooled VALUE-FREQUENCY table
    * (the [[graft.quality.Correlation]] trick) — one groupBy(value)
    * with per-variant counts, one ordered window over that value-
    * cardinality frame, one closing agg. No row-level rank window. */
  def mannWhitneyU(units: DataFrame, variant: Column,
      metric: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = units
      .select(variant.as("__b"), metric.cast("double").as("__m"))
      .where(col("__b").isNotNull && col("__m").isNotNull)
      .groupBy("__m")
      .agg(sum(when(!col("__b"), 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__b"), 1L).otherwise(0L)).as("__cb"))
      .withColumn("__t", col("__ca") + col("__cb"))
    val wCum = Window.orderBy("__m")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = freq.withColumn("__rank",
      coalesce(sum("__t").over(wCum), lit(0L)) + (col("__t") + 1.0) / 2.0)
    val g = ranked.agg(
      sum("__ca").as("n_a"),
      sum("__cb").as("n_b"),
      sum(col("__rank") * col("__ca")).as("__ra"),
      // t as DOUBLE before cubing: a long t³ overflows ANSI arithmetic
      // on corpus-scale tie runs
      sum(col("__t").cast("double") * col("__t") * col("__t") -
        col("__t")).as("__ties"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val n = na + nb
    val ua = col("__ra") - na * (na + 1.0) / 2.0
    val muU = na * nb / 2.0
    val sigU = sqrt(na * nb / 12.0 *
      ((n + 1.0) - col("__ties") / (n * (n - 1.0))))
    // fully-tied data degenerates σ_U to 0 (the tie correction eats
    // the whole variance): no evidence either way → z = 0, not NaN
    val z = when(sigU > 0.0, (ua - muU) / sigU).otherwise(lit(0.0))
    g.select(
      col("n_a"), col("n_b"),
      round(ua, 6).as("u_a"),
      round(z, 6).as("z"),
      (abs(z) > 1.96).as("sig_95"),
      (abs(z) > 2.576).as("sig_99"))
  }

  /** CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM 2013)
    * — the standard pre-experiment-covariate adjustment: ŷ = y −
    * θ·(x − x̄) with θ = cov(y, x)/var(x) removes the metric variance
    * the PRE-period already explains (reduction factor = ρ², the
    * squared metric/covariate correlation), which shrinks experiment
    * runtimes by the same factor without touching the treatment
    * effect. Reports the θ fit, the raw vs adjusted variance, and the
    * achieved reduction — the readout a team checks before adopting
    * the adjusted metric.
    *
    * One conditional-moment pass over unit-cardinality rows; θ is fit
    * POOLED (the standard, treatment-effect-unbiased choice). */
  def cuped(units: DataFrame, variant: Column, metric: Column,
      covariate: Column): DataFrame = {
    val g = units
      .select(variant.as("__b"), metric.cast("double").as("__y"),
        covariate.cast("double").as("__x"))
      .where(col("__b").isNotNull && col("__y").isNotNull &&
        col("__x").isNotNull)
      .groupBy()
      .agg(
        count(lit(1)).as("n"),
        covar_samp(col("__y"), col("__x")).as("__cyx"),
        var_samp(col("__x")).as("__vx"),
        var_samp(col("__y")).as("__vy"))
    val theta = when(col("__vx") > 0.0, col("__cyx") / col("__vx"))
      .otherwise(lit(0.0))
    // ρ² from guarded moments — ANSI `corr` throws DIVIDE_BY_ZERO on a
    // constant column, and a zero-variance covariate must mean "no
    // adjustment", not an exception
    val rho2 = when(col("__vx") > 0.0 && col("__vy") > 0.0,
      col("__cyx") * col("__cyx") / (col("__vx") * col("__vy")))
      .otherwise(lit(0.0))
    // var(ŷ) = var(y)·(1 − ρ²) in closed form — no second pass
    g.select(
      col("n"),
      round(theta, 6).as("theta"),
      round(col("__vy"), 6).as("var_raw"),
      round(col("__vy") * (lit(1.0) - rho2), 6).as("var_adjusted"),
      round(rho2, 6).as("var_reduction"))
  }

  /** DuckDB oracle for the registered CUPED fixture: metric = user's
    * second-half purchase value, covariate = first-half value (split
    * at the corpus midpoint date). */
  val cupedOracleSql: String =
    """WITH sp AS (
      |  SELECT CAST(MIN(ts) AS DATE) +
      |    CAST(CAST(date_diff('day', CAST(MIN(ts) AS DATE),
      |      CAST(MAX(ts) AS DATE)) AS DOUBLE) / 2 AS INTEGER) AS mid
      |  FROM events),
      |u AS (
      |  SELECT user_id,
      |    SUM(CASE WHEN event_type = 'purchase'
      |      AND CAST(ts AS DATE) > (SELECT mid FROM sp)
      |      THEN value ELSE 0 END) AS y,
      |    SUM(CASE WHEN event_type = 'purchase'
      |      AND CAST(ts AS DATE) <= (SELECT mid FROM sp)
      |      THEN value ELSE 0 END) AS x
      |  FROM events GROUP BY 1),
      |g AS (
      |  SELECT COUNT(*) AS n, covar_samp(y, x) AS cyx,
      |    var_samp(x) AS vx, var_samp(y) AS vy
      |  FROM u)
      |SELECT CAST(n AS BIGINT) AS n,
      |  ROUND(CASE WHEN vx > 0 THEN cyx / vx ELSE 0.0 END, 6) AS theta,
      |  ROUND(vy, 6) AS var_raw,
      |  ROUND(vy * (1.0 - CASE WHEN vx > 0 AND vy > 0
      |    THEN cyx * cyx / (vx * vy) ELSE 0.0 END), 6)
      |    AS var_adjusted,
      |  ROUND(CASE WHEN vx > 0 AND vy > 0
      |    THEN cyx * cyx / (vx * vy) ELSE 0.0 END, 6) AS var_reduction
      |FROM g""".stripMargin

  /** Two-sample power analysis from the corpus's own variance: the
    * per-arm sample size n = 2σ²(z_{α/2} + z_β)²/δ² to detect a
    * minimum effect `mde` (absolute units) at α = 0.05 two-sided with
    * 80% / 90% power, plus the MDE the CURRENT cohort size already
    * supports — the "how long must this experiment run" planning
    * readout, from ONE variance agg. */
  def powerAnalysis(units: DataFrame, metric: Column,
      mde: Double): DataFrame = {
    require(mde > 0.0, "mde must be positive")
    val z975 = 1.959964
    val z80 = 0.841621
    val z90 = 1.281552
    val g = units.select(metric.cast("double").as("__m"))
      .where(col("__m").isNotNull)
      .agg(count(lit(1)).as("n_units"),
        var_samp(col("__m")).as("__v"))
    def nFor(zb: Double) =
      ceil(lit(2.0) * col("__v") * math.pow(z975 + zb, 2) /
        (mde * mde)).cast("bigint")
    // MDE supportable NOW: both arms get n_units/2
    val mdeNow = sqrt(lit(2.0) * col("__v") *
      math.pow(z975 + z80, 2) /
      (col("n_units").cast("double") / 2.0))
    g.select(
      col("n_units"),
      round(col("__v"), 6).as("variance"),
      lit(mde).as("mde"),
      nFor(z80).as("n_per_arm_80"),
      nFor(z90).as("n_per_arm_90"),
      round(mdeNow, 6).as("mde_at_current_n"))
  }

  /** DuckDB oracle for the registered power fixture (per-user
    * purchase value, mde = 5.0). */
  def powerOracleSql(mde: Double): String =
    s"""WITH u AS (
       |  SELECT user_id, SUM(value) AS m
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
       |g AS (SELECT COUNT(*) AS n, var_samp(m) AS v FROM u)
       |SELECT CAST(n AS BIGINT) AS n_units,
       |  ROUND(v, 6) AS variance,
       |  CAST($mde AS DOUBLE) AS mde,
       |  CAST(ceil(2.0 * v * pow(1.959964 + 0.841621, 2)
       |    / ($mde * $mde)) AS BIGINT) AS n_per_arm_80,
       |  CAST(ceil(2.0 * v * pow(1.959964 + 1.281552, 2)
       |    / ($mde * $mde)) AS BIGINT) AS n_per_arm_90,
       |  ROUND(sqrt(2.0 * v * pow(1.959964 + 0.841621, 2)
       |    / (CAST(n AS DOUBLE) / 2.0)), 6) AS mde_at_current_n
       |FROM g""".stripMargin

  /** Delta-method analysis of a RATIO metric (Deng, Knoblich & Lu,
    * KDD 2018) — the correct A/B readout when the metric is a ratio
    * of sums over randomization units (revenue per event, clicks per
    * session): treating each event as independent understates the
    * variance because events cluster within users, and per-user
    * averaging answers a different question. The delta method expands
    * R = ΣX/ΣY around the unit means: var(R) ≈ (x̄/ȳ)²·[var(X)/x̄² −
    * 2cov(X,Y)/(x̄ȳ) + var(Y)/ȳ²]/n.
    *
    * One grouped agg to per-unit (x, y), one conditional-moment pass,
    * single-row output — the [[welchTTest]] scale shape with a
    * covariance term. */
  def ratioDelta(units: DataFrame, variant: Column, numer: Column,
      denom: Column): DataFrame = {
    val g = units
      .select(variant.as("__b"), numer.cast("double").as("__x"),
        denom.cast("double").as("__y"))
      .where(col("__b").isNotNull)
      .groupBy()
      .agg(
        sum(when(!col("__b"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__b"), 1L).otherwise(0L)).as("n_b"),
        avg(when(!col("__b"), col("__x"))).as("__xa"),
        avg(when(col("__b"), col("__x"))).as("__xb"),
        avg(when(!col("__b"), col("__y"))).as("__ya"),
        avg(when(col("__b"), col("__y"))).as("__yb"),
        var_samp(when(!col("__b"), col("__x"))).as("__vxa"),
        var_samp(when(col("__b"), col("__x"))).as("__vxb"),
        var_samp(when(!col("__b"), col("__y"))).as("__vya"),
        var_samp(when(col("__b"), col("__y"))).as("__vyb"),
        covar_samp(when(!col("__b"), col("__x")),
          when(!col("__b"), col("__y"))).as("__ca"),
        covar_samp(when(col("__b"), col("__x")),
          when(col("__b"), col("__y"))).as("__cb"))
    def ratio(x: Column, y: Column) = x / y
    def dvar(n: Column, x: Column, y: Column, vx: Column, vy: Column,
        cxy: Column) =
      ratio(x, y) * ratio(x, y) *
        (vx / (x * x) - lit(2.0) * cxy / (x * y) + vy / (y * y)) /
        n.cast("double")
    val ra = ratio(col("__xa"), col("__ya"))
    val rb = ratio(col("__xb"), col("__yb"))
    val va = dvar(col("n_a"), col("__xa"), col("__ya"), col("__vxa"),
      col("__vya"), col("__ca"))
    val vb = dvar(col("n_b"), col("__xb"), col("__yb"), col("__vxb"),
      col("__vyb"), col("__cb"))
    val se = sqrt(va + vb)
    val z = when(se > 0.0, (rb - ra) / se).otherwise(lit(0.0))
    g.select(
      col("n_a"), col("n_b"),
      round(ra, 6).as("ratio_a"),
      round(rb, 6).as("ratio_b"),
      round(rb - ra, 6).as("lift"),
      round(se, 6).as("se"),
      round(z, 6).as("z"),
      (abs(z) > 1.96).as("sig_95"))
  }

  /** DuckDB oracle for the registered ratio fixture: purchase revenue
    * per event, unit = user, variant = user_id parity. */
  val ratioDeltaOracleSql: String =
    """WITH u AS (
      |  SELECT user_id, user_id % 2 = 1 AS b,
      |    SUM(CASE WHEN event_type = 'purchase' THEN value
      |      ELSE 0 END) AS x,
      |    COUNT(*) AS y
      |  FROM events GROUP BY 1, 2),
      |g AS (
      |  SELECT
      |    SUM(CASE WHEN NOT b THEN 1 ELSE 0 END) AS n_a,
      |    SUM(CASE WHEN b THEN 1 ELSE 0 END) AS n_b,
      |    AVG(CASE WHEN NOT b THEN x END) AS xa,
      |    AVG(CASE WHEN b THEN x END) AS xb,
      |    AVG(CASE WHEN NOT b THEN CAST(y AS DOUBLE) END) AS ya,
      |    AVG(CASE WHEN b THEN CAST(y AS DOUBLE) END) AS yb,
      |    var_samp(CASE WHEN NOT b THEN x END) AS vxa,
      |    var_samp(CASE WHEN b THEN x END) AS vxb,
      |    var_samp(CASE WHEN NOT b THEN CAST(y AS DOUBLE) END) AS vya,
      |    var_samp(CASE WHEN b THEN CAST(y AS DOUBLE) END) AS vyb,
      |    covar_samp(CASE WHEN NOT b THEN x END,
      |      CASE WHEN NOT b THEN CAST(y AS DOUBLE) END) AS ca,
      |    covar_samp(CASE WHEN b THEN x END,
      |      CASE WHEN b THEN CAST(y AS DOUBLE) END) AS cb
      |  FROM u),
      |k AS (
      |  SELECT *, xa / ya AS ra, xb / yb AS rb,
      |    (xa / ya) * (xa / ya) * (vxa / (xa * xa)
      |      - 2.0 * ca / (xa * ya) + vya / (ya * ya)) / n_a AS va,
      |    (xb / yb) * (xb / yb) * (vxb / (xb * xb)
      |      - 2.0 * cb / (xb * yb) + vyb / (yb * yb)) / n_b AS vb
      |  FROM g)
      |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
      |  ROUND(ra, 6) AS ratio_a, ROUND(rb, 6) AS ratio_b,
      |  ROUND(rb - ra, 6) AS lift,
      |  ROUND(sqrt(va + vb), 6) AS se,
      |  ROUND(CASE WHEN sqrt(va + vb) > 0
      |    THEN (rb - ra) / sqrt(va + vb) ELSE 0.0 END, 6) AS z,
      |  abs(CASE WHEN sqrt(va + vb) > 0
      |    THEN (rb - ra) / sqrt(va + vb) ELSE 0.0 END) > 1.96
      |    AS sig_95
      |FROM k""".stripMargin

  /** DuckDB oracle for the registered Mann–Whitney fixture (same
    * per-user purchase metric and parity variant as [[welchTTest]]). */
  val mannWhitneyOracleSql: String =
    """WITH u AS (
      |  SELECT user_id, user_id % 2 = 1 AS b, SUM(value) AS m
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |f AS (
      |  SELECT m,
      |    SUM(CASE WHEN NOT b THEN 1 ELSE 0 END) AS ca,
      |    SUM(CASE WHEN b THEN 1 ELSE 0 END) AS cb,
      |    COUNT(*) AS t
      |  FROM u GROUP BY 1),
      |r AS (
      |  SELECT *, COALESCE(SUM(t) OVER (ORDER BY m
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    + (t + 1.0) / 2.0 AS rk
      |  FROM f),
      |g AS (
      |  SELECT SUM(ca) AS n_a, SUM(cb) AS n_b,
      |    SUM(rk * ca) AS ra,
      |    SUM(CAST(t AS DOUBLE) * t * t - t) AS ties
      |  FROM r)
      |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
      |  ROUND(ra - n_a * (n_a + 1.0) / 2.0, 6) AS u_a,
      |  ROUND((ra - n_a * (n_a + 1.0) / 2.0 - n_a * n_b / 2.0) /
      |    sqrt(n_a * n_b / 12.0 * ((n_a + n_b + 1.0) -
      |      ties / ((n_a + n_b) * (n_a + n_b - 1.0)))), 6) AS z,
      |  abs((ra - n_a * (n_a + 1.0) / 2.0 - n_a * n_b / 2.0) /
      |    sqrt(n_a * n_b / 12.0 * ((n_a + n_b + 1.0) -
      |      ties / ((n_a + n_b) * (n_a + n_b - 1.0))))) > 1.96
      |    AS sig_95,
      |  abs((ra - n_a * (n_a + 1.0) / 2.0 - n_a * n_b / 2.0) /
      |    sqrt(n_a * n_b / 12.0 * ((n_a + n_b + 1.0) -
      |      ties / ((n_a + n_b) * (n_a + n_b - 1.0))))) > 2.576
      |    AS sig_99
      |FROM g""".stripMargin

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
