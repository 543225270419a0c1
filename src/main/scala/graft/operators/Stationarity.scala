package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stationarity tests on the daily revenue series — the two classic
  * complementary nulls: KPSS's null IS stationarity (rejection =
  * evidence of a unit root / wandering level), Dickey–Fuller's null
  * IS the unit root (rejection = evidence of mean reversion). Run
  * together they split series into stationary / unit-root /
  * ambiguous, which is the actionable reading for "can I model this
  * daily metric with a fixed mean".
  *
  * Both operators share the SeriesTests scale shape: one corpus
  * aggregate to the calendar table, ordered windows and bounded
  * self-lag joins over THAT, 1-row moment factors. Critical values
  * are published asymptotic constants shared by both engines (KPSS
  * 1992 Table 1: 0.463; MacKinnon asymptotic τ_μ 5%: −2.8621) — no
  * quantile machinery to approximate.
  */
object Stationarity {

  private def daily(events: DataFrame): DataFrame =
    events.groupBy(to_date(col("ts")).as("d"))
      .agg(sum("value").as("y"))

  /** KPSS level-stationarity test (Kwiatkowski, Phillips, Schmidt &
    * Shin, J. Econometrics 1992): η = Σ_t S_t² / (n²·s²_l) with S_t
    * the partial sums of the demeaned series and s²_l the
    * Newey–West long-run variance under a Bartlett window of width
    * l = ⌊4·(n/100)^¼⌋ (their suggested short lag). η > 0.463
    * rejects level stationarity at 5%.
    *
    * The Bartlett-window autocovariances come from a bounded
    * self-lag join of the calendar table with itself (lag ≤ l —
    * calendar×(l+1) rows); the Bartlett weights keep s²_l ≥ 0, and
    * η is NULL for a constant series (s²_l = 0).
    *
    * One row `(n_days, lag_l, eta, sig_95)`. */
  def kpss(events: DataFrame): DataFrame = {
    val base = daily(events)
    val m = base.agg(count(lit(1)).as("__n"), avg("y").as("__mu"))
    val nD = col("__n").cast("double")
    val e = base.crossJoin(broadcast(m))   // 1-row moment factor
      .withColumn("__t",
        row_number().over(Window.orderBy("d")).cast("double"))
      .withColumn("__e", col("y") - col("__mu"))
      .withColumn("__l",
        floor(pow(nD / 100.0, 0.25) * 4.0).cast("double"))
      .withColumn("__s", sum("__e").over(Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)))
    val num = e.agg(
      first("__n").as("__n"), first("__l").as("__l"),
      sum(col("__s") * col("__s")).as("__ss2"))
    // bounded self-lag join: lag j = 0..l autocovariance products
    val lagged = e.as("a").join(e.as("b"),
        col("b.__t") >= col("a.__t") &&
          col("b.__t") <= col("a.__t") + col("a.__l"))
      .select((col("b.__t") - col("a.__t")).as("__j"),
        (col("a.__e") * col("b.__e")).as("__p"))
      .groupBy("__j").agg(sum("__p").as("__g"))
    val s2l = lagged.crossJoin(broadcast(num))   // 1-row factor
      .agg(
        first("__n").as("__n"), first("__l").as("__l"),
        first("__ss2").as("__ss2"),
        sum(
          when(col("__j") === 0.0, col("__g"))
            .otherwise(col("__g") * 2.0 *
              (lit(1.0) - col("__j") / (col("__l") + 1.0))))
          .as("__gsum"))
    val n2 = col("__n").cast("double")
    val lrv = col("__gsum") / n2
    val eta = when(lrv > 0.0, col("__ss2") / (n2 * n2 * lrv))
    s2l.select(
      col("__n").cast("bigint").as("n_days"),
      col("__l").cast("bigint").as("lag_l"),
      round(eta, 6).as("eta"),
      coalesce(eta > 0.463, lit(false)).as("sig_95"))
  }

  /** DuckDB oracle for [[kpss]]. */
  val kpssOracleSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d, SUM(value) AS y
      |  FROM events GROUP BY 1),
      |m AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(y) AS mu
      |  FROM daily),
      |e AS (
      |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) AS DOUBLE) AS t,
      |    y - m.mu AS e,
      |    FLOOR(POW(m.n / 100.0, 0.25) * 4.0) AS l,
      |    m.n AS n
      |  FROM daily CROSS JOIN m),
      |s AS (
      |  SELECT *, SUM(e) OVER (ORDER BY t
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS st
      |  FROM e),
      |num AS (
      |  SELECT ANY_VALUE(n) AS n, ANY_VALUE(l) AS l,
      |    SUM(st * st) AS ss2
      |  FROM s),
      |gam AS (
      |  SELECT b.t - a.t AS j, SUM(a.e * b.e) AS g
      |  FROM e a JOIN e b
      |    ON b.t >= a.t AND b.t <= a.t + a.l
      |  GROUP BY 1),
      |lrv AS (
      |  SELECT num.n, num.l, num.ss2,
      |    SUM(CASE WHEN j = 0 THEN g
      |      ELSE g * 2.0 * (1.0 - j / (num.l + 1.0)) END) / num.n
      |      AS s2l
      |  FROM gam CROSS JOIN num
      |  GROUP BY 1, 2, 3)
      |SELECT CAST(n AS BIGINT) AS n_days,
      |  CAST(l AS BIGINT) AS lag_l,
      |  ROUND(CASE WHEN s2l > 0 THEN ss2 / (n * n * s2l) END, 6)
      |    AS eta,
      |  COALESCE(CASE WHEN s2l > 0 THEN ss2 / (n * n * s2l) END
      |    > 0.463, FALSE) AS sig_95
      |FROM lrv""".stripMargin

  /** Dickey–Fuller unit-root test, constant-only, no augmentation
    * (Dickey & Fuller, JASA 1979): OLS of Δy_t on (1, y_{t−1});
    * τ = β̂/SE(β̂) against MacKinnon's asymptotic 5% τ_μ critical
    * value −2.8621 (more negative rejects the unit root). The
    * un-augmented form is the documented convention here — lag
    * augmentation corrects serial correlation in Δy, and the q291
    * Ljung–Box panel is the companion diagnostic for whether it
    * binds.
    *
    * Closed form on the lagged calendar pairs: β̂ = S_xy/S_xx,
    * s² = (S_yy − β̂·S_xy)/(m−2), SE = √(s²/S_xx); NULL τ when the
    * lag column is constant (S_xx = 0) or m < 3.
    *
    * One row `(n_obs, beta, tau, sig_95)`. */
  def dickeyFuller(events: DataFrame): DataFrame = {
    val w = Window.orderBy("d")
    val pairs = daily(events)
      .withColumn("__yl", lag("y", 1).over(w))
      .where(col("__yl").isNotNull)
      .select((col("y") - col("__yl")).as("__dy"), col("__yl"))
    val s = pairs.agg(
      count(lit(1)).as("__m"),
      avg("__dy").as("__mdy"), avg("__yl").as("__myl"),
      sum(col("__dy") * col("__yl")).as("__sxy0"),
      sum(col("__yl") * col("__yl")).as("__sxx0"),
      sum(col("__dy") * col("__dy")).as("__syy0"))
    val mD = col("__m").cast("double")
    val sxy = col("__sxy0") - mD * col("__mdy") * col("__myl")
    val sxx = col("__sxx0") - mD * col("__myl") * col("__myl")
    val syy = col("__syy0") - mD * col("__mdy") * col("__mdy")
    val beta = when(col("__sxx0") - mD * col("__myl") * col("__myl")
      > 0.0, sxy / sxx)
    val s2 = (syy - beta * sxy) / (mD - 2.0)
    val tau = when(mD >= 3.0 && s2 > 0.0, beta / sqrt(s2 / sxx))
    s.select(
      col("__m").cast("bigint").as("n_obs"),
      round(beta, 6).as("beta"),
      round(tau, 6).as("tau"),
      coalesce(tau < -2.8621, lit(false)).as("sig_95"))
  }

  /** DuckDB oracle for [[dickeyFuller]]. */
  val dickeyFullerOracleSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d, SUM(value) AS y
      |  FROM events GROUP BY 1),
      |p AS (
      |  SELECT y - LAG(y) OVER (ORDER BY d) AS dy,
      |    LAG(y) OVER (ORDER BY d) AS yl
      |  FROM daily
      |  QUALIFY yl IS NOT NULL),
      |s AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS m,
      |    AVG(dy) AS mdy, AVG(yl) AS myl,
      |    SUM(dy * yl) AS sxy0, SUM(yl * yl) AS sxx0,
      |    SUM(dy * dy) AS syy0
      |  FROM p),
      |f AS (
      |  SELECT m,
      |    sxy0 - m * mdy * myl AS sxy,
      |    sxx0 - m * myl * myl AS sxx,
      |    syy0 - m * mdy * mdy AS syy
      |  FROM s),
      |b AS (
      |  SELECT m, sxy, sxx, syy,
      |    CASE WHEN sxx > 0 THEN sxy / sxx END AS beta
      |  FROM f),
      |t AS (
      |  SELECT m, beta,
      |    CASE WHEN m >= 3 AND (syy - beta * sxy) / (m - 2.0) > 0
      |      THEN beta / SQRT(((syy - beta * sxy) / (m - 2.0)) / sxx)
      |      END AS tau
      |  FROM b)
      |SELECT CAST(m AS BIGINT) AS n_obs,
      |  ROUND(beta, 6) AS beta,
      |  ROUND(tau, 6) AS tau,
      |  COALESCE(tau < -2.8621, FALSE) AS sig_95
      |FROM t""".stripMargin

  /** Engle–Granger two-step cointegration test between daily revenue
    * and daily event volume (Engle & Granger, Econometrica 1987):
    * two individually wandering series are COINTEGRATED when some
    * linear combination is stationary — the property that makes
    * "revenue per event is stable" a valid long-run statement even
    * while both levels drift. Step 1: OLS of revenue on volume with
    * constant (closed-form moments). Step 2: un-augmented
    * Dickey–Fuller on the residuals WITHOUT a constant (the
    * residuals are mean-zero by construction — the textbook EG
    * step-2 regression Δr_t = ρ·r_{t−1} + u_t). The τ gate is
    * MacKinnon's (2010) asymptotic 5% value for N = 2 variables
    * with a constant in the cointegrating regression, −3.3377 —
    * NOT the plain DF −2.8621 ([[dickeyFuller]]), because step 2
    * tests an ESTIMATED residual.
    *
    * One row `(n_days, ols_alpha, ols_beta, r2, eg_rho, tau,
    * cointegrated)`. Scale shape: one corpus agg to the calendar
    * table, a 1-row OLS factor joined back for residuals, one lag
    * window, 1-row finishing agg. */
  def engleGranger(events: DataFrame): DataFrame = {
    val both = events.groupBy(to_date(col("ts")).as("d"))
      .agg(sum("value").as("y"),
        count(lit(1)).cast("double").as("x"))
    val mom = both.agg(
      count(lit(1)).cast("double").as("__n"),
      avg("y").as("__my"), avg("x").as("__mx"),
      sum(col("x") * col("y")).as("__sxy0"),
      sum(col("x") * col("x")).as("__sxx0"),
      sum(col("y") * col("y")).as("__syy0"))
    val nD = col("__n")
    val sxy = col("__sxy0") - nD * col("__mx") * col("__my")
    val sxx = col("__sxx0") - nD * col("__mx") * col("__mx")
    val syy = col("__syy0") - nD * col("__my") * col("__my")
    val ols = mom.select(
      col("__n"),
      when(sxx > 0.0, sxy / sxx).as("__b"),
      (col("__my") - when(sxx > 0.0, sxy / sxx) * col("__mx"))
        .as("__a"),
      when(sxx > 0.0 && syy > 0.0, sxy * sxy / (sxx * syy))
        .as("__r2"))
    val resid = both.crossJoin(broadcast(ols))   // 1-row OLS factor
      .withColumn("__r", col("y") - col("__a") - col("__b") * col("x"))
      .withColumn("__rl", lag("__r", 1).over(Window.orderBy("d")))
      .where(col("__rl").isNotNull)
    val s = resid.agg(
      first("__n").as("__nd"), first("__a").as("__af"),
      first("__b").as("__bf"), first("__r2").as("__r2f"),
      count(lit(1)).cast("double").as("__m"),
      sum(col("__rl") * (col("__r") - col("__rl"))).as("__srd"),
      sum(col("__rl") * col("__rl")).as("__srr"),
      sum((col("__r") - col("__rl")) * (col("__r") - col("__rl")))
        .as("__sdd"))
    val mD = col("__m")
    val rho = when(col("__srr") > 0.0, col("__srd") / col("__srr"))
    val s2 = (col("__sdd") - rho * col("__srd")) / (mD - 1.0)
    val tau = when(mD >= 2.0 && s2 > 0.0,
      rho / sqrt(s2 / col("__srr")))
    s.select(
      col("__nd").cast("bigint").as("n_days"),
      round(col("__af"), 6).as("ols_alpha"),
      round(col("__bf"), 6).as("ols_beta"),
      round(col("__r2f"), 6).as("r2"),
      round(rho, 6).as("eg_rho"),
      round(tau, 6).as("tau"),
      coalesce(tau < -3.3377, lit(false)).as("cointegrated"))
  }

  /** DuckDB oracle for [[engleGranger]]. */
  val engleGrangerOracleSql: String =
    """WITH both_d AS (
      |  SELECT CAST(ts AS DATE) AS d, SUM(value) AS y,
      |    CAST(COUNT(*) AS DOUBLE) AS x
      |  FROM events GROUP BY 1),
      |mom AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |    AVG(y) AS my, AVG(x) AS mx,
      |    SUM(x * y) AS sxy0, SUM(x * x) AS sxx0, SUM(y * y) AS syy0
      |  FROM both_d),
      |ols AS (
      |  SELECT n,
      |    CASE WHEN sxx0 - n * mx * mx > 0
      |      THEN (sxy0 - n * mx * my) / (sxx0 - n * mx * mx) END AS b,
      |    my - CASE WHEN sxx0 - n * mx * mx > 0
      |      THEN (sxy0 - n * mx * my) / (sxx0 - n * mx * mx) END * mx
      |      AS a,
      |    CASE WHEN sxx0 - n * mx * mx > 0 AND syy0 - n * my * my > 0
      |      THEN (sxy0 - n * mx * my) * (sxy0 - n * mx * my) /
      |        ((sxx0 - n * mx * mx) * (syy0 - n * my * my)) END AS r2
      |  FROM mom),
      |res AS (
      |  SELECT d, y - ols.a - ols.b * x AS r, ols.n, ols.a AS af,
      |    ols.b AS bf, ols.r2 AS r2f
      |  FROM both_d CROSS JOIN ols),
      |p AS (
      |  SELECT n, af, bf, r2f, r,
      |    LAG(r) OVER (ORDER BY d) AS rl
      |  FROM res
      |  QUALIFY rl IS NOT NULL),
      |s AS (
      |  SELECT ANY_VALUE(n) AS nd, ANY_VALUE(af) AS af,
      |    ANY_VALUE(bf) AS bf, ANY_VALUE(r2f) AS r2f,
      |    CAST(COUNT(*) AS DOUBLE) AS m,
      |    SUM(rl * (r - rl)) AS srd,
      |    SUM(rl * rl) AS srr,
      |    SUM((r - rl) * (r - rl)) AS sdd
      |  FROM p),
      |f AS (
      |  SELECT nd, af, bf, r2f, m, srd, srr, sdd,
      |    CASE WHEN srr > 0 THEN srd / srr END AS rho
      |  FROM s),
      |t AS (
      |  SELECT nd, af, bf, r2f, rho,
      |    CASE WHEN m >= 2 AND (sdd - rho * srd) / (m - 1.0) > 0
      |      THEN rho / SQRT(((sdd - rho * srd) / (m - 1.0)) / srr)
      |      END AS tau
      |  FROM f)
      |SELECT CAST(nd AS BIGINT) AS n_days,
      |  ROUND(af, 6) AS ols_alpha,
      |  ROUND(bf, 6) AS ols_beta,
      |  ROUND(r2f, 6) AS r2,
      |  ROUND(rho, 6) AS eg_rho,
      |  ROUND(tau, 6) AS tau,
      |  COALESCE(tau < -3.3377, FALSE) AS cointegrated
      |FROM t""".stripMargin
}
