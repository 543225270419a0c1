package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classical least-squares inference over the daily activity series —
  * the parametric counterpart to the robust [[Anomaly.theilSen]] fit:
  * per-slice OLS with standard errors and t-statistics (q269), the
  * optimal-split Chow-style structural-break test (q270), and
  * empirical-Bayes shrinkage of per-unit rates toward the corpus
  * prior (q272, the beta-binomial method-of-moments estimator of
  * Efron–Morris "Stein's paradox in statistics", Sci. Am. 1977 —
  * the standard fix for small-denominator rate leaderboards).
  *
  * All three reduce to CLOSED-FORM MOMENTS (n, Σx, Σy, Σxy, Σx², Σy²
  * per slice), so the engine never materializes a residual vector:
  * one grouped aggregate per input at slice cardinality, then scalar
  * arithmetic on the moment rows. That is the 100 TB shape — moments
  * are mergeable (map-side partials combine), the residual vector is
  * not. Reference analog: the daily-metrics trend readouts over
  * `fct_daily_store_metrics` (reference `dbt/models/marts/
  * fct_daily_store_metrics.sql:6-32`), which the reference consumes
  * in pandas; here the inference itself is a Spark plan.
  */
object Regression {

  /** Per-`event_type` OLS of daily revenue on the day index:
    * `(event_type, n_days, slope, intercept, r2, t_stat)`, ordered by
    * type. `slope` is revenue change per day; `t_stat` tests slope≠0
    * with the usual se(β̂) = √(SSE/(n−2) / (n·var_pop(x))). Guards:
    * NULL slope family when var(x)=0 (single day), NULL t when n≤2
    * or the residual is numerically zero.
    *
    * Scale shape: one (type, day) grouped agg — calendar×type rows —
    * a 1-row broadcast min-date factor, then one moment agg per type. */
  def olsTrend(events: DataFrame): DataFrame =
    olsTrendFromDaily(events
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(sum("value").as("y")))

  /** [[olsTrend]] over an already-built `(event_type, d, y)` daily
    * table — the entry point the streaming monitor shares, so
    * stream ≡ batch holds by construction (the monitor re-aggregates
    * its increments back to exactly this table). */
  def olsTrendFromDaily(daily: DataFrame): DataFrame = {
    val d0 = daily.agg(min("d").as("__d0"))
    val xy = daily.crossJoin(broadcast(d0))   // 1-row stat factor
      .select(col("event_type"),
        datediff(col("d"), col("__d0")).cast("double").as("x"),
        col("y"))
    val m = xy.groupBy("event_type").agg(
      count(lit(1)).as("n_days"),
      avg("x").as("__mx"), avg("y").as("__my"),
      var_pop(col("x")).as("__vx"), var_pop(col("y")).as("__vy"),
      covar_pop(col("x"), col("y")).as("__cxy"))
    val slope = when(col("__vx") > 0.0, col("__cxy") / col("__vx"))
    // SSE via the moment identity n·(var_y − cov²/var_x); clamp the
    // tiny negative FP residue a near-perfect fit can leave
    val sse = greatest(
      col("n_days") * (col("__vy") - col("__cxy") * col("__cxy") / col("__vx")),
      lit(0.0))
    val se = when(col("n_days") > 2 && col("__vx") > 0.0,
      sqrt(sse / (col("n_days") - 2) / (col("n_days") * col("__vx"))))
    m.select(
        col("event_type"), col("n_days"),
        round(slope, 6).as("slope"),
        round(col("__my") - slope * col("__mx"), 6).as("intercept"),
        round(when(col("__vx") > 0.0 && col("__vy") > 0.0,
          col("__cxy") * col("__cxy") / (col("__vx") * col("__vy"))), 6)
          .as("r2"),
        round(when(se > 0.0, slope / se), 6).as("t_stat"))
      .orderBy("event_type")
  }

  /** DuckDB oracle for [[olsTrend]] — the same guarded moments. */
  val olsTrendOracleSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d, SUM(value) AS y
      |  FROM events GROUP BY 1, 2),
      |xy AS (
      |  SELECT event_type,
      |    CAST(d - (SELECT MIN(d) FROM daily) AS DOUBLE) AS x, y
      |  FROM daily),
      |m AS (
      |  SELECT event_type, COUNT(*) AS n, AVG(x) AS mx, AVG(y) AS my,
      |    VAR_POP(x) AS vx, VAR_POP(y) AS vy, COVAR_POP(x, y) AS cxy
      |  FROM xy GROUP BY 1),
      |s AS (
      |  SELECT *,
      |    CASE WHEN vx > 0 THEN cxy / vx END AS slope,
      |    GREATEST(n * (vy - cxy * cxy / vx), 0.0) AS sse
      |  FROM m),
      |t AS (
      |  SELECT *,
      |    CASE WHEN n > 2 AND vx > 0
      |      THEN sqrt(sse / (n - 2) / (n * vx)) END AS se
      |  FROM s)
      |SELECT event_type, CAST(n AS BIGINT) AS n_days,
      |  ROUND(slope, 6) AS slope,
      |  ROUND(my - slope * mx, 6) AS intercept,
      |  ROUND(CASE WHEN vx > 0 AND vy > 0
      |    THEN cxy * cxy / (vx * vy) END, 6) AS r2,
      |  ROUND(CASE WHEN se > 0 THEN slope / se END, 6) AS t_stat
      |FROM t ORDER BY event_type""".stripMargin

  /** Durbin–Watson residual-autocorrelation diagnostic for the
    * per-type OLS trend (Durbin & Watson, Biometrika 1950): after
    * fitting [[olsTrend]]'s line, DW = Σ(eₜ−eₜ₋₁)²/Σeₜ² over the
    * date-ordered residuals — ≈2 means independent errors, →0 means
    * positive serial correlation (the t-stats q269 reports are then
    * OPTIMISTIC: the usual reason a daily-series "significant trend"
    * is a mirage). The standard companion row to any OLS table.
    *
    * Scale shape: the daily fit moments (type-cardinality) broadcast
    * back onto the calendar×type table; residual lag is a window
    * PARTITIONED by type over the calendar; one grouped reduction.
    * `(event_type, n_days, dw, rho1)` with rho1 = 1 − DW/2. */
  def durbinWatson(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(sum("value").as("y"))
    val d0 = daily.agg(min("d").as("__d0"))
    val xy = daily.crossJoin(broadcast(d0))   // 1-row stat factor
      .select(col("event_type"),
        datediff(col("d"), col("__d0")).cast("double").as("x"),
        col("y"))
    val m = xy.groupBy("event_type").agg(
      avg("x").as("__mx"), avg("y").as("__my"),
      var_pop(col("x")).as("__vx"),
      covar_pop(col("x"), col("y")).as("__cxy"))
    val fit = m.select(col("event_type"),
      when(col("__vx") > 0.0, col("__cxy") / col("__vx")).as("__slope"),
      (col("__my") - when(col("__vx") > 0.0,
        col("__cxy") / col("__vx")) * col("__mx")).as("__icept"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("x")
    val resid = xy.join(broadcast(fit), Seq("event_type"))
      .withColumn("__e",
        col("y") - (col("__icept") + col("__slope") * col("x")))
      .withColumn("__ep", lag("__e", 1).over(w))
    resid.groupBy("event_type")
      .agg(
        count(lit(1)).as("n_days"),
        (sum(when(col("__ep").isNotNull,
          (col("__e") - col("__ep")) * (col("__e") - col("__ep"))))
          / sum(col("__e") * col("__e"))).as("__dw"))
      .select(col("event_type"), col("n_days"),
        round(col("__dw"), 6).as("dw"),
        round(lit(1.0) - col("__dw") / 2.0, 6).as("rho1"))
      .orderBy("event_type")
  }

  /** DuckDB oracle for [[durbinWatson]]. */
  val durbinWatsonOracleSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d, SUM(value) AS y
      |  FROM events GROUP BY 1, 2),
      |xy AS (
      |  SELECT event_type,
      |    CAST(d - (SELECT MIN(d) FROM daily) AS DOUBLE) AS x, y
      |  FROM daily),
      |m AS (
      |  SELECT event_type, AVG(x) AS mx, AVG(y) AS my,
      |    VAR_POP(x) AS vx, COVAR_POP(x, y) AS cxy
      |  FROM xy GROUP BY 1),
      |fit AS (
      |  SELECT event_type,
      |    CASE WHEN vx > 0 THEN cxy / vx END AS slope,
      |    my - (CASE WHEN vx > 0 THEN cxy / vx END) * mx AS icept
      |  FROM m),
      |e AS (
      |  SELECT xy.event_type, xy.x,
      |    xy.y - (fit.icept + fit.slope * xy.x) AS e
      |  FROM xy JOIN fit ON xy.event_type = fit.event_type),
      |l AS (
      |  SELECT event_type, e,
      |    LAG(e) OVER (PARTITION BY event_type ORDER BY x) AS ep
      |  FROM e)
      |SELECT event_type, COUNT(*) AS n_days,
      |  ROUND(SUM(CASE WHEN ep IS NOT NULL
      |      THEN (e - ep) * (e - ep) END) / SUM(e * e), 6) AS dw,
      |  ROUND(1.0 - SUM(CASE WHEN ep IS NOT NULL
      |      THEN (e - ep) * (e - ep) END) / SUM(e * e) / 2.0, 6)
      |    AS rho1
      |FROM l GROUP BY 1 ORDER BY 1""".stripMargin

  /** Breusch–Pagan heteroskedasticity test in Koenker's studentized
    * form (Breusch & Pagan, Econometrica 1979; Koenker, J. Econom.
    * 1981) — the third leg of the OLS diagnostics stool: q269 reports
    * the fit, q281 (Durbin–Watson) checks residual INDEPENDENCE, this
    * checks residual VARIANCE CONSTANCY. The auxiliary regression of
    * e² on x gives LM = n·R²_aux ~ χ²(1); fan-shaped daily residuals
    * (variance growing with the trend — the usual shape when revenue
    * scales with traffic) reject, and then q269's homoskedastic
    * standard errors are understated.
    *
    * Same dataflow as [[durbinWatson]]: type-cardinality fit moments
    * broadcast onto the calendar×type table, residuals squared in
    * place, one more grouped moment agg — two corpus-free passes over
    * a calendar-bounded frame. `(event_type, n_days, lm_stat,
    * sig_95)` ordered by type; LM is NULL when the aux moments
    * degenerate (constant e² or a single day). */
  def breuschPagan(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(sum("value").as("y"))
    val d0 = daily.agg(min("d").as("__d0"))
    val xy = daily.crossJoin(broadcast(d0))   // 1-row stat factor
      .select(col("event_type"),
        datediff(col("d"), col("__d0")).cast("double").as("x"),
        col("y"))
    val m = xy.groupBy("event_type").agg(
      avg("x").as("__mx"), avg("y").as("__my"),
      var_pop(col("x")).as("__vx"),
      covar_pop(col("x"), col("y")).as("__cxy"))
    val fit = m.select(col("event_type"),
      when(col("__vx") > 0.0, col("__cxy") / col("__vx")).as("__slope"),
      (col("__my") - when(col("__vx") > 0.0,
        col("__cxy") / col("__vx")) * col("__mx")).as("__icept"))
    val aux = xy.join(broadcast(fit), Seq("event_type"))
      .withColumn("__e2",
        pow(col("y") - (col("__icept") + col("__slope") * col("x")), 2))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        var_pop(col("__e2")).as("__ve"),
        var_pop(col("x")).as("__vx"),
        covar_pop(col("__e2"), col("x")).as("__cex"))
    val lm = when(col("__ve") > 0.0 && col("__vx") > 0.0 &&
        col("n_days") > 2,
      col("n_days") * col("__cex") * col("__cex") /
        (col("__ve") * col("__vx")))
    aux.select(
        col("event_type"), col("n_days"),
        round(lm, 6).as("lm_stat"),
        (lm > 3.841459).as("sig_95"))
      .orderBy("event_type")
  }

  /** DuckDB oracle for [[breuschPagan]]. */
  val breuschPaganOracleSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d, SUM(value) AS y
      |  FROM events GROUP BY 1, 2),
      |xy AS (
      |  SELECT event_type,
      |    CAST(d - (SELECT MIN(d) FROM daily) AS DOUBLE) AS x, y
      |  FROM daily),
      |m AS (
      |  SELECT event_type, AVG(x) AS mx, AVG(y) AS my,
      |    VAR_POP(x) AS vx, COVAR_POP(x, y) AS cxy
      |  FROM xy GROUP BY 1),
      |fit AS (
      |  SELECT event_type,
      |    CASE WHEN vx > 0 THEN cxy / vx END AS slope,
      |    my - (CASE WHEN vx > 0 THEN cxy / vx END) * mx AS icept
      |  FROM m),
      |e AS (
      |  SELECT xy.event_type, xy.x,
      |    POW(xy.y - (fit.icept + fit.slope * xy.x), 2) AS e2
      |  FROM xy JOIN fit ON xy.event_type = fit.event_type),
      |a AS (
      |  SELECT event_type, COUNT(*) AS n_days,
      |    VAR_POP(e2) AS ve, VAR_POP(x) AS vx,
      |    COVAR_POP(e2, x) AS cex
      |  FROM e GROUP BY 1),
      |s AS (
      |  SELECT event_type, n_days,
      |    CASE WHEN ve > 0 AND vx > 0 AND n_days > 2
      |      THEN n_days * cex * cex / (ve * vx) END AS lm
      |  FROM a)
      |SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
      |  ROUND(lm, 6) AS lm_stat, lm > 3.841459 AS sig_95
      |FROM s ORDER BY event_type""".stripMargin

  /** Optimal single structural break in the total daily-revenue
    * series: fit one line (pooled) vs two lines split at candidate
    * day c (left x < c, right x ≥ c), pick the c minimizing the
    * split SSE, report the Chow F = ((SSE_p − SSE_s)/2)/(SSE_s/(n−4)).
    * One row: `(split_x, split_d, n_days, sse_pooled, sse_split,
    * f_stat)`. Candidates keep ≥3 points per side. Ties in F go to
    * the earliest split (F rounded to 6 before ranking so the argmax
    * is FP-stable across engines).
    *
    * Scale shape: the series is CALENDAR-sized, so the candidate×day
    * grid is calendar² — bounded forever (a decade of days is 3.6k²
    * cells). Moments per (candidate, side), scalar Chow arithmetic,
    * one tiny ordered limit. The raw-event work is one grouped agg. */
  def breakpoint(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum("value").as("y"))
    val d0 = daily.agg(min("d").as("__d0"))
    val pts = daily.crossJoin(broadcast(d0))   // 1-row stat factor
      .select(datediff(col("d"), col("__d0")).cast("double").as("x"),
        col("y"), col("__d0"))
    val maxX = pts.agg(max("x").as("__mx"))
    val cand = pts.crossJoin(broadcast(maxX))
      .where(col("x") >= 3.0 && col("x") <= col("__mx") - 2.0)
      .select(col("x").as("c"))
    // calendar² grid: deliberate NLJ on a bounded frame
    val sides = pts.crossJoin(broadcast(cand))
      .select(col("c"), (col("x") < col("c")).as("__left"),
        col("x"), col("y"))
    // degenerate side (one distinct x): intercept-only fit, SSE = n·var(y)
    def sseExpr = greatest(
      when(var_pop(col("x")) > 0.0,
        count(lit(1)) * (var_pop(col("y")) -
          covar_pop(col("x"), col("y")) * covar_pop(col("x"), col("y")) /
            var_pop(col("x"))))
        .otherwise(count(lit(1)) * var_pop(col("y"))),
      lit(0.0))
    val perSide = sides.groupBy("c", "__left")
      .agg(count(lit(1)).as("__n"), sseExpr.as("__sse"))
    val perC = perSide.groupBy("c").agg(
      sum("__n").as("n_days"), sum("__sse").as("__sse_split"))
    val pooled = pts.groupBy(col("__d0")).agg(sseExpr.as("__sse_pooled"))
    perC.crossJoin(broadcast(pooled))   // 1-row stat factor
      .select(
        col("c").cast("bigint").as("split_x"),
        date_add(col("__d0"), col("c").cast("int")).as("split_d"),
        col("n_days"),
        round(col("__sse_pooled"), 2).as("sse_pooled"),
        round(col("__sse_split"), 2).as("sse_split"),
        round(when(col("__sse_split") > 0.0,
          (col("__sse_pooled") - col("__sse_split")) / 2.0 /
            (col("__sse_split") / (col("n_days") - 4))), 6).as("f_stat"))
      .orderBy(desc("f_stat"), asc("split_x"))
      .limit(1)
  }

  /** DuckDB oracle for [[breakpoint]]. */
  val breakpointOracleSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d, SUM(value) AS y
      |  FROM events GROUP BY 1),
      |pts AS (
      |  SELECT CAST(d - (SELECT MIN(d) FROM daily) AS DOUBLE) AS x, y
      |  FROM daily),
      |cand AS (
      |  SELECT x AS c FROM pts
      |  WHERE x >= 3 AND x <= (SELECT MAX(x) FROM pts) - 2),
      |sides AS (
      |  SELECT c, pts.x < c AS lft, x, y FROM pts CROSS JOIN cand),
      |per_side AS (
      |  SELECT c, lft, COUNT(*) AS n,
      |    GREATEST(CASE WHEN VAR_POP(x) > 0 THEN
      |      COUNT(*) * (VAR_POP(y) -
      |        COVAR_POP(x, y) * COVAR_POP(x, y) / VAR_POP(x))
      |      ELSE COUNT(*) * VAR_POP(y) END, 0.0) AS sse
      |  FROM sides GROUP BY 1, 2),
      |per_c AS (
      |  SELECT c, SUM(n) AS n_days, SUM(sse) AS sse_split
      |  FROM per_side GROUP BY 1),
      |pooled AS (
      |  SELECT GREATEST(COUNT(*) * (VAR_POP(y) -
      |      COVAR_POP(x, y) * COVAR_POP(x, y) / VAR_POP(x)), 0.0)
      |      AS sse_pooled
      |  FROM pts)
      |SELECT CAST(c AS BIGINT) AS split_x,
      |  (SELECT MIN(d) FROM daily) + CAST(c AS INTEGER) AS split_d,
      |  CAST(n_days AS BIGINT) AS n_days,
      |  ROUND(sse_pooled, 2) AS sse_pooled,
      |  ROUND(sse_split, 2) AS sse_split,
      |  ROUND(CASE WHEN sse_split > 0 THEN
      |    (sse_pooled - sse_split) / 2.0 / (sse_split / (n_days - 4))
      |    END, 6) AS f_stat
      |FROM per_c CROSS JOIN pooled
      |ORDER BY f_stat DESC, split_x ASC LIMIT 1""".stripMargin

  /** Sharp regression-discontinuity estimate (Thistlethwaite &
    * Campbell 1960; Imbens & Lemieux, J. Econometrics 2008): the jump
    * in an outcome at a cutoff of a running variable, from two local
    * LINEAR fits inside a bandwidth — here, does crossing
    * `c_acctbal = cutoff` discontinuously shift a customer's order
    * count? The causal-inference panel's third leg next to DiD (q267)
    * and CEM (q313): DiD needs time, matching needs covariates, RDD
    * needs only the threshold rule.
    *
    * One row: `(n_left, n_right, slope_left, slope_right,
    * intercept_left, intercept_right, jump)` where each intercept is
    * the fit's value AT the cutoff and jump = right − left. Left side
    * is x ∈ [cutoff−h, cutoff), right is [cutoff, cutoff+h]. NULL
    * family when a side's variance is zero.
    *
    * Scale shape: one outcome agg per unit, one bandwidth filter, one
    * 2-group moment agg — closed-form, no residual vectors. */
  def rddJump(customer: DataFrame, orders: DataFrame,
      cutoff: Double = 0.0, bandwidth: Double = 2000.0): DataFrame = {
    val y = customer
      .join(orders.groupBy(col("o_custkey").as("c_custkey"))
        .agg(count(lit(1)).as("__y")), Seq("c_custkey"), "left")
      .select(
        (col("c_acctbal").cast("double") - cutoff).as("x"),
        coalesce(col("__y"), lit(0L)).cast("double").as("y"))
      .where(col("x") >= -bandwidth && col("x") <= bandwidth)
      .withColumn("side", col("x") >= 0.0)
    val m = y.groupBy("side").agg(
      count(lit(1)).as("n"), avg("x").as("mx"), avg("y").as("my"),
      var_pop(col("x")).as("vx"),
      covar_pop(col("x"), col("y")).as("cxy"))
    val slope = when(col("vx") > 0.0, col("cxy") / col("vx"))
    val fit = m.select(col("side"), col("n"),
      round(slope, 6).as("b"),
      round(col("my") - slope * col("mx"), 6).as("a"))
    val l = fit.where(!col("side"))
      .select(col("n").as("n_left"), col("b").as("slope_left"),
        col("a").as("intercept_left"))
    val r = fit.where(col("side"))
      .select(col("n").as("n_right"), col("b").as("slope_right"),
        col("a").as("intercept_right"))
    l.crossJoin(r)   // two 1-row fit factors
      .select(col("n_left"), col("n_right"), col("slope_left"),
        col("slope_right"), col("intercept_left"),
        col("intercept_right"),
        round(col("intercept_right") - col("intercept_left"), 6)
          .as("jump"))
  }

  /** DuckDB oracle for [[rddJump]] (defaults). */
  val rddOracleSql: String =
    """WITH y AS (
      |  SELECT CAST(c.c_acctbal AS DOUBLE) - 0.0 AS x,
      |    CAST(COALESCE(o.n, 0) AS DOUBLE) AS y
      |  FROM customer c LEFT JOIN (
      |    SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY 1) o
      |    ON c.c_custkey = o.o_custkey
      |  WHERE CAST(c.c_acctbal AS DOUBLE) - 0.0 BETWEEN -2000 AND 2000),
      |m AS (
      |  SELECT x >= 0.0 AS side, COUNT(*) AS n, AVG(x) AS mx,
      |    AVG(y) AS my, VAR_POP(x) AS vx, COVAR_POP(x, y) AS cxy
      |  FROM y GROUP BY 1),
      |fit AS (
      |  SELECT side, n,
      |    ROUND(CASE WHEN vx > 0 THEN cxy / vx END, 6) AS b,
      |    ROUND(my - (CASE WHEN vx > 0 THEN cxy / vx END) * mx, 6)
      |      AS a
      |  FROM m)
      |SELECT l.n AS n_left, r.n AS n_right,
      |  l.b AS slope_left, r.b AS slope_right,
      |  l.a AS intercept_left, r.a AS intercept_right,
      |  ROUND(r.a - l.a, 6) AS jump
      |FROM (SELECT * FROM fit WHERE NOT side) l
      |CROSS JOIN (SELECT * FROM fit WHERE side) r""".stripMargin

  /** Empirical-Bayes shrinkage of per-user purchase-conversion rates
    * toward the corpus prior (beta-binomial method of moments): the
    * prior Beta(μM, (1−μ)M) has mean μ = global conversions/trials
    * and strength M = (μ(1−μ) − s²)/s² from the across-user variance
    * s² of raw rates (fallback M=100 when the MoM is undefined — all
    * users identical, or rate variance exceeding the binomial bound).
    * The posterior mean (x + μM)/(n + M) is what a leaderboard should
    * rank by — a 1/1 user must not outrank a 95/100 user.
    *
    * Output folds users into `user_id % 10` segments:
    * `(segment, users, avg_raw, avg_shrunk)` — shrunk rates pull
    * toward μ hardest exactly where n is small.
    *
    * Scale shape: one per-user agg, a 1-row broadcast prior factor,
    * one segment agg. */
  def ebShrinkage(events: DataFrame,
      convType: String = "purchase"): DataFrame = {
    val perUser = events.groupBy("user_id").agg(
      count(lit(1)).cast("double").as("n"),
      sum(when(col("event_type") === convType, 1.0).otherwise(0.0))
        .as("x"))
      .withColumn("p", col("x") / col("n"))
    val prior = perUser.agg(
      (sum("x") / sum("n")).as("__mu"),
      var_pop(col("p")).as("__s2"))
      .select(col("__mu"),
        when(col("__s2") > 0.0 &&
            col("__mu") * (lit(1.0) - col("__mu")) > col("__s2"),
          (col("__mu") * (lit(1.0) - col("__mu")) - col("__s2")) /
            col("__s2"))
          .otherwise(lit(100.0)).as("__m"))
    perUser.crossJoin(broadcast(prior))   // 1-row stat factor
      .withColumn("__post",
        (col("x") + col("__mu") * col("__m")) / (col("n") + col("__m")))
      .groupBy((col("user_id") % 10).as("segment"))
      .agg(count(lit(1)).as("users"),
        round(avg("p"), 6).as("avg_raw"),
        round(avg("__post"), 6).as("avg_shrunk"))
      .orderBy("segment")
  }

  /** DuckDB oracle for [[ebShrinkage]]. */
  def ebShrinkageOracleSql(convType: String = "purchase"): String =
    s"""WITH pu AS (
       |  SELECT user_id, CAST(COUNT(*) AS DOUBLE) AS n,
       |    SUM(CASE WHEN event_type = '$convType' THEN 1.0
       |      ELSE 0.0 END) AS x
       |  FROM events GROUP BY 1),
       |pp AS (SELECT user_id, n, x, x / n AS p FROM pu),
       |pr AS (
       |  SELECT SUM(x) / SUM(n) AS mu, VAR_POP(p) AS s2 FROM pp),
       |pm AS (
       |  SELECT mu,
       |    CASE WHEN s2 > 0 AND mu * (1 - mu) > s2
       |      THEN (mu * (1 - mu) - s2) / s2 ELSE 100.0 END AS m
       |  FROM pr)
       |SELECT user_id % 10 AS segment, COUNT(*) AS users,
       |  ROUND(AVG(p), 6) AS avg_raw,
       |  ROUND(AVG((x + mu * m) / (n + m)), 6) AS avg_shrunk
       |FROM pp CROSS JOIN pm
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** HAC-robust (Newey & West, Econometrica 1987) trend inference on
    * total daily revenue: [[olsTrend]]'s t-stat assumes independent
    * errors, and q271's Durbin–Watson row documents exactly when that
    * lies — this query completes the loop by re-computing the slope's
    * standard error from the Bartlett-weighted long-run variance of
    * the score hₜ = (xₜ−x̄)·uₜ (the same kernel and lag rule
    * l = ⌊4(n/100)^¼⌋ as the KPSS long-run variance):
    * Var(β̂) = Σ_{|j|≤l} w_j·Γ_j / S_xx², w_j = 1−|j|/(l+1). Both
    * t's are reported side by side — the GAP between them is the
    * serial-correlation penalty. Asymptotic normal gate on t_nw.
    *
    * One row `(n_days, lag_l, slope, se_ols, se_nw, t_ols, t_nw,
    * sig_95)`. Scale shape: one corpus agg to the calendar table, a
    * 1-row OLS factor joined back for scores, the KPSS-style bounded
    * self-lag join (calendar×(l+1) rows), 1-row finish. */
  def hacTrend(events: DataFrame): DataFrame = {
    val daily = events.groupBy(to_date(col("ts")).as("d"))
      .agg(sum("value").as("y"))
    val mom = daily.agg(
      count(lit(1)).cast("double").as("__n"),
      avg("y").as("__my"),
      min("d").as("__d0"))
    val xy = daily.crossJoin(broadcast(mom))   // 1-row stat factor
      .withColumn("__t", row_number()
        .over(org.apache.spark.sql.expressions.Window.orderBy("d"))
        .cast("double"))
      .withColumn("__x", datediff(col("d"), col("__d0")).cast("double"))
    val m2 = xy.agg(
      first("__n").as("__n"), first("__my").as("__my2"),
      avg("__x").as("__mx"),
      sum(col("__x") * col("__x")).as("__sxx0"),
      sum(col("__x") * col("y")).as("__sxy0"),
      sum(col("y") * col("y")).as("__syy0"))
    val nD = col("__n")
    val sxx = col("__sxx0") - nD * col("__mx") * col("__mx")
    val sxy = col("__sxy0") - nD * col("__mx") * col("__my2")
    val syy = col("__syy0") - nD * col("__my2") * col("__my2")
    val slope = when(sxx > 0.0, sxy / sxx)
    val ols = m2.select(
      col("__n"), col("__mx"),
      slope.as("__b"),
      (col("__my2") - slope * col("__mx")).as("__a"),
      sxx.as("__sxx"),
      when(nD > 2.0 && sxx > 0.0,
        sqrt(greatest(syy - slope * sxy, lit(0.0)) /
          (nD - 2.0) / sxx)).as("__se_ols"),
      floor(pow(nD / 100.0, 0.25) * 4.0).cast("double").as("__l"))
    val h = xy.select(col("__t"), col("__x"), col("y"))
      .crossJoin(broadcast(ols))   // 1-row OLS factor
      .withColumn("__h", (col("__x") - col("__mx")) *
        (col("y") - col("__a") - col("__b") * col("__x")))
    val gam = h.as("a").join(h.as("b"),
        col("b.__t") >= col("a.__t") &&
          col("b.__t") <= col("a.__t") + col("a.__l"))
      .select((col("b.__t") - col("a.__t")).as("__j"),
        (col("a.__h") * col("b.__h")).as("__p"))
      .groupBy("__j").agg(sum("__p").as("__g"))
    val fin = gam.crossJoin(broadcast(ols))   // 1-row factor
      .agg(
        first("__n").as("__nf"), first("__l").as("__lf"),
        first("__b").as("__bf"), first("__se_ols").as("__seof"),
        first("__sxx").as("__sxxf"),
        sum(when(col("__j") === 0.0, col("__g"))
          .otherwise(col("__g") * 2.0 *
            (lit(1.0) - col("__j") / (col("__l") + 1.0))))
          .as("__s"))
    val seNw = when(col("__s") > 0.0 && col("__sxxf") > 0.0,
      sqrt(col("__s")) / col("__sxxf"))
    fin.select(
      col("__nf").cast("bigint").as("n_days"),
      col("__lf").cast("bigint").as("lag_l"),
      round(col("__bf"), 6).as("slope"),
      round(col("__seof"), 6).as("se_ols"),
      round(seNw, 6).as("se_nw"),
      round(when(col("__seof") > 0.0, col("__bf") / col("__seof")), 6)
        .as("t_ols"),
      round(when(seNw > 0.0, col("__bf") / seNw), 6).as("t_nw"),
      coalesce(abs(when(seNw > 0.0, col("__bf") / seNw)) > 1.959964,
        lit(false)).as("sig_95"))
  }

  /** DuckDB oracle for [[hacTrend]]. */
  val hacTrendOracleSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d, SUM(value) AS y
      |  FROM events GROUP BY 1),
      |mom AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(y) AS my,
      |    MIN(d) AS d0
      |  FROM daily),
      |xy AS (
      |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) AS DOUBLE) AS t,
      |    CAST(d - mom.d0 AS DOUBLE) AS x, y, mom.n, mom.my
      |  FROM daily CROSS JOIN mom),
      |m2 AS (
      |  SELECT ANY_VALUE(n) AS n, ANY_VALUE(my) AS my, AVG(x) AS mx,
      |    SUM(x * x) AS sxx0, SUM(x * y) AS sxy0, SUM(y * y) AS syy0
      |  FROM xy),
      |ols AS (
      |  SELECT n, mx,
      |    CASE WHEN sxx0 - n * mx * mx > 0
      |      THEN (sxy0 - n * mx * my) / (sxx0 - n * mx * mx) END AS b,
      |    my - CASE WHEN sxx0 - n * mx * mx > 0
      |      THEN (sxy0 - n * mx * my) / (sxx0 - n * mx * mx) END * mx
      |      AS a,
      |    sxx0 - n * mx * mx AS sxx,
      |    CASE WHEN n > 2 AND sxx0 - n * mx * mx > 0
      |      THEN SQRT(GREATEST(
      |        (syy0 - n * my * my) -
      |        (sxy0 - n * mx * my) / (sxx0 - n * mx * mx) *
      |          (sxy0 - n * mx * my), 0.0) /
      |        (n - 2.0) / (sxx0 - n * mx * mx)) END AS se_ols,
      |    FLOOR(POW(n / 100.0, 0.25) * 4.0) AS l
      |  FROM m2),
      |h AS (
      |  SELECT t, (x - ols.mx) * (y - ols.a - ols.b * x) AS h,
      |    ols.n, ols.l, ols.b, ols.se_ols, ols.sxx
      |  FROM xy CROSS JOIN ols),
      |gam AS (
      |  SELECT b.t - a.t AS j, SUM(a.h * b.h) AS g
      |  FROM h a JOIN h b
      |    ON b.t >= a.t AND b.t <= a.t + a.l
      |  GROUP BY 1),
      |fin AS (
      |  SELECT ols.n AS n, ols.l AS l, ols.b AS b,
      |    ols.se_ols AS se_ols, ols.sxx AS sxx,
      |    SUM(CASE WHEN j = 0 THEN g
      |      ELSE g * 2.0 * (1.0 - j / (ols.l + 1.0)) END) AS s
      |  FROM gam CROSS JOIN ols
      |  GROUP BY 1, 2, 3, 4, 5),
      |fe AS (
      |  SELECT n, l, b, se_ols,
      |    CASE WHEN s > 0 AND sxx > 0 THEN SQRT(s) / sxx END AS se_nw
      |  FROM fin)
      |SELECT CAST(n AS BIGINT) AS n_days,
      |  CAST(l AS BIGINT) AS lag_l,
      |  ROUND(b, 6) AS slope,
      |  ROUND(se_ols, 6) AS se_ols,
      |  ROUND(se_nw, 6) AS se_nw,
      |  ROUND(CASE WHEN se_ols > 0 THEN b / se_ols END, 6) AS t_ols,
      |  ROUND(CASE WHEN se_nw > 0 THEN b / se_nw END, 6) AS t_nw,
      |  COALESCE(ABS(CASE WHEN se_nw > 0 THEN b / se_nw END)
      |    > 1.959964, FALSE) AS sig_95
      |FROM fe""".stripMargin
}
