package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lag-1 Granger "causality" between two daily series (Granger,
  * Econometrica 1969) — the feed-level diagnostic behind every "does
  * traffic predict revenue, or does revenue predict traffic?"
  * dashboard question: regress today's value on BOTH series'
  * yesterdays and F-test whether the cross-lag coefficient earns its
  * keep over the own-lag-only model. Both directions are reported,
  * because the interesting outcomes are the asymmetric ones.
  *
  * Everything reduces to CLOSED-FORM MOMENTS of the lagged daily
  * table (the [[Regression]] discipline): the two-regressor OLS
  * solves a 2×2 normal equation per direction from six pooled
  * covariances, so the engine aggregates a calendar-sized frame once
  * and does scalar arithmetic on ONE row — no residual vectors, no
  * iteration, mergeable map-side partials at any corpus size.
  *
  * Reference analog: the daily-metrics trend readouts the reference
  * consumes in pandas (`dbt/models/marts/fct_daily_store_metrics
  * .sql:6-32`); the inference here is a Spark plan.
  */
object Causality {

  /** Lag-1 Granger F-tests between daily aggregates of two event
    * slices: series `y` = SUM(value) over rows matching `yFilter`
    * (default: purchase revenue), series `x` = COUNT(*) over rows
    * matching `xFilter` (default: non-purchase traffic). Output is
    * two rows `(direction, n, cross_coef, sse_restricted,
    * sse_unrestricted, f_stat)`, direction ∈ {'x->y', 'y->x'},
    * ordered by direction. F = ((SSE_r − SSE_u)/1)/(SSE_u/(n−3));
    * NULL when the normal-equation determinant or SSE_u is
    * numerically zero (constant series).
    *
    * Scale shape: one grouped agg to the calendar table, one
    * calendar-sized lag window, one moment agg to a single row. */
  def granger(events: DataFrame,
      yFilter: Column = col("event_type") === "purchase",
      xFilter: Column = col("event_type") =!= "purchase"): DataFrame = {
    val daily = events
      .groupBy(to_date(col("ts")).as("d"))
      .agg(
        coalesce(sum(when(yFilter, col("value"))), lit(0.0)).as("y"),
        sum(when(xFilter, 1.0).otherwise(0.0)).as("x"))
    // calendar-sized frame: the single-partition window is bounded
    val w = Window.orderBy("d")
    val lagged = daily
      .withColumn("yl", lag("y", 1).over(w))
      .withColumn("xl", lag("x", 1).over(w))
      .where(col("yl").isNotNull && col("xl").isNotNull)
    val m = lagged.agg(
      count(lit(1)).cast("double").as("n"),
      var_pop(col("y")).as("vy"), var_pop(col("x")).as("vx"),
      var_pop(col("yl")).as("vu"), var_pop(col("xl")).as("vv"),
      covar_pop(col("yl"), col("xl")).as("cuv"),
      covar_pop(col("y"), col("yl")).as("cyu"),
      covar_pop(col("y"), col("xl")).as("cyv"),
      covar_pop(col("x"), col("xl")).as("cxu"),
      covar_pop(col("x"), col("yl")).as("cxv"))

    // direction rows share the lag-covariance determinant
    def dir(name: String, vt: Column, cOwn: Column, cCross: Column,
        vOwn: Column, vCross: Column, cuv: Column, n: Column) = {
      val det = vOwn * vCross - cuv * cuv
      val b = (cOwn * vCross - cCross * cuv) / det    // own-lag coef
      val c = (cCross * vOwn - cOwn * cuv) / det      // cross-lag coef
      val sseU = greatest(n * (vt - b * cOwn - c * cCross), lit(0.0))
      val sseR = greatest(
        when(vOwn > 0.0, n * (vt - cOwn * cOwn / vOwn))
          .otherwise(n * vt), lit(0.0))
      struct(
        lit(name).as("direction"), n.cast("bigint").as("n"),
        round(when(det > 0.0, c), 6).as("cross_coef"),
        round(sseR, 2).as("sse_restricted"),
        round(when(det > 0.0, sseU), 2).as("sse_unrestricted"),
        round(when(det > 0.0 && sseU > 0.0 && n > 3.0,
          (sseR - sseU) / (sseU / (n - 3.0))), 6).as("f_stat"))
    }
    m.select(explode(array(
        dir("x->y", col("vy"), col("cyu"), col("cyv"),
          col("vu"), col("vv"), col("cuv"), col("n")),
        dir("y->x", col("vx"), col("cxu"), col("cxv"),
          col("vv"), col("vu"), col("cuv"), col("n"))))
        .as("r"))
      .select(col("r.*"))
      .orderBy("direction")
  }

  /** DuckDB oracle for [[granger]] with the default purchase /
    * non-purchase slices — identical guarded moments. */
  val grangerOracleSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d,
      |    COALESCE(SUM(CASE WHEN event_type = 'purchase'
      |      THEN value END), 0.0) AS y,
      |    SUM(CASE WHEN event_type <> 'purchase'
      |      THEN 1.0 ELSE 0.0 END) AS x
      |  FROM events GROUP BY 1),
      |lagged AS (
      |  SELECT y, x,
      |    LAG(y) OVER (ORDER BY d) AS yl,
      |    LAG(x) OVER (ORDER BY d) AS xl
      |  FROM daily),
      |m AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |    VAR_POP(y) AS vy, VAR_POP(x) AS vx,
      |    VAR_POP(yl) AS vu, VAR_POP(xl) AS vv,
      |    COVAR_POP(yl, xl) AS cuv,
      |    COVAR_POP(y, yl) AS cyu, COVAR_POP(y, xl) AS cyv,
      |    COVAR_POP(x, xl) AS cxu, COVAR_POP(x, yl) AS cxv
      |  FROM lagged WHERE yl IS NOT NULL AND xl IS NOT NULL),
      |dirs AS (
      |  SELECT 'x->y' AS direction, n, vy AS vt, cyu AS c_own,
      |    cyv AS c_cross, vu AS v_own, vv AS v_cross, cuv FROM m
      |  UNION ALL
      |  SELECT 'y->x', n, vx, cxu, cxv, vv, vu, cuv FROM m),
      |s AS (
      |  SELECT direction, n,
      |    v_own * v_cross - cuv * cuv AS det,
      |    (c_own * v_cross - c_cross * cuv) /
      |      (v_own * v_cross - cuv * cuv) AS b,
      |    (c_cross * v_own - c_own * cuv) /
      |      (v_own * v_cross - cuv * cuv) AS c,
      |    vt, c_own, c_cross, v_own
      |  FROM dirs),
      |f AS (
      |  SELECT direction, n, det, c,
      |    GREATEST(n * (vt - b * c_own - c * c_cross), 0.0) AS sse_u,
      |    GREATEST(CASE WHEN v_own > 0
      |      THEN n * (vt - c_own * c_own / v_own)
      |      ELSE n * vt END, 0.0) AS sse_r
      |  FROM s)
      |SELECT direction, CAST(n AS BIGINT) AS n,
      |  ROUND(CASE WHEN det > 0 THEN c END, 6) AS cross_coef,
      |  ROUND(sse_r, 2) AS sse_restricted,
      |  ROUND(CASE WHEN det > 0 THEN sse_u END, 2)
      |    AS sse_unrestricted,
      |  ROUND(CASE WHEN det > 0 AND sse_u > 0 AND n > 3
      |    THEN (sse_r - sse_u) / (sse_u / (n - 3.0)) END, 6)
      |    AS f_stat
      |FROM f ORDER BY direction""".stripMargin

  /** Distance correlation between the two daily series (Székely,
    * Rizzo & Bakirov, Ann. Stat. 2007) — the dependence measure that
    * is ZERO exactly when the series are independent: Pearson (q243)
    * reads only linear coupling and Spearman only monotone; dCor
    * responds to ANY functional dependence (V-shaped, periodic,
    * heteroskedastic), which is what "does purchase volume depend on
    * traffic at all" actually asks. Double-centered pairwise-distance
    * matrices; dCor² = dCov²/√(dVarₓ²·dVarᵧ²).
    *
    * Scale shape: the corpus collapses to the daily (x, y) table in
    * one grouped agg; the day² pair grid, its row/column means, and
    * the centered products are all calendar²-bounded (the Theil–Sen
    * precedent — a decade of days is 3.6k², forever tiny). One row
    * `(n_days, dcov2, dvarx2, dvary2, dcor)`; NULL when either
    * marginal distance variance degenerates (constant series). */
  def distanceCorrelation(events: DataFrame,
      yFilter: Column = col("event_type") === "purchase",
      xFilter: Column = col("event_type") =!= "purchase"): DataFrame = {
    val daily = events
      .groupBy(to_date(col("ts")).as("d"))
      .agg(
        coalesce(sum(when(yFilter, col("value"))), lit(0.0)).as("y"),
        sum(when(xFilter, 1.0).otherwise(0.0)).as("x"))
    val l = daily.select(col("d").as("di"), col("x").as("xi"),
      col("y").as("yi"))
    val r = daily.select(col("d").as("dj"), col("x").as("xj"),
      col("y").as("yj"))
    val pairs = l.crossJoin(r)   // days² — calendar-bounded
      .select(col("di"), col("dj"),
        abs(col("xi") - col("xj")).as("a"),
        abs(col("yi") - col("yj")).as("b"))
    val rowM = pairs.groupBy("di")
      .agg(avg("a").as("ra"), avg("b").as("rb"))
    val colM = pairs.groupBy("dj")
      .agg(avg("a").as("ca"), avg("b").as("cb"))
    val grand = pairs.agg(avg("a").as("ga"), avg("b").as("gb"),
      countDistinct("di").as("__n"))
    val centered = pairs
      .join(rowM, "di").join(colM, "dj")
      .crossJoin(broadcast(grand))   // 1-row stat factor
      .select(
        (col("a") - col("ra") - col("ca") + col("ga")).as("ac"),
        (col("b") - col("rb") - col("cb") + col("gb")).as("bc"),
        col("__n"))
    val s = centered.agg(
      first("__n").as("n_days"),
      avg(col("ac") * col("bc")).as("__dcov2"),
      avg(col("ac") * col("ac")).as("__dvx2"),
      avg(col("bc") * col("bc")).as("__dvy2"))
    val ok = col("__dvx2") > 0.0 && col("__dvy2") > 0.0
    s.select(
      col("n_days").cast("bigint").as("n_days"),
      round(col("__dcov2"), 6).as("dcov2"),
      round(col("__dvx2"), 6).as("dvarx2"),
      round(col("__dvy2"), 6).as("dvary2"),
      round(when(ok, sqrt(
        greatest(col("__dcov2"), lit(0.0)) /
          sqrt(col("__dvx2") * col("__dvy2")))), 6).as("dcor"))
  }

  /** DuckDB oracle for [[distanceCorrelation]] (defaults). */
  val distanceCorrelationOracleSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d,
      |    COALESCE(SUM(CASE WHEN event_type = 'purchase'
      |      THEN value END), 0.0) AS y,
      |    SUM(CASE WHEN event_type <> 'purchase'
      |      THEN 1.0 ELSE 0.0 END) AS x
      |  FROM events GROUP BY 1),
      |p AS (
      |  SELECT i.d AS di, j.d AS dj,
      |    ABS(i.x - j.x) AS a, ABS(i.y - j.y) AS b
      |  FROM daily i CROSS JOIN daily j),
      |rm AS (SELECT di, AVG(a) AS ra, AVG(b) AS rb FROM p GROUP BY 1),
      |cm AS (SELECT dj, AVG(a) AS ca, AVG(b) AS cb FROM p GROUP BY 1),
      |g AS (SELECT AVG(a) AS ga, AVG(b) AS gb,
      |  COUNT(DISTINCT di) AS n FROM p),
      |c AS (
      |  SELECT p.a - rm.ra - cm.ca + g.ga AS ac,
      |    p.b - rm.rb - cm.cb + g.gb AS bc, g.n
      |  FROM p JOIN rm ON p.di = rm.di JOIN cm ON p.dj = cm.dj
      |  CROSS JOIN g),
      |s AS (
      |  SELECT ANY_VALUE(n) AS n, AVG(ac * bc) AS dcov2,
      |    AVG(ac * ac) AS dvx2, AVG(bc * bc) AS dvy2
      |  FROM c)
      |SELECT CAST(n AS BIGINT) AS n_days,
      |  ROUND(dcov2, 6) AS dcov2,
      |  ROUND(dvx2, 6) AS dvarx2,
      |  ROUND(dvy2, 6) AS dvary2,
      |  ROUND(CASE WHEN dvx2 > 0 AND dvy2 > 0
      |    THEN SQRT(GREATEST(dcov2, 0.0) / SQRT(dvx2 * dvy2)) END, 6)
      |    AS dcor
      |FROM s""".stripMargin
}
