package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grubbs' test for a single outlier in the daily revenue series
  * (Grubbs, Technometrics 1969): G = max|x − x̄|/s against the exact
  * critical value G_crit = ((n−1)/√n)·√(t²/(n−2+t²)) with t the
  * upper α/(2n) quantile of Student's t with n−2 df — the
  * Bonferroni-per-observation form that makes "the worst day looks
  * weird" a calibrated statement instead of an eyeball. Complements
  * the charts ([[ControlCharts.imrChart]] flags against short-term
  * sigma; Grubbs asks whether the single most extreme point is
  * consistent with the Gaussian bulk AT THIS n).
  *
  * Quantile machinery — shared VERBATIM with the oracle so parity is
  * bit-tight regardless of approximation error:
  *  - the normal quantile by Acklam's upper-tail rational (the only
  *    branch ever taken: p = 1 − α/(2n) > 0.9988 for n ≥ 21, and the
  *    operator requires n ≥ 21);
  *  - Student-t from z by the Cornish–Fisher expansion to ν⁻⁴
  *    (Fisher & Cornish 1960) — at the calendar n this engine runs
  *    (ν ≥ 19) the truncation error is < 1e-6 in t.
  *
  * One corpus aggregate to the calendar table, one moment pass, one
  * ordered limit for the argmax day. One row `(n_days, mean, sd,
  * g_stat, g_crit_95, sig_95, worst_day)`. */
object Outliers {

  /** Acklam's inverse normal CDF, UPPER-TAIL branch only (valid for
    * p > 0.97575): z = −r(q), q = √(−2·ln(1−p)). Shared with the
    * Conover–Iman post-hoc ([[Homogeneity.conoverIman]]).
    *
    * SCALAR (JVM) form, wrapped in a deterministic UDF at the call
    * sites: these quantiles only ever evaluate on 1-row stat tails,
    * and the fully-inlined Column form of the chain (z appears 9×
    * in the Cornish–Fisher polynomial, each copy re-expanding the
    * whole Acklam rational) blew the plan to a multi-MB task binary
    * costing ~3 s of per-run plan/codegen overhead — measured on
    * q426 at bench scale, vs ~0.5 s for its non-quantile siblings.
    * IEEE arithmetic is deterministic, so the scalar twin with the
    * IDENTICAL operation order is bit-identical to both the old
    * Column form and the oracle's staged-CTE SQL. */
  private[operators] def qnormUpperD(p: Double): Double = {
    val q = math.sqrt(math.log(1.0 - p) * -2.0)
    val num = ((((q * -7.784894002430293e-3 +
      -0.3223964580411365) * q + -2.400758277161838) * q +
      -2.549732539343734) * q + 4.374664141464968) * q +
      2.938163982698783
    val den = (((q * 7.784695709041462e-3 +
      0.3224671290700398) * q + 2.445134137142996) * q +
      3.754408661907416) * q + 1.0
    // the lower-tail rational is negative; the upper tail is its
    // reflection
    (num / den) * -1.0
  }

  /** Cornish–Fisher t quantile from the normal quantile z at ν df
    * (Fisher & Cornish, Technometrics 1960, terms to ν⁻⁴) — scalar
    * twin, operation order identical to the oracle SQL. */
  private[operators] def tFromZD(z: Double, nu: Double): Double = {
    val z2 = z * z
    z + (z * z2 + z) / (nu * 4.0) +
      (z * z2 * z2 * 5.0 + z * z2 * 16.0 + z * 3.0) /
        (nu * nu * 96.0) +
      (z * z2 * z2 * z2 * 3.0 + z * z2 * z2 * 19.0 +
        z * z2 * 17.0 - z * 15.0) / (nu * nu * nu * 384.0) +
      (z * z2 * z2 * z2 * z2 * 79.0 + z * z2 * z2 * z2 * 776.0 +
        z * z2 * z2 * 1482.0 - z * z2 * 1920.0 - z * 945.0) /
        (nu * nu * nu * nu * 92160.0)
  }

  /** Grubbs/GESD critical value at per-observation level α/(2n),
    * ν = n−2 — the scalar chain the q426/q427 oracles stage through
    * CTE columns. */
  private[operators] def gCritD(n: Double, alpha: Double): Double = {
    val p = 1.0 - alpha / (n * 2.0)
    val t = tFromZD(qnormUpperD(p), n - 2.0)
    (n - 1.0) / math.sqrt(n) * math.sqrt(t * t / (n - 2.0 + t * t))
  }

  /** Acklam's upper-tail rational needs p > 0.97575 and the
    * Cornish–Fisher truncation bound is established for ν ≥ 19; with
    * the n ≥ 21 output gate both hold for any α ≤ 0.1, so the domain
    * is enforced here rather than silently mis-evaluated. */
  private def requireAlphaInDomain(alpha: Double): Unit =
    require(alpha > 0.0 && alpha <= 0.1,
      s"alpha=$alpha outside (0, 0.1]: the Acklam upper-tail branch " +
        "and the Cornish-Fisher nu>=19 accuracy bound only cover " +
        "small tail probabilities")

  /** One-pass moments + argmax: |y − μ| is maximized at the max or
    * the min of y, so ONE aggregation emitting (n, μ, s, argmax-y,
    * argmin-y) replaces the moment-factor-broadcast + ordered-limit
    * two-job plan (measured 3.5 s → sub-second at bench scale). Day
    * keys ride inside the extreme structs with the sign arranged so
    * ties resolve to the EARLIEST day — bit-identical to the
    * oracle's `ORDER BY dev DESC, d ASC LIMIT 1`. Emits the 1-row
    * frame `(d, y, __n, __mu, __sd, __dev)`; empty input → 0 rows
    * (the LIMIT-1-on-empty convention). */
  private def worstDay(daily: DataFrame): DataFrame = {
    val dk = datediff(col("d"), lit("1970-01-01").cast("date"))
    val agg = daily
      .select(col("d"), col("y"), dk.as("__dk"))
      .agg(
        count(lit(1)).as("__n"), avg("y").as("__mu"),
        stddev_samp(col("y")).as("__sd"),
        max(struct(col("y"), (col("__dk") * -1).as("__nk")))
          .as("__hi"),
        min(struct(col("y"), col("__dk"))).as("__lo"))
      .where(col("__n") > 0L)
    val dHi = date_add(lit("1970-01-01").cast("date"),
      col("__hi.__nk") * -1)
    val dLo = date_add(lit("1970-01-01").cast("date"),
      col("__lo.__dk"))
    val devHi = col("__hi.y") - col("__mu")
    val devLo = col("__mu") - col("__lo.y")
    val pickHi = devHi > devLo ||
      (devHi === devLo && dHi <= dLo)
    agg.select(
      when(pickHi, dHi).otherwise(dLo).as("d"),
      when(pickHi, col("__hi.y")).otherwise(col("__lo.y")).as("y"),
      col("__n"), col("__mu"), col("__sd"),
      when(pickHi, devHi).otherwise(devLo).as("__dev"))
  }

  def grubbs(events: DataFrame, alpha: Double = 0.05): DataFrame = {
    requireAlphaInDomain(alpha)
    val daily = events.groupBy(to_date(col("ts")).as("d"))
      .agg(sum("value").as("y"))
    val worst = worstDay(daily)
    val n = col("__n").cast("double")
    val critU = udf((nn: Double) => gCritD(nn, alpha))
    val gCrit = critU(n)
    val g = when(col("__sd") > 0.0, col("__dev") / col("__sd"))
    worst.select(
      col("__n").cast("bigint").as("n_days"),
      round(col("__mu"), 6).as("mean"),
      round(col("__sd"), 6).as("sd"),
      round(g, 6).as("g_stat"),
      round(when(col("__n") >= 21L, gCrit), 6).as("g_crit_95"),
      coalesce(col("__n") >= 21L && g > gCrit, lit(false))
        .as("sig_95"),
      col("d").cast("date").as("worst_day"))
  }

  /** DuckDB oracle for [[grubbs]] on events daily revenue — the
    * identical Acklam upper-tail rational and Cornish–Fisher
    * expansion, staged through CTE columns in the engine's exact
    * operation order. */
  val grubbsOracleSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d, SUM(value) AS y
      |  FROM events GROUP BY 1),
      |m AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(y) AS mu,
      |    STDDEV_SAMP(y) AS sd
      |  FROM daily),
      |w AS (
      |  SELECT daily.d, daily.y, m.n, m.mu, m.sd,
      |    ABS(daily.y - m.mu) AS dev
      |  FROM daily CROSS JOIN m
      |  ORDER BY dev DESC, d ASC LIMIT 1),
      |qn AS (
      |  SELECT *, SQRT(-2.0 * LN(1.0 - (1.0 - 0.05 / (2.0 * n))))
      |    AS q
      |  FROM w),
      |zc AS (
      |  SELECT *,
      |    ((((((q * -7.784894002430293e-3 +
      |      -0.3223964580411365) * q + -2.400758277161838) * q +
      |      -2.549732539343734) * q + 4.374664141464968) * q +
      |      2.938163982698783) /
      |     ((((q * 7.784695709041462e-3 + 0.3224671290700398) * q +
      |      2.445134137142996) * q + 3.754408661907416) * q + 1.0))
      |      * -1.0 AS z
      |  FROM qn),
      |tc AS (
      |  SELECT *, n - 2.0 AS nu,
      |    z + (z * z * z + z) / ((n - 2.0) * 4.0) +
      |    (5.0 * z * z * z * z * z + 16.0 * z * z * z + 3.0 * z) /
      |      ((n - 2.0) * (n - 2.0) * 96.0) +
      |    (3.0 * POW(z, 7) + 19.0 * POW(z, 5) + 17.0 * z * z * z -
      |      15.0 * z) / (POW(n - 2.0, 3) * 384.0) +
      |    (79.0 * POW(z, 9) + 776.0 * POW(z, 7) +
      |      1482.0 * POW(z, 5) - 1920.0 * z * z * z - 945.0 * z) /
      |      (POW(n - 2.0, 4) * 92160.0) AS t
      |  FROM zc),
      |g AS (
      |  SELECT *,
      |    (n - 1.0) / SQRT(n) * SQRT(t * t / (n - 2.0 + t * t))
      |      AS gcrit,
      |    CASE WHEN sd > 0 THEN dev / sd END AS gs
      |  FROM tc)
      |SELECT CAST(n AS BIGINT) AS n_days,
      |  ROUND(mu, 6) AS mean, ROUND(sd, 6) AS sd,
      |  ROUND(gs, 6) AS g_stat,
      |  ROUND(CASE WHEN n >= 21 THEN gcrit END, 6) AS g_crit_95,
      |  COALESCE(n >= 21 AND gs > gcrit, FALSE) AS sig_95,
      |  d AS worst_day
      |FROM g""".stripMargin

  /** Generalized ESD (Rosner, Technometrics 1983), k = 3 rounds
    * unrolled, on the daily revenue series. Fixes Grubbs' masking
    * failure: two comparable outliers inflate s enough that neither
    * clears the single-test critical value, while ESD re-estimates
    * the moments after removing each round's argmax, so round i is
    * exactly Grubbs applied to the n−i+1 surviving days (λ_i with
    * n→n_i is algebraically Rosner's (n−i)·t/√((n−i−1+t²)(n−i+1))).
    * The GESD decision rule — the outlier count is the LARGEST i with
    * R_i > λ_i, not the first — is what defeats masking, and is
    * emitted as `flagged` = (round ≤ last significant round).
    *
    * The daily table is calendar-bounded; it is persisted once, so
    * events is scanned a single time and each round's moment/argmax
    * passes are in-memory re-reads. Per-round critical values reuse
    * the q426 Acklam + Cornish–Fisher chain verbatim (oracle-shared).
    * One row per round `(round, n_days, g_stat, g_crit_95, worst_day,
    * flagged)`, ordered by round. */
  def gesd(events: DataFrame, alpha: Double = 0.05): DataFrame = {
    requireAlphaInDomain(alpha)
    val daily = events.groupBy(to_date(col("ts")).as("d"))
      .agg(sum("value").as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def worstOf(df: DataFrame, roundNo: Int): DataFrame =
      worstDay(df).withColumn("__round", lit(roundNo))
    val w1 = worstOf(daily, 1)
    val d2 = daily.join(broadcast(w1.select(col("d"))), Seq("d"),
      "left_anti")
    val w2 = worstOf(d2, 2)
    val d3 = d2.join(broadcast(w2.select(col("d"))), Seq("d"),
      "left_anti")
    val w3 = worstOf(d3, 3)
    val rounds = w1.unionByName(w2).unionByName(w3)
    val n = col("__n").cast("double")
    val critU = udf((nn: Double) => gCritD(nn, alpha))
    val gCrit = critU(n)
    val g = when(col("__sd") > 0.0, col("__dev") / col("__sd"))
    val flg = coalesce(col("__n") >= 21L && g > gCrit, lit(false))
    val base = rounds.select(
      col("__round").cast("bigint").as("round"),
      col("__n").cast("bigint").as("n_days"),
      round(g, 6).as("g_stat"),
      round(when(col("__n") >= 21L, gCrit), 6).as("g_crit_95"),
      col("d").cast("date").as("worst_day"),
      flg.as("__flg"))
    // GESD rule over the 3-row frame: flagged through the LAST
    // significant round, even if an earlier round (masked) was not
    val frame = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
    base
      .withColumn("__last",
        max(when(col("__flg"), col("round"))).over(frame))
      .select(col("round"), col("n_days"), col("g_stat"),
        col("g_crit_95"), col("worst_day"),
        coalesce(col("round") <= col("__last"), lit(false))
          .as("flagged"))
      .orderBy("round")
  }

  /** DuckDB oracle for [[gesd]] — three chained remove-argmax CTEs,
    * then the identical Acklam + Cornish–Fisher chain applied to the
    * unioned 3-row set with per-round n, and the last-significant-
    * round GESD decision. */
  val gesdOracleSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d, SUM(value) AS y
      |  FROM events GROUP BY 1),
      |m1 AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(y) AS mu,
      |    STDDEV_SAMP(y) AS sd FROM daily),
      |w1 AS (
      |  SELECT 1 AS r, daily.d, m1.n, m1.sd,
      |    ABS(daily.y - m1.mu) AS dev
      |  FROM daily CROSS JOIN m1
      |  ORDER BY dev DESC, d ASC LIMIT 1),
      |d2 AS (
      |  SELECT * FROM daily WHERE d NOT IN (SELECT d FROM w1)),
      |m2 AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(y) AS mu,
      |    STDDEV_SAMP(y) AS sd FROM d2),
      |w2 AS (
      |  SELECT 2 AS r, d2.d, m2.n, m2.sd,
      |    ABS(d2.y - m2.mu) AS dev
      |  FROM d2 CROSS JOIN m2
      |  ORDER BY dev DESC, d ASC LIMIT 1),
      |d3 AS (
      |  SELECT * FROM d2 WHERE d NOT IN (SELECT d FROM w2)),
      |m3 AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(y) AS mu,
      |    STDDEV_SAMP(y) AS sd FROM d3),
      |w3 AS (
      |  SELECT 3 AS r, d3.d, m3.n, m3.sd,
      |    ABS(d3.y - m3.mu) AS dev
      |  FROM d3 CROSS JOIN m3
      |  ORDER BY dev DESC, d ASC LIMIT 1),
      |rounds AS (
      |  SELECT * FROM w1 UNION ALL SELECT * FROM w2
      |  UNION ALL SELECT * FROM w3),
      |qn AS (
      |  SELECT *, SQRT(-2.0 * LN(1.0 - (1.0 - 0.05 / (2.0 * n))))
      |    AS q
      |  FROM rounds),
      |zc AS (
      |  SELECT *,
      |    ((((((q * -7.784894002430293e-3 +
      |      -0.3223964580411365) * q + -2.400758277161838) * q +
      |      -2.549732539343734) * q + 4.374664141464968) * q +
      |      2.938163982698783) /
      |     ((((q * 7.784695709041462e-3 + 0.3224671290700398) * q +
      |      2.445134137142996) * q + 3.754408661907416) * q + 1.0))
      |      * -1.0 AS z
      |  FROM qn),
      |tc AS (
      |  SELECT *,
      |    z + (z * z * z + z) / ((n - 2.0) * 4.0) +
      |    (5.0 * z * z * z * z * z + 16.0 * z * z * z + 3.0 * z) /
      |      ((n - 2.0) * (n - 2.0) * 96.0) +
      |    (3.0 * POW(z, 7) + 19.0 * POW(z, 5) + 17.0 * z * z * z -
      |      15.0 * z) / (POW(n - 2.0, 3) * 384.0) +
      |    (79.0 * POW(z, 9) + 776.0 * POW(z, 7) +
      |      1482.0 * POW(z, 5) - 1920.0 * z * z * z - 945.0 * z) /
      |      (POW(n - 2.0, 4) * 92160.0) AS t
      |  FROM zc),
      |g AS (
      |  SELECT *,
      |    (n - 1.0) / SQRT(n) * SQRT(t * t / (n - 2.0 + t * t))
      |      AS gcrit,
      |    CASE WHEN sd > 0 THEN dev / sd END AS gs
      |  FROM tc),
      |f AS (
      |  SELECT *, COALESCE(n >= 21 AND gs > gcrit, FALSE) AS flg
      |  FROM g),
      |mx AS (
      |  SELECT MAX(CASE WHEN flg THEN r END) AS lastflag FROM f)
      |SELECT CAST(r AS BIGINT) AS round,
      |  CAST(n AS BIGINT) AS n_days,
      |  ROUND(gs, 6) AS g_stat,
      |  ROUND(CASE WHEN n >= 21 THEN gcrit END, 6) AS g_crit_95,
      |  d AS worst_day,
      |  COALESCE(r <= (SELECT lastflag FROM mx), FALSE) AS flagged
      |FROM f ORDER BY round""".stripMargin
}
