package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling z-score anomaly flags over a keyed daily series — the
  * ops-monitoring staple ("did today's number jump more than Nσ off
  * its trailing window") applied per key.
  *
  * The trailing window INCLUDES the current row (the standard online
  * form: today's value shifts today's baseline too, which damps but
  * never hides a spike); rows whose window holds fewer than 2 points
  * have no sample stddev and flag false. Deterministic given the data,
  * so the whole report — rolling mean, rolling σ, z, flag — is
  * oracle-checkable.
  *
  * Scale shape: one window per key ordered by date; series length per
  * key is the window unit, keys are the parallelism unit — same
  * contract as [[GapFill.locf]], and the natural input is its
  * densified output (gaps would silently shrink the trailing frame).
  */
object Anomaly {

  def rollingZScore(df: DataFrame, keyCol: String, dateCol: String,
      valueCol: String, trailingRows: Int = 7,
      zThreshold: Double = 2.0): DataFrame = {
    require(trailingRows >= 2, "need at least 2 trailing rows for a stddev")
    val w = Window.partitionBy(keyCol).orderBy(dateCol)
      .rowsBetween(-(trailingRows - 1), Window.currentRow)
    val mean = avg(col(valueCol)).over(w)
    val sd = stddev_samp(col(valueCol)).over(w)
    // the published z is rounded for display/oracle stability, but the
    // FLAG tests the raw quotient — flagging off the rounded value
    // would silently pass raw |z| in (thr, thr + 0.00005)
    val rawZ = when(sd.isNotNull && sd =!= 0.0, (col(valueCol) - mean) / sd)
    df
      .withColumn("roll_mean", round(mean, 4))
      .withColumn("roll_std", round(sd, 4))
      .withColumn("z", round(rawZ, 4))
      .withColumn("anomaly",
        coalesce(abs(rawZ) > zThreshold, lit(false)))
      .orderBy(keyCol, dateCol)
  }

  /** Seasonality-adjusted anomaly — the day-of-week/hour-of-day
    * upgrade of [[rollingZScore]]: a 2 am traffic dip is normal at
    * 2 am and an incident at 2 pm, so each (key, hour-of-day)
    * bucket is scored against ITS OWN baseline distribution, not a
    * flat trailing window. Baseline = per-(key, hour) mean/σ of the
    * hourly totals over days ≤ `splitDay`; every later (key, day,
    * hour) cell gets a z against the matching hour's baseline.
    * Cells whose baseline has no spread (σ null/0) flag false —
    * same fail-safe convention as [[rollingZScore]], raw-quotient
    * flag with rounded display columns.
    *
    * Scale shape: one grouped aggregate to the (key × day × hour)
    * cell table (map-side partials — the only corpus-scale pass),
    * a baseline aggregate over that tiny table, and a broadcast-
    * sized join back. */
  def seasonalZScore(events: DataFrame, keyCol: String = "event_type",
      tsCol: String = "ts", valueCol: String = "value",
      splitDay: Int = 20, zThreshold: Double = 3.0): DataFrame = {
    val cells = events
      .groupBy(col(keyCol), dayofmonth(col(tsCol)).as("dd"),
        hour(col(tsCol)).as("hod"))
      // cell totals round to 2 BEFORE any downstream stat: both
      // engines then compute baselines from IDENTICAL inputs, so a
      // sum-order jitter of ~1e-12 can no longer flip a z rounded at
      // a .00005 boundary (observed live at sf0.01)
      .agg(round(sum(col(valueCol)), 2).as("__v"))
    val base = cells.where(col("dd") <= splitDay)
      .groupBy(col(keyCol), col("hod"))
      .agg(avg(col("__v")).as("__m"),
        stddev_samp(col("__v")).as("__s"),
        count(lit(1)).as("n_base"))
    val rawZ = when(col("__s").isNotNull && col("__s") =!= 0.0,
      (col("__v") - col("__m")) / col("__s"))
    cells.where(col("dd") > splitDay)
      .join(base, Seq(keyCol, "hod"))
      .select(col(keyCol), col("dd"), col("hod"),
        round(col("__v"), 2).as("v"),
        // displays round at 6, NOT 4: baseline means of 2-decimal
        // cell totals over n=20 days are EXACT 4-5-decimal values
        // (e.g. 145.72125), and a half-up decision on their double
        // representation differs across engines; at 6 decimals such
        // values round to themselves — no boundary decision exists
        round(col("__m"), 6).as("base_mean"),
        round(col("__s"), 6).as("base_sd"),
        col("n_base"),
        round(rawZ, 6).as("z"),
        coalesce(abs(rawZ) > zThreshold, lit(false)).as("anomaly"))
      .orderBy(keyCol, "dd", "hod")
  }

  /** DuckDB oracle for [[seasonalZScore]] over events. */
  def seasonalOracleSql(splitDay: Int = 20,
      zThreshold: Double = 3.0): String =
    s"""WITH cells AS (
       |  SELECT event_type, day(ts) AS dd, hour(ts) AS hod,
       |    ROUND(SUM(value), 2) AS v
       |  FROM events GROUP BY 1, 2, 3),
       |base AS (
       |  SELECT event_type, hod, AVG(v) AS m, stddev_samp(v) AS s,
       |    CAST(COUNT(*) AS BIGINT) AS n_base
       |  FROM cells WHERE dd <= $splitDay GROUP BY 1, 2)
       |SELECT c.event_type, c.dd, c.hod,
       |  ROUND(c.v, 2) AS v,
       |  ROUND(b.m, 6) AS base_mean,
       |  ROUND(b.s, 6) AS base_sd,
       |  b.n_base,
       |  ROUND(CASE WHEN b.s IS NOT NULL AND b.s <> 0
       |    THEN (c.v - b.m) / b.s END, 6) AS z,
       |  COALESCE(ABS(CASE WHEN b.s IS NOT NULL AND b.s <> 0
       |    THEN (c.v - b.m) / b.s END) > $zThreshold, FALSE) AS anomaly
       |FROM cells c JOIN base b
       |  ON c.event_type = b.event_type AND c.hod = b.hod
       |WHERE c.dd > $splitDay
       |ORDER BY c.event_type, c.dd, c.hod""".stripMargin

  /** Autocorrelation of the daily event-count series at lags 1..`maxLag`
    * — the periodicity detector that tells a monitor whether its
    * baseline needs a seasonal split at all (a strong lag-7 spike says
    * weekly; the [[seasonalZScore]] hour-of-day split is the lag-24
    * analog): r_k = Σ(c_t−c̄)(c_{t+k}−c̄) / Σ(c_t−c̄)², the standard
    * sample ACF normalization (constant denominator over the full
    * series).
    *
    * Dataflow: ONE corpus-scale shuffle to the daily-count table; the
    * series mean/denominator is a 1-row stat factor; each lag is an
    * equi-join of the day-cardinality table against itself shifted by
    * k days (days × maxLag rows total) — nothing rescans events. */
  def dailyAcf(events: DataFrame, maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, "maxLag must be positive")
    val daily = events
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).cast("double").as("c"))
    val stats = daily.agg(
      avg("c").as("__mu"),
      count(lit(1)).as("__nd"))
    val centered = daily.crossJoin(broadcast(stats))  // 1-row stat factor
      .select(col("d"), (col("c") - col("__mu")).as("x"))
    val denom = centered.agg(sum(col("x") * col("x")).as("__den"))
    val lags = centered.sparkSession.range(1, maxLag + 1)
      .select(col("id").cast("int").as("lag"))
    centered.as("a")
      .crossJoin(broadcast(lags))
      .join(centered.as("b"),
        col("b.d") === date_add(col("a.d"), col("lag")))
      .groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("a.x") * col("b.x")).as("__num"))
      .crossJoin(broadcast(denom))  // 1-row stat factor
      .select(col("lag"), col("n_pairs"),
        round(col("__num") / col("__den"), 6).as("acf"))
      .orderBy("lag")
  }

  /** Partial autocorrelation of the daily-count series via the
    * Durbin–Levinson recursion (Durbin 1960; Box & Jenkins ch. 3) —
    * the AR-order dial [[dailyAcf]] can't give: ρₖ conflates direct
    * and propagated dependence, while PACF(k) is the correlation at
    * lag k AFTER regressing out lags 1..k−1, so the lag where PACF
    * cuts off is the AR(p) order. Built ON [[dailyAcf]]'s 6-decimal
    * output exactly as [[ljungBox]] is, so the two engines run the
    * recursion on bit-identical ρ̂ inputs, and each step's
    * sum-then-subtract order matches the oracle's `list_sum` fold.
    *
    * Scale shape: the corpus-scale work IS [[dailyAcf]]; the
    * recursion is O(K²) arithmetic on the collected K-row ACF table
    * (K ≤ 10 — the Jacobi-on-driver precedent, lag-bounded, never
    * corpus-bounded). */
  def pacfReport(events: DataFrame, maxLag: Int = 7): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val acfRows = dailyAcf(events, maxLag).collect()   // K-bounded
    // ρ indexed by LAG VALUE, truncated at the first gap: a daily
    // series too short/sparse for some lag yields no pair rows there,
    // and positional indexing would silently shift every later ρ
    // while the oracle's recursive CTE (joined on a.lag = r.k + 1)
    // stops at the gap — mirror the oracle and stop.
    val byLag = acfRows.map(r => r.getInt(0) -> r.getDouble(2)).toMap
    val rhos = Iterator.from(1).takeWhile(byLag.contains).map(byLag).toArray
    val pacf = new Array[Double](rhos.length)
    var phi = Array.empty[Double]
    for (k <- 1 to rhos.length) {
      if (k == 1) { phi = Array(rhos(0)); pacf(0) = rhos(0) }
      else {
        var sn = 0.0; var sd = 0.0
        for (j <- 1 until k) {
          sn += phi(j - 1) * rhos(k - j - 1)
          sd += phi(j - 1) * rhos(j - 1)
        }
        val num = rhos(k - 1) - sn
        val den = 1.0 - sd
        val pkk = if (den != 0.0) num / den else 0.0
        phi = Array.tabulate(k - 1)(i => phi(i) - pkk * phi(k - 2 - i)) :+
          pkk
        pacf(k - 1) = pkk
      }
    }
    rhos.indices.map { i =>
      (i + 1, rhos(i),
        BigDecimal(pacf(i)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }.toDF("lag", "acf", "pacf").orderBy("lag")
  }

  /** DuckDB oracle for [[pacfReport]] — the identical Durbin–Levinson
    * recursion as a recursive CTE carrying the ρ and φ LISTS
    * (comprehension-updated), over the same rounded [[acfOracleSql]]
    * output. */
  def pacfOracleSql(maxLag: Int = 7): String =
    s"""WITH RECURSIVE acf AS (${acfOracleSql(maxLag)
          .replace("\n", "\n  ")}),
       |r AS (
       |  SELECT 1 AS k,
       |    [CAST(acf AS DOUBLE)] AS rhos,
       |    [CAST(acf AS DOUBLE)] AS phi,
       |    CAST(acf AS DOUBLE) AS pkk
       |  FROM acf WHERE lag = 1
       |  UNION ALL
       |  SELECT k, rhos, list_append(
       |      [phi[j] - pkk * phi[k - j] for j in range(1, k)], pkk),
       |    pkk
       |  FROM (
       |    SELECT r.k + 1 AS k,
       |      list_append(r.rhos, CAST(a.acf AS DOUBLE)) AS rhos,
       |      r.phi AS phi,
       |      CASE WHEN 1.0 - list_sum(
       |          [r.phi[j] * r.rhos[j] for j in range(1, r.k + 1)])
       |          <> 0.0
       |        THEN (CAST(a.acf AS DOUBLE) - list_sum(
       |          [r.phi[j] * r.rhos[r.k + 1 - j]
       |            for j in range(1, r.k + 1)]))
       |        / (1.0 - list_sum(
       |          [r.phi[j] * r.rhos[j] for j in range(1, r.k + 1)]))
       |        ELSE 0.0 END AS pkk
       |    FROM r JOIN acf a ON a.lag = r.k + 1))
       |SELECT CAST(r.k AS INTEGER) AS lag,
       |  ROUND(r.rhos[r.k], 6) AS acf,
       |  ROUND(r.pkk, 6) AS pacf
       |FROM r ORDER BY lag""".stripMargin

  /** Sample entropy of the daily event-count series (Richman &
    * Moorman, Am. J. Physiol. 2000) — the regularity dial the
    * spectral/ACF tier can't read: SampEn(m, r) = −ln(A/B) where B
    * counts length-m template pairs matching within tolerance r and
    * A the same at length m+1. A perfectly periodic series repeats
    * its templates (A≈B, SampEn→0); an uncorrelated one loses most
    * matches when the window grows (SampEn large). Unlike
    * approximate entropy it excludes self-matches, so it is unbiased
    * in short series — exactly the daily-series regime.
    *
    * r = round(rFactor·σ, 6), snapped to the 6-decimal grid BEFORE
    * the template comparisons so both engines classify every pair
    * identically (the [[pacfReport]] rounded-input precedent).
    *
    * Scale shape: the corpus-scale work is ONE grouped agg to the
    * daily-count table; the O(days²) template count runs on the
    * collected calendar-bounded series (the Jacobi-on-driver
    * precedent — day-bounded, never corpus-bounded). One row
    * `(n_days, r_tol, b_count, a_count, sampen)`; NULL sampen when
    * either count is 0. */
  def sampleEntropy(events: DataFrame, m: Int = 2,
      rFactor: Double = 0.2): DataFrame = {
    require(m >= 1, "template length must be >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    val ys = events
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).cast("double").as("c"))
      .orderBy("d")
      .select("c").collect().map(_.getDouble(0))   // calendar-bounded
    val n = ys.length
    val mu = ys.sum / n
    val sg = math.sqrt(ys.map(y => y * y).sum / n - mu * mu)
    val r = graft.util.Canon.snap6(rFactor * sg)
    def templatePairs(w: Int): Long = {
      var cnt = 0L
      var i = 0
      while (i <= n - w) {
        var j = i + 1
        while (j <= n - w) {
          var ok = true; var t = 0
          while (ok && t < w) {
            if (math.abs(ys(i + t) - ys(j + t)) > r) ok = false
            t += 1
          }
          if (ok) cnt += 1
          j += 1
        }
        i += 1
      }
      cnt
    }
    val b = templatePairs(m)
    val a = templatePairs(m + 1)
    val se: Option[Double] =
      if (a > 0 && b > 0)
        Some(graft.util.Canon.snap6(-math.log(a.toDouble / b)))
      else None
    Seq((n.toLong, r, b, a, se))
      .toDF("n_days", "r_tol", "b_count", "a_count", "sampen")
  }

  /** DuckDB oracle for [[sampleEntropy]] (m = 2, rFactor = 0.2) —
    * the same snapped tolerance, the same i<j unordered template
    * pairs via a day-indexed self-join. */
  val sampleEntropyOracleSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS DOUBLE) AS c
      |  FROM events GROUP BY 1),
      |st AS (
      |  SELECT COUNT(*) AS n,
      |    ROUND(0.2 * SQRT(AVG(c * c) - AVG(c) * AVG(c)), 6) AS r
      |  FROM daily),
      |ser AS (
      |  SELECT ROW_NUMBER() OVER (ORDER BY d) AS i, c,
      |    LEAD(c, 1) OVER (ORDER BY d) AS c1,
      |    LEAD(c, 2) OVER (ORDER BY d) AS c2
      |  FROM daily),
      |b2 AS (
      |  SELECT COUNT(*) AS b_cnt
      |  FROM ser p JOIN ser q ON p.i < q.i CROSS JOIN st
      |  WHERE p.c1 IS NOT NULL AND q.c1 IS NOT NULL
      |    AND ABS(p.c - q.c) <= st.r AND ABS(p.c1 - q.c1) <= st.r),
      |a3 AS (
      |  SELECT COUNT(*) AS a_cnt
      |  FROM ser p JOIN ser q ON p.i < q.i CROSS JOIN st
      |  WHERE p.c2 IS NOT NULL AND q.c2 IS NOT NULL
      |    AND ABS(p.c - q.c) <= st.r AND ABS(p.c1 - q.c1) <= st.r
      |    AND ABS(p.c2 - q.c2) <= st.r)
      |SELECT CAST(st.n AS BIGINT) AS n_days, st.r AS r_tol,
      |  CAST(b2.b_cnt AS BIGINT) AS b_count,
      |  CAST(a3.a_cnt AS BIGINT) AS a_count,
      |  CASE WHEN a3.a_cnt > 0 AND b2.b_cnt > 0
      |    THEN ROUND(-LN(CAST(a3.a_cnt AS DOUBLE) / b2.b_cnt), 6)
      |    END AS sampen
      |FROM st, b2, a3""".stripMargin

  /** Hampel outlier flags over each key's daily-count series — the
    * robust complement to [[zScoreReport]]: mean/σ baselines are
    * dragged by the very outliers they're meant to flag (one 100×
    * spike inflates σ enough to hide a 10× spike), while the median
    * and MAD (median absolute deviation, ×1.4826 to estimate σ under
    * normality — the Hampel identifier, Davies & Gather 1993) ignore
    * up to half the series being corrupt.
    *
    * Dataflow: one corpus shuffle to the (key × day) count table; the
    * median and MAD are two exact-percentile aggs over each key's
    * day-cardinality series (tiny; swap approx_percentile if keys ×
    * days ever isn't). */
  def hampelReport(events: DataFrame, keyCol: String = "event_type",
      k: Double = 3.0): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).cast("double").as("c"))
    val med = daily.groupBy(keyCol)
      .agg(expr("percentile(c, 0.5)").as("med"))
    val withMed = daily.join(med, keyCol)
    val mad = withMed.groupBy(keyCol)
      .agg(expr("percentile(abs(c - med), 0.5)").as("mad"))
    // MAD = 0 (over half the series identical): z is undefined — NULL,
    // and any deviation at all is an outlier (the degenerate-but-
    // standard reading of the identifier)
    val dev = abs(col("c") - col("med"))
    withMed.join(mad, keyCol)
      .select(col(keyCol), col("d"), col("c"),
        round(col("med"), 4).as("med"),
        round(col("mad"), 4).as("mad"),
        when(col("mad") === 0.0, lit(null).cast("double"))
          .otherwise(round(dev / (lit(1.4826) * col("mad")), 4))
          .as("hampel_z"),
        when(col("mad") === 0.0, dev > 0.0)
          .otherwise(dev > lit(k) * lit(1.4826) * col("mad"))
          .as("outlier"))
      .orderBy(col(keyCol), col("d"))
  }

  /** DuckDB oracle for [[hampelReport]]. */
  def hampelOracleSql(keyCol: String = "event_type",
      k: Double = 3.0): String =
    s"""WITH daily AS (
       |  SELECT $keyCol, CAST(ts AS DATE) AS d,
       |    CAST(COUNT(*) AS DOUBLE) AS c
       |  FROM events GROUP BY 1, 2),
       |m AS (
       |  SELECT $keyCol, quantile_cont(c, 0.5) AS med
       |  FROM daily GROUP BY 1),
       |w AS (
       |  SELECT daily.$keyCol, d, c, med
       |  FROM daily JOIN m ON daily.$keyCol = m.$keyCol),
       |md AS (
       |  SELECT $keyCol, quantile_cont(abs(c - med), 0.5) AS mad
       |  FROM w GROUP BY 1)
       |SELECT w.$keyCol, w.d, w.c,
       |  ROUND(w.med, 4) AS med,
       |  ROUND(md.mad, 4) AS mad,
       |  CASE WHEN md.mad = 0 THEN NULL
       |    ELSE ROUND(abs(w.c - w.med) / (1.4826 * md.mad), 4) END
       |    AS hampel_z,
       |  CASE WHEN md.mad = 0 THEN abs(w.c - w.med) > 0
       |    ELSE abs(w.c - w.med) > $k * 1.4826 * md.mad END AS outlier
       |FROM w JOIN md ON w.$keyCol = md.$keyCol
       |ORDER BY w.$keyCol, w.d""".stripMargin

  /** One-sided CUSUM change detection on each key's daily-count series
    * (Page 1954) — the SEQUENTIAL drift detector beside the
    * two-slice family (PSI/KS/W₁ compare snapshots; CUSUM watches the
    * series accumulate evidence of a level shift and flags the day it
    * crosses, with the classic sensitivity/false-alarm trade set by
    * slack `k` and threshold `h`, both in units of the per-key
    * baseline σ).
    *
    * The textbook recurrence S_t = max(0, S_{t−1} + (x_t − μ − kσ)) is
    * a sequential loop, but it has the closed window form
    * S_t = P_t − min_{s ≤ t} P_s over the prefix sums
    * P_t = Σ_{i ≤ t} (x_i − μ − kσ) — two cumulative windows
    * PARTITIONED PER KEY over the day-cardinality table, no recursion
    * and no cross-key coupling. μ and σ come from the first
    * `baselineDays` days of each key's series (population σ). */
  def cusumReport(events: DataFrame, keyCol: String = "event_type",
      baselineDays: Int = 10, k: Double = 0.5,
      h: Double = 4.0): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).cast("double").as("c"))
    val wRank = Window.partitionBy(keyCol).orderBy("d")
    val ranked = daily.withColumn("__i", row_number().over(wRank))
    val base = ranked.where(col("__i") <= baselineDays)
      .groupBy(keyCol)
      .agg(avg("c").as("__mu"),
        sqrt(greatest(avg(col("c") * col("c")) -
          avg("c") * avg("c"), lit(0.0))).as("__sd"))
    val wCum = Window.partitionBy(keyCol).orderBy("d")
      .rowsBetween(Window.unboundedPreceding, 0)
    ranked.join(base, keyCol)
      .withColumn("__p",
        sum(col("c") - col("__mu") - lit(k) * col("__sd")).over(wCum))
      .withColumn("__s", col("__p") - min(least(col("__p"), lit(0.0)))
        .over(wCum))
      .select(col(keyCol), col("d"), col("c"),
        round(col("__mu"), 4).as("base_mean"),
        round(col("__sd"), 4).as("base_sd"),
        round(col("__s"), 4).as("cusum"),
        when(col("__sd") === 0.0, col("__s") > 0.0)
          .otherwise(col("__s") > lit(h) * col("__sd")).as("alarm"))
      .orderBy(col(keyCol), col("d"))
  }

  /** DuckDB oracle for [[cusumReport]]. */
  def cusumOracleSql(keyCol: String = "event_type",
      baselineDays: Int = 10, k: Double = 0.5,
      h: Double = 4.0): String =
    s"""WITH daily AS (
       |  SELECT $keyCol, CAST(ts AS DATE) AS d,
       |    CAST(COUNT(*) AS DOUBLE) AS c
       |  FROM events GROUP BY 1, 2),
       |r AS (
       |  SELECT $keyCol, d, c,
       |    ROW_NUMBER() OVER (PARTITION BY $keyCol ORDER BY d) AS i
       |  FROM daily),
       |b AS (
       |  SELECT $keyCol, AVG(c) AS mu,
       |    sqrt(GREATEST(AVG(c * c) - AVG(c) * AVG(c), 0.0)) AS sd
       |  FROM r WHERE i <= $baselineDays GROUP BY 1),
       |p AS (
       |  SELECT r.$keyCol, d, c, mu, sd,
       |    SUM(c - mu - $k * sd) OVER (PARTITION BY r.$keyCol ORDER BY d
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp
       |  FROM r JOIN b ON r.$keyCol = b.$keyCol),
       |s AS (
       |  SELECT $keyCol, d, c, mu, sd,
       |    pp - MIN(LEAST(pp, 0.0)) OVER (PARTITION BY $keyCol ORDER BY d
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ss
       |  FROM p)
       |SELECT $keyCol, d, c,
       |  ROUND(mu, 4) AS base_mean,
       |  ROUND(sd, 4) AS base_sd,
       |  ROUND(ss, 4) AS cusum,
       |  CASE WHEN sd = 0 THEN ss > 0
       |    ELSE ss > $h * sd END AS alarm
       |FROM s ORDER BY $keyCol, d""".stripMargin

  /** Robust location report per key — mean beside the 10% trimmed mean
    * (drop the tails, average the middle) and the winsorized mean
    * (clamp the tails to the cut points, Tukey's preference when mass
    * must be conserved): the three-way comparison IS the diagnosis —
    * mean far from both robust forms says outliers are driving the
    * headline number a dashboard reports.
    *
    * One grouped agg for the cut points (exact percentiles as the
    * oracle pin), one conditional agg for the three means — two passes
    * over the (key, value) rows, key-cardinality output. */
  def robustLocation(df: DataFrame, keyCol: String, valueCol: String,
      trim: Double = 0.1): DataFrame = {
    require(trim > 0.0 && trim < 0.5, s"trim in (0, 0.5), got $trim")
    val v = col(valueCol).cast("double")
    val cuts = df.groupBy(col(keyCol).as("k"))
      .agg(expr(s"percentile($valueCol, $trim)").as("__lo"),
        expr(s"percentile($valueCol, ${1.0 - trim})").as("__hi"))
    df.select(col(keyCol).as("k"), v.as("__v"))
      .join(broadcast(cuts), "k")
      .groupBy("k")
      .agg(
        count(lit(1)).as("n"),
        round(avg("__v"), 4).as("mean"),
        round(avg(when(col("__v").between(col("__lo"), col("__hi")),
          col("__v"))), 4).as("trimmed_mean"),
        round(avg(least(greatest(col("__v"), col("__lo")), col("__hi"))),
          4).as("winsorized_mean"),
        round(first("__lo"), 4).as("cut_lo"),
        round(first("__hi"), 4).as("cut_hi"))
      .withColumnRenamed("k", keyCol)
      .orderBy(keyCol)
  }

  /** DuckDB oracle for [[robustLocation]] on events(event_type,
    * value). */
  def robustLocationOracleSql(trim: Double = 0.1): String =
    s"""WITH cuts AS (
       |  SELECT event_type AS k,
       |    quantile_cont(value, $trim) AS lo,
       |    quantile_cont(value, ${1.0 - trim}) AS hi
       |  FROM events GROUP BY 1)
       |SELECT e.event_type,
       |  CAST(COUNT(*) AS BIGINT) AS n,
       |  ROUND(AVG(e.value), 4) AS mean,
       |  ROUND(AVG(CASE WHEN e.value BETWEEN c.lo AND c.hi
       |    THEN e.value END), 4) AS trimmed_mean,
       |  ROUND(AVG(LEAST(GREATEST(e.value, c.lo), c.hi)), 4)
       |    AS winsorized_mean,
       |  ROUND(ANY_VALUE(c.lo), 4) AS cut_lo,
       |  ROUND(ANY_VALUE(c.hi), 4) AS cut_hi
       |FROM events e JOIN cuts c ON e.event_type = c.k
       |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin

  /** Theil–Sen robust trend of the daily count series — the median of
    * all pairwise slopes (Theil 1950, Sen 1968): a least-squares slope
    * is dragged by the same outlier days the anomaly monitors exist to
    * catch, while the pairwise-slope median tolerates ~29% corruption.
    * Output is one row: the robust daily trend in counts/day with its
    * OLS counterpart beside it — disagreement IS the outlier warning.
    *
    * The pairwise-slope table is day-cardinality², which at daily
    * grain is bounded (a YEAR is 66k pairs) — a deliberate bounded
    * cross, never corpus-sized. */
  def theilSen(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).cast("double").as("c"))
      .withColumn("t", datediff(col("d"), lit("1970-01-01")).cast("double"))
    val pairs = daily.as("a").join(daily.as("b"),
      col("a.t") < col("b.t"))
      .select(((col("b.c") - col("a.c")) /
        (col("b.t") - col("a.t"))).as("slope"))
    val ols = daily.agg(
      count(lit(1)).as("n_days"),
      (covar_pop(col("t"), col("c")) / var_pop(col("t"))).as("__ols"))
    pairs.agg(
      count(lit(1)).as("n_pairs"),
      expr("percentile(slope, 0.5)").as("__ts"))
      .crossJoin(broadcast(ols))   // 1-row stat factor
      .select(col("n_days"), col("n_pairs"),
        round(col("__ts"), 6).as("theil_sen_slope"),
        round(col("__ols"), 6).as("ols_slope"))
  }

  /** DuckDB oracle for [[theilSen]]. */
  val theilSenOracleSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS DOUBLE) AS c
      |  FROM events GROUP BY 1),
      |td AS (
      |  SELECT CAST(date_diff('day', DATE '1970-01-01', d) AS DOUBLE)
      |    AS t, c FROM daily),
      |pairs AS (
      |  SELECT (b.c - a.c) / (b.t - a.t) AS slope
      |  FROM td a JOIN td b ON a.t < b.t),
      |ols AS (
      |  SELECT COUNT(*) AS n_days,
      |    covar_pop(t, c) / var_pop(t) AS o FROM td)
      |SELECT
      |  CAST((SELECT n_days FROM ols) AS BIGINT) AS n_days,
      |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  ROUND(quantile_cont(slope, 0.5), 6) AS theil_sen_slope,
      |  ROUND((SELECT o FROM ols), 6) AS ols_slope
      |FROM pairs""".stripMargin

  /** STL-lite seasonal decomposition of the daily event-count series:
    * count = trend (centered 7-day moving average, partial at the
    * edges) + weekday effect (mean detrended value per weekday) +
    * residual — the additive classical decomposition (the first pass
    * of STL, Cleveland et al. 1990) that turns "Mondays look weird"
    * from anecdote into three auditable columns; the residual is what
    * the z-score/Hampel/CUSUM monitors SHOULD be fed once q213's ACF
    * shows weekly structure.
    *
    * Everything is windows over the day-cardinality table (centered
    * frame for trend, weekday partition for the seasonal mean). */
  def seasonalDecompose(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).cast("double").as("c"))
      .withColumn("weekday", dayofweek(col("d")))
    val wTrend = Window.orderBy("d").rowsBetween(-3, 3)
    val withTrend = daily
      .withColumn("trend", avg("c").over(wTrend))
      .withColumn("__detr", col("c") - col("trend"))
    val wWd = Window.partitionBy("weekday")
    withTrend
      .withColumn("seasonal", avg("__detr").over(wWd))
      .select(col("d"), col("weekday"), col("c"),
        round(col("trend"), 4).as("trend"),
        round(col("seasonal"), 4).as("seasonal"),
        round(col("c") - col("trend") - col("seasonal"), 4)
          .as("residual"))
      .orderBy("d")
  }

  /** DuckDB oracle for [[seasonalDecompose]] (DuckDB dayofweek is
    * Sunday=0; +1 matches Spark). */
  val seasonalOracleSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS DOUBLE) AS c
      |  FROM events GROUP BY 1),
      |t AS (
      |  SELECT d, CAST(dayofweek(d) + 1 AS INTEGER) AS weekday, c,
      |    AVG(c) OVER (ORDER BY d
      |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend
      |  FROM daily),
      |s AS (
      |  SELECT d, weekday, c, trend,
      |    AVG(c - trend) OVER (PARTITION BY weekday) AS seasonal
      |  FROM t)
      |SELECT d, weekday, c,
      |  ROUND(trend, 4) AS trend,
      |  ROUND(seasonal, 4) AS seasonal,
      |  ROUND(c - trend - seasonal, 4) AS residual
      |FROM s ORDER BY d""".stripMargin

  /** Lead–lag cross-correlation between two event types' daily series
    * — "does A lead B, and by how many days": r(k) correlates A's day
    * t with B's day t+k for k ∈ [−maxLag, maxLag], normalized by the
    * two series' full standard deviations (the sample CCF). The peak's
    * lag is the causal-direction hint a funnel owner reads (clicks
    * leading purchases by 2 days says the conversion window to
    * attribute over).
    *
    * Same dataflow as [[dailyAcf]]: one corpus shuffle to the daily
    * table; means and the normalizer are 1-row stat factors; each lag
    * is a day-cardinality self-join. */
  def crossCorrelation(events: DataFrame, typeA: String, typeB: String,
      maxLag: Int = 5): DataFrame = {
    require(maxLag >= 0, "maxLag must be non-negative")
    def daily(t: String) = events
      .where(col("event_type") === t)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).cast("double").as("c"))
    val a = daily(typeA)
    val b = daily(typeB)
    val statsA = a.agg(avg("c").as("__ma"))
    val statsB = b.agg(avg("c").as("__mb"))
    val ca = a.crossJoin(broadcast(statsA))
      .select(col("d"), (col("c") - col("__ma")).as("xa"))
    val cb = b.crossJoin(broadcast(statsB))
      .select(col("d").as("db"), (col("c") - col("__mb")).as("xb"))
    val denom = ca.agg(sum(col("xa") * col("xa")).as("__da"))
      .crossJoin(cb.agg(sum(col("xb") * col("xb")).as("__db")))
      .select(sqrt(col("__da") * col("__db")).as("__den"))
    val lags = events.sparkSession.range(-maxLag, maxLag + 1)
      .select(col("id").cast("int").as("lag"))
    ca.crossJoin(broadcast(lags))
      .join(cb, col("db") === date_add(col("d"), col("lag")))
      .groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("xa") * col("xb")).as("__num"))
      .crossJoin(broadcast(denom))
      .select(col("lag"), col("n_pairs"),
        round(col("__num") / col("__den"), 6).as("ccf"))
      .orderBy("lag")
  }

  /** DuckDB oracle for [[crossCorrelation]]. */
  def ccfOracleSql(typeA: String, typeB: String,
      maxLag: Int = 5): String =
    s"""WITH a AS (
       |  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS DOUBLE) AS c
       |  FROM events WHERE event_type = '$typeA' GROUP BY 1),
       |b AS (
       |  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS DOUBLE) AS c
       |  FROM events WHERE event_type = '$typeB' GROUP BY 1),
       |ca AS (SELECT d, c - (SELECT AVG(c) FROM a) AS xa FROM a),
       |cb AS (SELECT d, c - (SELECT AVG(c) FROM b) AS xb FROM b),
       |den AS (
       |  SELECT sqrt((SELECT SUM(xa * xa) FROM ca) *
       |              (SELECT SUM(xb * xb) FROM cb)) AS dd),
       |lags AS (
       |  SELECT CAST(UNNEST(range(${-maxLag}, ${maxLag + 1})) AS INTEGER)
       |    AS lag)
       |SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  ROUND(SUM(ca.xa * cb.xb) / (SELECT dd FROM den), 6) AS ccf
       |FROM ca JOIN lags ON TRUE
       |JOIN cb ON cb.d = ca.d + lag
       |GROUP BY lag ORDER BY lag""".stripMargin

  /** Fano-factor burstiness per event type — the dispersion index
    * var/mean of the DAILY count series (Fano 1947; = 1 for a Poisson
    * arrival process): the one-number answer to "is this event type's
    * traffic bursty or steady", which decides whether the z-score
    * monitors upstream need a seasonal baseline or a heavier-tailed
    * one. Computed over the ZERO-FILLED day spine (a type silent for
    * 20 of 30 days is extremely bursty — dropping its silent days
    * would hide exactly that), classification on the UNROUNDED ratio
    * (the q230 lesson).
    *
    * One shuffle to the (type, day) count table; the spine grid is
    * |types|·|days| — calendar-sized, never corpus-sized. */
  def fanoFactor(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).cast("double").as("c"))
    val spine = daily.agg(min("d").as("__lo"), max("d").as("__hi"))
      .select(explode(expr("sequence(__lo, __hi, interval 1 day)"))
        .as("d"))
    val grid = daily.select("event_type").distinct()
      .crossJoin(broadcast(spine))   // calendar-sized grid
      .join(daily, Seq("event_type", "d"), "left_outer")
      .na.fill(0.0, Seq("c"))
    grid.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        avg("c").as("__mu"),
        var_pop("c").as("__v"))
      .select(col("event_type"), col("n_days"),
        round(col("__mu"), 6).as("mean_daily"),
        round(col("__v"), 6).as("var_daily"),
        round(col("__v") / col("__mu"), 6).as("fano"),
        when(col("__v") / col("__mu") > 1.0, lit("over"))
          .when(col("__v") / col("__mu") < 1.0, lit("under"))
          .otherwise(lit("poisson")).as("dispersion"))
      .orderBy("event_type")
  }

  /** Mann–Kendall trend test over the daily count series (Mann 1945;
    * Kendall's τ machinery) — the SIGNIFICANCE readout q236's
    * Theil–Sen slope lacks: S = Σ_{i<j} sign(yⱼ−yᵢ) with the
    * tie-corrected variance n(n−1)(2n+5)/18 − Σt(t−1)(2t+5)/18 and
    * the continuity-corrected z. Non-parametric — no residual-
    * normality assumption, robust to the same outlier days Theil–Sen
    * tolerates; the pair (robust slope, MK z) is the standard
    * distribution-free trend report.
    *
    * Scale shape: the day-pair table is calendar²-bounded (the q236
    * deliberate cross); the tie table is value-cardinality over daily
    * counts, also calendar-bounded. One grouped agg touches the
    * corpus. */
  def mannKendall(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).cast("double").as("c"))
    val pairs = daily.as("a").join(daily.as("b"),
        col("a.d") < col("b.d"))   // calendar² deliberate cross
      .agg(sum(signum(col("b.c") - col("a.c"))).as("__s"))
    val nRow = daily.agg(count(lit(1)).cast("double").as("__n"))
    val ties = daily.groupBy("c").agg(count(lit(1)).as("__t"))
      .agg(coalesce(sum(col("__t") * (col("__t") - 1L) *
        (col("__t") * 2L + 5L)), lit(0L)).cast("double").as("__tc"))
    val z = {
      val varS = (col("__n") * (col("__n") - 1.0) *
        (col("__n") * 2.0 + 5.0) - col("__tc")) / 18.0
      when(varS > 0.0 && col("__s") > 0.0,
        (col("__s") - 1.0) / sqrt(varS))
        .when(varS > 0.0 && col("__s") < 0.0,
          (col("__s") + 1.0) / sqrt(varS))
        .otherwise(lit(0.0))
    }
    pairs.crossJoin(broadcast(nRow))   // 1-row stat factors
      .crossJoin(broadcast(ties))
      .select(
        col("__n").cast("long").as("n_days"),
        col("__s").cast("long").as("s_stat"),
        round((col("__n") * (col("__n") - 1.0) *
          (col("__n") * 2.0 + 5.0) - col("__tc")) / 18.0, 6)
          .as("var_s"),
        round(z, 6).as("z"),
        when(z > 1.959964, lit("up"))
          .when(z < -1.959964, lit("down"))
          .otherwise(lit("none")).as("trend"))
  }

  /** DuckDB oracle for [[mannKendall]]. */
  val mannKendallOracleSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS DOUBLE) AS c
      |  FROM events GROUP BY 1),
      |s AS (
      |  SELECT SUM(SIGN(b.c - a.c)) AS s
      |  FROM daily a JOIN daily b ON a.d < b.d),
      |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM daily),
      |tc AS (
      |  SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0)
      |    AS DOUBLE) AS tc
      |  FROM (SELECT COUNT(*) AS t FROM daily GROUP BY c)),
      |v AS (
      |  SELECT s.s, n.n, tc.tc,
      |    (n.n * (n.n - 1.0) * (2.0 * n.n + 5.0) - tc.tc) / 18.0
      |      AS var_s
      |  FROM s CROSS JOIN n CROSS JOIN tc),
      |z AS (
      |  SELECT *, CASE
      |    WHEN var_s > 0 AND s > 0 THEN (s - 1.0) / sqrt(var_s)
      |    WHEN var_s > 0 AND s < 0 THEN (s + 1.0) / sqrt(var_s)
      |    ELSE 0.0 END AS zv
      |  FROM v)
      |SELECT CAST(n AS BIGINT) AS n_days, CAST(s AS BIGINT) AS s_stat,
      |  ROUND(var_s, 6) AS var_s,
      |  ROUND(zv, 6) AS z,
      |  CASE WHEN zv > 1.959964 THEN 'up'
      |    WHEN zv < -1.959964 THEN 'down'
      |    ELSE 'none' END AS trend
      |FROM z""".stripMargin

  /** Seasonal Mann–Kendall trend test (Hirsch & Slack, Water Resour.
    * Res. 1984) — [[mannKendall]] computed WITHIN each weekday season
    * and summed: a strong weekly cycle (q213's lag-7 spike) inflates
    * plain MK's variance and can mask or fake a trend; comparing only
    * Mondays to Mondays removes the cycle before asking "is there
    * drift". S' = Σ_g S_g, Var' = Σ_g Var_g (tie-corrected per
    * season), continuity-corrected z on the totals.
    *
    * Scale shape: the day-pair cross is PER-SEASON calendar²/7 (the
    * q287 deliberate-cross shape, partitioned); tie tables at
    * (season × distinct-count) cardinality. One corpus-touching agg. */
  def seasonalMannKendall(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).cast("double").as("c"))
      .withColumn("g", dayofweek(col("d")))
    val s = daily.as("a").join(daily.as("b"),
        col("a.g") === col("b.g") && col("a.d") < col("b.d"))
      .agg(coalesce(sum(signum(col("b.c") - col("a.c"))), lit(0.0))
        .as("__s"))
    val tieG = daily.groupBy("g", "c").agg(count(lit(1)).as("__t"))
      .groupBy("g").agg(coalesce(sum(col("__t") * (col("__t") - 1L) *
        (col("__t") * 2L + 5L)), lit(0L)).cast("double").as("__tcg"))
    val ng = col("__ng")
    val v = daily.groupBy("g")
      .agg(count(lit(1)).cast("double").as("__ng"))
      .join(tieG, Seq("g"), "left_outer")
      .agg(
        sum((ng * (ng - 1.0) * (ng * 2.0 + 5.0) -
          coalesce(col("__tcg"), lit(0.0))) / 18.0).as("__var"),
        count(lit(1)).as("__k"),
        sum(ng).as("__n"))
    val z = when(col("__var") > 0.0 && col("__s") > 0.0,
        (col("__s") - 1.0) / sqrt(col("__var")))
      .when(col("__var") > 0.0 && col("__s") < 0.0,
        (col("__s") + 1.0) / sqrt(col("__var")))
      .otherwise(lit(0.0))
    s.crossJoin(broadcast(v))   // 1-row stat factors
      .select(
        col("__n").cast("bigint").as("n_days"),
        col("__k").cast("bigint").as("k_seasons"),
        col("__s").cast("bigint").as("s_stat"),
        round(col("__var"), 6).as("var_s"),
        round(z, 6).as("z"),
        when(z > 1.959964, lit("up"))
          .when(z < -1.959964, lit("down"))
          .otherwise(lit("none")).as("trend"))
  }

  /** DuckDB oracle for [[seasonalMannKendall]]. */
  val seasonalMannKendallOracleSql: String =
    """WITH daily AS (
      |  SELECT d, c, dayofweek(d) AS g FROM (
      |    SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS DOUBLE) AS c
      |    FROM events GROUP BY 1)),
      |s AS (
      |  SELECT COALESCE(SUM(SIGN(b.c - a.c)), 0.0) AS s
      |  FROM daily a JOIN daily b ON a.g = b.g AND a.d < b.d),
      |tg AS (
      |  SELECT g, CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0)
      |    AS DOUBLE) AS tcg
      |  FROM (SELECT g, c, COUNT(*) AS t FROM daily GROUP BY 1, 2)
      |  GROUP BY 1),
      |v AS (
      |  SELECT SUM((ng * (ng - 1.0) * (2.0 * ng + 5.0)
      |      - COALESCE(tcg, 0.0)) / 18.0) AS var_s,
      |    COUNT(*) AS k, SUM(ng) AS n
      |  FROM (SELECT g, CAST(COUNT(*) AS DOUBLE) AS ng FROM daily
      |        GROUP BY 1) pg
      |  LEFT JOIN tg USING (g)),
      |z AS (
      |  SELECT s.s, v.var_s, v.k, v.n, CASE
      |    WHEN v.var_s > 0 AND s.s > 0 THEN (s.s - 1.0) / sqrt(v.var_s)
      |    WHEN v.var_s > 0 AND s.s < 0 THEN (s.s + 1.0) / sqrt(v.var_s)
      |    ELSE 0.0 END AS zv
      |  FROM s CROSS JOIN v)
      |SELECT CAST(n AS BIGINT) AS n_days, CAST(k AS BIGINT) AS k_seasons,
      |  CAST(s AS BIGINT) AS s_stat,
      |  ROUND(var_s, 6) AS var_s, ROUND(zv, 6) AS z,
      |  CASE WHEN zv > 1.959964 THEN 'up'
      |    WHEN zv < -1.959964 THEN 'down'
      |    ELSE 'none' END AS trend
      |FROM z""".stripMargin

  /** Bartels rank test of serial randomness (Bartels, JASA 1982) —
    * the rank-based von Neumann ratio over the daily revenue series:
    * RVN = Σ(rᵢ − rᵢ₊₁)² / Σ(rᵢ − r̄)² on average ranks. The
    * distribution-free complement to [[runsTest]] (which reads only
    * the sign pattern around the median) and to the q281
    * Durbin–Watson (which assumes the OLS residual model): RVN ≪ 2 =
    * trending/sticky, ≫ 2 = oscillating. z via Bartels' exact
    * variance 4(n−2)(5n²−2n−9)/(5n(n+1)(n−1)²), two-sided 5%.
    *
    * Scale shape: one corpus agg to the calendar table, ranks via the
    * value-frequency convention (min-rank + (ties−1)/2), one ordered
    * lag window, scalar arithmetic. */
  def bartelsRank(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum("value").as("y"))
    val wRank = Window.orderBy("y")
    val wTie = Window.partitionBy("y")
    val wOrd = Window.orderBy("d")
    val ranked = daily
      .withColumn("__minr", rank().over(wRank))
      .withColumn("__eq", count(lit(1)).over(wTie))
      .withColumn("__r", col("__minr") + (col("__eq") - 1) / 2.0)
      .withColumn("__rn", lead("__r", 1).over(wOrd))
    val s = ranked.agg(
      count(lit(1)).cast("double").as("__n"),
      avg("__r").as("__rb"),
      sum(when(col("__rn").isNotNull,
        pow(col("__r") - col("__rn"), 2))).as("__num"))
    val dev = ranked.crossJoin(broadcast(s))   // 1-row mean factor
      .agg(first("__n").as("__n2"), first("__num").as("__num2"),
        sum(pow(col("__r") - col("__rb"), 2)).as("__den"))
    val n = col("__n2")
    val rvn = when(col("__den") > 0.0, col("__num2") / col("__den"))
    val varR = (n - 2.0) * 4.0 * (n * n * 5.0 - n * 2.0 - 9.0) /
      (n * 5.0 * (n + 1.0) * (n - 1.0) * (n - 1.0))
    val z = when(rvn.isNotNull && varR > 0.0,
      (rvn - 2.0) / sqrt(varR))
    dev.select(
      n.cast("bigint").as("n_days"),
      round(rvn, 6).as("rvn"),
      round(z, 6).as("z"),
      when(z.isNotNull, abs(z) > 1.959964).otherwise(lit(false))
        .as("sig_95"),
      when(z.isNotNull && z < -1.959964, lit("trending"))
        .when(z.isNotNull && z > 1.959964, lit("oscillating"))
        .otherwise(lit("random")).as("reading"))
  }

  /** DuckDB oracle for [[bartelsRank]]. */
  val bartelsOracleSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d, SUM(value) AS y
      |  FROM events GROUP BY 1),
      |r AS (
      |  SELECT d,
      |    RANK() OVER (ORDER BY y) +
      |      (COUNT(*) OVER (PARTITION BY y) - 1) / 2.0 AS rr
      |  FROM daily),
      |l AS (
      |  SELECT rr, LEAD(rr) OVER (ORDER BY d) AS rn FROM r),
      |s AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(rr) AS rb,
      |    SUM(CASE WHEN rn IS NOT NULL
      |      THEN POW(rr - rn, 2) END) AS num
      |  FROM l),
      |f AS (
      |  SELECT s.n, s.num, SUM(POW(l.rr - s.rb, 2)) AS den
      |  FROM l CROSS JOIN s GROUP BY 1, 2),
      |g AS (
      |  SELECT n, CASE WHEN den > 0 THEN num / den END AS rvn,
      |    4.0 * (n - 2.0) * (5.0 * n * n - 2.0 * n - 9.0) /
      |      (5.0 * n * (n + 1.0) * (n - 1.0) * (n - 1.0)) AS vr
      |  FROM f)
      |SELECT CAST(n AS BIGINT) AS n_days,
      |  ROUND(rvn, 6) AS rvn,
      |  ROUND(CASE WHEN rvn IS NOT NULL AND vr > 0
      |    THEN (rvn - 2.0) / SQRT(vr) END, 6) AS z,
      |  CASE WHEN rvn IS NOT NULL AND vr > 0
      |    THEN ABS((rvn - 2.0) / SQRT(vr)) > 1.959964
      |    ELSE FALSE END AS sig_95,
      |  CASE WHEN rvn IS NOT NULL AND vr > 0
      |      AND (rvn - 2.0) / SQRT(vr) < -1.959964 THEN 'trending'
      |    WHEN rvn IS NOT NULL AND vr > 0
      |      AND (rvn - 2.0) / SQRT(vr) > 1.959964 THEN 'oscillating'
      |    ELSE 'random' END AS reading
      |FROM g""".stripMargin
  /** Wald–Wolfowitz runs test on the daily-revenue series around its
    * median (Wald & Wolfowitz, Ann. Math. Stat. 1940) — the
    * randomness check that catches what [[mannKendall]] (monotone
    * drift) and the q281 Durbin–Watson (lag-1 linear correlation)
    * both miss: ANY sign-clustering pattern. R = number of
    * same-sign runs; under randomness E[R] = 2n₊n₋/n + 1,
    * Var[R] = 2n₊n₋(2n₊n₋−n)/(n²(n−1)); days AT the median are
    * excluded (the standard convention). Too few runs = regimes;
    * too many = oscillation.
    *
    * Scale shape: one grouped agg to the calendar table, an exact-
    * percentile 1-row median factor, one calendar-ordered lag
    * window, scalar arithmetic. */
  def runsTest(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum("value").as("y"))
    val med = daily.agg(expr("percentile(y, 0.5)").as("__med"))
    val signed = daily.crossJoin(broadcast(med))   // 1-row stat factor
      .where(col("y") =!= col("__med"))
      .select(col("d"), (col("y") > col("__med")).as("__up"))
    val w = Window.orderBy("d")   // calendar-sized window
    val runs = signed
      .withColumn("__prev", lag("__up", 1).over(w))
      .agg(
        count(lit(1)).cast("double").as("__n"),
        sum(when(col("__up"), 1.0).otherwise(0.0)).as("__np"),
        (sum(when(col("__prev").isNull ||
          col("__up") =!= col("__prev"), 1L).otherwise(0L)))
          .cast("double").as("__r"))
    val nm = col("__n") - col("__np")
    val e = col("__np") * nm * 2.0 / col("__n") + 1.0
    val v = (col("__np") * nm * 2.0) *
      (col("__np") * nm * 2.0 - col("__n")) /
      (col("__n") * col("__n") * (col("__n") - 1.0))
    runs.select(
      col("__n").cast("long").as("n_days"),
      col("__np").cast("long").as("n_above"),
      col("__r").cast("long").as("runs"),
      round(e, 6).as("expected_runs"),
      round(when(v > 0.0, (col("__r") - e) / sqrt(v)), 6).as("z"),
      when(v > 0.0 && (col("__r") - e) / sqrt(v) < -1.959964,
        lit("clustered"))
        .when(v > 0.0 && (col("__r") - e) / sqrt(v) > 1.959964,
          lit("oscillating"))
        .otherwise(lit("random")).as("verdict"))
  }

  /** DuckDB oracle for [[runsTest]]. */
  val runsTestOracleSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d, SUM(value) AS y
      |  FROM events GROUP BY 1),
      |med AS (SELECT quantile_cont(y, 0.5) AS m FROM daily),
      |s AS (
      |  SELECT d, y > med.m AS up
      |  FROM daily CROSS JOIN med WHERE y <> med.m),
      |l AS (
      |  SELECT up, LAG(up) OVER (ORDER BY d) AS prev FROM s),
      |agg AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |    SUM(CASE WHEN up THEN 1.0 ELSE 0.0 END) AS np,
      |    CAST(SUM(CASE WHEN prev IS NULL OR up <> prev THEN 1
      |      ELSE 0 END) AS DOUBLE) AS r
      |  FROM l),
      |f AS (
      |  SELECT *, n - np AS nm,
      |    np * (n - np) * 2.0 / n + 1.0 AS e,
      |    (np * (n - np) * 2.0) * (np * (n - np) * 2.0 - n) /
      |      (n * n * (n - 1.0)) AS v
      |  FROM agg)
      |SELECT CAST(n AS BIGINT) AS n_days, CAST(np AS BIGINT) AS n_above,
      |  CAST(r AS BIGINT) AS runs,
      |  ROUND(e, 6) AS expected_runs,
      |  ROUND(CASE WHEN v > 0 THEN (r - e) / sqrt(v) END, 6) AS z,
      |  CASE WHEN v > 0 AND (r - e) / sqrt(v) < -1.959964
      |      THEN 'clustered'
      |    WHEN v > 0 AND (r - e) / sqrt(v) > 1.959964
      |      THEN 'oscillating'
      |    ELSE 'random' END AS verdict
      |FROM f""".stripMargin

  /** Negative-binomial method-of-moments fit per event type over the
    * zero-filled daily-count spine — the quantification of what
    * [[fanoFactor]] only flags: when var > mean, the counts are not
    * Poisson and every Poisson-based alert threshold is too tight.
    * MoM (Anscombe 1950): r = μ²/(σ²−μ), p = μ/σ² — NULL when the
    * data is at-or-under-dispersed (no NB fit exists there). The
    * usable output is `thr_3sd` = μ+3σ under the FITTED variance, the
    * threshold a count alert should actually use (vs the Poisson
    * μ+3√μ beside it — the gap between the two columns IS the
    * false-page rate a Poisson alert would pay).
    *
    * Scale shape: identical to [[fanoFactor]] — one grouped agg, a
    * calendar-sized spine grid, type-cardinality out. */
  def negativeBinomialFit(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).cast("double").as("c"))
    val spine = daily.agg(min("d").as("__lo"), max("d").as("__hi"))
      .select(explode(expr("sequence(__lo, __hi, interval 1 day)"))
        .as("d"))
    val grid = daily.select("event_type").distinct()
      .crossJoin(broadcast(spine))   // calendar-sized grid
      .join(daily, Seq("event_type", "d"), "left_outer")
      .na.fill(0.0, Seq("c"))
    grid.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        avg("c").as("__mu"), var_pop("c").as("__v"))
      .select(col("event_type"), col("n_days"),
        round(col("__mu"), 6).as("mean_daily"),
        round(col("__v"), 6).as("var_daily"),
        round(when(col("__v") > col("__mu"),
          col("__mu") * col("__mu") / (col("__v") - col("__mu"))), 6)
          .as("nb_r"),
        round(when(col("__v") > col("__mu"),
          col("__mu") / col("__v")), 6).as("nb_p"),
        round(col("__mu") + lit(3.0) * sqrt(col("__v")), 6)
          .as("thr_3sd"),
        round(col("__mu") + lit(3.0) * sqrt(col("__mu")), 6)
          .as("thr_poisson"))
      .orderBy("event_type")
  }

  /** DuckDB oracle for [[negativeBinomialFit]]. */
  val negativeBinomialOracleSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d,
      |    CAST(COUNT(*) AS DOUBLE) AS c
      |  FROM events GROUP BY 1, 2),
      |spine AS (
      |  SELECT UNNEST(generate_series((SELECT MIN(d) FROM daily),
      |    (SELECT MAX(d) FROM daily), INTERVAL 1 DAY)) AS d),
      |grid AS (
      |  SELECT t.event_type, CAST(spine.d AS DATE) AS d,
      |    COALESCE(daily.c, 0.0) AS c
      |  FROM (SELECT DISTINCT event_type FROM daily) t
      |  CROSS JOIN spine
      |  LEFT JOIN daily ON daily.event_type = t.event_type
      |    AND daily.d = CAST(spine.d AS DATE)),
      |m AS (
      |  SELECT event_type, COUNT(*) AS n, AVG(c) AS mu, VAR_POP(c) AS v
      |  FROM grid GROUP BY 1)
      |SELECT event_type, CAST(n AS BIGINT) AS n_days,
      |  ROUND(mu, 6) AS mean_daily,
      |  ROUND(v, 6) AS var_daily,
      |  ROUND(CASE WHEN v > mu THEN mu * mu / (v - mu) END, 6) AS nb_r,
      |  ROUND(CASE WHEN v > mu THEN mu / v END, 6) AS nb_p,
      |  ROUND(mu + 3.0 * sqrt(v), 6) AS thr_3sd,
      |  ROUND(mu + 3.0 * sqrt(mu), 6) AS thr_poisson
      |FROM m ORDER BY event_type""".stripMargin

  /** Daily error-rate SLO monitor with a Wilson score interval
    * (Wilson 1927) — the proportion CI that behaves at small n and
    * extreme rates, where the naive ±z√(p(1−p)/n) interval collapses
    * or escapes [0,1]. A day breaches only when its LOWER bound
    * clears the SLO — "confidently above budget", the alert rule
    * that doesn't page on one unlucky event in a ten-event day.
    *
    * One shuffle to daily (n, errors); calendar-sized arithmetic
    * after. */
  def errorSlo(events: DataFrame, errorType: String = "error",
      slo: Double = 0.25, z: Double = 1.959964): DataFrame = {
    require(slo > 0.0 && slo < 1.0, "slo must be in (0,1)")
    val daily = events
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === errorType, 1L).otherwise(0L))
          .as("errors"))
    val nD = col("n").cast("double")
    val p = col("errors").cast("double") / nD
    val z2 = z * z
    val center = (p + lit(z2) / (nD * 2.0)) / (lit(1.0) + lit(z2) / nD)
    val half = (sqrt(p * (lit(1.0) - p) / nD +
      lit(z2) / (nD * nD * 4.0)) * z) / (lit(1.0) + lit(z2) / nD)
    daily.select(
      col("d"), col("n"), col("errors"),
      round(p, 6).as("rate"),
      round(center - half, 6).as("wilson_lo"),
      round(center + half, 6).as("wilson_hi"),
      (center - half > slo).as("breach"))
      .orderBy("d")
  }

  /** DuckDB oracle for [[errorSlo]]. */
  def errorSloOracleSql(errorType: String = "error",
      slo: Double = 0.25, z: Double = 1.959964): String = {
    val z2 = z * z
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n,
       |    SUM(CASE WHEN event_type = '$errorType' THEN 1 ELSE 0 END)
       |      AS errors
       |  FROM events GROUP BY 1),
       |k AS (
       |  SELECT d, n, errors,
       |    CAST(errors AS DOUBLE) / n AS p,
       |    (CAST(errors AS DOUBLE) / n + $z2 / (2.0 * n))
       |      / (1.0 + $z2 / n) AS center,
       |    ($z * sqrt((CAST(errors AS DOUBLE) / n)
       |        * (1.0 - CAST(errors AS DOUBLE) / n) / n
       |      + $z2 / (4.0 * CAST(n AS DOUBLE) * n)))
       |      / (1.0 + $z2 / n) AS half
       |  FROM daily)
       |SELECT d, CAST(n AS BIGINT) AS n,
       |  CAST(errors AS BIGINT) AS errors,
       |  ROUND(p, 6) AS rate,
       |  ROUND(center - half, 6) AS wilson_lo,
       |  ROUND(center + half, 6) AS wilson_hi,
       |  center - half > $slo AS breach
       |FROM k ORDER BY d""".stripMargin
  }

  /** DuckDB oracle for [[fanoFactor]]. */
  val fanoOracleSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d,
      |    CAST(COUNT(*) AS DOUBLE) AS c
      |  FROM events GROUP BY 1, 2),
      |span AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM daily),
      |spine AS (
      |  SELECT CAST(UNNEST(generate_series((SELECT lo FROM span),
      |    (SELECT hi FROM span), INTERVAL 1 DAY)) AS DATE) AS d),
      |grid AS (
      |  SELECT t.event_type, s.d, COALESCE(daily.c, 0.0) AS c
      |  FROM (SELECT DISTINCT event_type FROM daily) t
      |  CROSS JOIN spine s
      |  LEFT JOIN daily ON daily.event_type = t.event_type
      |    AND daily.d = s.d)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
      |  ROUND(AVG(c), 6) AS mean_daily,
      |  ROUND(var_pop(c), 6) AS var_daily,
      |  ROUND(var_pop(c) / AVG(c), 6) AS fano,
      |  CASE WHEN var_pop(c) / AVG(c) > 1.0 THEN 'over'
      |    WHEN var_pop(c) / AVG(c) < 1.0 THEN 'under'
      |    ELSE 'poisson' END AS dispersion
      |FROM grid GROUP BY 1 ORDER BY 1""".stripMargin

  /** DuckDB oracle for [[dailyAcf]]. */
  def acfOracleSql(maxLag: Int = 7): String =
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS DOUBLE) AS c
       |  FROM events GROUP BY 1),
       |st AS (SELECT AVG(c) AS mu FROM daily),
       |cent AS (SELECT d, c - (SELECT mu FROM st) AS x FROM daily),
       |den AS (SELECT SUM(x * x) AS dd FROM cent),
       |lags AS (SELECT CAST(UNNEST(range(1, ${maxLag + 1})) AS INTEGER) AS lag)
       |SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  ROUND(SUM(a.x * b.x) / (SELECT dd FROM den), 6) AS acf
       |FROM cent a
       |JOIN lags ON TRUE
       |JOIN cent b ON b.d = a.d + lag
       |GROUP BY lag ORDER BY lag""".stripMargin

  /** Ljung–Box portmanteau test (Ljung & Box, Biometrika 1978) on the
    * daily-count series: Q = n(n+2)·Σ_{k≤m} ρ̂ₖ²/(n−k), the "is there
    * ANY autocorrelation left" reading on top of [[dailyAcf]]'s
    * per-lag view — Q ~ χ²(m) under white noise. One row:
    * `(n_days, max_lag, q_stat)` (compare against the χ²(m) critical
    * value, the q286/q290 convention). Built ON the [[dailyAcf]]
    * output — including its 6-decimal rounding — so the two queries
    * can never disagree about ρ̂ₖ.
    *
    * Calendar-cardinality dataflow end-to-end; the day count is a
    * 1-row broadcast stat factor. */
  def ljungBox(events: DataFrame, maxLag: Int = 7): DataFrame = {
    val acf = dailyAcf(events, maxLag)
    val nd = events
      .groupBy(to_date(col("ts")).as("d")).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("__n"))
    acf.crossJoin(broadcast(nd))   // 1-row stat factor
      .agg(
        first("__n").as("n_days"),
        count(lit(1)).as("max_lag"),
        sum(col("acf") * col("acf") /
          (col("__n") - col("lag")).cast("double")).as("__s"))
      .select(
        col("n_days").cast("bigint").as("n_days"),
        col("max_lag").cast("bigint").as("max_lag"),
        round(col("n_days").cast("double") *
          (col("n_days").cast("double") + 2.0) * col("__s"), 6)
          .as("q_stat"))
  }

  /** DuckDB oracle for [[ljungBox]]. */
  def ljungBoxOracleSql(maxLag: Int = 7): String =
    s"""WITH acf AS (${acfOracleSql(maxLag).replace("\n", "\n  ")}),
       |nd AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM (
       |    SELECT CAST(ts AS DATE) AS d FROM events GROUP BY 1))
       |SELECT CAST(n AS BIGINT) AS n_days,
       |  CAST(COUNT(*) AS BIGINT) AS max_lag,
       |  ROUND(n * (n + 2.0) * SUM(acf * acf / (n - lag)), 6) AS q_stat
       |FROM acf, nd GROUP BY n""".stripMargin

  /** Page–Hinkley change detector (Page, Biometrika 1954; the
    * sequential drift monitor beside [[cusumReport]]'s shift chart) on
    * the daily revenue series: mₜ = Σ_{i≤t}(xᵢ − x̄ᵢ − δ) with x̄ᵢ the
    * RUNNING mean, alarm when mₜ − min_{i≤t} mᵢ > λ. Emits the full
    * per-day trace `(d, x, run_mean, ph, ph_min, alert)` — the table a
    * monitoring dashboard plots, with the alarm column the pipeline
    * gates on.
    *
    * Calendar-cardinality: one grouped day agg, then three stacked
    * cumulative windows over the same ordered spec (ordered+framed —
    * NOT the two-partition-spec shape the q220 corruption note bans). */
  def pageHinkley(events: DataFrame, delta: Double = 0.0,
      lambda: Double = 1000.0): DataFrame =
    pageHinkleyFromDaily(
      events.groupBy(to_date(col("ts")).as("d")).agg(sum("value").as("x")),
      delta, lambda)

  /** [[pageHinkley]] from an already-daily `(d, x)` frame — the entry
    * the streaming monitor's replay-safe increment table feeds
    * ([[graft.streaming.TrendMonitor]] recipe), so stream ≡ batch by
    * construction and the same oracle pins both. */
  def pageHinkleyFromDaily(daily: DataFrame, delta: Double = 0.0,
      lambda: Double = 1000.0): DataFrame = {
    val w = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, 0)
    daily
      .withColumn("run_mean", avg("x").over(w))
      .withColumn("ph",
        sum(col("x") - col("run_mean") - lit(delta)).over(w))
      .withColumn("ph_min", min("ph").over(w))
      .select(col("d"),
        round(col("x"), 6).as("x"),
        round(col("run_mean"), 6).as("run_mean"),
        round(col("ph"), 6).as("ph"),
        round(col("ph_min"), 6).as("ph_min"),
        (col("ph") - col("ph_min") > lambda).as("alert"))
      .orderBy("d")
  }

  /** DuckDB oracle for [[pageHinkley]]. */
  def pageHinkleyOracleSql(delta: Double = 0.0,
      lambda: Double = 1000.0): String =
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS d, SUM(value) AS x
       |  FROM events GROUP BY 1),
       |rm AS (
       |  SELECT d, x, AVG(x) OVER (ORDER BY d
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_mean
       |  FROM daily),
       |ph AS (
       |  SELECT d, x, run_mean,
       |    SUM(x - run_mean - CAST($delta AS DOUBLE)) OVER (ORDER BY d
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
       |  FROM rm),
       |mm AS (
       |  SELECT d, x, run_mean, m,
       |    MIN(m) OVER (ORDER BY d
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m_min
       |  FROM ph)
       |SELECT d, ROUND(x, 6) AS x, ROUND(run_mean, 6) AS run_mean,
       |  ROUND(m, 6) AS ph, ROUND(m_min, 6) AS ph_min,
       |  m - m_min > CAST($lambda AS DOUBLE) AS alert
       |FROM mm ORDER BY d""".stripMargin

  /** EWMA control chart over daily total revenue (Roberts 1959;
    * Montgomery SPC ch. 9): zₜ = λ·xₜ + (1−λ)·zₜ₋₁ anchored at the
    * process mean z₀ = μ̂, with the exact time-varying limits
    * μ ± L·σ̂·sqrt(λ/(2−λ)·(1−(1−λ)^{2t})). Between the memoryless
    * 3σ rule ([[robustDaily]] family) and the change-POINT detectors
    * ([[cusumReport]]/[[pageHinkley]]), EWMA is the standard middle
    * dial: small persistent shifts alarm fast, single spikes are
    * damped, and the chart value itself is readable as a smoothed
    * level.
    *
    * The recursion unrolls to the SES closed form (one cumulative
    * window, [[Forecast.sesBacktest]] precedent):
    * zₜ = b^t·μ + λ·Σ_{i≤t} b^{t−i}·xᵢ with b = 1−λ. μ̂/σ̂ are a
    * 1-row stat factor (population moments over the full series —
    * the textbook Phase-I estimate). Scale shape: one shuffle to the
    * day table; day-cardinality windows after. */
  def ewmaChart(events: DataFrame, lambda: Double = 0.2,
      widthL: Double = 3.0): DataFrame =
    ewmaFromDaily(
      events.groupBy(to_date(col("ts")).as("d"))
        .agg(sum("value").as("x")),
      lambda, widthL)

  /** [[ewmaChart]] from an already-daily `(d, x)` frame — the entry
    * the streaming monitor's replay-safe table feeds, so stream ≡
    * batch shares one oracle. */
  def ewmaFromDaily(daily: DataFrame, lambda: Double = 0.2,
      widthL: Double = 3.0): DataFrame = {
    require(lambda > 0.0 && lambda < 1.0, "lambda must be in (0,1)")
    val b = 1.0 - lambda
    val stats = daily.agg(avg("x").as("__mu"),
      stddev_pop(col("x")).as("__sd"))
    val wOrd = Window.orderBy("d")
    val wCum = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, 0)
    val withT = daily.crossJoin(broadcast(stats))   // 1-row stat factor
      .withColumn("__t", row_number().over(wOrd).cast("double"))
    val z = pow(lit(b), col("__t")) * (col("__mu") +
      sum(lit(lambda) * pow(lit(b), -col("__t")) * col("x")).over(wCum))
    val half = lit(widthL) * col("__sd") *
      sqrt(lit(lambda / (2.0 - lambda)) *
        (lit(1.0) - pow(lit(b), col("__t") * 2.0)))
    withT
      .withColumn("__z", z)
      .withColumn("__h", half)
      .select(col("d"), round(col("x"), 6).as("x"),
        round(col("__z"), 6).as("ewma"),
        round(col("__mu") + col("__h"), 6).as("ucl"),
        round(col("__mu") - col("__h"), 6).as("lcl"),
        (abs(col("__z") - col("__mu")) > col("__h")).as("alarm"))
      .orderBy("d")
  }

  /** DuckDB oracle for [[ewmaChart]]. */
  def ewmaOracleSql(lambda: Double = 0.2,
      widthL: Double = 3.0): String = {
    val b = 1.0 - lambda
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS d, SUM(value) AS x
       |  FROM events GROUP BY 1),
       |st AS (SELECT AVG(x) AS mu, stddev_pop(x) AS sd FROM daily),
       |t AS (
       |  SELECT d, x, mu, sd,
       |    CAST(ROW_NUMBER() OVER (ORDER BY d) AS DOUBLE) AS tt
       |  FROM daily, st),
       |z AS (
       |  SELECT d, x, mu, sd, tt,
       |    pow($b, tt) * (mu + SUM($lambda * pow($b, -tt) * x)
       |      OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)) AS zz,
       |    $widthL * sd * sqrt($lambda / ${2.0 - lambda} *
       |      (1.0 - pow($b, tt * 2.0))) AS hh
       |  FROM t)
       |SELECT d, ROUND(x, 6) AS x, ROUND(zz, 6) AS ewma,
       |  ROUND(mu + hh, 6) AS ucl, ROUND(mu - hh, 6) AS lcl,
       |  abs(zz - mu) > hh AS alarm
       |FROM z ORDER BY d""".stripMargin
  }
}
