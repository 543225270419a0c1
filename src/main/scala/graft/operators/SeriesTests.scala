package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Nonparametric randomness and complexity tests over the daily
  * revenue series — the shelf beside [[Anomaly.bartelsRank]] (rank
  * von Neumann) and the runs test: each reads a DIFFERENT departure
  * from serial randomness, and a monitoring stack wants the panel,
  * not one. Turning points reads local extremum frequency (too few =
  * smooth drift, too many = oscillation), Cox–Stuart reads a
  * first-half/second-half level shift, the records test reads
  * whether new maxima keep arriving faster than 1/k, Hjorth
  * parameters summarize the series' spectral shape in three moment
  * ratios, and permutation entropy measures ordinal-pattern
  * diversity (1 = white noise, → 0 = deterministic motion).
  *
  * All five share the daily-series dataflow: one corpus aggregate to
  * the calendar table (≤ a few thousand rows at any corpus size),
  * ordered lag/cumulative windows over THAT, and a scalar reduce —
  * the corpus is touched exactly once per query. */
object SeriesTests {

  private def daily(events: DataFrame): DataFrame =
    events.groupBy(to_date(col("ts")).as("d"))
      .agg(sum("value").as("y"))

  /** Turning-points test (Kendall, Time Series 1973 §3): T = count
    * of strict local maxima/minima; under i.i.d. E[T] = 2(n−2)/3,
    * Var[T] = (16n−29)/90. z two-sided at 5%; LOW z = too smooth
    * (trend/stickiness), HIGH = oscillation. One row
    * `(n_days, t_points, e_t, z, sig_95, reading)`. */
  def turningPoints(events: DataFrame): DataFrame = {
    val w = Window.orderBy("d")
    val lagged = daily(events)
      .withColumn("__p", lag("y", 1).over(w))
      .withColumn("__n", lead("y", 1).over(w))
    val turn = col("__p").isNotNull && col("__n").isNotNull &&
      ((col("y") > col("__p") && col("y") > col("__n")) ||
        (col("y") < col("__p") && col("y") < col("__n")))
    val s = lagged.agg(
      count(lit(1)).cast("double").as("__nn"),
      sum(when(turn, 1L).otherwise(0L)).as("__t"))
    val n = col("__nn")
    val eT = (n - 2.0) * 2.0 / 3.0
    val varT = (n * 16.0 - 29.0) / 90.0
    val z = when(varT > 0.0, (col("__t").cast("double") - eT) /
      sqrt(varT))
    s.select(
      n.cast("bigint").as("n_days"),
      col("__t").cast("bigint").as("t_points"),
      round(eT, 6).as("e_t"),
      round(z, 6).as("z"),
      coalesce(abs(z) > 1.959964, lit(false)).as("sig_95"),
      when(z.isNotNull && z < -1.959964, lit("smooth"))
        .when(z.isNotNull && z > 1.959964, lit("oscillating"))
        .otherwise(lit("random")).as("reading"))
  }

  /** Cox–Stuart trend test (Cox & Stuart, Biometrika 1955): pair
    * x_i with x_{i+h}, h = ⌊n/2⌋ (for odd n the last point drops —
    * one fixed convention, shared by the oracle), count
    * the sign of each second-half − first-half difference, and
    * binomial-normal test S⁺ against n'/2 (ties drop; no continuity
    * correction — documented, shared by the oracle). One row
    * `(n_days, n_pairs, s_plus, z, sig_95, trend)`. */
  def coxStuart(events: DataFrame): DataFrame = {
    val w = Window.orderBy("d")
    val d = daily(events).withColumn("__rn", row_number().over(w))
    val tot = d.agg(count(lit(1)).as("__cnt"),
      floor(count(lit(1)) / 2).as("__h"))
    val dd = d.crossJoin(broadcast(tot))   // 1-row stat factor
    val late = dd.select((col("__rn") - col("__h")).as("__rn2"),
      col("y").as("__y2"))
    // first-half rows join their +h partner: equi-join on the
    // shifted index (both sides calendar-sized)
    val pairs = dd.where(col("__rn") <= col("__h"))
      .join(late, col("__rn") === col("__rn2"))
      .agg(
        first("__cnt").as("__n"),
        sum(when(col("__y2") > col("y"), 1L).otherwise(0L)).as("__sp"),
        sum(when(col("__y2") =!= col("y"), 1L).otherwise(0L)).as("__np"))
    val npD = col("__np").cast("double")
    val z = when(col("__np") > 0L,
      (col("__sp").cast("double") - npD / 2.0) / sqrt(npD / 4.0))
    pairs.select(
      col("__n").cast("bigint").as("n_days"),
      col("__np").cast("bigint").as("n_pairs"),
      col("__sp").cast("bigint").as("s_plus"),
      round(z, 6).as("z"),
      coalesce(abs(z) > 1.959964, lit(false)).as("sig_95"),
      when(z.isNotNull && z > 1.959964, lit("up"))
        .when(z.isNotNull && z < -1.959964, lit("down"))
        .otherwise(lit("none")).as("trend"))
  }

  /** Records test (Foster & Stuart, JRSS B 1954): R = number of
    * upper records (running maxima, the first observation counts);
    * under i.i.d. E[R] = H_n (harmonic) and Var[R] = H_n − H_n⁽²⁾ —
    * records arriving faster than 1/k is drift the mean-based tests
    * can miss when the level moves in bursts. One row
    * `(n_days, n_records, e_records, z, sig_95)`. */
  def recordsTest(events: DataFrame): DataFrame = {
    val w = Window.orderBy("d")
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val d = daily(events)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__pm", max("y").over(wPrev))
    val s = d.agg(
      count(lit(1)).cast("double").as("__n"),
      sum(when(col("__pm").isNull || col("y") > col("__pm"), 1L)
        .otherwise(0L)).as("__r"),
      sum(lit(1.0) / col("__rn")).as("__h1"),
      sum(lit(1.0) / (col("__rn") * col("__rn"))).as("__h2"))
    val varR = col("__h1") - col("__h2")
    val z = when(varR > 0.0,
      (col("__r").cast("double") - col("__h1")) / sqrt(varR))
    s.select(
      col("__n").cast("bigint").as("n_days"),
      col("__r").cast("bigint").as("n_records"),
      round(col("__h1"), 6).as("e_records"),
      round(z, 6).as("z"),
      coalesce(abs(z) > 1.959964, lit(false)).as("sig_95"))
  }

  /** Hjorth parameters (Hjorth, EEG Clin. Neurophysiol. 1970): the
    * three-moment spectral summary — mobility = σ(Δx)/σ(x) (mean
    * frequency proxy) and complexity = mobility(Δx)/mobility(x)
    * (bandwidth proxy; 1 for a pure sine, grows with spectral
    * spread). Activity (= raw variance) is metric²-scale, so it is
    * reported as the O(1) coefficient of variation instead. All
    * three from closed-form moment sums over the lag-1 and lag-2
    * difference columns — one calendar-table pass. One row
    * `(n_days, cv, mobility, complexity)`. */
  def hjorth(events: DataFrame): DataFrame = {
    val w = Window.orderBy("d")
    val d = daily(events)
      .withColumn("__d1", col("y") - lag("y", 1).over(w))
      .withColumn("__d2", col("y") - lag("y", 1).over(w) * 2.0 +
        lag("y", 2).over(w))
    def mom(c: org.apache.spark.sql.Column, p: String) = Seq(
      count(c).cast("double").as(s"__n$p"),
      sum(c).as(s"__s$p"), sum(c * c).as(s"__q$p"))
    val s = d.agg(
      (mom(col("y"), "0") ++ mom(col("__d1"), "1") ++
        mom(col("__d2"), "2")).head,
      (mom(col("y"), "0") ++ mom(col("__d1"), "1") ++
        mom(col("__d2"), "2")).tail: _*)
    def varOf(p: String) =
      col(s"__q$p") / col(s"__n$p") -
        (col(s"__s$p") / col(s"__n$p")) * (col(s"__s$p") / col(s"__n$p"))
    val mob = when(varOf("0") > 0.0, sqrt(varOf("1") / varOf("0")))
    val mob2 = when(varOf("1") > 0.0, sqrt(varOf("2") / varOf("1")))
    s.select(
      col("__n0").cast("bigint").as("n_days"),
      round(when(col("__s0") =!= 0.0,
        sqrt(varOf("0")) / (col("__s0") / col("__n0"))), 6).as("cv"),
      round(mob, 6).as("mobility"),
      round(when(mob > 0.0, mob2 / mob), 6).as("complexity"))
  }

  /** Permutation entropy at order 3 (Bandt & Pompe, PRL 2002): the
    * Shannon entropy of the ordinal pattern distribution over
    * (x_i, x_{i+1}, x_{i+2}) triples, normalized by ln(3!) so 1 =
    * maximally diverse motion and → 0 = deterministic. Ties break
    * toward "not greater" consistently in both engines (a measure-0
    * event on the revenue series, pinned anyway). One row
    * `(n_triples, k_patterns, h, h_norm)`. */
  def permutationEntropy(events: DataFrame): DataFrame = {
    val w = Window.orderBy("d")
    val d = daily(events)
      .withColumn("__b", lead("y", 1).over(w))
      .withColumn("__c", lead("y", 2).over(w))
      .where(col("__b").isNotNull && col("__c").isNotNull)
    val code =
      when(col("__b") > col("y"), 4).otherwise(0) +
      when(col("__c") > col("y"), 2).otherwise(0) +
      when(col("__c") > col("__b"), 1).otherwise(0)
    val pat = d.groupBy(code.as("__pat"))
      .agg(count(lit(1)).as("__c"))
    val tot = pat.agg(sum("__c").as("__t"))
    val h = pat.crossJoin(broadcast(tot))   // 1-row total factor
      .agg(
        first("__t").as("n_triples"),
        count(lit(1)).as("k_patterns"),
        (-sum((col("__c").cast("double") / col("__t")) *
          log(col("__c").cast("double") / col("__t")))).as("__h"))
    h.select(
      col("n_triples").cast("bigint").as("n_triples"),
      col("k_patterns").cast("bigint").as("k_patterns"),
      round(col("__h"), 6).as("h"),
      round(col("__h") / math.log(6.0), 6).as("h_norm"))
  }

  /** Index of dispersion (variance-to-mean ratio) of the DAILY EVENT
    * COUNT with its χ² test (Cox & Lewis 1966 §6.3): a Poisson
    * arrival process has D = 1; D ≫ 1 = bursty/overdispersed
    * traffic (bot storms, batch replays), D ≪ 1 = suspiciously
    * regular (a scheduler pretending to be users). (n−1)·D ~
    * χ²(n−1) under Poisson, tested two-sided at 5% via the
    * Wilson–Hilferty normal approximation (exact-identical on both
    * engines). One row `(n_days, mean_count, vmr, z, sig_95,
    * reading)`. */
  def dispersionIndex(events: DataFrame): DataFrame = {
    val d = events.groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"))
    val s = d.agg(
      count(lit(1)).cast("double").as("__n"),
      avg(col("c").cast("double")).as("__mu"),
      var_samp(col("c").cast("double")).as("__v"))
    val vmr = when(col("__mu") > 0.0, col("__v") / col("__mu"))
    val dof = col("__n") - 1.0
    val chi2 = dof * vmr
    // Wilson–Hilferty: ((χ²/k)^(1/3) − (1 − 2/(9k))) / sqrt(2/(9k))
    val z = (pow(chi2 / dof, 1.0 / 3.0) -
      (lit(1.0) - lit(2.0) / (dof * 9.0))) /
      sqrt(lit(2.0) / (dof * 9.0))
    s.select(
      col("__n").cast("bigint").as("n_days"),
      round(col("__mu"), 6).as("mean_count"),
      round(vmr, 6).as("vmr"),
      round(z, 6).as("z"),
      coalesce(abs(z) > 1.959964, lit(false)).as("sig_95"),
      when(z.isNotNull && z > 1.959964, lit("overdispersed"))
        .when(z.isNotNull && z < -1.959964, lit("underdispersed"))
        .otherwise(lit("poisson")).as("reading"))
  }

  /** Overlapping Allan deviation of daily revenue at τ = 1, 2, 4
    * days (Allan, Proc. IEEE 1966): σ_y(τ)² = ½⟨(ȳ_{k+τ} − ȳ_k)²⟩
    * over τ-day block means — the stability-vs-averaging-window
    * curve. White noise falls as τ^(−1/2); a flat or rising curve
    * means drift/random-walk, i.e. averaging more days does NOT
    * stabilize the metric. Reported RELATIVE to the series mean
    * (the raw variance is metric²-scale, beyond the 6-decimal
    * canonical grid). One row `(n_days, adev_rel_1, adev_rel_2,
    * adev_rel_4, tau_slope)` with tau_slope =
    * log₂(adev(4)/adev(1))/2 (−0.5 = white noise, 0 = flat). */
  def allanDeviation(events: DataFrame): DataFrame = {
    val w = Window.orderBy("d")
    def blockMean(tau: Int) =
      avg("y").over(w.rowsBetween(0, tau - 1))
    val d = events.groupBy(to_date(col("ts")).as("d"))
      .agg(sum("value").as("y"))
    def avarCols(dd: DataFrame, tau: Int): DataFrame =
      dd.withColumn(s"__b$tau", blockMean(tau))
        .withColumn(s"__d$tau",
          lead(s"__b$tau", tau).over(w) - col(s"__b$tau"))
    val base = d.crossJoin(broadcast(d.agg(
      count(lit(1)).as("__n"), avg("y").as("__mu"))))
    val withB = avarCols(avarCols(avarCols(base, 1), 2), 4)
    // a τ-block difference is valid only when the SECOND block is
    // complete: its window must not run off the series end
    val rn = row_number().over(w)
    val s = withB.withColumn("__rn", rn)
      .agg(
        first("__n").as("n_days"), first("__mu").as("__mu"),
        avg(when(col("__rn") <= col("__n") - 1,
          col("__d1") * col("__d1"))).as("__a1"),
        avg(when(col("__rn") <= col("__n") - 3,
          col("__d2") * col("__d2"))).as("__a2"),
        avg(when(col("__rn") <= col("__n") - 7,
          col("__d4") * col("__d4"))).as("__a4"))
    def adev(a: org.apache.spark.sql.Column) =
      when(col("__mu") =!= 0.0, sqrt(a / 2.0) / col("__mu"))
    val slope = when(col("__a1") > 0.0 && col("__a4") > 0.0,
      log(sqrt(col("__a4")) / sqrt(col("__a1"))) / math.log(2.0) / 2.0)
    s.select(
      col("n_days").cast("bigint").as("n_days"),
      round(adev(col("__a1")), 6).as("adev_rel_1"),
      round(adev(col("__a2")), 6).as("adev_rel_2"),
      round(adev(col("__a4")), 6).as("adev_rel_4"),
      round(slope, 6).as("tau_slope"))
  }

  /** Pettitt changepoint test (Pettitt, Appl. Statist. 28, 1979):
    * the nonparametric single-changepoint locator — completes the
    * changepoint shelf (CUSUM/Page–Hinkley stream forward, q270
    * breakpoint fits a parametric two-segment mean; Pettitt asks
    * WHERE the Mann–Whitney-style rank mass splits, distribution-
    * free). U_t = Σ_{i≤t, j>t} sgn(x_i − x_j) telescopes through
    * ranks: with R_i the full-series ranks, U_t = 2·Σ_{i≤t}R_i −
    * t(n+1), so ONE rank window + ONE cumulative window computes
    * every U_t. K = max_{t<n} |U_t| (argmax day = last day of the
    * pre-change regime, earliest-date tie-break), approximate
    * two-sided p = 2·exp(−6K²/(n³+n²)) (Pettitt eq. 8; accurate for
    * p ≤ 0.5, capped at 1). Ranks tie-break by date — revenue ties
    * are measure-zero, so the plain-rank (vs midrank) distinction
    * never binds.
    *
    * One row `(n_days, k_stat, change_day, p_approx, sig_95)`.
    * Scale shape: one corpus agg to the calendar table, ordered
    * windows over THAT, 1-row count factor. */
  def pettitt(events: DataFrame): DataFrame = {
    val ranked = daily(events).withColumn("__r",
      rank().over(Window.orderBy(col("y"), col("d"))).cast("double"))
    val tot = ranked.agg(count(lit(1)).as("__n"))
    val nD = col("__n").cast("double")
    val u = ranked
      .withColumn("__t",
        row_number().over(Window.orderBy("d")).cast("double"))
      .withColumn("__cum", sum("__r").over(Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(tot))   // 1-row stat factor
      .withColumn("__u", col("__cum") * 2.0 - col("__t") * (nD + 1.0))
    // t = n has U_n = 0 by construction; a change must leave a tail
    val best = u.where(col("__t") < nD)
      .orderBy(abs(col("__u")).desc, col("d").asc)
      .limit(1)
    val k = abs(col("__u"))
    val p = least(lit(1.0),
      exp(k * k * -6.0 / (nD * nD * nD + nD * nD)) * 2.0)
    best.select(
      col("__n").cast("bigint").as("n_days"),
      k.cast("bigint").as("k_stat"),
      col("d").cast("date").as("change_day"),
      round(p, 6).as("p_approx"),
      (p < 0.05).as("sig_95"))
  }

  /** DuckDB oracle for [[pettitt]]. */
  val pettittOracleSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d, SUM(value) AS y
      |  FROM events GROUP BY 1),
      |rk AS (
      |  SELECT d, CAST(RANK() OVER (ORDER BY y, d) AS DOUBLE) AS r
      |  FROM daily),
      |cu AS (
      |  SELECT d,
      |    CAST(ROW_NUMBER() OVER (ORDER BY d) AS DOUBLE) AS t,
      |    SUM(r) OVER (ORDER BY d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM rk),
      |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM daily),
      |u AS (
      |  SELECT d, t, nn.n,
      |    cum * 2.0 - t * (nn.n + 1.0) AS u
      |  FROM cu CROSS JOIN nn),
      |best AS (
      |  SELECT * FROM u WHERE t < n
      |  ORDER BY ABS(u) DESC, d ASC LIMIT 1)
      |SELECT CAST(n AS BIGINT) AS n_days,
      |  CAST(ABS(u) AS BIGINT) AS k_stat,
      |  d AS change_day,
      |  ROUND(LEAST(1.0,
      |    EXP(ABS(u) * ABS(u) * -6.0 / (n * n * n + n * n)) * 2.0),
      |    6) AS p_approx,
      |  LEAST(1.0,
      |    EXP(ABS(u) * ABS(u) * -6.0 / (n * n * n + n * n)) * 2.0)
      |    < 0.05 AS sig_95
      |FROM best""".stripMargin

  /** Sample L-moments of the daily revenue distribution (Hosking,
    * JRSS-B 1990): the order-statistics analogue of the moment
    * profile q100 reports — L-CV, L-skewness and L-kurtosis are
    * bounded, exist whenever the mean does, and are far less
    * outlier-dominated than classical CV/skew/kurtosis (a single
    * 10× day moves g₁ wildly but τ₃ only O(1/n)). Unbiased
    * probability-weighted moments from the ordered sample:
    *   b_r = (1/n) Σ_i [(i−1)⋯(i−r)] / [(n−1)⋯(n−r)] · x_(i)
    *   λ₁ = b₀, λ₂ = 2b₁ − b₀, λ₃ = 6b₂ − 6b₁ + b₀,
    *   λ₄ = 20b₃ − 30b₂ + 12b₁ − b₀
    *   τ₂ = λ₂/λ₁ (L-CV; positive-location data), τ₃ = λ₃/λ₂,
    *   τ₄ = λ₄/λ₂.
    * Exact arithmetic on ranks — no approximation anywhere. Ordering
    * ties break by date (measure-zero on revenue sums).
    *
    * One row `(n_days, l1, l2, l_cv, l_skew, l_kurt)`. Scale shape:
    * corpus agg → calendar table, one ordered window, one reduce. */
  def lMoments(events: DataFrame): DataFrame = {
    val ranked = daily(events).withColumn("__i",
      row_number().over(Window.orderBy(col("y"), col("d")))
        .cast("double"))
    val tot = ranked.agg(count(lit(1)).as("__n"))
    val nD = col("__n").cast("double")
    val x = col("y").cast("double")
    val i = col("__i")
    val b = ranked.crossJoin(broadcast(tot))   // 1-row count factor
      .agg(
        first("__n").as("__n"),
        avg(x).as("__b0"),
        avg(x * (i - 1.0) / (nD - 1.0)).as("__b1"),
        avg(x * (i - 1.0) * (i - 2.0) /
          ((nD - 1.0) * (nD - 2.0))).as("__b2"),
        avg(x * (i - 1.0) * (i - 2.0) * (i - 3.0) /
          ((nD - 1.0) * (nD - 2.0) * (nD - 3.0))).as("__b3"))
    val l1 = col("__b0")
    val l2 = col("__b1") * 2.0 - col("__b0")
    val l3 = col("__b2") * 6.0 - col("__b1") * 6.0 + col("__b0")
    val l4 = col("__b3") * 20.0 - col("__b2") * 30.0 +
      col("__b1") * 12.0 - col("__b0")
    b.select(
      col("__n").cast("bigint").as("n_days"),
      round(l1, 6).as("l1"),
      round(l2, 6).as("l2"),
      round(when(l1 > 0.0, l2 / l1), 6).as("l_cv"),
      round(when(l2 > 0.0, l3 / l2), 6).as("l_skew"),
      round(when(l2 > 0.0, l4 / l2), 6).as("l_kurt"))
  }

  /** DuckDB oracle for [[lMoments]]. */
  val lMomentsOracleSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d, SUM(value) AS y
      |  FROM events GROUP BY 1),
      |rk AS (
      |  SELECT CAST(y AS DOUBLE) AS x,
      |    CAST(ROW_NUMBER() OVER (ORDER BY y, d) AS DOUBLE) AS i
      |  FROM daily),
      |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM daily),
      |b AS (
      |  SELECT nn.n,
      |    AVG(x) AS b0,
      |    AVG(x * (i - 1.0) / (nn.n - 1.0)) AS b1,
      |    AVG(x * (i - 1.0) * (i - 2.0) /
      |      ((nn.n - 1.0) * (nn.n - 2.0))) AS b2,
      |    AVG(x * (i - 1.0) * (i - 2.0) * (i - 3.0) /
      |      ((nn.n - 1.0) * (nn.n - 2.0) * (nn.n - 3.0))) AS b3
      |  FROM rk CROSS JOIN nn
      |  GROUP BY 1),
      |l AS (
      |  SELECT n, b0 AS l1,
      |    b1 * 2.0 - b0 AS l2,
      |    b2 * 6.0 - b1 * 6.0 + b0 AS l3,
      |    b3 * 20.0 - b2 * 30.0 + b1 * 12.0 - b0 AS l4
      |  FROM b)
      |SELECT CAST(n AS BIGINT) AS n_days,
      |  ROUND(l1, 6) AS l1, ROUND(l2, 6) AS l2,
      |  ROUND(CASE WHEN l1 > 0 THEN l2 / l1 END, 6) AS l_cv,
      |  ROUND(CASE WHEN l2 > 0 THEN l3 / l2 END, 6) AS l_skew,
      |  ROUND(CASE WHEN l2 > 0 THEN l4 / l2 END, 6) AS l_kurt
      |FROM l""".stripMargin

  private val dailyCte =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d, SUM(value) AS y
      |  FROM events GROUP BY 1)""".stripMargin

  /** DuckDB oracle for [[dispersionIndex]]. */
  val dispersionOracleSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS c
      |  FROM events GROUP BY 1),
      |s AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |    AVG(CAST(c AS DOUBLE)) AS mu,
      |    VAR_SAMP(CAST(c AS DOUBLE)) AS v
      |  FROM daily),
      |g AS (
      |  SELECT n, mu, CASE WHEN mu > 0 THEN v / mu END AS vmr,
      |    n - 1.0 AS dof
      |  FROM s),
      |z AS (
      |  SELECT n, mu, vmr,
      |    (POW(dof * vmr / dof, 1.0 / 3.0) -
      |      (1.0 - 2.0 / (9.0 * dof))) / SQRT(2.0 / (9.0 * dof))
      |      AS zv
      |  FROM g)
      |SELECT CAST(n AS BIGINT) AS n_days,
      |  ROUND(mu, 6) AS mean_count, ROUND(vmr, 6) AS vmr,
      |  ROUND(zv, 6) AS z,
      |  COALESCE(ABS(zv) > 1.959964, FALSE) AS sig_95,
      |  CASE WHEN zv > 1.959964 THEN 'overdispersed'
      |    WHEN zv < -1.959964 THEN 'underdispersed'
      |    ELSE 'poisson' END AS reading
      |FROM z""".stripMargin

  /** DuckDB oracle for [[allanDeviation]]. */
  val allanOracleSql: String =
    s"""$dailyCte,
      |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(y) AS mu
      |  FROM daily),
      |b AS (
      |  SELECT ROW_NUMBER() OVER (ORDER BY d) AS rn,
      |    AVG(y) OVER (ORDER BY d
      |      ROWS BETWEEN CURRENT ROW AND 0 FOLLOWING) AS b1,
      |    AVG(y) OVER (ORDER BY d
      |      ROWS BETWEEN CURRENT ROW AND 1 FOLLOWING) AS b2,
      |    AVG(y) OVER (ORDER BY d
      |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS b4
      |  FROM daily),
      |dd AS (
      |  SELECT rn,
      |    LEAD(b1, 1) OVER (ORDER BY rn) - b1 AS d1,
      |    LEAD(b2, 2) OVER (ORDER BY rn) - b2 AS d2,
      |    LEAD(b4, 4) OVER (ORDER BY rn) - b4 AS d4
      |  FROM b),
      |s AS (
      |  SELECT ANY_VALUE(nn.n) AS n, ANY_VALUE(nn.mu) AS mu,
      |    AVG(CASE WHEN rn <= nn.n - 1 THEN d1 * d1 END) AS a1,
      |    AVG(CASE WHEN rn <= nn.n - 3 THEN d2 * d2 END) AS a2,
      |    AVG(CASE WHEN rn <= nn.n - 7 THEN d4 * d4 END) AS a4
      |  FROM dd CROSS JOIN nn)
      |SELECT CAST(n AS BIGINT) AS n_days,
      |  ROUND(CASE WHEN mu <> 0 THEN SQRT(a1 / 2.0) / mu END, 6)
      |    AS adev_rel_1,
      |  ROUND(CASE WHEN mu <> 0 THEN SQRT(a2 / 2.0) / mu END, 6)
      |    AS adev_rel_2,
      |  ROUND(CASE WHEN mu <> 0 THEN SQRT(a4 / 2.0) / mu END, 6)
      |    AS adev_rel_4,
      |  ROUND(CASE WHEN a1 > 0 AND a4 > 0 THEN
      |    LN(SQRT(a4) / SQRT(a1)) / LN(2.0) / 2.0 END, 6)
      |    AS tau_slope
      |FROM s""".stripMargin

  /** DuckDB oracle for [[turningPoints]]. */
  val turningPointsOracleSql: String =
    s"""$dailyCte,
      |l AS (
      |  SELECT y, LAG(y) OVER (ORDER BY d) AS p,
      |    LEAD(y) OVER (ORDER BY d) AS nx
      |  FROM daily),
      |s AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |    SUM(CASE WHEN p IS NOT NULL AND nx IS NOT NULL AND
      |      ((y > p AND y > nx) OR (y < p AND y < nx))
      |      THEN 1 ELSE 0 END) AS t
      |  FROM l),
      |g AS (
      |  SELECT n, t, 2.0 * (n - 2.0) / 3.0 AS et,
      |    (16.0 * n - 29.0) / 90.0 AS vt
      |  FROM s),
      |z AS (
      |  SELECT n, t, et,
      |    CASE WHEN vt > 0 THEN (t - et) / SQRT(vt) END AS zv
      |  FROM g)
      |SELECT CAST(n AS BIGINT) AS n_days, CAST(t AS BIGINT) AS t_points,
      |  ROUND(et, 6) AS e_t, ROUND(zv, 6) AS z,
      |  COALESCE(ABS(zv) > 1.959964, FALSE) AS sig_95,
      |  CASE WHEN zv < -1.959964 THEN 'smooth'
      |    WHEN zv > 1.959964 THEN 'oscillating'
      |    ELSE 'random' END AS reading
      |FROM z""".stripMargin

  /** DuckDB oracle for [[coxStuart]]. */
  val coxStuartOracleSql: String =
    s"""$dailyCte,
      |r AS (
      |  SELECT y, ROW_NUMBER() OVER (ORDER BY d) AS rn FROM daily),
      |tot AS (
      |  SELECT COUNT(*) AS cnt,
      |    CAST(FLOOR(COUNT(*) / 2) AS BIGINT) AS h
      |  FROM r),
      |p AS (
      |  SELECT a.y AS y1, b.y AS y2
      |  FROM r a CROSS JOIN tot
      |  JOIN r b ON b.rn = a.rn + tot.h
      |  WHERE a.rn <= tot.h),
      |s AS (
      |  SELECT (SELECT cnt FROM tot) AS n,
      |    SUM(CASE WHEN y2 > y1 THEN 1 ELSE 0 END) AS sp,
      |    SUM(CASE WHEN y2 <> y1 THEN 1 ELSE 0 END) AS np
      |  FROM p),
      |z AS (
      |  SELECT n, np, sp, CASE WHEN np > 0 THEN
      |    (sp - np / 2.0) / SQRT(np / 4.0) END AS zv
      |  FROM s)
      |SELECT CAST(n AS BIGINT) AS n_days, CAST(np AS BIGINT) AS n_pairs,
      |  CAST(sp AS BIGINT) AS s_plus, ROUND(zv, 6) AS z,
      |  COALESCE(ABS(zv) > 1.959964, FALSE) AS sig_95,
      |  CASE WHEN zv > 1.959964 THEN 'up'
      |    WHEN zv < -1.959964 THEN 'down'
      |    ELSE 'none' END AS trend
      |FROM z""".stripMargin

  /** DuckDB oracle for [[recordsTest]]. */
  val recordsOracleSql: String =
    s"""$dailyCte,
      |r AS (
      |  SELECT y, ROW_NUMBER() OVER (ORDER BY d) AS rn,
      |    MAX(y) OVER (ORDER BY d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      |  FROM daily),
      |s AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |    SUM(CASE WHEN pm IS NULL OR y > pm THEN 1 ELSE 0 END) AS rec,
      |    SUM(1.0 / rn) AS h1, SUM(1.0 / (rn * rn)) AS h2
      |  FROM r),
      |z AS (
      |  SELECT n, rec, h1,
      |    CASE WHEN h1 - h2 > 0
      |      THEN (rec - h1) / SQRT(h1 - h2) END AS zv
      |  FROM s)
      |SELECT CAST(n AS BIGINT) AS n_days,
      |  CAST(rec AS BIGINT) AS n_records,
      |  ROUND(h1, 6) AS e_records, ROUND(zv, 6) AS z,
      |  COALESCE(ABS(zv) > 1.959964, FALSE) AS sig_95
      |FROM z""".stripMargin

  /** DuckDB oracle for [[hjorth]]. */
  val hjorthOracleSql: String =
    s"""$dailyCte,
      |l AS (
      |  SELECT y,
      |    y - LAG(y) OVER (ORDER BY d) AS d1,
      |    y - 2.0 * LAG(y) OVER (ORDER BY d) +
      |      LAG(y, 2) OVER (ORDER BY d) AS d2
      |  FROM daily),
      |s AS (
      |  SELECT
      |    CAST(COUNT(y) AS DOUBLE) AS n0, SUM(y) AS s0,
      |      SUM(y * y) AS q0,
      |    CAST(COUNT(d1) AS DOUBLE) AS n1, SUM(d1) AS s1,
      |      SUM(d1 * d1) AS q1,
      |    CAST(COUNT(d2) AS DOUBLE) AS n2, SUM(d2) AS s2,
      |      SUM(d2 * d2) AS q2
      |  FROM l),
      |v AS (
      |  SELECT n0,
      |    q0 / n0 - (s0 / n0) * (s0 / n0) AS v0,
      |    q1 / n1 - (s1 / n1) * (s1 / n1) AS v1,
      |    q2 / n2 - (s2 / n2) * (s2 / n2) AS v2,
      |    s0 / n0 AS mean0
      |  FROM s),
      |m AS (
      |  SELECT n0, v0, mean0,
      |    CASE WHEN v0 > 0 THEN SQRT(v1 / v0) END AS mob,
      |    CASE WHEN v1 > 0 THEN SQRT(v2 / v1) END AS mob2
      |  FROM v)
      |SELECT CAST(n0 AS BIGINT) AS n_days,
      |  ROUND(CASE WHEN mean0 <> 0 THEN SQRT(v0) / mean0 END, 6) AS cv,
      |  ROUND(mob, 6) AS mobility,
      |  ROUND(CASE WHEN mob > 0 THEN mob2 / mob END, 6) AS complexity
      |FROM m""".stripMargin

  /** DuckDB oracle for [[permutationEntropy]]. */
  val permEntropyOracleSql: String =
    s"""$dailyCte,
      |t AS (
      |  SELECT y AS a, LEAD(y) OVER (ORDER BY d) AS b,
      |    LEAD(y, 2) OVER (ORDER BY d) AS c
      |  FROM daily),
      |p AS (
      |  SELECT (CASE WHEN b > a THEN 4 ELSE 0 END) +
      |    (CASE WHEN c > a THEN 2 ELSE 0 END) +
      |    (CASE WHEN c > b THEN 1 ELSE 0 END) AS pat,
      |    COUNT(*) AS cnt
      |  FROM t WHERE b IS NOT NULL AND c IS NOT NULL
      |  GROUP BY 1),
      |tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n FROM p),
      |h AS (
      |  SELECT ANY_VALUE(tot.n) AS n, COUNT(*) AS k,
      |    -SUM((cnt / tot.n) * LN(cnt / tot.n)) AS hh
      |  FROM p CROSS JOIN tot)
      |SELECT CAST(n AS BIGINT) AS n_triples,
      |  CAST(k AS BIGINT) AS k_patterns,
      |  ROUND(hh, 6) AS h, ROUND(hh / LN(6.0), 6) AS h_norm
      |FROM h""".stripMargin

  /** Trend and seasonal STRENGTH of daily revenue (Wang, Smith &
    * Hyndman, Data Min Knowl Disc 2006; the `feasts` diagnostic):
    * classical additive decomposition — centered MA-7 trend,
    * per-weekday mean of the detrended series as the seasonal
    * component, the rest is remainder — then
    *   F_T = max(0, 1 − Var(R)/Var(T+R))  (trend strength),
    *   F_S = max(0, 1 − Var(R)/Var(S+R))  (seasonal strength),
    * both in [0, 1]: "how much variance does removing this
    * component explain". The q304-adjacent [[graft.operators.Anomaly.seasonalDecompose]]
    * reports the component SERIES; this collapses them to the
    * two-number summary a 10,000-series triage actually scans.
    * Edge days without a full 7-day window are excluded from BOTH
    * the seasonal means and the variances (the standard trimmed
    * convention). Variances are sample variances; only O(1) ratios
    * are emitted (raw revenue² magnitudes would sit below double
    * ulp at the 6-decimal canon).
    *
    * One row `(n_used, f_trend, f_seasonal, dominant)`. Scale
    * shape: one corpus agg to the calendar table; centered window,
    * 7-row broadcast seasonal join, 1-row finishing agg. */
  def seasonalStrength(events: DataFrame): DataFrame = {
    val w7 = Window.orderBy("d").rowsBetween(-3, 3)
    val dd = daily(events)
      .withColumn("__c7", count(lit(1)).over(w7))
      .withColumn("__tr", avg("y").over(w7))
      .where(col("__c7") === 7L)
      .withColumn("__detr", col("y") - col("__tr"))
      .withColumn("__dow", dayofweek(col("d")))
    val seas = dd.groupBy("__dow").agg(avg("__detr").as("__s"))
    val j = dd.join(broadcast(seas), "__dow")
      .withColumn("__rem", col("__detr") - col("__s"))
    val vr = var_samp(col("__rem"))
    val vtr = var_samp(col("y") - col("__s"))     // trend + remainder
    val vsr = var_samp(col("__detr"))             // seasonal + remainder
    val ft = when(vtr > 0.0,
      greatest(lit(0.0), lit(1.0) - vr / vtr)).otherwise(lit(0.0))
    val fs = when(vsr > 0.0,
      greatest(lit(0.0), lit(1.0) - vr / vsr)).otherwise(lit(0.0))
    j.agg(
      count(lit(1)).cast("bigint").as("n_used"),
      round(ft, 6).as("f_trend"),
      round(fs, 6).as("f_seasonal"),
      when(fs > ft, lit("seasonal")).otherwise(lit("trend"))
        .as("dominant"))
  }

  /** DuckDB oracle for [[seasonalStrength]]. DuckDB's dayofweek is
    * Sunday = 0 (Spark: Sunday = 1) — the key is join-internal, so
    * no shift is needed. */
  val seasonalStrengthOracleSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d, SUM(value) AS y
      |  FROM events GROUP BY 1),
      |tr AS (
      |  SELECT d, y,
      |    COUNT(*) OVER w7 AS c7, AVG(y) OVER w7 AS t
      |  FROM daily
      |  WINDOW w7 AS (ORDER BY d
      |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |dt AS (
      |  SELECT d, y, t, y - t AS detr, dayofweek(d) AS dow
      |  FROM tr WHERE c7 = 7),
      |seas AS (
      |  SELECT dow, AVG(detr) AS s FROM dt GROUP BY 1),
      |j AS (
      |  SELECT dt.y, dt.detr, seas.s, dt.detr - seas.s AS rem
      |  FROM dt JOIN seas ON dt.dow = seas.dow),
      |v AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    VAR_SAMP(rem) AS vr,
      |    VAR_SAMP(y - s) AS vtr,
      |    VAR_SAMP(detr) AS vsr
      |  FROM j)
      |SELECT n AS n_used,
      |  ROUND(CASE WHEN vtr > 0.0
      |    THEN GREATEST(0.0, 1.0 - vr / vtr) ELSE 0.0 END, 6)
      |    AS f_trend,
      |  ROUND(CASE WHEN vsr > 0.0
      |    THEN GREATEST(0.0, 1.0 - vr / vsr) ELSE 0.0 END, 6)
      |    AS f_seasonal,
      |  CASE WHEN (CASE WHEN vsr > 0.0
      |      THEN GREATEST(0.0, 1.0 - vr / vsr) ELSE 0.0 END) >
      |    (CASE WHEN vtr > 0.0
      |      THEN GREATEST(0.0, 1.0 - vr / vtr) ELSE 0.0 END)
      |    THEN 'seasonal' ELSE 'trend' END AS dominant
      |FROM v""".stripMargin
}
