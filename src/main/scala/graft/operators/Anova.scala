package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-dimension one-way ANOVA over a labeled embedding column — the
  * class-separability audit: before training on (or stratifying by) a
  * label, measure how much of each embedding dimension's variance the
  * label actually explains. F = MSB/MSW (Fisher 1925) ranks
  * dimensions; η² = SSB/SST is the effect size ("this dimension is 0.3
  * label, 0.7 noise"). Near-zero F across all dimensions means the
  * label is not linearly visible in this space — fix the embedding
  * before tuning the classifier ([[graft.operators.QualityModel]]'s
  * upstream sanity check).
  *
  * Scale shape: one explode to (label, dim, x) with map-side partial
  * aggregation into |labels|·d groups, then a dim-keyed reduction of
  * that class-cardinality table. No windows, no joins against the
  * corpus, driver sees nothing. */
object Anova {

  /** `(dim, n, k, f_stat, eta_sq)` per embedding dimension (1-based),
    * ordered by dim. Degenerate dimensions (zero within-class
    * variance) pin F to NULL rather than ∞ — mirrored in the
    * oracle. */
  def classSeparation(emb: DataFrame, vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val perClass = emb
      .select(col(labelCol).as("__g"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .withColumn("x", col("x").cast("double"))
      .groupBy("__g", "dim")
      .agg(count(lit(1)).as("n_g"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"))
    // per-dim reduction over the class-cardinality table:
    // SST = Σx² − N·μ², SSW = Σ_g (Σx²_g − n_g·μ_g²), SSB = SST − SSW
    perClass
      .groupBy("dim")
      .agg(
        sum("n_g").as("n"),
        count(lit(1)).as("k"),
        sum("sxx").as("__sxx"),
        sum("sx").as("__sx"),
        sum(col("sxx") - col("sx") * col("sx") / col("n_g")).as("__ssw"))
      .withColumn("__sst",
        col("__sxx") - col("__sx") * col("__sx") / col("n"))
      .withColumn("__ssb", col("__sst") - col("__ssw"))
      .select(
        (col("dim") + 1).cast("bigint").as("dim"),
        col("n").cast("bigint").as("n"),
        col("k").cast("bigint").as("k"),
        round(when(col("__ssw") > 0.0,
          (col("__ssb") / (col("k") - 1)) /
            (col("__ssw") / (col("n") - col("k"))))
          .otherwise(lit(null).cast("double")), 6).as("f_stat"),
        round(when(col("__sst") > 0.0, col("__ssb") / col("__sst"))
          .otherwise(lit(null).cast("double")), 6).as("eta_sq"))
      .orderBy("dim")
  }

  /** DuckDB oracle for [[classSeparation]] on the embeddings table. */
  val classSeparationOracleSql: String =
    """WITH e AS (
      |  SELECT label AS g, generate_subscripts(embedding, 1) AS dim,
      |    CAST(UNNEST(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |pc AS (
      |  SELECT g, dim, COUNT(*) AS n_g, SUM(x) AS sx,
      |    SUM(x * x) AS sxx
      |  FROM e GROUP BY 1, 2),
      |agg AS (
      |  SELECT dim, SUM(n_g) AS n, COUNT(*) AS k,
      |    SUM(sxx) AS sxx, SUM(sx) AS sx,
      |    SUM(sxx - sx * sx / n_g) AS ssw
      |  FROM pc GROUP BY 1)
      |SELECT CAST(dim AS BIGINT) AS dim, CAST(n AS BIGINT) AS n,
      |  CAST(k AS BIGINT) AS k,
      |  ROUND(CASE WHEN ssw > 0 THEN
      |    ((sxx - sx * sx / n - ssw) / (k - 1)) / (ssw / (n - k))
      |    ELSE NULL END, 6) AS f_stat,
      |  ROUND(CASE WHEN (sxx - sx * sx / n) > 0 THEN
      |    (sxx - sx * sx / n - ssw) / (sxx - sx * sx / n)
      |    ELSE NULL END, 6) AS eta_sq
      |FROM agg ORDER BY dim""".stripMargin

  /** Classic one-way ANOVA on a SCALAR metric (Fisher 1925) — the
    * k-group generalization of the two-sample t that completes the
    * k-sample test shelf: Kruskal–Wallis (q290) compares rank sums,
    * Mood's median (q366) compares above-median counts, this compares
    * MEANS under equal-variance normality, with the two standard
    * effect sizes (η² biased-up, ω² the unbiased companion —
    * Hays 1963). Significance is judged against the large-within-df
    * limit ((k−1)·F → χ²(k−1)), the same closed-form χ² table/WH
    * approximation every χ² test in this engine shares — exact-F
    * tables need an incomplete-beta the oracle can't replay, and at
    * n−k in the thousands the two are indistinguishable.
    *
    * One row `(n, k, df_between, df_within, f_stat, eta_sq, omega_sq,
    * sig_95)`. Scale shape: one grouped moment agg (map-side
    * partials) to k rows, then a k-row reduction — the corpus is
    * touched once, nothing reaches the driver. */
  def onewayF(df: DataFrame, group: Column, metric: Column): DataFrame = {
    val gv = df.select(group.as("g"), metric.cast("double").as("x"))
      .where(col("g").isNotNull && col("x").isNotNull)
    val perG = gv.groupBy("g").agg(
      count(lit(1)).as("n_g"),
      sum("x").as("sx_g"),
      sum(col("x") * col("x")).as("sxx_g"))
    val s = perG.agg(
      sum("n_g").as("n"), count(lit(1)).as("k"),
      sum("sx_g").as("sx"), sum("sxx_g").as("sxx"),
      sum(col("sx_g") * col("sx_g") / col("n_g")).as("sgg"))
    val ssb = col("sgg") - col("sx") * col("sx") / col("n")
    val ssw = col("sxx") - col("sgg")
    val sst = col("sxx") - col("sx") * col("sx") / col("n")
    val dfb = (col("k") - 1).cast("double")
    val dfw = (col("n") - col("k")).cast("double")
    val msw = ssw / dfw
    val f = when(col("k") >= 2 && col("n") > col("k") && ssw > 0.0,
      (ssb / dfb) / msw)
    s.select(
      col("n").cast("bigint").as("n"),
      col("k").cast("bigint").as("k"),
      (col("k") - 1).cast("bigint").as("df_between"),
      (col("n") - col("k")).cast("bigint").as("df_within"),
      round(f, 6).as("f_stat"),
      round(when(sst > 0.0, ssb / sst), 6).as("eta_sq"),
      round(when(sst > 0.0 && ssw > 0.0,
        (ssb - dfb * msw) / (sst + msw)), 6).as("omega_sq"),
      // degenerate designs read as "not significant", not NULL —
      // the house convention (pageTrend, kendallW, bartelsRank)
      coalesce(f * dfb > Homogeneity.chi2Crit95(col("k") - 1),
        lit(false)).as("sig_95"))
  }

  /** One-way random-effects intraclass correlation ICC(1) (Fisher
    * 1925 §39; Shrout & Fleiss, Psych. Bull. 1979 case 1) — the
    * CLUSTERING dial [[onewayF]]'s hypothesis test doesn't give:
    * what share of the metric's variance lives BETWEEN groups rather
    * than within them. ICC ≈ 0 means group identity is irrelevant
    * (rows are exchangeable — simple random sampling is fine);
    * ICC ≫ 0 means rows cluster, and any per-row standard error that
    * ignores the grouping (experiment units, shard sampling,
    * bootstrap resampling) is understated by the design effect
    * 1 + (n̄−1)·ICC. Unbalanced groups use the standard
    * n₀ = (N − Σn_g²/N)/(k−1) average group size.
    *
    * Same single grouped-moment pass as [[onewayF]] plus the Σn_g²
    * term. One row `(n, k, n0, f_ratio, icc)` — the mean squares are
    * reported as their RATIO MSB/MSW rather than raw values: the raw
    * mean squares scale with the metric² (~10¹⁰ here), where the
    * 6-decimal canonical grid sits below one double ulp and the
    * bit-exact hash cannot be honored; the ratio and ICC are O(1).
    * NULL family when the design degenerates (k < 2, n ≤ k, or zero
    * within variance). */
  def icc1(df: DataFrame, group: Column, metric: Column): DataFrame = {
    val gv = df.select(group.as("g"), metric.cast("double").as("x"))
      .where(col("g").isNotNull && col("x").isNotNull)
    val perG = gv.groupBy("g").agg(
      count(lit(1)).as("n_g"),
      sum("x").as("sx_g"),
      sum(col("x") * col("x")).as("sxx_g"))
    val s = perG.agg(
      sum("n_g").as("n"), count(lit(1)).as("k"),
      sum("sx_g").as("sx"), sum("sxx_g").as("sxx"),
      sum(col("sx_g") * col("sx_g") / col("n_g")).as("sgg"),
      sum(col("n_g") * col("n_g")).as("sn2"))
    val nD = col("n").cast("double")
    val kD = col("k").cast("double")
    val ssb = col("sgg") - col("sx") * col("sx") / nD
    val ssw = col("sxx") - col("sgg")
    val n0 = (nD - col("sn2").cast("double") / nD) / (kD - 1.0)
    val msb = ssb / (kD - 1.0)
    val msw = ssw / (nD - kD)
    val ok = col("k") >= 2 && col("n") > col("k") && ssw > 0.0
    val icc = (msb - msw) / (msb + (n0 - 1.0) * msw)
    s.select(
      col("n").cast("bigint").as("n"),
      col("k").cast("bigint").as("k"),
      round(when(ok, n0), 6).as("n0"),
      round(when(ok, msb / msw), 6).as("f_ratio"),
      round(when(ok, icc), 6).as("icc"))
  }

  /** DuckDB oracle for [[icc1]] on orders
    * (group = o_custkey, metric = o_totalprice). */
  val iccOracleSql: String =
    """WITH gv AS (
      |  SELECT o_custkey AS g, CAST(o_totalprice AS DOUBLE) AS x
      |  FROM orders
      |  WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL),
      |per_g AS (
      |  SELECT g, COUNT(*) AS n_g, SUM(x) AS sx_g,
      |    SUM(x * x) AS sxx_g
      |  FROM gv GROUP BY 1),
      |s AS (
      |  SELECT SUM(n_g) AS n, COUNT(*) AS k,
      |    SUM(sx_g) AS sx, SUM(sxx_g) AS sxx,
      |    SUM(sx_g * sx_g / n_g) AS sgg,
      |    SUM(n_g * n_g) AS sn2
      |  FROM per_g),
      |f AS (
      |  SELECT n, k,
      |    sgg - sx * sx / n AS ssb,
      |    sxx - sgg AS ssw,
      |    (CAST(n AS DOUBLE) - CAST(sn2 AS DOUBLE) / n) /
      |      (CAST(k AS DOUBLE) - 1.0) AS n0,
      |    k >= 2 AND n > k AND (sxx - sgg) > 0.0 AS ok
      |  FROM s),
      |g AS (
      |  SELECT n, k, n0, ok,
      |    ssb / (CAST(k AS DOUBLE) - 1.0) AS msb,
      |    ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) AS msw
      |  FROM f)
      |SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
      |  ROUND(CASE WHEN ok THEN n0 END, 6) AS n0,
      |  ROUND(CASE WHEN ok THEN msb / msw END, 6) AS f_ratio,
      |  ROUND(CASE WHEN ok THEN (msb - msw) /
      |    (msb + (n0 - 1.0) * msw) END, 6) AS icc
      |FROM g""".stripMargin

  /** DuckDB oracle for [[onewayF]] on orders
    * (group = o_orderpriority, metric = o_totalprice). */
  val onewayOracleSql: String =
    """WITH gv AS (
      |  SELECT o_orderpriority AS g,
      |    CAST(o_totalprice AS DOUBLE) AS x
      |  FROM orders
      |  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL),
      |per_g AS (
      |  SELECT g, COUNT(*) AS n_g, SUM(x) AS sx_g,
      |    SUM(x * x) AS sxx_g
      |  FROM gv GROUP BY 1),
      |s AS (
      |  SELECT SUM(n_g) AS n, COUNT(*) AS k,
      |    SUM(sx_g) AS sx, SUM(sxx_g) AS sxx,
      |    SUM(sx_g * sx_g / n_g) AS sgg
      |  FROM per_g),
      |f AS (
      |  SELECT n, k,
      |    sgg - sx * sx / n AS ssb,
      |    sxx - sgg AS ssw,
      |    sxx - sx * sx / n AS sst,
      |    CAST(k - 1 AS DOUBLE) AS dfb,
      |    CAST(n - k AS DOUBLE) AS dfw
      |  FROM s),
      |g AS (
      |  SELECT *, ssw / dfw AS msw,
      |    CASE WHEN k >= 2 AND n > k AND ssw > 0.0
      |      THEN (ssb / dfb) / (ssw / dfw) END AS fs
      |  FROM f)
      |SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
      |  CAST(k - 1 AS BIGINT) AS df_between,
      |  CAST(n - k AS BIGINT) AS df_within,
      |  ROUND(fs, 6) AS f_stat,
      |  ROUND(CASE WHEN sst > 0.0 THEN ssb / sst END, 6) AS eta_sq,
      |  ROUND(CASE WHEN sst > 0.0 AND ssw > 0.0
      |    THEN (ssb - dfb * msw) / (sst + msw) END, 6) AS omega_sq,
      |  COALESCE(fs * dfb > (CASE CAST(k - 1 AS INT)
      |    WHEN 1 THEN 3.841459 WHEN 2 THEN 5.991465
      |    WHEN 3 THEN 7.814728 WHEN 4 THEN 9.487729
      |    WHEN 5 THEN 11.070498 WHEN 6 THEN 12.591587
      |    WHEN 7 THEN 14.067140 WHEN 8 THEN 15.507313
      |    WHEN 9 THEN 16.918978 WHEN 10 THEN 18.307038
      |    ELSE (k - 1) * POW(1.0 - 2.0 / (9.0 * (k - 1)) +
      |      1.6448536269514722 * SQRT(2.0 / (9.0 * (k - 1))), 3)
      |    END), FALSE) AS sig_95
      |FROM g""".stripMargin
}
