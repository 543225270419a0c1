package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Theil-T inequality decomposition (Theil, "Economics and
  * Information Theory", 1967) — the inequality index the corpus tier
  * was missing next to Gini ([[graft.operators.Concentration]]):
  * unlike Gini, Theil T decomposes EXACTLY into between-group +
  * within-group terms, so "document length inequality" splits into
  * "sources differ in mean length" vs "lengths vary inside each
  * source" — the number that says whether a mixture rebalance or a
  * per-source length filter is the right lever.
  *
  * T = (1/N)·Σᵢ (xᵢ/μ)·ln(xᵢ/μ)
  *   = Σ_g s_g·T_g + Σ_g s_g·ln(μ_g/μ),  s_g = (n_g·μ_g)/(N·μ)
  *
  * Scale shape: one grouped aggregate to group cardinality (n, Σx,
  * Σ x·ln x per group — ln x is map-side, so the within term needs no
  * second pass), a 1-row broadcast total factor, scalar arithmetic.
  */
object Inequality {

  /** Per-group decomposition rows plus the exact identity columns:
    * `(group, n, mean_x, share, t_within_g, between_term)` ordered by
    * group, with corpus-level `t_total, t_between, t_within`
    * repeated per row (1-row broadcast factor — the stat-table
    * convention). Rows with x ≤ 0 are excluded (Theil needs positive
    * support); group T_g = (1/(n_g·μ_g))·Σ x·ln(x/μ_g) =
    * Σ(x·ln x)/(n_g·μ_g) − ln μ_g. */
  def theilDecomposition(df: DataFrame, group: Column,
      metric: Column): DataFrame = {
    val gv = df.select(group.as("g"), metric.cast("double").as("x"))
      .where(col("g").isNotNull && col("x") > 0.0)
    val perG = gv.groupBy("g").agg(
      count(lit(1)).cast("double").as("n_g"),
      sum("x").as("sx_g"),
      sum(col("x") * log(col("x"))).as("sxlx_g"))
    val tot = perG.agg(sum("n_g").as("n"), sum("sx_g").as("sx"),
      sum("sxlx_g").as("sxlx"))
      .select(col("n"), (col("sx") / col("n")).as("mu"), col("sxlx"),
        col("sx"))
    val rows = perG.crossJoin(broadcast(tot))   // 1-row stat factor
      .withColumn("mu_g", col("sx_g") / col("n_g"))
      .withColumn("share", col("sx_g") / col("sx"))
      .withColumn("t_g",
        col("sxlx_g") / col("sx_g") - log(col("mu_g")))
      .withColumn("bt", col("share") * log(col("mu_g") / col("mu")))
    val agg = rows.agg(
      sum(col("share") * col("t_g")).as("tw"),
      sum(col("bt")).as("tb"))
      .select(col("tw"), col("tb"), (col("tw") + col("tb")).as("tt"))
    rows.crossJoin(broadcast(agg))   // 1-row stat factor
      .select(col("g").as("group"),
        col("n_g").cast("bigint").as("n"),
        round(col("mu_g"), 6).as("mean_x"),
        round(col("share"), 6).as("share"),
        round(col("t_g"), 6).as("t_within_g"),
        round(col("bt"), 6).as("between_term"),
        round(col("tt"), 6).as("t_total"),
        round(col("tb"), 6).as("t_between"),
        round(col("tw"), 6).as("t_within"))
      .orderBy("group")
  }

  /** DuckDB oracle for the q323 registration (documents: group =
    * source, metric = n_chars). */
  val theilOracleSql: String =
    """WITH gv AS (
      |  SELECT source AS g, CAST(n_chars AS DOUBLE) AS x
      |  FROM documents WHERE source IS NOT NULL AND n_chars > 0),
      |per_g AS (
      |  SELECT g, CAST(COUNT(*) AS DOUBLE) AS n_g, SUM(x) AS sx_g,
      |    SUM(x * LN(x)) AS sxlx_g
      |  FROM gv GROUP BY 1),
      |tot AS (
      |  SELECT SUM(n_g) AS n, SUM(sx_g) AS sx,
      |    SUM(sx_g) / SUM(n_g) AS mu
      |  FROM per_g),
      |rows_ AS (
      |  SELECT g, n_g, sx_g / n_g AS mu_g, sx_g / tot.sx AS share,
      |    sxlx_g / sx_g - LN(sx_g / n_g) AS t_g,
      |    (sx_g / tot.sx) * LN((sx_g / n_g) / tot.mu) AS bt
      |  FROM per_g CROSS JOIN tot),
      |agg AS (
      |  SELECT SUM(share * t_g) AS tw, SUM(bt) AS tb,
      |    SUM(share * t_g) + SUM(bt) AS tt
      |  FROM rows_)
      |SELECT g AS "group", CAST(n_g AS BIGINT) AS n,
      |  ROUND(mu_g, 6) AS mean_x, ROUND(share, 6) AS share,
      |  ROUND(t_g, 6) AS t_within_g, ROUND(bt, 6) AS between_term,
      |  ROUND(agg.tt, 6) AS t_total, ROUND(agg.tb, 6) AS t_between,
      |  ROUND(agg.tw, 6) AS t_within
      |FROM rows_ CROSS JOIN agg
      |ORDER BY g""".stripMargin

  /** Atkinson inequality index at the three canonical aversion
    * levels ε ∈ {0.5, 1, 2} (Atkinson, J. Econ. Theory 1970) — the
    * WELFARE-weighted complement to Gini/Theil: A_ε is "the share of
    * total metric society would give up to equalize", and ε dials
    * which end of the distribution drives it (ε→0 top-sensitive,
    * ε large bottom-sensitive). A_ε = 1 − M_{1−ε}/μ with M the
    * (1−ε)-power mean — so ε=0.5 uses the square-root mean, ε=1 the
    * geometric mean, ε=2 the harmonic mean, ALL single-pass
    * map-side-combinable aggregates: one corpus scan, one row
    * `(n, mean_x, a_half, a_one, a_two)`. Rows with x ≤ 0 are
    * excluded (the index needs positive support, like Theil). */
  def atkinson(df: DataFrame, metric: Column): DataFrame = {
    val x = df.select(metric.cast("double").as("x"))
      .where(col("x") > 0.0)
    val s = x.agg(
      count(lit(1)).as("n"),
      avg("x").as("mu"),
      avg(sqrt(col("x"))).as("m_half"),
      avg(log(col("x"))).as("m_log"),
      avg(lit(1.0) / col("x")).as("m_inv"))
    s.select(
      col("n").cast("bigint").as("n"),
      round(col("mu"), 6).as("mean_x"),
      round(lit(1.0) - col("m_half") * col("m_half") / col("mu"), 6)
        .as("a_half"),
      round(lit(1.0) - exp(col("m_log")) / col("mu"), 6).as("a_one"),
      round(lit(1.0) - (lit(1.0) / col("m_inv")) / col("mu"), 6)
        .as("a_two"))
  }

  /** DuckDB oracle for [[atkinson]] over per-customer total spend. */
  val atkinsonOracleSql: String =
    """WITH per AS (
      |  SELECT o_custkey, SUM(o_totalprice) AS x
      |  FROM orders GROUP BY 1),
      |v AS (SELECT CAST(x AS DOUBLE) AS x FROM per WHERE x > 0.0),
      |s AS (
      |  SELECT COUNT(*) AS n, AVG(x) AS mu,
      |    AVG(SQRT(x)) AS m_half, AVG(LN(x)) AS m_log,
      |    AVG(1.0 / x) AS m_inv
      |  FROM v)
      |SELECT CAST(n AS BIGINT) AS n,
      |  ROUND(mu, 6) AS mean_x,
      |  ROUND(1.0 - m_half * m_half / mu, 6) AS a_half,
      |  ROUND(1.0 - EXP(m_log) / mu, 6) AS a_one,
      |  ROUND(1.0 - (1.0 / m_inv) / mu, 6) AS a_two
      |FROM s""".stripMargin
}
