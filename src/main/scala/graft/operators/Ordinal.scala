package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordinal-by-ordinal association: Goodman–Kruskal γ, Somers' D and
  * Goodman–Kruskal λ over a k×m contingency table (Goodman &
  * Kruskal, JASA 1954; Somers, ASR 1962). Pearson correlation
  * assumes interval scales and χ² ignores order entirely; these are
  * the measures for "does HIGHER priority come with HIGHER spend"
  * when both sides are ordered categories — γ from concordant vs
  * discordant pairs ignoring all ties, Somers' d_yx penalizing ties
  * on the dependent side, λ as the proportional-reduction-in-error
  * of predicting Y from X (order-free, reported as the contrast).
  *
  * Scale shape: ONE corpus pass builds the k×m contingency (one
  * shuffle at category-pair cardinality, tiny); the concordance
  * sums are a self-join OF THE CONTINGENCY TABLE (k·m × k·m cells,
  * e.g. 25×25 — a deliberate broadcast nested-loop over a
  * postcard), never a pair join over rows. Pair counts are exact
  * longs (C, D ≤ n²/2 ≈ 1.1e10 at bench scale — well inside
  * int64). */
object Ordinal {

  /** One row `(n, c_pairs, d_pairs, gamma, somers_d, lambda)` for
    * ordinal levels `x` and `y` (both integer-coded, small
    * cardinality). */
  def ordinalAssociation(df: DataFrame, x: Column, y: Column)
      : DataFrame = {
    val cells = df.select(x.cast("int").as("__x"),
        y.cast("int").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
      .groupBy("__x", "__y").agg(count(lit(1)).as("__n"))
    val c2 = cells.select(col("__x").as("__x2"),
      col("__y").as("__y2"), col("__n").as("__n2"))
    // concordant / discordant pair sums over the cell grid — each
    // unordered pair counted once via the strict i'<i ordering
    val pairs = cells.join(broadcast(c2),
        col("__x2") > col("__x"), "inner")
      .agg(
        sum(when(col("__y2") > col("__y"),
          col("__n") * col("__n2")).otherwise(0L)).as("__c"),
        sum(when(col("__y2") < col("__y"),
          col("__n") * col("__n2")).otherwise(0L)).as("__d"))
    val margins = cells.agg(sum("__n").as("__nn"))
    val xm = cells.groupBy("__x").agg(sum("__n").as("__nx"))
      .agg(sum(col("__nx") * (col("__nx") - 1L) / 2L).as("__tx"))
    val ym = cells.groupBy("__y").agg(sum("__n").as("__ny"))
      .agg(sum(col("__ny") * (col("__ny") - 1L) / 2L).as("__ty"),
        max("__ny").as("__maxy"))
    // λ_Y|X: within-row modes vs the global Y mode
    val rowModes = cells.groupBy("__x").agg(max("__n").as("__mx"))
      .agg(sum("__mx").as("__summx"))
    val j = pairs
      .crossJoin(broadcast(margins))   // 1-row stat factors
      .crossJoin(broadcast(xm))
      .crossJoin(broadcast(ym))
      .crossJoin(broadcast(rowModes))
    val cD = col("__c").cast("double")
    val dD = col("__d").cast("double")
    val nD = col("__nn").cast("double")
    val totalPairs = nD * (nD - 1.0) / 2.0
    j.select(
      col("__nn").cast("bigint").as("n"),
      col("__c").cast("bigint").as("c_pairs"),
      col("__d").cast("bigint").as("d_pairs"),
      round((cD - dD) / (cD + dD), 6).as("gamma"),
      round((cD - dD) / (totalPairs - col("__tx").cast("double")), 6)
        .as("somers_d"),
      round((col("__summx") - col("__maxy")).cast("double") /
        (nD - col("__maxy").cast("double")), 6).as("lambda"))
  }

  /** The q408 registration: order priority rank (1-URGENT … 5-LOW,
    * REVERSED so level 5 = most urgent and a positive γ reads
    * "urgency travels with spend") against fixed total-price bands
    * (100k steps — fixed cutoffs, no computed quantile to diverge
    * between engines). */
  def priceUrgencyAssociation(orders: DataFrame): DataFrame =
    ordinalAssociation(orders,
      lit(6) - substring(col("o_orderpriority"), 1, 1).cast("int"),
      least(floor(col("o_totalprice") / 100000.0).cast("int"), lit(4)))

  /** DuckDB oracle for [[priceUrgencyAssociation]]. */
  val ordinalAssocOracleSql: String =
    """WITH cells AS (
      |  SELECT 6 - CAST(substr(o_orderpriority, 1, 1) AS INT) AS x,
      |    LEAST(CAST(FLOOR(o_totalprice / 100000.0) AS INT), 4) AS y,
      |    COUNT(*) AS n
      |  FROM orders GROUP BY 1, 2),
      |p AS (
      |  SELECT
      |    SUM(CASE WHEN b.y > a.y THEN a.n * b.n ELSE 0 END) AS c,
      |    SUM(CASE WHEN b.y < a.y THEN a.n * b.n ELSE 0 END) AS d
      |  FROM cells a JOIN cells b ON b.x > a.x),
      |tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS nn FROM cells),
      |tx AS (
      |  SELECT SUM(nx * (nx - 1) / 2) AS t FROM (
      |    SELECT SUM(n) AS nx FROM cells GROUP BY x)),
      |ym AS (
      |  SELECT MAX(ny) AS maxy FROM (
      |    SELECT SUM(n) AS ny FROM cells GROUP BY y)),
      |rm AS (
      |  SELECT SUM(mx) AS summx FROM (
      |    SELECT MAX(n) AS mx FROM cells GROUP BY x))
      |SELECT CAST(tot.nn AS BIGINT) AS n,
      |  CAST(p.c AS BIGINT) AS c_pairs,
      |  CAST(p.d AS BIGINT) AS d_pairs,
      |  ROUND((p.c - p.d) / CAST(p.c + p.d AS DOUBLE), 6) AS gamma,
      |  ROUND((p.c - p.d) /
      |    (tot.nn * (tot.nn - 1.0) / 2.0 - tx.t), 6) AS somers_d,
      |  ROUND((rm.summx - ym.maxy) / (tot.nn - ym.maxy), 6) AS lambda
      |FROM p, tot, tx, ym, rm""".stripMargin

  /** NOMINAL association panel: Theil's uncertainty coefficient
    * U(Y|X) = I(X;Y)/H(Y) (Theil, Statistical Decomposition Analysis
    * 1972) and Goodman–Kruskal τ(Y|X) (JASA 1954) in both
    * directions — the order-free companions to
    * [[ordinalAssociation]]: U reads "what fraction of Y's entropy
    * does X explain", τ the proportional reduction in
    * proportional-prediction error. Both are ASYMMETRIC by design
    * (U(lang|source) ≠ U(source|lang) — which way the leakage runs
    * is the point for a metadata audit).
    *
    * One grouped count to the |X|×|Y| contingency, marginal
    * reductions, scalar combine. One row `(n, u_yx, u_xy, tau_yx,
    * tau_xy)`; NULLs when the conditioned-on side is constant
    * (zero entropy / zero baseline error). */
  def nominalAssociation(df: DataFrame, x: Column, y: Column)
      : DataFrame = {
    val cells = df.select(x.as("__x"), y.as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
      .groupBy("__x", "__y").agg(count(lit(1)).as("__n"))
    val tot = cells.agg(sum("__n").as("__nn"))
    val xm = cells.groupBy("__x").agg(sum("__n").as("__nx"))
    val ym = cells.groupBy("__y").agg(sum("__n").as("__ny"))
    val nD = col("__nn").cast("double")
    // entropies from the marginals (1-row factors)
    def entropy(m: DataFrame, c: String, out: String) =
      m.crossJoin(broadcast(tot)).agg(
        (-sum((col(c).cast("double") / nD) *
          log(col(c).cast("double") / nD))).as(out))
    val hx = entropy(xm, "__nx", "__hx")
    val hy = entropy(ym, "__ny", "__hy")
    // joint terms: MI and the two tau numerators need per-cell work
    // joined with BOTH marginals (category-cardinality joins)
    val j = cells
      .join(xm, Seq("__x")).join(ym, Seq("__y"))
      .crossJoin(broadcast(tot))
    val pxy = col("__n").cast("double") / nD
    val px = col("__nx").cast("double") / nD
    val py = col("__ny").cast("double") / nD
    val s = j.agg(
      first("__nn").as("n"),
      sum(pxy * log(pxy / (px * py))).as("__mi"),
      sum(pxy * pxy / px).as("__txnum"),
      sum(pxy * pxy / py).as("__tynum"))
    val m2 = (mm: DataFrame, c: String, out: String) =>
      mm.crossJoin(broadcast(tot)).agg(
        sum((col(c).cast("double") / nD) *
          (col(c).cast("double") / nD)).as(out))
    val sx2 = m2(xm, "__nx", "__sx2")
    val sy2 = m2(ym, "__ny", "__sy2")
    val out = s.crossJoin(broadcast(hx)).crossJoin(broadcast(hy))
      .crossJoin(broadcast(sx2)).crossJoin(broadcast(sy2))
    out.select(
      col("n").cast("bigint").as("n"),
      round(when(col("__hy") > 0.0, col("__mi") / col("__hy")), 6)
        .as("u_yx"),
      round(when(col("__hx") > 0.0, col("__mi") / col("__hx")), 6)
        .as("u_xy"),
      // τ(Y|X) predicts Y from X: numerator Σ p_xy²/p_x against the
      // no-information baseline Σ p_y² (and symmetrically for τ(X|Y))
      round(when(col("__sy2") < 1.0,
        (col("__txnum") - col("__sy2")) / (lit(1.0) - col("__sy2"))),
        6).as("tau_yx"),
      round(when(col("__sx2") < 1.0,
        (col("__tynum") - col("__sx2")) / (lit(1.0) - col("__sx2"))),
        6).as("tau_xy"))
  }

  /** DuckDB oracle for the q423 registration: X = documents.source,
    * Y = documents.lang. */
  val nominalAssocOracleSql: String =
    """WITH cells AS (
      |  SELECT source AS x, lang AS y, COUNT(*) AS n
      |  FROM documents
      |  WHERE source IS NOT NULL AND lang IS NOT NULL
      |  GROUP BY 1, 2),
      |tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS nn FROM cells),
      |xm AS (SELECT x, SUM(n) AS nx FROM cells GROUP BY 1),
      |ym AS (SELECT y, SUM(n) AS ny FROM cells GROUP BY 1),
      |hx AS (SELECT -SUM((nx / nn) * LN(nx / nn)) AS h
      |  FROM xm CROSS JOIN tot),
      |hy AS (SELECT -SUM((ny / nn) * LN(ny / nn)) AS h
      |  FROM ym CROSS JOIN tot),
      |sx2 AS (SELECT SUM((nx / nn) * (nx / nn)) AS s
      |  FROM xm CROSS JOIN tot),
      |sy2 AS (SELECT SUM((ny / nn) * (ny / nn)) AS s
      |  FROM ym CROSS JOIN tot),
      |s AS (
      |  SELECT ANY_VALUE(tot.nn) AS n,
      |    SUM((c.n / tot.nn) * LN((c.n / tot.nn) /
      |      ((xm.nx / tot.nn) * (ym.ny / tot.nn)))) AS mi,
      |    SUM((c.n / tot.nn) * (c.n / tot.nn) / (xm.nx / tot.nn))
      |      AS txnum,
      |    SUM((c.n / tot.nn) * (c.n / tot.nn) / (ym.ny / tot.nn))
      |      AS tynum
      |  FROM cells c
      |  JOIN xm ON c.x = xm.x JOIN ym ON c.y = ym.y
      |  CROSS JOIN tot)
      |SELECT CAST(n AS BIGINT) AS n,
      |  ROUND(CASE WHEN hy.h > 0 THEN mi / hy.h END, 6) AS u_yx,
      |  ROUND(CASE WHEN hx.h > 0 THEN mi / hx.h END, 6) AS u_xy,
      |  ROUND(CASE WHEN sy2.s < 1.0
      |    THEN (txnum - sy2.s) / (1.0 - sy2.s) END, 6) AS tau_yx,
      |  ROUND(CASE WHEN sx2.s < 1.0
      |    THEN (tynum - sx2.s) / (1.0 - sx2.s) END, 6) AS tau_xy
      |FROM s, hx, hy, sx2, sy2""".stripMargin

  /** Jonckheere–Terpstra test for an ORDERED alternative in order
    * value across the five priority classes (Jonckheere, Biometrika
    * 1954; Terpstra 1952): where Kruskal–Wallis asks "do the groups
    * differ at all", J–T asks "do values MONOTONICALLY shift with
    * priority" — J = Σ_{i<j} U_ij over the ordered group pairs
    * (priority strings sort naturally: `1-URGENT` < … < `5-LOW`),
    * each U_ij the Mann–Whitney count with ties at ½. Under H₀,
    * μ = (N² − Σnᵢ²)/4 and σ² = [N²(2N+3) − Σnᵢ²(2nᵢ+3)]/72 (tie
    * correction omitted: prices are near-continuous, and both
    * engines share the identical formula either way); z two-sided.
    *
    * All pair arithmetic is EXACT: U_ij comes from the integer
    * doubled midrank 2·rank + tiecount − 1 (so no float midrank
    * sums whose accumulation order could move the 6th decimal), and
    * every intermediate stays below 2⁵³.
    *
    * One row `(n, k_groups, j_stat, mu, sigma, z, sig_95)`.
    * Scale shape: each order row fans out to its k−1 = 4 group
    * pairs, then ONE window job partitioned by pair — k(k−1)/2
    * partition-local sorts of O(n) rows each (the q249 Mann–Whitney
    * cost shape, ×4 rows). At 1000× the per-pair sort is the
    * bottleneck; range-bucketed pre-partitioning of the value column
    * is the scale path, same as any global-rank statistic here. */
  def jonckheereTerpstra(orders: DataFrame): DataFrame = {
    val pri = orders.select(col("o_orderpriority").as("__o")).distinct()
    val ex = orders
      .select(col("o_orderpriority").as("__p"),
        col("o_totalprice").as("__v"))
      .join(broadcast(pri), col("__p") =!= col("__o"))
      .select(
        least(col("__p"), col("__o")).as("__pa"),
        greatest(col("__p"), col("__o")).as("__pb"),
        (col("__p") === greatest(col("__p"), col("__o"))).as("__hi"),
        col("__v"))
    val wPair = Window.partitionBy("__pa", "__pb").orderBy("__v")
    val wTie = Window.partitionBy("__pa", "__pb", "__v")
    val mid2 = rank().over(wPair).cast("bigint") * 2L +
      count(lit(1)).over(wTie) - 1L
    val perPair = ex
      .withColumn("__m2", mid2)
      .groupBy("__pa", "__pb")
      .agg(
        sum(when(col("__hi"), col("__m2"))).as("__s2"),
        sum(when(col("__hi"), 1L).otherwise(0L)).as("__nhi"))
      // U2 = 2·U: still integer-exact
      .select((col("__s2") - col("__nhi") * (col("__nhi") + 1L))
        .as("__u2"))
    val jStat = perPair.agg(
      (sum("__u2").cast("double") / 2.0).as("__j"))
    val sizes = orders.groupBy("o_orderpriority")
      .agg(count(lit(1)).cast("double").as("__ni"))
    val f = sizes.agg(
      sum("__ni").as("__n"), count(lit(1)).as("__k"),
      sum(col("__ni") * col("__ni")).as("__sn2"),
      sum(col("__ni") * col("__ni") *
        (col("__ni") * 2.0 + 3.0)).as("__sn23"))
    val nD = col("__n")
    val mu = (nD * nD - col("__sn2")) / 4.0
    val vr = (nD * nD * (nD * 2.0 + 3.0) - col("__sn23")) / 72.0
    val z = when(vr > 0.0, (col("__j") - mu) / sqrt(vr))
    jStat.crossJoin(broadcast(f))   // two 1-row stat factors
      .select(
        nD.cast("bigint").as("n"),
        col("__k").cast("bigint").as("k_groups"),
        round(col("__j"), 6).as("j_stat"),
        round(mu, 6).as("mu"),
        round(sqrt(vr), 6).as("sigma"),
        round(z, 6).as("z"),
        coalesce(abs(z) > 1.959964, lit(false)).as("sig_95"))
  }

  /** DuckDB oracle for [[jonckheereTerpstra]]. */
  val jonckheereOracleSql: String =
    """WITH pri AS (
      |  SELECT DISTINCT o_orderpriority AS o FROM orders),
      |ex AS (
      |  SELECT LEAST(t.o_orderpriority, pri.o) AS pa,
      |    GREATEST(t.o_orderpriority, pri.o) AS pb,
      |    t.o_orderpriority =
      |      GREATEST(t.o_orderpriority, pri.o) AS hi,
      |    t.o_totalprice AS v
      |  FROM orders t JOIN pri ON pri.o <> t.o_orderpriority),
      |mid AS (
      |  SELECT pa, pb, hi,
      |    RANK() OVER (PARTITION BY pa, pb ORDER BY v) * 2 +
      |      COUNT(*) OVER (PARTITION BY pa, pb, v) - 1 AS m2
      |  FROM ex),
      |u AS (
      |  SELECT pa, pb,
      |    SUM(CASE WHEN hi THEN m2 END) -
      |      SUM(CASE WHEN hi THEN 1 ELSE 0 END) *
      |      (SUM(CASE WHEN hi THEN 1 ELSE 0 END) + 1) AS u2
      |  FROM mid GROUP BY 1, 2),
      |j AS (SELECT CAST(SUM(u2) AS DOUBLE) / 2.0 AS jstat FROM u),
      |g AS (
      |  SELECT o_orderpriority, CAST(COUNT(*) AS DOUBLE) AS ni
      |  FROM orders GROUP BY 1),
      |f AS (
      |  SELECT SUM(ni) AS n, CAST(COUNT(*) AS BIGINT) AS k,
      |    SUM(ni * ni) AS sn2,
      |    SUM(ni * ni * (ni * 2.0 + 3.0)) AS sn23
      |  FROM g)
      |SELECT CAST(n AS BIGINT) AS n, k AS k_groups,
      |  ROUND(jstat, 6) AS j_stat,
      |  ROUND((n * n - sn2) / 4.0, 6) AS mu,
      |  ROUND(SQRT((n * n * (n * 2.0 + 3.0) - sn23) / 72.0), 6)
      |    AS sigma,
      |  ROUND(CASE WHEN (n * n * (n * 2.0 + 3.0) - sn23) / 72.0 > 0.0
      |    THEN (jstat - (n * n - sn2) / 4.0) /
      |      SQRT((n * n * (n * 2.0 + 3.0) - sn23) / 72.0) END, 6)
      |    AS z,
      |  COALESCE(ABS(CASE WHEN
      |      (n * n * (n * 2.0 + 3.0) - sn23) / 72.0 > 0.0
      |    THEN (jstat - (n * n - sn2) / 4.0) /
      |      SQRT((n * n * (n * 2.0 + 3.0) - sn23) / 72.0) END)
      |    > 1.959964, FALSE) AS sig_95
      |FROM j CROSS JOIN f""".stripMargin
}
