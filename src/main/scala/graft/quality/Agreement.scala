package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inter-labeler agreement — Cohen's κ (Cohen 1960) between two binary
  * labelers over the same rows: raw percent agreement is inflated by
  * chance whenever the base rates are skewed, and κ is the standard
  * chance-corrected audit a curation team runs before trusting a
  * quality label (heuristic vs heuristic here, heuristic vs model or
  * annotator vs annotator in production — the labelers are plugged in
  * as Columns, so any boolean signal fits).
  *
  * Scale shape: ONE full-scan aggregate with conditional sums — the
  * confusion matrix, marginals and κ all come out of a single
  * map-side-combined pass; the output is one row regardless of corpus
  * size. */
object Agreement {

  /** κ report `(n, n11, n10, n01, n00, po, pe, kappa)` for two boolean
    * labeler columns. Rows where either labeler is NULL are excluded
    * (both engines count only co-labeled rows). The degenerate pe = 1
    * case (both labelers constant and equal) is pinned to κ = 1 when
    * they agree everywhere, else 0 — mirrored in the oracle. */
  def cohenKappa(df: DataFrame, labelerA: Column,
      labelerB: Column): DataFrame = {
    val a = labelerA.cast("boolean")
    val b = labelerB.cast("boolean")
    def cell(pa: Column, pb: Column) =
      sum(when(pa && pb, 1L).otherwise(0L))
    val base = df
      .where(a.isNotNull && b.isNotNull)
      .agg(
        count(lit(1)).as("n"),
        cell(a, b).as("n11"),
        cell(a, !b).as("n10"),
        cell(!a, b).as("n01"),
        cell(!a, !b).as("n00"))
    val nd = col("n").cast("double")
    val po = (col("n11") + col("n00")) / nd
    val pe = ((col("n11") + col("n10")) / nd) *
      ((col("n11") + col("n01")) / nd) +
      ((col("n01") + col("n00")) / nd) *
      ((col("n10") + col("n00")) / nd)
    base.select(
      col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
      round(po, 6).as("po"),
      round(pe, 6).as("pe"),
      round(when(pe === 1.0, when(po === 1.0, 1.0).otherwise(0.0))
        .otherwise((po - pe) / (lit(1.0) - pe)), 6).as("kappa"))
  }

  /** DuckDB oracle for the registered documents fixture: labeler A =
    * length heuristic (n_chars ≥ `charsMin`), labeler B = token-count
    * heuristic (whitespace tokens ≥ `tokensMin`). */
  def kappaOracleSql(charsMin: Long, tokensMin: Long): String =
    s"""WITH l AS (
       |  SELECT n_chars >= $charsMin AS a,
       |    len(list_filter(str_split_regex(trim(text), '\\s+'),
       |      t -> t <> '')) >= $tokensMin AS b
       |  FROM documents),
       |m AS (
       |  SELECT COUNT(*) AS n,
       |    SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS n11,
       |    SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS n10,
       |    SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS n01,
       |    SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS n00
       |  FROM l WHERE a IS NOT NULL AND b IS NOT NULL)
       |SELECT CAST(n AS BIGINT) AS n,
       |  CAST(n11 AS BIGINT) AS n11, CAST(n10 AS BIGINT) AS n10,
       |  CAST(n01 AS BIGINT) AS n01, CAST(n00 AS BIGINT) AS n00,
       |  ROUND((n11 + n00) / CAST(n AS DOUBLE), 6) AS po,
       |  ROUND(((n11 + n10) / CAST(n AS DOUBLE)) *
       |      ((n11 + n01) / CAST(n AS DOUBLE)) +
       |    ((n01 + n00) / CAST(n AS DOUBLE)) *
       |      ((n10 + n00) / CAST(n AS DOUBLE)), 6) AS pe,
       |  ROUND(CASE WHEN ((n11 + n10) / CAST(n AS DOUBLE)) *
       |      ((n11 + n01) / CAST(n AS DOUBLE)) +
       |    ((n01 + n00) / CAST(n AS DOUBLE)) *
       |      ((n10 + n00) / CAST(n AS DOUBLE)) = 1.0
       |    THEN CASE WHEN (n11 + n00) = n THEN 1.0 ELSE 0.0 END
       |    ELSE ((n11 + n00) / CAST(n AS DOUBLE) -
       |      (((n11 + n10) / CAST(n AS DOUBLE)) *
       |        ((n11 + n01) / CAST(n AS DOUBLE)) +
       |      ((n01 + n00) / CAST(n AS DOUBLE)) *
       |        ((n10 + n00) / CAST(n AS DOUBLE)))) /
       |      (1.0 - (((n11 + n10) / CAST(n AS DOUBLE)) *
       |        ((n11 + n01) / CAST(n AS DOUBLE)) +
       |      ((n01 + n00) / CAST(n AS DOUBLE)) *
       |        ((n10 + n00) / CAST(n AS DOUBLE)))) END, 6) AS kappa
       |FROM m""".stripMargin

  /** Bland–Altman agreement between two CONTINUOUS raters (Bland &
    * Altman, Lancet 1986) — the companion to [[cohenKappa]]'s binary
    * case: correlation flatters two scores that move together while
    * disagreeing by a constant offset; what a swap decision needs is
    * the difference's bias and its 95% limits of agreement
    * (mean ± 1.96·σ). One row: `(n, mean_diff, sd_diff, loa_low,
    * loa_high, pct_outside)`, with pct_outside the observed share
    * beyond the limits (≈5% under normality — a fat-tailed excess
    * means the limits understate the risk).
    *
    * Scale shape: one moment pass, one broadcast-limits recount. */
  def blandAltman(df: DataFrame, raterA: Column,
      raterB: Column): DataFrame = {
    val d = df.select((raterA.cast("double") - raterB.cast("double"))
      .as("diff")).where(col("diff").isNotNull)
    val m = d.agg(count(lit(1)).as("n"), avg("diff").as("__mu"),
      stddev_pop(col("diff")).as("__sd"))
    d.crossJoin(broadcast(m))   // 1-row stat factor
      .agg(
        first("n").as("n"),
        round(first("__mu"), 6).as("mean_diff"),
        round(first("__sd"), 6).as("sd_diff"),
        round(first("__mu") - first("__sd") * 1.96, 6).as("loa_low"),
        round(first("__mu") + first("__sd") * 1.96, 6).as("loa_high"),
        round(avg(when(
          abs(col("diff") - col("__mu")) > col("__sd") * 1.96, 1.0)
          .otherwise(0.0)), 6).as("pct_outside"))
  }

  /** DuckDB oracle for [[blandAltman]]: `diffQuery` is any SQL
    * producing a `diff` column computed the same way as the engine's
    * A−B. */
  def blandAltmanOracleSql(diffQuery: String): String =
    s"""WITH d AS ($diffQuery),
       |d2 AS (SELECT diff FROM d WHERE diff IS NOT NULL),
       |m AS (
       |  SELECT COUNT(*) AS n, AVG(diff) AS mu,
       |    STDDEV_POP(diff) AS sd
       |  FROM d2)
       |SELECT ANY_VALUE(m.n) AS n,
       |  ROUND(ANY_VALUE(m.mu), 6) AS mean_diff,
       |  ROUND(ANY_VALUE(m.sd), 6) AS sd_diff,
       |  ROUND(ANY_VALUE(m.mu) - 1.96 * ANY_VALUE(m.sd), 6) AS loa_low,
       |  ROUND(ANY_VALUE(m.mu) + 1.96 * ANY_VALUE(m.sd), 6) AS loa_high,
       |  ROUND(AVG(CASE WHEN ABS(diff - m.mu) > 1.96 * m.sd
       |    THEN 1.0 ELSE 0.0 END), 6) AS pct_outside
       |FROM d2 CROSS JOIN m""".stripMargin


  /** Quadratic-weighted Cohen's κ for ORDINAL labels (Cohen, Psych.
    * Bull. 1968) — [[cohenKappa]] treats "off by one bucket" and
    * "off by the whole scale" as the same disagreement, which is
    * wrong for any ordered rating (quality tiers, length buckets,
    * star ratings); weighted κ charges disagreement v_ij =
    * ((i−j)/(k−1))², the standard quadratic scheme, making it
    * interpretable as an ICC analog. κ_w = 1 − Σv·o / Σv·e over the
    * observed and chance (outer-product marginal) cell tables.
    *
    * One grouped count to the k×k cell table, marginal joins at k
    * rows, scalar reduction. One row `(n, k, d_obs, d_exp,
    * kappa_w)`; NULL κ when chance disagreement is 0 (both raters
    * constant). */
  def weightedKappa(df: DataFrame, raterA: Column,
      raterB: Column): DataFrame = {
    val pairs = df.select(raterA.cast("long").as("i"),
        raterB.cast("long").as("j"))
      .where(col("i").isNotNull && col("j").isNotNull)
    val cells = pairs.groupBy("i", "j").agg(count(lit(1)).as("o"))
    val ra = pairs.groupBy("i").agg(count(lit(1)).as("ri"))
    val rb = pairs.groupBy("j").agg(count(lit(1)).as("cj"))
    val tot = pairs.agg(count(lit(1)).as("__n"),
      (greatest(max("i"), max("j")) - least(min("i"), min("j")))
        .cast("double").as("__span"))
    // the complete k×k chance grid (missing observed cells are 0)
    val grid = ra.crossJoin(rb).crossJoin(broadcast(tot))
      .join(cells, Seq("i", "j"), "left_outer")
      .na.fill(0L, Seq("o"))
    val nD = col("__n").cast("double")
    val v = when(col("__span") > 0.0,
      pow((col("i") - col("j")).cast("double") / col("__span"), 2))
      .otherwise(lit(0.0))
    val s = grid.agg(
      first("__n").as("n"),
      countDistinct(col("i")).as("k"),
      sum(v * col("o").cast("double") / nD).as("__do"),
      sum(v * (col("ri").cast("double") / nD) *
        (col("cj").cast("double") / nD)).as("__de"))
    s.select(
      col("n"), col("k").cast("bigint").as("k"),
      round(col("__do"), 6).as("d_obs"),
      round(col("__de"), 6).as("d_exp"),
      round(when(col("__de") > 0.0,
        lit(1.0) - col("__do") / col("__de")), 6).as("kappa_w"))
  }

  /** DuckDB oracle for the registered ordinal fixture: rater A =
    * n_chars tertile buckets (220/380), rater B = token-count
    * tertiles (40/70). */
  val weightedKappaOracleSql: String =
    """WITH p AS (
      |  SELECT
      |    CASE WHEN n_chars < 220 THEN 0
      |      WHEN n_chars < 380 THEN 1 ELSE 2 END AS i,
      |    CASE WHEN len(list_filter(str_split_regex(trim(text),
      |        '\s+'), x -> x <> '')) < 40 THEN 0
      |      WHEN len(list_filter(str_split_regex(trim(text),
      |        '\s+'), x -> x <> '')) < 70 THEN 1 ELSE 2 END AS j
      |  FROM documents),
      |cells AS (SELECT i, j, COUNT(*) AS o FROM p GROUP BY 1, 2),
      |ra AS (SELECT i, COUNT(*) AS ri FROM p GROUP BY 1),
      |rb AS (SELECT j, COUNT(*) AS cj FROM p GROUP BY 1),
      |tot AS (
      |  SELECT COUNT(*) AS n,
      |    CAST(GREATEST(MAX(i), MAX(j)) -
      |      LEAST(MIN(i), MIN(j)) AS DOUBLE) AS span
      |  FROM p),
      |grid AS (
      |  SELECT ra.i, rb.j, ra.ri, rb.cj, tot.n, tot.span,
      |    COALESCE(cells.o, 0) AS o
      |  FROM ra CROSS JOIN rb CROSS JOIN tot
      |  LEFT JOIN cells ON cells.i = ra.i AND cells.j = rb.j),
      |s AS (
      |  SELECT ANY_VALUE(n) AS n, COUNT(DISTINCT i) AS k,
      |    SUM((CASE WHEN span > 0
      |        THEN POW((i - j) / span, 2) ELSE 0.0 END) *
      |      CAST(o AS DOUBLE) / n) AS dobs,
      |    SUM((CASE WHEN span > 0
      |        THEN POW((i - j) / span, 2) ELSE 0.0 END) *
      |      (CAST(ri AS DOUBLE) / n) * (CAST(cj AS DOUBLE) / n))
      |      AS dexp
      |  FROM grid)
      |SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
      |  ROUND(dobs, 6) AS d_obs,
      |  ROUND(dexp, 6) AS d_exp,
      |  ROUND(CASE WHEN dexp > 0 THEN 1.0 - dobs / dexp END, 6)
      |    AS kappa_w
      |FROM s""".stripMargin

  /** Fleiss' κ (Fleiss, Psych. Bull. 1971): chance-corrected
    * agreement for m RATERS per item — the multi-rater member of the
    * kappa family ([[cohenKappa]] reads exactly two raters,
    * [[weightedKappa]] two ordinal ones). Items with a different
    * rating count are dropped (the fixed-m design Fleiss assumes).
    * P_i = (Σ_j n_ij² − m)/(m(m−1)) per item, P̄ vs the chance rate
    * P̄_e = Σ_j p_j², κ = (P̄ − P̄_e)/(1 − P̄_e).
    *
    * Scale shape: one grouped count to the (item, category) table,
    * two grouped reductions — never an item×item or rater×rater
    * pair. One row `(n_items, m_raters, k_cats, p_bar, p_exp,
    * kappa)`; NULL κ when P̄_e = 1 (all raters constant). */
  def fleissKappa(df: DataFrame, item: Column, category: Column,
      m: Int): DataFrame = {
    require(m >= 2, s"need >= 2 raters per item, got $m")
    val mD = m.toDouble
    val cell = df.select(item.as("__i"), category.as("__c"))
      .where(col("__i").isNotNull && col("__c").isNotNull)
      .groupBy("__i", "__c").agg(count(lit(1)).as("__nij"))
    // keep only complete items (exactly m ratings)
    val full = cell.groupBy("__i")
      .agg(sum("__nij").as("__mi"),
        sum(col("__nij") * col("__nij")).as("__sq"))
      .where(col("__mi") === m.toLong)
    val items = full.agg(
      count(lit(1)).as("__n"),
      avg((col("__sq").cast("double") - mD) / (mD * (mD - 1.0)))
        .as("__pbar"))
    val cats = cell.join(full.select("__i"), Seq("__i"))
      .groupBy("__c").agg(sum("__nij").as("__cj"))
      .crossJoin(broadcast(items))   // 1-row stat factor
      .agg(
        first("__n").as("n_items"),
        count(lit(1)).as("k_cats"),
        first("__pbar").as("__pb"),
        sum(pow(col("__cj").cast("double") /
          (col("__n").cast("double") * mD), 2)).as("__pe"))
    cats.select(
      col("n_items").cast("bigint").as("n_items"),
      lit(m.toLong).as("m_raters"),
      col("k_cats").cast("bigint").as("k_cats"),
      round(col("__pb"), 6).as("p_bar"),
      round(col("__pe"), 6).as("p_exp"),
      round(when(col("__pe") < 1.0,
        (col("__pb") - col("__pe")) / (lit(1.0) - col("__pe"))), 6)
        .as("kappa"))
  }

  /** The q410 registration: items = users, ratings = the event
    * types of each user's FIRST 5 events (by ts, event_id — a
    * deterministic, oracle-replayable rater panel); users with
    * fewer than 5 events drop. "Do a user's first five actions
    * agree on what kind of user this is?" */
  def firstEventsFleiss(events: DataFrame, m: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"),
      col("event_id"))
    val first5 = events
      .where(col("ts").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= m)
    fleissKappa(first5, col("user_id"), col("event_type"), m)
  }

  /** DuckDB oracle for [[firstEventsFleiss]] on events. */
  val fleissOracleSql: String =
    """WITH r AS (
      |  SELECT user_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS rn
      |  FROM events WHERE ts IS NOT NULL),
      |cell AS (
      |  SELECT user_id, event_type, COUNT(*) AS nij
      |  FROM r
      |  WHERE rn <= 5 AND user_id IS NOT NULL
      |    AND event_type IS NOT NULL
      |  GROUP BY 1, 2),
      |full_items AS (
      |  SELECT user_id, SUM(nij) AS mi, SUM(nij * nij) AS sq
      |  FROM cell GROUP BY 1 HAVING SUM(nij) = 5),
      |it AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |    AVG((sq - 5.0) / 20.0) AS pbar
      |  FROM full_items),
      |catsum AS (
      |  SELECT c.event_type, SUM(c.nij) AS cj
      |  FROM cell c JOIN full_items f ON c.user_id = f.user_id
      |  GROUP BY 1),
      |cats AS (
      |  SELECT COUNT(*) AS k,
      |    SUM(POW(cj / (it.n * 5.0), 2)) AS pe
      |  FROM catsum CROSS JOIN it)
      |SELECT CAST(it.n AS BIGINT) AS n_items,
      |  CAST(5 AS BIGINT) AS m_raters,
      |  CAST(cats.k AS BIGINT) AS k_cats,
      |  ROUND(it.pbar, 6) AS p_bar, ROUND(cats.pe, 6) AS p_exp,
      |  ROUND(CASE WHEN cats.pe < 1.0
      |    THEN (it.pbar - cats.pe) / (1.0 - cats.pe) END, 6) AS kappa
      |FROM cats CROSS JOIN it""".stripMargin

  /** Krippendorff's α, nominal metric (Krippendorff, Content
    * Analysis, ch. 12): chance-corrected agreement that — unlike
    * [[fleissKappa]]'s fixed-m design — accepts a VARIABLE number of
    * raters per item; items with a single rating are excluded (they
    * carry no pairable information), everything else contributes.
    *
    * Computed in the coincidence-matrix closed form without
    * materializing the matrix: with n_uc the count of category c in
    * item u and m_u = Σ_c n_uc,
    *   Σ_c o_cc = Σ_u (Σ_c n_uc² − m_u)/(m_u − 1)   (pairable agreement)
    *   n_c      = Σ_u n_uc,  n = Σ_c n_c
    *   D_o = 1 − (Σ_c o_cc)/n
    *   D_e = 1 − Σ_c n_c(n_c − 1)/(n(n − 1))
    *   α   = 1 − D_o/D_e          (NULL when D_e = 0: one category)
    *
    * Scale shape (identical to Fleiss): one grouped count to the
    * (item, category) table, an item-level reduction, a category-
    * level reduction over included items, 1-row stat factor. One row
    * `(n_items, n_ratings, k_cats, d_obs, d_exp, alpha)`. */
  def krippendorffAlpha(df: DataFrame, item: Column,
      category: Column): DataFrame = {
    val cell = df.select(item.as("__i"), category.as("__c"))
      .where(col("__i").isNotNull && col("__c").isNotNull)
      .groupBy("__i", "__c").agg(count(lit(1)).as("__nij"))
    // pairable items: at least two ratings (m need NOT be constant)
    val full = cell.groupBy("__i")
      .agg(sum("__nij").as("__mu"),
        sum(col("__nij") * col("__nij")).as("__sq"))
      .where(col("__mu") >= 2L)
    val items = full.agg(
      count(lit(1)).as("__nitems"),
      sum("__mu").as("__n"),
      sum((col("__sq") - col("__mu")).cast("double") /
        (col("__mu").cast("double") - 1.0)).as("__agree"))
    val cats = cell.join(full.select("__i"), Seq("__i"))
      .groupBy("__c").agg(sum("__nij").as("__cj"))
      .crossJoin(broadcast(items))   // 1-row stat factor
      .agg(
        first("__nitems").as("n_items"),
        first("__n").as("__nr"),
        count(lit(1)).as("k_cats"),
        first("__agree").as("__ag"),
        sum(col("__cj").cast("double") *
          (col("__cj").cast("double") - 1.0)).as("__pairs"))
    val nD = col("__nr").cast("double")
    val dObs = lit(1.0) - col("__ag") / nD
    val dExp = lit(1.0) - col("__pairs") / (nD * (nD - 1.0))
    cats.select(
      col("n_items").cast("bigint").as("n_items"),
      col("__nr").cast("bigint").as("n_ratings"),
      col("k_cats").cast("bigint").as("k_cats"),
      round(dObs, 6).as("d_obs"),
      round(dExp, 6).as("d_exp"),
      round(when(dExp > 0.0, lit(1.0) - dObs / dExp), 6)
        .as("alpha"))
  }

  /** The q428 registration: the q410 first-5-events panel WITHOUT
    * the complete-item filter — users contribute their first ≤ 5
    * event types however many they have (α handles the variable
    * panel; single-event users drop as unpairable). */
  def firstEventsKrippendorff(events: DataFrame,
      m: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"),
      col("event_id"))
    val firstM = events
      .where(col("ts").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= m)
    krippendorffAlpha(firstM, col("user_id"), col("event_type"))
  }

  /** DuckDB oracle for [[firstEventsKrippendorff]] on events. */
  val krippendorffOracleSql: String =
    """WITH r AS (
      |  SELECT user_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS rn
      |  FROM events WHERE ts IS NOT NULL),
      |cell AS (
      |  SELECT user_id, event_type, COUNT(*) AS nij
      |  FROM r
      |  WHERE rn <= 5 AND user_id IS NOT NULL
      |    AND event_type IS NOT NULL
      |  GROUP BY 1, 2),
      |full_items AS (
      |  SELECT user_id, SUM(nij) AS mi, SUM(nij * nij) AS sq
      |  FROM cell GROUP BY 1 HAVING SUM(nij) >= 2),
      |it AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_items,
      |    CAST(SUM(mi) AS DOUBLE) AS n,
      |    SUM((sq - mi) / (mi - 1.0)) AS agree
      |  FROM full_items),
      |catsum AS (
      |  SELECT c.event_type, CAST(SUM(c.nij) AS DOUBLE) AS cj
      |  FROM cell c JOIN full_items f ON c.user_id = f.user_id
      |  GROUP BY 1),
      |cats AS (
      |  SELECT COUNT(*) AS k, SUM(cj * (cj - 1.0)) AS pairs
      |  FROM catsum),
      |fin AS (
      |  SELECT it.n_items, it.n, cats.k,
      |    1.0 - it.agree / it.n AS dobs,
      |    1.0 - cats.pairs / (it.n * (it.n - 1.0)) AS dexp
      |  FROM cats CROSS JOIN it)
      |SELECT CAST(n_items AS BIGINT) AS n_items,
      |  CAST(n AS BIGINT) AS n_ratings,
      |  CAST(k AS BIGINT) AS k_cats,
      |  ROUND(dobs, 6) AS d_obs,
      |  ROUND(dexp, 6) AS d_exp,
      |  ROUND(CASE WHEN dexp > 0 THEN 1.0 - dobs / dexp END, 6)
      |    AS alpha
      |FROM fin""".stripMargin
}
