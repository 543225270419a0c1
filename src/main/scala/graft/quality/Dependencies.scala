package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Functional-dependency discovery over a profiled column list — the
  * data-profiling pass that finds which columns DETERMINE which others
  * (A → B holds iff no A value maps to two B values), the
  * Metanome/HyFD family of profiling (Papenbrock et al., VLDB 2015)
  * reduced to its cardinality form: A → B ⇔ |distinct(A)| =
  * |distinct(A, B)|. Feeds the same consumers as
  * [[SuggestExpectations]]: discovered FDs become uniqueness/
  * consistency expectations, join-key candidates, and normalization
  * hints ("o_orderkey determines everything" = it's the key).
  *
  * Scale shape (exact path): one DISTINCT branch per profiled column
  * set, all p + p·(p−1) branches unioned into a single job — each
  * branch is a 2-column pruned scan whose shuffle carries only the
  * set's distinct values (map-side partial dedup), so total shuffle
  * volume is Σ|distinct(set)|, bounded by the data's actual
  * cardinalities. The tempting alternative — ONE agg with every
  * countDistinct — plans through Catalyst's EXPAND, multiplying the
  * corpus ×(p + p²) before the shuffle: measured 14× at a 10× scale
  * step (r13 heavy probe) from exactly that spill, which is why this
  * is branch-per-set. At 100 TB swap `approx = true` for one
  * HLL-sketch pass (`approx_count_distinct`, 2% default error, no
  * EXPAND) and treat near-equality as "holds" — the standard
  * profiling trade. Output is p·(p−1) rows whatever the corpus size.
  */
object Dependencies {

  /** Pairwise FD report `(lhs, rhs, n_lhs, n_pairs, violations,
    * holds)` over `cols`, ordered (lhs, rhs). `violations` counts the
    * extra (lhs, rhs) combinations beyond one-per-lhs-value — 0 means
    * the dependency holds exactly. */
  def fdReport(df: DataFrame, cols: Seq[String],
      approx: Boolean = false): DataFrame = {
    require(cols.size >= 2, "need at least two columns to profile")
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = for {
      a <- cols; b <- cols if a != b
    } yield (a, b)
    // distinct-count column sets: singles + unordered pairs (the
    // (a,b) and (b,a) FDs share one pair count)
    val sets: Seq[(String, Seq[String])] =
      cols.map(c => s"__d_$c" -> Seq(c)) ++
        (for { a <- cols; b <- cols if a < b }
          yield s"__d_${a}__$b" -> Seq(a, b))
    val counts: Map[String, Long] =
      if (approx) {
        // HLL sketches aggregate in one pass without EXPAND — the
        // 100 TB path
        def cd(c: Seq[String]) = approx_count_distinct(
          if (c.size == 1) col(c.head) else struct(c.map(col): _*))
        val aggs = sets.map { case (n, c) => cd(c).as(n) }
        val one = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        sets.map { case (n, _) => n -> one.getAs[Long](n) }.toMap
      } else {
        // exact path: one DISTINCT branch per set, one union job.
        // Pair branches keep null-field combinations (DuckDB's
        // COUNT(DISTINCT (a,b)) row semantics); single-column
        // branches skip nulls, like COUNT(DISTINCT a) in both
        // engines.
        val branches = sets.map { case (n, c) =>
          val base =
            if (c.size == 1) df.select(col(c.head)).where(col(c.head).isNotNull)
            else df.select(c.map(col): _*)
          base.distinct()
            .agg(count(lit(1)).as("__n"))
            .select(lit(n).as("__k"), col("__n"))
        }
        branches.reduce(_ unionByName _).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
      }

    def pairKey(a: String, b: String) =
      if (a < b) s"__d_${a}__$b" else s"__d_${b}__$a"
    val rows = pairs.map { case (a, b) =>
      val nl = counts(s"__d_$a")
      val np = counts(pairKey(a, b))
      (a, b, nl, np, np - nl, np == nl)
    }
    rows.toDF("lhs", "rhs", "n_lhs", "n_pairs", "violations", "holds")
      .orderBy("lhs", "rhs")
  }

  /** Mutual information between two categorical columns — the
    * STATISTICAL complement to [[fdReport]]'s deterministic
    * dependencies: FD answers "does A fix B exactly", MI answers "how
    * many bits of B does knowing A buy" (Cover & Thomas ch. 2), which
    * is the feature-audit question a curation team asks of metadata
    * columns ("does `source` leak `lang`? does event type encode the
    * weekday?"). MI = Σ p(x,y)·log₂(p(x,y)/(p(x)p(y))).
    *
    * Dataflow: ONE grouped count to the joint (a, b) cell table;
    * marginals and the grand total are plain uniquely-named aggregates
    * over that cell table JOINED back as broadcast stat factors —
    * never stacked unbounded windows with different partition specs
    * over one frame, which silently corrupts on Spark 4.1 (every
    * window returns the grand total; the same failure
    * [[graft.operators.Drift.ksBySliceFdr]] was rewritten around).
    * All factors are category-cardinality, never a corpus rescan.
    * Output is one row per observed cell with its signed contribution,
    * plus the total in every row. */
  def mutualInformation(df: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val joint = df
      .where(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("n"))
    val aTot = joint.groupBy("a").agg(sum("n").as("__na"))
    val bTot = joint.groupBy("b").agg(sum("n").as("__nb"))
    val grand = joint.agg(sum("n").as("__nt"))
    val tot = col("__nt").cast("double")
    val pxy = col("n") / tot
    val px = col("__na").cast("double") / tot
    val py = col("__nb").cast("double") / tot
    val contrib = pxy * log2(pxy / (px * py))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))   // the ONLY unbounded window on this frame
    joint
      .join(broadcast(aTot), "a")
      .join(broadcast(bTot), "b")
      .crossJoin(broadcast(grand))   // 1-row stat factor
      .withColumn("p_joint", round(pxy, 6))
      .withColumn("p_a", round(px, 6))
      .withColumn("p_b", round(py, 6))
      .withColumn("mi_term_bits", round(contrib, 6))
      .withColumn("mi_bits", round(sum(contrib).over(wAll), 6))
      .select("a", "b", "n", "p_joint", "p_a", "p_b",
        "mi_term_bits", "mi_bits")
      .orderBy("a", "b")
  }

  /** DuckDB oracle for [[mutualInformation]] with expressions for the
    * two columns (e.g. a date part). */
  def miOracleSql(table: String, aExpr: String, bExpr: String): String =
    s"""WITH joint AS (
       |  SELECT $aExpr AS a, $bExpr AS b, COUNT(*) AS n
       |  FROM $table
       |  WHERE $aExpr IS NOT NULL AND $bExpr IS NOT NULL
       |  GROUP BY 1, 2),
       |p AS (
       |  SELECT a, b, n,
       |    CAST(n AS DOUBLE) / SUM(n) OVER () AS pxy,
       |    CAST(SUM(n) OVER (PARTITION BY a) AS DOUBLE)
       |      / SUM(n) OVER () AS px,
       |    CAST(SUM(n) OVER (PARTITION BY b) AS DOUBLE)
       |      / SUM(n) OVER () AS py
       |  FROM joint)
       |SELECT a, b, CAST(n AS BIGINT) AS n,
       |  ROUND(pxy, 6) AS p_joint,
       |  ROUND(px, 6) AS p_a,
       |  ROUND(py, 6) AS p_b,
       |  ROUND(pxy * log2(pxy / (px * py)), 6) AS mi_term_bits,
       |  ROUND(SUM(pxy * log2(pxy / (px * py))) OVER (), 6) AS mi_bits
       |FROM p ORDER BY a, b""".stripMargin

  /** Categorical association strength in one row — the effect-size
    * companions to the q216 MI table and q200's chi² DRIFT test:
    * Pearson's chi² on the a×b contingency table, Cramér's V =
    * √(χ²/(N·(min(R,C)−1))) (the [0,1] normalization that makes
    * association comparable across tables), and Theil's uncertainty
    * coefficient U(a|b) = I(a;b)/H(a) — the ASYMMETRIC "how much of a
    * does knowing b explain", which V (symmetric) cannot answer.
    *
    * Scale shape: the q216 joined-stat-tables recipe (never stacked
    * unbounded windows — the Spark 4.1 corruption trap): one joint
    * agg at |a|×|b| cells, marginals joined back, scalar folds. */
  def association(df: DataFrame, aCol: org.apache.spark.sql.Column,
      bCol: org.apache.spark.sql.Column): DataFrame = {
    val joint = df
      .where(aCol.isNotNull && bCol.isNotNull)
      .groupBy(aCol.as("a"), bCol.as("b"))
      .agg(count(lit(1)).as("n"))
    val aTot = joint.groupBy("a").agg(sum("n").as("__na"))
    val bTot = joint.groupBy("b").agg(sum("n").as("__nb"))
    val grand = joint.agg(sum("n").as("__nt"),
      countDistinct(col("a")).as("__r"),
      countDistinct(col("b")).as("__c"))
    // chi² needs the FULL R×C grid — an empty cell still contributes
    // (0−e)²/e (a diagonal-only table is χ²-maximal BECAUSE of its
    // empty off-diagonal cells); |a|×|b|-bounded deliberate cross
    val cells = aTot.crossJoin(broadcast(bTot))
      .join(joint, Seq("a", "b"), "left_outer")
      .withColumn("__n0", coalesce(col("n"), lit(0L)))
      .crossJoin(broadcast(grand))   // 1-row stat factor
    val tot = col("__nt").cast("double")
    val exp = col("__na").cast("double") * col("__nb") / tot
    val pxy = col("__n0") / tot
    val px = col("__na").cast("double") / tot
    val py = col("__nb").cast("double") / tot
    // MI terms only over OBSERVED cells (0·log 0 = 0 by convention)
    val folded = cells.groupBy(col("__nt"), col("__r"), col("__c"))
      .agg(
        sum((col("__n0") - exp) * (col("__n0") - exp) / exp)
          .as("__chi2"),
        sum(when(col("__n0") > 0L, pxy * log2(pxy / (px * py)))
          .otherwise(0.0)).as("__mi"))
    val ha = cells.select(col("a"), col("__na"), col("__nt")).distinct()
      .select((-(col("__na").cast("double") / col("__nt")) *
        log2(col("__na").cast("double") / col("__nt"))).as("__h"))
      .agg(sum("__h").as("__ha"))
    folded.crossJoin(broadcast(ha))   // 1-row stat factor
      .select(
        col("__nt").cast("long").as("n"),
        col("__r").as("levels_a"), col("__c").as("levels_b"),
        round(col("__chi2"), 6).as("chi2"),
        round(sqrt(col("__chi2") / (col("__nt") *
          (least(col("__r"), col("__c")) - 1))), 6).as("cramers_v"),
        round(when(col("__ha") > 0.0, col("__mi") / col("__ha")), 6)
          .as("theil_u"))
  }

  /** DuckDB oracle for [[association]] with column expressions. */
  def associationOracleSql(table: String, aExpr: String,
      bExpr: String): String =
    s"""WITH joint AS (
       |  SELECT $aExpr AS a, $bExpr AS b, COUNT(*) AS n
       |  FROM $table
       |  WHERE $aExpr IS NOT NULL AND $bExpr IS NOT NULL
       |  GROUP BY 1, 2),
       |at AS (SELECT a, SUM(n) AS na FROM joint GROUP BY 1),
       |bt AS (SELECT b, SUM(n) AS nb FROM joint GROUP BY 1),
       |g AS (
       |  SELECT SUM(n) AS nt, COUNT(DISTINCT a) AS r,
       |    COUNT(DISTINCT b) AS c
       |  FROM joint),
       |cells AS (
       |  SELECT COALESCE(joint.n, 0) AS n, at.na, bt.nb, g.nt, g.r, g.c
       |  FROM at CROSS JOIN bt
       |  LEFT JOIN joint ON joint.a = at.a AND joint.b = bt.b
       |  CROSS JOIN g),
       |f AS (
       |  SELECT MAX(nt) AS nt, MAX(r) AS r, MAX(c) AS c,
       |    SUM((n - CAST(na AS DOUBLE) * nb / nt) *
       |        (n - CAST(na AS DOUBLE) * nb / nt)
       |      / (CAST(na AS DOUBLE) * nb / nt)) AS chi2,
       |    SUM(CASE WHEN n > 0 THEN n / CAST(nt AS DOUBLE) * log2(
       |      (n / CAST(nt AS DOUBLE)) /
       |      ((na / CAST(nt AS DOUBLE)) * (nb / CAST(nt AS DOUBLE))))
       |      ELSE 0.0 END) AS mi
       |  FROM cells),
       |ha AS (
       |  SELECT SUM(-(na / CAST(g.nt AS DOUBLE)) *
       |    log2(na / CAST(g.nt AS DOUBLE))) AS ha
       |  FROM at CROSS JOIN g)
       |SELECT CAST(f.nt AS BIGINT) AS n,
       |  CAST(f.r AS BIGINT) AS levels_a,
       |  CAST(f.c AS BIGINT) AS levels_b,
       |  ROUND(f.chi2, 6) AS chi2,
       |  ROUND(sqrt(f.chi2 / (f.nt * (LEAST(f.r, f.c) - 1))), 6)
       |    AS cramers_v,
       |  ROUND(CASE WHEN ha.ha > 0 THEN f.mi / ha.ha END, 6)
       |    AS theil_u
       |FROM f CROSS JOIN ha""".stripMargin

  /** DuckDB oracle for [[fdReport]] (exact mode) on a named table. */
  def fdOracleSql(table: String, cols: Seq[String]): String = {
    val selects = (for {
      a <- cols; b <- cols if a != b
    } yield
      s"""SELECT '$a' AS lhs, '$b' AS rhs,
         |  CAST(COUNT(DISTINCT $a) AS BIGINT) AS n_lhs,
         |  CAST(COUNT(DISTINCT ($a, $b)) AS BIGINT) AS n_pairs,
         |  CAST(COUNT(DISTINCT ($a, $b)) - COUNT(DISTINCT $a) AS BIGINT)
         |    AS violations,
         |  COUNT(DISTINCT ($a, $b)) = COUNT(DISTINCT $a) AS holds
         |FROM $table""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""SELECT * FROM (
       |$selects
       |) ORDER BY lhs, rhs""".stripMargin
  }

  /** Per-cell standardized and adjusted residuals of the contingency
    * grid (Haberman, Biometrics 1973) — the drill-down behind
    * [[association]]'s single χ²: WHICH (a, b) cells drive the
    * dependence, and in which direction. The adjusted residual
    * (n−e)/√(e(1−pₐ)(1−p_b)) is asymptotically N(0,1), so |z| > 2
    * reads directly as "this cell is over/under-represented".
    * Includes empty grid cells (they under-represent too — the χ²
    * convention of [[association]]).
    *
    * Scale shape: one grouped count to the joint table, two marginal
    * aggs, the |a|×|b|-bounded grid cross, scalar arithmetic. */
  def chi2Residuals(df: DataFrame, aCol: org.apache.spark.sql.Column,
      bCol: org.apache.spark.sql.Column): DataFrame = {
    val joint = df
      .where(aCol.isNotNull && bCol.isNotNull)
      .groupBy(aCol.as("a"), bCol.as("b"))
      .agg(count(lit(1)).as("n"))
    val aTot = joint.groupBy("a").agg(sum("n").as("__na"))
    val bTot = joint.groupBy("b").agg(sum("n").as("__nb"))
    val grand = joint.agg(sum("n").as("__nt"))
    val cells = aTot.crossJoin(broadcast(bTot))
      .join(joint, Seq("a", "b"), "left_outer")
      .withColumn("__n0", coalesce(col("n"), lit(0L)))
      .crossJoin(broadcast(grand))   // 1-row stat factor
    val tot = col("__nt").cast("double")
    val e = col("__na").cast("double") * col("__nb") / tot
    val adjDen = sqrt(e * (lit(1.0) - col("__na") / tot) *
      (lit(1.0) - col("__nb") / tot))
    cells.select(col("a"), col("b"), col("__n0").as("n"),
        round(e, 6).as("expected"),
        round((col("__n0") - e) / sqrt(e), 6).as("std_residual"),
        round(when(adjDen > 0.0, (col("__n0") - e) / adjDen), 6)
          .as("adj_residual"))
      .orderBy("a", "b")
  }

  /** DuckDB oracle for [[chi2Residuals]]. */
  def chi2ResidualsOracleSql(table: String, aExpr: String,
      bExpr: String): String =
    s"""WITH joint AS (
       |  SELECT $aExpr AS a, $bExpr AS b, COUNT(*) AS n
       |  FROM $table
       |  WHERE $aExpr IS NOT NULL AND $bExpr IS NOT NULL
       |  GROUP BY 1, 2),
       |at AS (SELECT a, SUM(n) AS na FROM joint GROUP BY 1),
       |bt AS (SELECT b, SUM(n) AS nb FROM joint GROUP BY 1),
       |g AS (SELECT SUM(n) AS nt FROM joint),
       |cells AS (
       |  SELECT at.a, bt.b, at.na, bt.nb,
       |    COALESCE(joint.n, 0) AS n0, g.nt
       |  FROM at CROSS JOIN bt
       |  LEFT JOIN joint ON joint.a = at.a AND joint.b = bt.b
       |  CROSS JOIN g),
       |e AS (
       |  SELECT a, b, n0,
       |    CAST(na AS DOUBLE) * nb / nt AS e,
       |    CAST(na AS DOUBLE) / nt AS pa,
       |    CAST(nb AS DOUBLE) / nt AS pb
       |  FROM cells)
       |SELECT a, b, CAST(n0 AS BIGINT) AS n,
       |  ROUND(e, 6) AS expected,
       |  ROUND((n0 - e) / sqrt(e), 6) AS std_residual,
       |  ROUND(CASE WHEN sqrt(e * (1 - pa) * (1 - pb)) > 0
       |    THEN (n0 - e) / sqrt(e * (1 - pa) * (1 - pb)) END, 6)
       |    AS adj_residual
       |FROM e ORDER BY a, b""".stripMargin

  /** Approximate-FD violation rate — the g3 error measure (Kivinen &
    * Mannila, TCS 1995; the metric HyFD-family profilers report for
    * "almost holds"): g3(A→B) = the minimum fraction of rows that
    * must be removed for A→B to hold exactly = (n − Σₐ maxᵦ c(a,b))/n.
    * [[fdReport]] says WHETHER a dependency holds; g3 says how CLOSE
    * a violated one is — the difference between "drop the rule" and
    * "quarantine 0.2% of rows and keep it".
    *
    * NULLs group as ordinary values in both engines (GROUP BY
    * semantics), so the rate is defined over ALL rows.
    *
    * Scale shape per pair: one grouped count at |A×B| cell
    * cardinality, one per-A max reduction, one scalar row — the
    * corpus is scanned once per pair, never joined. `pairs` is the
    * caller's shortlist (the q211 near-FDs), not all p². */
  def g3Report(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one (det, dep) pair")
    pairs.map { case (a, b) =>
      val cells = df.groupBy(col(a).as("__a"), col(b).as("__b"))
        .agg(count(lit(1)).as("__c"))
      val perA = cells.groupBy("__a").agg(max("__c").as("__m"),
        sum("__c").as("__n"))
      perA.agg(sum("__n").as("n"), sum("__m").as("__keep"))
        .select(lit(a).as("det_col"), lit(b).as("dep_col"),
          col("n"), (col("n") - col("__keep")).as("violations"),
          round((col("n") - col("__keep")).cast("double") / col("n"), 6)
            .as("g3_rate"),
          (col("n") === col("__keep")).as("holds_exactly"))
    }.reduce(_.unionByName(_)).orderBy("det_col", "dep_col")
  }

  /** DuckDB oracle for [[g3Report]]. */
  def g3OracleSql(table: String, pairs: Seq[(String, String)]): String = {
    val selects = pairs.map { case (a, b) =>
      s"""SELECT '$a' AS det_col, '$b' AS dep_col,
         |  CAST(SUM(n) AS BIGINT) AS n,
         |  CAST(SUM(n) - SUM(m) AS BIGINT) AS violations,
         |  ROUND(CAST(SUM(n) - SUM(m) AS DOUBLE) / SUM(n), 6)
         |    AS g3_rate,
         |  SUM(n) = SUM(m) AS holds_exactly
         |FROM (
         |  SELECT av, MAX(c) AS m, SUM(c) AS n FROM (
         |    SELECT $a AS av, COUNT(*) AS c FROM $table
         |    GROUP BY $a, $b) t
         |  GROUP BY av) s""".stripMargin }
      .mkString("\nUNION ALL\n")
    s"""SELECT * FROM (
       |$selects
       |) ORDER BY det_col, dep_col""".stripMargin
  }

  /** Cramér's V association strength for a categorical pair — the
    * EFFECT SIZE the [[chi2Residuals]] significance readout lacks
    * (Cramér 1946 §21.9), with the Bergsma (J. Korean Stat. Soc.
    * 2013) bias correction that keeps small-table V from reading
    * spurious association: φ² = χ²/n; φ²₊ = max(0, φ² −
    * (r−1)(c−1)/(n−1)); Ṽ = √(φ²₊ / min(r₊−1, c₊−1)) with r₊ = r −
    * (r−1)²/(n−1). One row `(n, r, c, chi2, cramers_v,
    * v_corrected)`.
    *
    * Scale shape: the [[chi2Residuals]] dataflow collapsed to one
    * scalar — a grouped count at cell cardinality, margin
    * reductions, a broadcast-assembled r×c frame, one row out. */
  def cramersV(df: DataFrame, aCol: org.apache.spark.sql.Column,
      bCol: org.apache.spark.sql.Column): DataFrame = {
    val joint = df
      .where(aCol.isNotNull && bCol.isNotNull)
      .groupBy(aCol.as("a"), bCol.as("b"))
      .agg(count(lit(1)).as("n"))
    val aTot = joint.groupBy("a").agg(sum("n").as("__na"))
    val bTot = joint.groupBy("b").agg(sum("n").as("__nb"))
    val grand = joint.agg(sum("n").as("__nt"),
      countDistinct("a").as("__r"), countDistinct("b").as("__c"))
    val cells = aTot.crossJoin(broadcast(bTot))
      .join(joint, Seq("a", "b"), "left_outer")
      .withColumn("__n0", coalesce(col("n"), lit(0L)))
      .crossJoin(broadcast(grand))
    val tot = col("__nt").cast("double")
    val e = col("__na").cast("double") * col("__nb") / tot
    val s = cells
      .agg(first("__nt").as("__nt"), first("__r").as("__r"),
        first("__c").as("__c"),
        sum(pow(col("__n0") - e, 2) / e).as("__chi2"))
    val n = col("__nt").cast("double")
    val r = col("__r").cast("double")
    val c = col("__c").cast("double")
    val phi2 = col("__chi2") / n
    val phi2p = greatest(
      phi2 - (r - 1.0) * (c - 1.0) / (n - 1.0), lit(0.0))
    val rp = r - pow(r - 1.0, 2) / (n - 1.0)
    val cp = c - pow(c - 1.0, 2) / (n - 1.0)
    val minDf = least(r, c) - 1.0
    val minDfP = least(rp, cp) - 1.0
    s.select(
      col("__nt").cast("bigint").as("n"),
      col("__r").cast("bigint").as("r"),
      col("__c").cast("bigint").as("c"),
      round(col("__chi2"), 6).as("chi2"),
      round(when(minDf > 0.0, sqrt(phi2 / minDf)), 6)
        .as("cramers_v"),
      round(when(minDfP > 0.0, sqrt(phi2p / minDfP)), 6)
        .as("v_corrected"))
  }

  /** DuckDB oracle for [[cramersV]]. */
  def cramersVOracleSql(table: String, aExpr: String,
      bExpr: String): String =
    s"""WITH joint AS (
       |  SELECT $aExpr AS a, $bExpr AS b, COUNT(*) AS n
       |  FROM $table
       |  WHERE $aExpr IS NOT NULL AND $bExpr IS NOT NULL
       |  GROUP BY 1, 2),
       |at AS (SELECT a, SUM(n) AS na FROM joint GROUP BY 1),
       |bt AS (SELECT b, SUM(n) AS nb FROM joint GROUP BY 1),
       |g AS (SELECT SUM(n) AS nt, COUNT(DISTINCT a) AS r,
       |  COUNT(DISTINCT b) AS c FROM joint),
       |cells AS (
       |  SELECT at.na, bt.nb, COALESCE(joint.n, 0) AS n0, g.nt,
       |    g.r, g.c
       |  FROM at CROSS JOIN bt
       |  LEFT JOIN joint ON joint.a = at.a AND joint.b = bt.b
       |  CROSS JOIN g),
       |s AS (
       |  SELECT ANY_VALUE(nt) AS nt, ANY_VALUE(r) AS r,
       |    ANY_VALUE(c) AS c,
       |    SUM(POW(n0 - CAST(na AS DOUBLE) * nb / nt, 2) /
       |      (CAST(na AS DOUBLE) * nb / nt)) AS chi2
       |  FROM cells),
       |f AS (
       |  SELECT nt, r, c, chi2,
       |    chi2 / nt AS phi2,
       |    GREATEST(chi2 / nt -
       |      (r - 1.0) * (c - 1.0) / (nt - 1.0), 0.0) AS phi2p,
       |    r - POW(r - 1.0, 2) / (nt - 1.0) AS rp,
       |    c - POW(c - 1.0, 2) / (nt - 1.0) AS cp
       |  FROM s)
       |SELECT CAST(nt AS BIGINT) AS n, CAST(r AS BIGINT) AS r,
       |  CAST(c AS BIGINT) AS c,
       |  ROUND(chi2, 6) AS chi2,
       |  ROUND(CASE WHEN LEAST(r, c) - 1.0 > 0
       |    THEN SQRT(phi2 / (LEAST(r, c) - 1.0)) END, 6)
       |    AS cramers_v,
       |  ROUND(CASE WHEN LEAST(rp, cp) - 1.0 > 0
       |    THEN SQRT(phi2p / (LEAST(rp, cp) - 1.0)) END, 6)
       |    AS v_corrected
       |FROM f""".stripMargin
}
