package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pairwise correlation profiling — Pearson r (linear association)
  * beside Spearman ρ (monotone association, outlier-robust) for every
  * pair of numeric columns: the third leg of the dependency-audit
  * stool after [[Dependencies.fdReport]] (exact determination) and
  * [[Dependencies.mutualInformation]] (categorical bits). Pearson ≫
  * Spearman flags outlier-driven "correlation"; Spearman ≫ Pearson
  * flags a monotone-but-curved link a linear model would miss.
  *
  * Scale shape: Spearman needs ranks, and a global row-level rank
  * window is a single-partition scale-killer — so ranks come from the
  * VALUE-FREQUENCY table instead (groupBy value → cumulative count →
  * average rank per tie group, the standard Spearman tie convention),
  * an ordered window over a value-cardinality frame joined back on the
  * value (the ksBySliceFdr stat-table pattern). The correlations
  * themselves are ONE aggregate pass (p² `corr` aggregates); the
  * collected result is a single row. */
object Correlation {

  /** `(col_a, col_b, pearson, spearman)` for every unordered pair of
    * `cols`, ordered (col_a, col_b). NULL rows are excluded per pair
    * by `corr` itself (both engines skip null pairs). */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val spark = df.sparkSession
    import spark.implicits._
    var d = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
    cols.foreach { c =>
      // ranks over NON-NULL values only, attached with a LEFT join: a
      // row that is null in column c keeps its other columns and gets a
      // null rank, so `corr` excludes it from exactly the pairs
      // involving c — an inner equi-join here silently dropped any row
      // with a null in ANY profiled column from ALL pair correlations
      val freq = d.filter(col(c).isNotNull).groupBy(col(c).as("__v"))
        .agg(count(lit(1)).as("__c"))
      val wCum = Window.orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, -1)
      val rk = freq
        .withColumn("__rank",
          coalesce(sum("__c").over(wCum), lit(0L)) +
            (col("__c") + 1.0) / 2.0)   // average rank over the tie run
        .select(col("__v").as(c), col("__rank").as(s"__r_$c"))
      d = d.join(rk, Seq(c), "left")
    }
    val pairs = for {
      (a, i) <- cols.zipWithIndex; b <- cols.drop(i + 1)
    } yield (a, b)
    val aggs = pairs.flatMap { case (a, b) => Seq(
      corr(col(a), col(b)).as(s"__p_${a}__$b"),
      corr(col(s"__r_$a"), col(s"__r_$b")).as(s"__s_${a}__$b"))
    }
    val one = d.agg(aggs.head, aggs.tail: _*).collect()(0)
    pairs.map { case (a, b) =>
      (a, b,
        round6(one.getAs[Double](s"__p_${a}__$b")),
        round6(one.getAs[Double](s"__s_${a}__$b")))
    }.toDF("col_a", "col_b", "pearson", "spearman")
      .orderBy("col_a", "col_b")
  }

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** DuckDB oracle for [[correlationMatrix]] on a named table. The
    * rank mirror is row-level (`rank() + (tie − 1)/2`) — value-
    * identical to the engine's frequency-table form. */
  def oracleSql(table: String, cols: Seq[String]): String = {
    val rankCols = cols.map { c =>
      s"""rank() OVER (ORDER BY CAST($c AS DOUBLE)) +
         |    (COUNT(*) OVER (PARTITION BY CAST($c AS DOUBLE)) - 1) / 2.0
         |    AS __r_$c""".stripMargin
    }.mkString(",\n  ")
    val selects = (for {
      (a, i) <- cols.zipWithIndex; b <- cols.drop(i + 1)
    } yield
      s"""SELECT '$a' AS col_a, '$b' AS col_b,
         |  ROUND(corr(CAST($a AS DOUBLE), CAST($b AS DOUBLE)), 6)
         |    AS pearson,
         |  ROUND(corr(__r_$a, __r_$b), 6) AS spearman
         |FROM r""".stripMargin).mkString("\nUNION ALL\n")
    s"""WITH r AS (
       |  SELECT *,
       |  $rankCols
       |  FROM $table)
       |SELECT * FROM (
       |$selects
       |) ORDER BY col_a, col_b""".stripMargin
  }

  /** Kendall τ-b between two metrics over a BOUNDED entity frame
    * `(k, x, y)` (Kendall 1938; tie correction per Agresti §2.1.2):
    * τ_b = (C − D) / √((n₀−n₁)(n₀−n₂)) with n₁/n₂ the tied-pair
    * counts in x/y. Completes the rank-association family next to
    * Spearman ([[correlationMatrix]]) and RBO (top-k lists): τ reads
    * directly as P(concordant) − P(discordant), the number an analyst
    * quotes when two league tables disagree.
    *
    * Pair generation is an explicit self-cross of the ENTITY table —
    * correct only because the caller aggregates to a bounded grain
    * first (nations, stores, segments: the q176 audience-overlap
    * precedent, PlanAudit-allowlisted). The corpus-scale work is
    * whatever aggregation built `m`; this step is |m|² on a dimension-
    * sized frame. One output row: `(n_pairs, concordant, discordant,
    * ties_x, ties_y, tau_b)`. */
  def kendallTau(m: DataFrame): DataFrame = {
    val a = m.select(col("k").as("__ka"), col("x").as("__xa"),
      col("y").as("__ya"))
    val b = m.select(col("k").as("__kb"), col("x").as("__xb"),
      col("y").as("__yb"))
    val s = (col("__xa") - col("__xb")) * (col("__ya") - col("__yb"))
    val cnt = (c: org.apache.spark.sql.Column) =>
      sum(when(c, 1L).otherwise(0L))
    a.crossJoin(b).where(col("__ka") < col("__kb"))
      .agg(
        count(lit(1)).as("n_pairs"),
        cnt(s > 0.0).as("concordant"),
        cnt(s < 0.0).as("discordant"),
        cnt(col("__xa") === col("__xb")).as("ties_x"),
        cnt(col("__ya") === col("__yb")).as("ties_y"))
      .select(col("n_pairs"), col("concordant"), col("discordant"),
        col("ties_x"), col("ties_y"),
        round((col("concordant") - col("discordant")).cast("double") /
          sqrt((col("n_pairs") - col("ties_x")).cast("double") *
            (col("n_pairs") - col("ties_y")).cast("double")), 6)
          .as("tau_b"))
  }

  /** DuckDB oracle for [[kendallTau]] over the nation-grain
    * revenue-vs-order-count league tables (the q301 registration). */
  val kendallNationOracleSql: String =
    """WITH m AS (
      |  SELECT n_name AS k,
      |    CAST(SUM(o_totalprice) AS DOUBLE) AS x,
      |    CAST(COUNT(*) AS DOUBLE) AS y
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1),
      |p AS (
      |  SELECT a.x AS xa, a.y AS ya, b.x AS xb, b.y AS yb
      |  FROM m a JOIN m b ON a.k < b.k)
      |SELECT COUNT(*) AS n_pairs,
      |  SUM(CASE WHEN (xa-xb)*(ya-yb) > 0 THEN 1 ELSE 0 END)
      |    AS concordant,
      |  SUM(CASE WHEN (xa-xb)*(ya-yb) < 0 THEN 1 ELSE 0 END)
      |    AS discordant,
      |  SUM(CASE WHEN xa = xb THEN 1 ELSE 0 END) AS ties_x,
      |  SUM(CASE WHEN ya = yb THEN 1 ELSE 0 END) AS ties_y,
      |  ROUND(CAST(SUM(CASE WHEN (xa-xb)*(ya-yb) > 0 THEN 1 ELSE 0 END)
      |      - SUM(CASE WHEN (xa-xb)*(ya-yb) < 0 THEN 1 ELSE 0 END)
      |      AS DOUBLE) /
      |    sqrt(CAST(COUNT(*) - SUM(CASE WHEN xa = xb THEN 1 ELSE 0 END)
      |        AS DOUBLE) *
      |      CAST(COUNT(*) - SUM(CASE WHEN ya = yb THEN 1 ELSE 0 END)
      |        AS DOUBLE)), 6) AS tau_b
      |FROM p""".stripMargin
}
