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
  * Scale shape: ONE aggregate pass computing every |distinct(col)| and
  * |distinct(lhs, rhs)| — Catalyst plans multi-distinct aggregates via
  * expand (×(p + p²) row multiplication for p profiled columns), which
  * is the exact-count price; at 100 TB swap `approx = true` to run the
  * same pass on HLL sketches (`approx_count_distinct`, 2% default
  * error) and treat near-equality as "holds" — the standard profiling
  * trade. Output is p·(p−1) rows whatever the corpus size.
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
    // pairs count via a STRUCT so a null field doesn't drop the row
    // (DuckDB's COUNT(DISTINCT (a,b)) row semantics); bare-column
    // singles skip nulls in both engines
    def cd(c: Seq[String]): org.apache.spark.sql.Column = {
      val e = if (c.size == 1) col(c.head) else struct(c.map(col): _*)
      if (approx) approx_count_distinct(e) else countDistinct(e)
    }

    val singles = cols.map(c => cd(Seq(c)).as(s"__d_$c"))
    val pairs = for {
      a <- cols; b <- cols if a != b
    } yield (a, b)
    val pairAggs = pairs.map { case (a, b) =>
      cd(Seq(a, b)).as(s"__d_${a}__$b") }
    val one = df.agg((singles ++ pairAggs).head,
      (singles ++ pairAggs).tail: _*).collect()(0)

    val rows = pairs.map { case (a, b) =>
      val nl = one.getAs[Long](s"__d_$a")
      val np = one.getAs[Long](s"__d_${a}__$b")
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
}
