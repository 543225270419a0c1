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
