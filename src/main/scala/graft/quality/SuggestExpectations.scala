package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Expectation suggestion — profile a table once and emit the
  * data-quality contract a human would write: the onboarding
  * workflow of the reference's Great Expectations layer
  * (the suite JSONs under `great_expectations/expectations/` are
  * hand-authored;
  * GE's own profiler automates exactly this step). Per column:
  * null count/fraction, distinct count, numeric min/max, and ONE
  * suggested rule by priority — small domain → `in_set`, numeric →
  * `between`, clean → `not_null`, else `profile_only`. The output
  * feeds [[Expectations]] directly: a reviewed suggestion row is a
  * one-liner to enact.
  *
  * Scale shape: a SINGLE aggregation pass computes every column's
  * stats (the multi-distinct expands map-side — one scan, expand ×
  * columns, never one scan per column), then one row per column is
  * unpacked from the 1-row result. Column list and numeric flags
  * are static, so the same generator writes the engine plan and the
  * DuckDB oracle — they cannot disagree on priority order. */
object SuggestExpectations {

  /** Column spec: (name, isNumeric). */
  type ColSpec = (String, Boolean)

  def suggest(df: DataFrame, cols: Seq[ColSpec],
      domainMax: Long = 10L): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = cols.flatMap { case (c, num) =>
      Seq(count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c")) ++
        (if (num) Seq(min(col(c)).cast("double").as(s"__mn_$c"),
          max(col(c)).cast("double").as(s"__mx_$c"))
        else Nil)
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val structs = cols.map { case (c, num) =>
      val nNulls = col("__n") - col(s"__nn_$c")
      val rule = when(col(s"__nd_$c") <= domainMax, "in_set")
        .otherwise(if (num) lit("between")
        else when(nNulls === 0, "not_null").otherwise("profile_only"))
      struct(
        lit(c).as("column_name"),
        nNulls.as("n_nulls"),
        round(nNulls.cast("double") / col("__n"), 6).as("null_frac"),
        col(s"__nd_$c").as("n_distinct"),
        (if (num) col(s"__mn_$c") else lit(null).cast("double"))
          .as("min_value"),
        (if (num) col(s"__mx_$c") else lit(null).cast("double"))
          .as("max_value"),
        rule.as("suggested_rule"))
    }
    row.select(explode(array(structs: _*)).as("p"))
      .select("p.*")
      .orderBy("column_name")
  }

  /** DuckDB oracle generated from the same column specs. */
  def oracleSql(table: String, cols: Seq[ColSpec],
      domainMax: Long = 10L): String = {
    val branches = cols.map { case (c, num) =>
      val minMax =
        if (num) s"CAST(MIN($c) AS DOUBLE) AS min_value,\n    CAST(MAX($c) AS DOUBLE) AS max_value"
        else "CAST(NULL AS DOUBLE) AS min_value,\n    CAST(NULL AS DOUBLE) AS max_value"
      val tailRule =
        if (num) "'between'"
        else s"CASE WHEN COUNT(*) - COUNT($c) = 0 THEN 'not_null' ELSE 'profile_only' END"
      s"""SELECT '$c' AS column_name,
         |    CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_nulls,
         |    ROUND(CAST(COUNT(*) - COUNT($c) AS DOUBLE) / COUNT(*), 6)
         |      AS null_frac,
         |    CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
         |    $minMax,
         |    CASE WHEN COUNT(DISTINCT $c) <= $domainMax THEN 'in_set'
         |      ELSE $tailRule END AS suggested_rule
         |  FROM $table""".stripMargin
    }
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }
}
