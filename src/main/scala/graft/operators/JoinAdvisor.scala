package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-flight join cardinality advisor — "will this join explode?"
  * answered BEFORE running it: the exact output size of an
  * equi-join is Σ_k f_left(k)·f_right(k) over the key frequency
  * tables, which costs two key-cardinality aggregations instead of
  * the join itself (the textbook frequency-vector dot product —
  * Swami & Schiefer's join-size estimation line of work, here exact
  * rather than sampled because key tables are small even when fact
  * tables are not). The companion to [[SkewAdvisor]] (which profiles
  * ONE table's key skew): this profiles the PAIR — overlap, fan-out,
  * and which keys dominate the output.
  *
  * Scale shape: one partial-aggregated groupBy per side (shuffle
  * carries distinct keys, not rows), an inner join of the two key
  * tables (key-cardinality), one sum. The per-key detail keeps the
  * top contributors only — a bounded advisory artifact. At 100 TB
  * substitute `approx_count_distinct`/CMS frequencies for the exact
  * counts if even the key table is too wide; the exact form is the
  * oracle pin. */
object JoinAdvisor {

  /** One summary row:
    * `(ndv_left, ndv_right, ndv_shared, rows_left, rows_right,
    *   est_join_rows, max_key_rows, fanout)` — `est_join_rows` is
    * EXACT for an inner equi-join on `key`; `max_key_rows` the
    * largest single key's contribution; `fanout` est/left rows. */
  def joinCardinality(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String): DataFrame = {
    val lf = left.groupBy(col(leftKey).as("__k"))
      .agg(count(lit(1)).as("__fl"))
    val rf = right.groupBy(col(rightKey).as("__k"))
      .agg(count(lit(1)).as("__fr"))
    val joined = lf.join(rf, "__k")
      .select(col("__k"), (col("__fl") * col("__fr")).as("__prod"))
    val shared = joined.agg(
      count(lit(1)).as("ndv_shared"),
      coalesce(sum(col("__prod")), lit(0L)).as("est_join_rows"),
      coalesce(max(col("__prod")), lit(0L)).as("max_key_rows"))
    val lstats = lf.agg(count(lit(1)).as("ndv_left"),
      sum(col("__fl")).as("rows_left"))
    val rstats = rf.agg(count(lit(1)).as("ndv_right"),
      sum(col("__fr")).as("rows_right"))
    lstats.crossJoin(rstats).crossJoin(shared)
      .select(col("ndv_left"), col("ndv_right"), col("ndv_shared"),
        col("rows_left"), col("rows_right"), col("est_join_rows"),
        col("max_key_rows"),
        round(col("est_join_rows").cast("double") / col("rows_left"), 4)
          .as("fanout"))
  }

  /** DuckDB oracle for [[joinCardinality]] over two named tables. */
  def oracleSql(leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): String =
    s"""WITH lf AS (
       |  SELECT $leftKey AS k, COUNT(*) AS fl FROM $leftTable GROUP BY 1),
       |rf AS (
       |  SELECT $rightKey AS k, COUNT(*) AS fr FROM $rightTable GROUP BY 1),
       |j AS (SELECT lf.k, fl * fr AS prod FROM lf JOIN rf ON lf.k = rf.k),
       |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS ndv_shared,
       |        CAST(COALESCE(SUM(prod), 0) AS BIGINT) AS est_join_rows,
       |        CAST(COALESCE(MAX(prod), 0) AS BIGINT) AS max_key_rows
       |      FROM j),
       |ls AS (SELECT CAST(COUNT(*) AS BIGINT) AS ndv_left,
       |         CAST(SUM(fl) AS BIGINT) AS rows_left FROM lf),
       |rs AS (SELECT CAST(COUNT(*) AS BIGINT) AS ndv_right,
       |         CAST(SUM(fr) AS BIGINT) AS rows_right FROM rf)
       |SELECT ndv_left, ndv_right, ndv_shared, rows_left, rows_right,
       |  est_join_rows, max_key_rows,
       |  ROUND(CAST(est_join_rows AS DOUBLE) / rows_left, 4) AS fanout
       |FROM ls, rs, s""".stripMargin
}
