package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling: one row per profiled column with the
  * numbers every catalog page shows (rows, nulls, distincts, min/max,
  * mean, stddev) — the live-data counterpart of
  * [[graft.lake.StatsAgg]] (which answers from manifest stats without
  * touching data) and the per-table tier under
  * [[graft.lake.Catalog]]'s table-of-tables.
  *
  * ONE aggregate pass computes every column's statistics side by side
  * (the same N-checks-one-scan contract as [[Expectations]]); the
  * per-column rows are exploded from that single result row, so
  * profiling 50 columns costs one scan, not 50. */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__rows_$c"),
        count(when(col(c).isNull, 1)).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__distinct_$c"),
        round(min(col(c)).cast("double"), 4).as(s"__min_$c"),
        round(max(col(c)).cast("double"), 4).as(s"__max_$c"),
        round(avg(col(c)), 4).as(s"__mean_$c"),
        round(stddev_samp(col(c)), 4).as(s"__std_$c"))
    }
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"__rows_$c").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__distinct_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"),
        col(s"__mean_$c").as("mean_value"),
        col(s"__std_$c").as("stddev_value"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("p"))
      .select("p.*")
      .orderBy("col_name")
  }
}
