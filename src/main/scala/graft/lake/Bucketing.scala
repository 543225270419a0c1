package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables for co-located, shuffle-free joins.
  *
  * A join between two tables bucketed the same way on the join key
  * needs NO exchange: each task reads matching bucket files from both
  * sides. At 100 TB this converts the recurring fact⋈fact join cost
  * from a full shuffle per query into a one-time layout cost at write
  * time — the same trade the reference makes with its partitioned,
  * Z-ordered curated layer (reference `README.md:3,12,35`), extended to
  * the join dimension.
  */
object Bucketing {

  /** Persist `df` as a bucketed managed table (sorted within buckets so
    * merge-join needs no sort either). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. With matched
    * bucket counts Catalyst plans a SortMergeJoin with NO Exchange on
    * either side. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** True when the physical plan contains no shuffle exchange — the
    * property bucketing buys. (BroadcastExchange is not a shuffle; only
    * hash/range repartitioning counts.) Checked on the rendered plan:
    * under AQE, `AdaptiveSparkPlanExec.inputPlan` predates
    * EnsureRequirements, so a node-collect there never sees exchanges —
    * the rendered tree shows the prepared plan. */
  def isShuffleFree(df: DataFrame): Boolean = {
    val rendered = df.queryExecution.executedPlan.toString
    !rendered.contains("Exchange hashpartitioning") &&
      !rendered.contains("Exchange rangepartitioning")
  }
}
