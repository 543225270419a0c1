package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic stratified sampling — the data-mixing primitive of a
  * training pipeline: per-stratum quotas ("n docs per (lang, source)
  * cell") drawn reproducibly, so a re-run (or a different engine)
  * selects the same rows.
  *
  * The pseudo-random order is `md5(id)` — a stable content-free
  * permutation both Spark and the DuckDB oracle compute identically,
  * unlike `rand()` (non-deterministic) or engine hash functions
  * (implementation-specific). Ties broken by id.
  *
  * Scale shape: one shuffle on the strata columns, then a per-stratum
  * window rank with early cutoff. Strata are the natural partition of
  * a curation run (languages × sources — thousands of cells, not
  * billions), so the window never sees unbounded partitions; the
  * hot-key case (one giant stratum) is the same row_number shape as
  * top-k-per-group (q30), which AQE skew-split handles.
  */
object Sampling {

  /** Keep the first `n` rows of each stratum in md5 order. Appends
    * `sample_rank` (1-based within stratum). */
  def stratifiedN(df: DataFrame, strataCols: Seq[String], n: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(strataCols.nonEmpty, "need at least one stratum column")
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("bigint"))
      .filter(col("sample_rank") <= n)
  }

  /** Per-stratum counts before/after a quota — the mix report a
    * curation run logs. */
  def mixReport(df: DataFrame, strataCols: Seq[String], n: Int,
      idCol: String = "doc_id"): DataFrame = {
    val total = df.groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).as("n_total"))
    val sampled = stratifiedN(df, strataCols, n, idCol)
      .groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).as("n_sampled"))
    total.join(sampled, strataCols)
      .orderBy(strataCols.map(col): _*)
  }
}
