package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot differencing — the CDC primitive of a lakehouse: given two
  * versions of a keyed table, classify every key as `added`, `removed`,
  * or `changed` (any non-key column differs). This is what an
  * incremental consumer reads instead of re-scanning the table, and
  * what a data-quality run uses to audit a merge.
  *
  * Scale shape: one full-outer join on the key columns — the same
  * single-shuffle shape as the MERGE it audits. Change detection
  * compares a row-level fingerprint so wide tables don't pay
  * per-column comparison plumbing; `added`/`removed` fall out of the
  * join's null sides. The fingerprint hashes the JSON encoding with
  * null fields KEPT — `xxhash64(struct(...))` skips null fields
  * entirely, so a value moving between columns across a null
  * (before: (a, null), after: (null, a)) would hash identically and
  * the change would vanish from the feed.
  */
object SnapshotDiff {

  /** Rows of `after` vs `before`, classified per key. Returns the key
    * columns + `change_type` ∈ {added, removed, changed}; unchanged
    * keys are omitted (the interesting set is the delta, and at 100 TB
    * emitting the unchanged majority defeats the point). */
  def diff(before: DataFrame, after: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs key columns")
    require(before.columns.sameElements(after.columns),
      "snapshots must share a schema; run schema sync first")
    val dataCols = before.columns.filterNot(keys.contains).toSeq
    def fingerprinted(df: DataFrame, fp: String, mark: String) =
      df.select(keys.map(col) :+
        xxhash64(to_json(struct(dataCols.map(col): _*),
          Map("ignoreNullFields" -> "false"))).as(fp) :+
        lit(1).as(mark): _*)
    val b = fingerprinted(before, "__fp_b", "__in_b")
    val a = fingerprinted(after, "__fp_a", "__in_a")
    b.join(a, keys, "full_outer")
      .withColumn("change_type",
        when(col("__in_b").isNull, "added")
          .when(col("__in_a").isNull, "removed")
          .when(col("__fp_a") =!= col("__fp_b"), "changed"))
      .filter(col("change_type").isNotNull)
      .select(keys.map(col) :+ col("change_type"): _*)
      .orderBy(keys.map(col): _*)
  }
}
