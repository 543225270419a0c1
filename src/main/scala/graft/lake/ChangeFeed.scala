package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-level change feed between two [[TableLog]] versions — the
  * "change data feed" a downstream incremental consumer reads instead
  * of re-scanning the table (the lakehouse generalization of the
  * reference's incremental-model contract, dbt
  * `fct_daily_store_metrics.sql:1-5`: downstreams want "what changed
  * since my last run", not the full snapshot).
  *
  * Scale shape — this is the whole point of computing the feed from
  * the log rather than diffing two snapshot reads:
  *
  *   - Data directories are IMMUTABLE, so a directory present in both
  *     manifests contributes no changes and is never opened. For an
  *     append-heavy table (the 100 TB norm: per-batch
  *     [[TableLog.commitAppend]] commits) the feed reads exactly the
  *     appended directories — O(delta), not O(table).
  *   - A rewriting commit ([[TableLog.commitMerge]],
  *     [[TableLog.commitOptimize]], [[TableLog.commitDelete]]) swaps
  *     directories; both sides of the swap are read and netted by a
  *     single hash-partitioned count — one shuffle of the touched
  *     rows, no join against the untouched remainder. `commitDelete`'s
  *     stats pruning carries untouched directories forward, so even a
  *     delete's feed reads only the rewritten fraction.
  *
  * Netting is multiset-correct: each side groups by a full-row
  * fingerprint and the feed emits the count delta, so k identical
  * copies inserted report `n = k`, and a row merely REWRITTEN into a
  * different file (optimize/compaction) nets to zero and vanishes
  * from the feed. An update appears as a delete+insert pair — the
  * standard CDF shape for formats without persistent row ids. The
  * fingerprint hashes the JSON encoding with null fields kept
  * (`xxhash64(struct(...))` would skip nulls and conflate
  * `(a, null)` with `(null, a)`); a 64-bit collision would need two
  * DIFFERENT rows inside the same netting window to collide —
  * ~2^-64 per pair, accepted and documented.
  */
object ChangeFeed {

  /** Directory-level read plan for the feed: directories only in
    * `fromV` (read as candidate deletes), only in `toV` (candidate
    * inserts), and shared (never opened). */
  final case class DirDelta(removed: Seq[String], added: Seq[String],
      sharedSkipped: Int)

  private def commitAt(spark: SparkSession, path: String, v: Int) =
    TableLog.history(spark, path).find(_.version == v).getOrElse(
      throw new IllegalArgumentException(s"version $v not found at $path"))

  def dirDelta(spark: SparkSession, path: String, fromV: Int,
      toV: Int): DirDelta = {
    val from = commitAt(spark, path, fromV)
    val to = commitAt(spark, path, toV)
    val f = from.dirs.toSet
    val t = to.dirs.toSet
    DirDelta(from.dirs.filterNot(t), to.dirs.filterNot(f),
      (f intersect t).size)
  }

  /** All row-level changes from version `fromV` to `toV`: the table's
    * columns plus `_change_type` ∈ {insert, delete} and `n` (how many
    * identical copies changed). Unchanged rows — including rows
    * rewritten into different files with identical values — are
    * absent. */
  def changes(spark: SparkSession, path: String, fromV: Int,
      toV: Int): DataFrame = {
    require(fromV <= toV, s"fromV $fromV must be <= toV $toV")
    val delta = dirDelta(spark, path, fromV, toV)
    // the feed speaks the TARGET version's schema: pre-evolution
    // directories align by null-backfilling absent columns and casting
    // widened ones (same contract as the snapshot read); columns
    // DROPPED by the evolution don't participate in change identity
    val schemaDf = TableLog.read(spark, path, Some(toV)).limit(0)
    val cols = schemaDf.columns.toSeq
    def side(dirs: Seq[String], sign: Int): DataFrame =
      if (dirs.isEmpty) schemaDf.withColumn("__side", lit(sign))
      else {
        val raw = spark.read.option("mergeSchema", "true")
          .parquet(dirs.map(d => s"$path/$d"): _*)
        val have = raw.columns.toSet
        raw.select(schemaDf.schema.fields.toSeq.map { f =>
          (if (have.contains(f.name)) col(f.name).cast(f.dataType)
           else lit(null).cast(f.dataType)).as(f.name)
        }: _*).withColumn("__side", lit(sign))
      }
    val rowStruct = struct(cols.map(col): _*)
    // change identity hashes a CANONICAL form, not the raw row: map
    // columns sort by key (map key order is storage-dependent) and
    // float/double columns collapse -0.0 to 0.0 (+0.0 is an IEEE
    // identity except on -0.0), so a pure rewrite of logically-equal
    // rows nets out instead of emitting spurious delete+insert pairs.
    // Maps/floats NESTED inside structs/arrays are not normalized —
    // documented limitation (none of the lake's schemas nest them).
    val fpStruct = struct(schemaDf.schema.fields.toSeq.map { f =>
      (f.dataType match {
        case _: org.apache.spark.sql.types.MapType =>
          array_sort(map_entries(col(f.name)))
        case org.apache.spark.sql.types.DoubleType => col(f.name) + lit(0.0d)
        case org.apache.spark.sql.types.FloatType  => col(f.name) + lit(0.0f)
        case _ => col(f.name)
      }).as(f.name)
    }: _*)
    side(delta.added, 1).unionByName(side(delta.removed, -1))
      .groupBy(xxhash64(to_json(fpStruct,
        Map("ignoreNullFields" -> "false"))).as("__fp"))
      .agg(sum(col("__side")).as("__delta"),
        first(rowStruct).as("__row"))
      .where(col("__delta") =!= 0)
      .select(cols.map(c => col(s"__row.$c")) ++ Seq(
        when(col("__delta") > 0, lit("insert")).otherwise(lit("delete"))
          .as("_change_type"),
        abs(col("__delta")).as("n")): _*)
  }
}
