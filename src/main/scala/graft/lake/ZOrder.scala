package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order-lite: multi-dimensional clustering for the curated layer.
  *
  * The reference claims a Z-ordered parquet layout and leaves automation
  * as future work (reference `README.md:3,12,35,107`). Without Delta's
  * OPTIMIZE ZORDER, the same data-skipping benefit is had by computing a
  * bit-interleaved key over the cluster columns and range-partitioning +
  * sorting by it: rows close in Z-value are close in both dimensions, so
  * parquet row-group min/max stats become selective for filters on EITHER
  * column — that's what makes the 100 TB scan prune.
  *
  * The interleave is built from Spark bitwise built-ins (shiftleft / |),
  * so the whole key stays inside whole-stage codegen — no UDF, no
  * codegen fallback.
  */
object ZOrder {

  /** Bin a numeric column into [0, 2^bits) with width_bucket over its
    * observed min/max. Deliberately NOT a global-window ntile: a
    * Window.orderBy with no partition key funnels the whole table
    * through one task, which is exactly the pattern that dies at 100 TB.
    * width_bucket is a scalar expression — fully parallel, codegen'd —
    * at the cost of equal-width rather than equal-depth bins. */
  private def widthBin(c: Column, min: Double, max: Double, bits: Int): Column = {
    val buckets = 1 << bits
    val hi = if (max > min) max else min + 1.0d
    (width_bucket(c.cast("double"), lit(min), lit(hi), lit(buckets)) - 1)
      .cast("long")
  }

  /** Interleave the low `bits` bits of two non-negative long columns:
    * result bit 2i = bit i of a, bit 2i+1 = bit i of b. Pure built-in
    * expression tree (codegen-friendly). */
  def interleaveBits(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Reference Scala implementation for tests. */
  def interleaveRef(a: Long, b: Long, bits: Int = 16): Long = {
    var r = 0L
    var i = 0
    while (i < bits) {
      r |= ((a >> i) & 1L) << (2 * i)
      r |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    r
  }

  /** Cluster `df` by the Z-value of two numeric columns: range-partition
    * into `numFiles` output files, sort within partitions by Z. One
    * cheap stats pass (a 4-column agg, collected to the driver) sizes the
    * bins; the layout pass itself is a scalar expression + range shuffle,
    * both fully parallel. Reads then get row-group pruning on either
    * column for free. */
  def cluster(df: DataFrame, colA: String, colB: String,
      numFiles: Int, bits: Int = 16): DataFrame = {
    val stats = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    val z = interleaveBits(
      widthBin(col(colA), stats.getDouble(0), stats.getDouble(1), bits),
      widthBin(col(colB), stats.getDouble(2), stats.getDouble(3), bits),
      bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
