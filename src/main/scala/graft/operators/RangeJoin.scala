package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range join: `points.value ∈ [intervals.lo, intervals.hi]`.
  *
  * Spark plans a raw interval predicate as BroadcastNestedLoopJoin —
  * O(|points|·|intervals|), which is exactly what dies first at scale.
  * Binning converts it to an equi-join: every interval is exploded to
  * the bins it overlaps, every point maps to its one bin, the join runs
  * on bin id (shuffle/broadcast hash join), and the residual predicate
  * filters within bins. Cost: |intervals| inflated by their average
  * span/binWidth — pick binWidth near the typical interval length.
  * Same shape Spark itself uses for watermarked stream-stream interval
  * joins.
  */
object RangeJoin {

  /** @param points    table with a numeric `valueCol`
    * @param intervals table with numeric `loCol`/`hiCol` (inclusive)
    * @param binWidth  bin size in value units */
  def binned(points: DataFrame, intervals: DataFrame,
      valueCol: String, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    val pBin = points.withColumn("__bin",
      floor(col(valueCol) / binWidth).cast("long"))
    val iBin = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    pBin.join(iBin, Seq("__bin"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("__bin")
  }
}
