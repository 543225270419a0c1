package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Backward as-of join: for each left row, the most recent right row
  * with `right.ts <= left.ts` on the same key — the operator behind
  * "latest dimension state at event time" and point-in-time joins.
  *
  * Spark has no ASOF JOIN; a naive theta-join (`l.ts >= r.ts`) plans as
  * a nested loop. This is the scalable union-window form: tag both
  * inputs, union them, carry the last right payload forward over a
  * (key, ts ordered) window. Cost = ONE shuffle on the key + one sort
  * within partitions — same wire cost as a sort-merge join, no pairwise
  * blow-up, which is what holds at 100 TB.
  *
  * Constraints: right must be unique per (key, ts) for determinism
  * (aggregate it first), and `rightCols` must not collide with left
  * column names.
  */
object AsOfJoin {

  def asofBackward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightCols: Seq[String]): DataFrame = {
    val leftDataCols = left.columns.toSeq.filterNot(_ == key)
    val leftSchema = left.schema
    require(rightCols.intersect(left.columns).isEmpty,
      s"rightCols ${rightCols.intersect(left.columns)} collide with left columns")

    val payloadType = right.select(rightCols.map(col): _*).schema
    val taggedLeft = left.select(
      (col(key) +: col(leftTs).cast("timestamp").as("__ts") +:
        lit(1).as("__is_left") +:
        leftDataCols.map(col)) :+
        lit(null).cast(payloadType).as("__payload"): _*)
    val taggedRight = right.select(
      (col(key) +: col(rightTs).cast("timestamp").as("__ts") +:
        lit(0).as("__is_left") +:
        leftDataCols.map(c =>
          lit(null).cast(leftSchema(c).dataType).as(c))) :+
        struct(rightCols.map(col): _*).as("__payload"): _*)

    // is_left=0 sorts right rows first at equal ts ⇒ `<=` semantics.
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedLeft.unionByName(taggedRight)
      .withColumn("__state", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1 && col("__state").isNotNull)
      .select((col(key) +: leftDataCols.map(col)) ++
        rightCols.map(c => col("__state").getField(c).as(c)): _*)
  }
}
