package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series densification: expand each key onto a complete date
  * spine and fill the gaps — the step between a sparse fact table
  * ("rows only for days with activity") and anything that consumes a
  * regular series (forecasting features, day-over-day deltas,
  * charting). Fill policy is last-observation-carried-forward (LOCF);
  * days before a key's first observation stay NULL (there is nothing
  * to carry), matching the standard resample semantics.
  *
  * Scale shape: the spine explodes |keys| × |days| rows from the KEY
  * table (not the fact table), the fill join is on (key, date), and
  * LOCF is one per-key ordered window — series length is the window
  * unit, keys are the parallelism unit. All deterministic, so the
  * whole densified frame is oracle-checkable.
  */
object GapFill {

  /** Dense (key, date) frame over [start, end] with `valueCol` LOCF-
    * filled and `observed` marking real rows. */
  def locf(df: DataFrame, keyCol: String, dateCol: String,
      valueCol: String, start: String, end: String): DataFrame = {
    val spine = df.select(col(keyCol)).distinct()
      .select(col(keyCol), explode(sequence(
        lit(start).cast("date"), lit(end).cast("date"),
        expr("interval 1 day"))).as(dateCol))
    val filled: Column = last(col(valueCol), ignoreNulls = true)
      .over(Window.partitionBy(keyCol).orderBy(dateCol)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    spine
      .join(df.select(col(keyCol), col(dateCol), col(valueCol)),
        Seq(keyCol, dateCol), "left")
      .withColumn("observed", col(valueCol).isNotNull)
      .withColumn(valueCol, filled)
      .orderBy(keyCol, dateCol)
  }
}
