package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling z-score anomaly flags over a keyed daily series — the
  * ops-monitoring staple ("did today's number jump more than Nσ off
  * its trailing window") applied per key.
  *
  * The trailing window INCLUDES the current row (the standard online
  * form: today's value shifts today's baseline too, which damps but
  * never hides a spike); rows whose window holds fewer than 2 points
  * have no sample stddev and flag false. Deterministic given the data,
  * so the whole report — rolling mean, rolling σ, z, flag — is
  * oracle-checkable.
  *
  * Scale shape: one window per key ordered by date; series length per
  * key is the window unit, keys are the parallelism unit — same
  * contract as [[GapFill.locf]], and the natural input is its
  * densified output (gaps would silently shrink the trailing frame).
  */
object Anomaly {

  def rollingZScore(df: DataFrame, keyCol: String, dateCol: String,
      valueCol: String, trailingRows: Int = 7,
      zThreshold: Double = 2.0): DataFrame = {
    require(trailingRows >= 2, "need at least 2 trailing rows for a stddev")
    val w = Window.partitionBy(keyCol).orderBy(dateCol)
      .rowsBetween(-(trailingRows - 1), Window.currentRow)
    val mean = avg(col(valueCol)).over(w)
    val sd = stddev_samp(col(valueCol)).over(w)
    // the published z is rounded for display/oracle stability, but the
    // FLAG tests the raw quotient — flagging off the rounded value
    // would silently pass raw |z| in (thr, thr + 0.00005)
    val rawZ = when(sd.isNotNull && sd =!= 0.0, (col(valueCol) - mean) / sd)
    df
      .withColumn("roll_mean", round(mean, 4))
      .withColumn("roll_std", round(sd, 4))
      .withColumn("z", round(rawZ, 4))
      .withColumn("anomaly",
        coalesce(abs(rawZ) > zThreshold, lit(false)))
      .orderBy(keyCol, dateCol)
  }
}
