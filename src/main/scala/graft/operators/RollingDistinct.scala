package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rolling-window distinct counts (7-day active users, WAU/MAU): the
  * one aggregate windowed OLAP does NOT get for free, because
  * `COUNT(DISTINCT)` is not an associative window aggregate.
  *
  * Scale design — the naive forms both die at 100 TB:
  *   - `collect_set` over a range window materializes every window's
  *     member set per row;
  *   - per-day self-joins rescan the event table W times.
  * Instead: dedupe `(day, key)` ONCE (one shuffle, output is
  * days × daily-active — corpus-sized, not event-sized), fan each
  * deduped row out to the W window-end days it contributes to (a
  * W-element literal explode, map-side), and count-distinct per
  * window end (second shuffle). Total: two shuffles of the deduped
  * table, W× inflation of the SMALL table only, no global sort.
  * The sketch path replaces the second distinct with per-day HLL
  * sketches unioned across the window — the fan-out then multiplies
  * |days| rows, not |days × daily-active|, the right trade once daily
  * cardinality is itself large.
  */
object RollingDistinct {

  /** Exact rolling `windowDays`-day distinct `keyCol` per window-end
    * day. Only days observed in the data appear as window ends (a day
    * with zero events is not a reporting row — same contract as the
    * daily tables it sits beside). */
  def activeKeys(events: DataFrame, tsCol: String = "ts",
      keyCol: String = "user_id", windowDays: Int = 7): DataFrame = {
    val dedup = events
      .select(to_date(col(tsCol)).as("d"), col(keyCol).as("k"))
      .distinct()
    val days = dedup.select(col("d")).distinct()
    val offsets = array((0 until windowDays).map(lit): _*)
    val fanned = dedup
      .withColumn("dt", explode(offsets))
      .select(date_add(col("d"), col("dt")).as("dt"), col("k"))
    fanned
      // keep only window-end days that actually occur (drops the
      // phantom tail past the last observed day)
      .join(days.withColumnRenamed("d", "dt"), Seq("dt"), "left_semi")
      .groupBy("dt")
      .agg(countDistinct(col("k")).as("active_users"))
      .orderBy("dt")
  }

  /** Sketch path: per-day HLL sketches (one tiny row per day), fanned
    * out W× and unioned per window end. The fan-out multiplies |days|
    * rows carrying ~KB sketches — event cardinality never appears
    * after the first aggregate. lgK=14 ≈ 0.8% rsd. */
  def approxActiveKeys(events: DataFrame, tsCol: String = "ts",
      keyCol: String = "user_id", windowDays: Int = 7,
      lgK: Int = 14): DataFrame = {
    val daily = events
      .select(to_date(col(tsCol)).as("d"), col(keyCol).as("k"))
      .groupBy("d")
      .agg(hll_sketch_agg(col("k"), lit(lgK)).as("sk"))
    val days = daily.select(col("d")).distinct()
    val offsets = array((0 until windowDays).map(lit): _*)
    daily
      .withColumn("dt", explode(offsets))
      .select(date_add(col("d"), col("dt")).as("dt"), col("sk"))
      .join(days.withColumnRenamed("d", "dt"), Seq("dt"), "left_semi")
      .groupBy("dt")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
        .as("active_users_approx"))
      .orderBy("dt")
  }
}
