package graft.marts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The fact build — grouped aggregates + chained full-outer join +
  * key-coalescing + null-fill + stable sort.
  *
  * Re-expresses the reference's `fct_daily_store_metrics`
  * (reference `dbt/models/marts/fct_daily_store_metrics.sql:6-32`,
  * `local_runner.py:136-156`) over the driver testdata: `orders` plays
  * `erp_orders` (revenue / order_count / status-filtered count) and
  * `events` plays `web_events` (sessions / visitors); the synthetic
  * `store_id` is a modulus of the customer / user key (SURVEY §7.0).
  *
  * Scale notes: both inputs aggregate BEFORE the join, so the full-outer
  * join sees |stores|×|days| rows, not raw fact rows — the shuffles are
  * on pre-reduced data and Catalyst plans partial (map-side) aggregation
  * for each groupBy. The `Seq`-key join form coalesces the join keys the
  * way SQL `USING` does, which is exactly the reference's
  * `coalesce(o.store_id, l.store_id, w.store_id)` (fct:24-25).
  */
object DailyStoreMetrics {

  val NumStores = 10

  /** Daily order metrics (A1-A4: group-by, sum, count, filtered count). */
  def ordersDaily(orders: DataFrame): DataFrame =
    orders
      .groupBy(
        (col("o_custkey") % NumStores).as("store_id"),
        to_date(col("o_orderdate")).as("dt"))
      .agg(
        round(sum("o_totalprice"), 2).as("revenue"),
        count(lit(1)).as("order_count"),
        count(when(col("o_orderstatus") === "F", 1)).as("fulfilled_orders"))

  /** Daily web metrics (sessions + distinct visitors). */
  def eventsDaily(events: DataFrame): DataFrame =
    events
      .groupBy(
        (col("user_id") % NumStores).as("store_id"),
        to_date(col("ts")).as("dt"))
      .agg(
        count(lit(1)).as("sessions"),
        countDistinct(col("user_id")).as("visitors"))

  /** FOJ the daily aggregates on (store_id, dt), zero-fill, stable sort
    * (J1-J2, F1-F2, O1). */
  def build(orders: DataFrame, events: DataFrame): DataFrame =
    ordersDaily(orders)
      .join(eventsDaily(events), Seq("store_id", "dt"), "full_outer")
      .na.fill(0, Seq("revenue", "order_count", "fulfilled_orders", "sessions", "visitors"))
      .orderBy("store_id", "dt")
}
