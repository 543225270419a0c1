package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Slowly-changing-dimension (type 2) support: build a versioned
  * dimension from a change feed, and join facts to the version valid
  * at fact time — the canonical warehouse pattern (Kimball, "The Data
  * Warehouse Toolkit" ch. 5) the reference's incremental-merge mart
  * (`fct_daily_store_metrics.sql`) sidesteps by only keeping latest
  * state. Here history is first-class: every attribute change closes
  * the previous validity interval and opens a new one, so facts can
  * always be attributed to the attribute value THAT WAS TRUE at the
  * time — the difference between "revenue by customer tier today"
  * and "revenue by the tier the customer was in when they bought".
  *
  * Scale shape:
  *   - [[scd2Build]] is ONE window shuffle on the dimension key:
  *     change-dedupe (lag) and interval chaining (lead) both ride the
  *     same (key, ts) ordering, and per-key partitions are bounded by
  *     a key's change count, never corpus size.
  *   - [[pointInTimeJoin]] is an EQUI-join on the key with a residual
  *     interval predicate — the shuffle is driven by key equality
  *     (hash join, not a range/NLJ explosion), and because a key's
  *     validity intervals partition the timeline, each fact matches
  *     at most one version: output cardinality = facts with a
  *     dimension row, no fan-out.
  */
object Scd {

  /** Build the SCD2 dimension from a change feed: one row per
    * (key, attribute-run), `[valid_from, valid_to)` half-open,
    * `valid_to` NULL on the current row. Consecutive feed rows with
    * an unchanged attribute are collapsed (a re-stated value is not
    * a change). `orderCol` breaks same-timestamp ties so the build
    * is deterministic. */
  def scd2Build(feed: DataFrame, keyCol: String, attrCol: Column,
      tsCol: String = "ts", orderCol: String = "event_id"): DataFrame = {
    val ordered = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(orderCol))
    val changes = feed
      .select(col(keyCol), col(tsCol), col(orderCol), attrCol.as("attr"))
      .withColumn("__prev", lag(col("attr"), 1).over(ordered))
      .where(col("__prev").isNull || col("attr") =!= col("__prev"))
    val chained = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(orderCol))
    changes
      .withColumn("valid_to", lead(col(tsCol), 1).over(chained))
      .select(col(keyCol), col("attr"),
        col(tsCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Facts joined to the dimension version valid at fact time:
    * `fact.ts ∈ [valid_from, valid_to)`, with the open current row
    * matching everything from its `valid_from` on. Inner join —
    * facts before a key's first version (or keyless facts) drop,
    * which is the point-in-time contract. */
  def pointInTimeJoin(facts: DataFrame, dim: DataFrame, keyCol: String,
      factTs: String = "ts"): DataFrame =
    facts.join(dim,
      facts(keyCol) === dim(keyCol) &&
        facts(factTs) >= dim("valid_from") &&
        (dim("valid_to").isNull || facts(factTs) < dim("valid_to")))

  // ---- registered forms: the events table carries both roles — the
  // profile feed (signup/view events, attribute = value tier) and the
  // fact stream (purchases) ----

  /** Dimension of user value-tiers (tier = ⌊value/100⌋) from the
    * signup/view profile feed. */
  def userTierDimension(events: DataFrame): DataFrame =
    scd2Build(
      events.where(col("event_type").isin("signup", "view")),
      "user_id", floor(col("value") / 100).cast("int"))
      .withColumnRenamed("attr", "tier")
      .orderBy("user_id", "valid_from")

  /** Purchases attributed to the tier the user was in AT PURCHASE
    * TIME: per-tier purchase count and revenue. */
  def revenueByTierAtPurchase(events: DataFrame): DataFrame = {
    val dim = userTierDimension(events)
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    pointInTimeJoin(purchases, dim, "user_id")
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("value")), 2).as("revenue"))
      .orderBy("tier")
  }

  /** Incremental SCD2 merge: fold a NEW batch of feed rows into an
    * existing dimension without rebuilding untouched keys — the
    * production form (a daily profile-change batch against a
    * billions-of-keys dimension).
    *
    * Only keys PRESENT IN THE BATCH are rebuilt: their existing
    * versions are re-expanded to (ts, attr) change points (the
    * interval build is deterministic, so change points round-trip),
    * unioned with the batch's rows, and re-chained; every other key's
    * rows pass through untouched. The anti-join/semi-join split means
    * the shuffle is sized by the BATCH's key set, not the dimension —
    * the same touched-partition-only discipline as
    * [[graft.lake.MergeWriter]]. ScdSpec pins the invariant:
    * incremental merge ≡ full rebuild on the concatenated feed.
    *
    * Precondition (the SCD2 append contract): batch rows are not
    * older than the key's current `valid_from` — history is
    * append-only; a true historical restatement is a rebuild. */
  def scd2Merge(existing: DataFrame, batch: DataFrame, keyCol: String,
      attrCol: Column, tsCol: String = "ts",
      orderCol: String = "event_id"): DataFrame = {
    val touchedKeys = batch.select(col(keyCol)).distinct()
    val untouched = existing.join(touchedKeys, Seq(keyCol), "left_anti")
    // existing versions of touched keys, re-expanded to change points;
    // synthetic order -1 keeps them ahead of any same-ts batch row
    val replayed = existing.join(touchedKeys, Seq(keyCol), "left_semi")
      .select(col(keyCol), col("valid_from").as(tsCol),
        lit(-1L).as(orderCol), col("attr"))
    val rebuilt = scd2Build(
      replayed.unionByName(
        batch.select(col(keyCol), col(tsCol), col(orderCol),
          attrCol.as("attr"))),
      keyCol, col("attr"), tsCol, orderCol)
    untouched.unionByName(rebuilt)
  }

  private val feedCte =
    """WITH feed AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(FLOOR(value / 100) AS INTEGER) AS tier
      |  FROM events WHERE event_type IN ('signup', 'view')),
      |ch AS (
      |  SELECT user_id, ts, event_id, tier FROM (
      |    SELECT user_id, ts, event_id, tier,
      |      LAG(tier) OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id) AS prev
      |    FROM feed)
      |  WHERE prev IS NULL OR tier <> prev),
      |scd AS (
      |  SELECT user_id, tier, ts AS valid_from,
      |    LEAD(ts) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS valid_to
      |  FROM ch)""".stripMargin

  /** DuckDB oracle for [[userTierDimension]]. */
  def dimensionOracleSql: String =
    s"""$feedCte
       |SELECT user_id, tier, valid_from, valid_to,
       |  valid_to IS NULL AS is_current
       |FROM scd ORDER BY user_id, valid_from""".stripMargin

  /** DuckDB oracle for [[revenueByTierAtPurchase]]. */
  def revenueOracleSql: String =
    s"""$feedCte,
       |facts AS (
       |  SELECT user_id, ts, value FROM events
       |  WHERE event_type = 'purchase')
       |SELECT d.tier, CAST(COUNT(*) AS BIGINT) AS n_purchases,
       |  ROUND(SUM(f.value), 2) AS revenue
       |FROM facts f JOIN scd d ON f.user_id = d.user_id
       |  AND f.ts >= d.valid_from
       |  AND (d.valid_to IS NULL OR f.ts < d.valid_to)
       |GROUP BY 1 ORDER BY 1""".stripMargin
}
