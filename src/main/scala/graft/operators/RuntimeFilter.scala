package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.BloomKeyMightContain

/** Explicit runtime join filter — semi-join reduction for the case
  * where the build side is too big to broadcast but its KEY SET still
  * fits a Bloom filter. A shuffle join over 100 TB moves the entire
  * probe side; when the join is selective (a filtered dimension, a
  * changed-keys delta), most probe rows shuffle only to be discarded
  * by the join. Building a Bloom over the build side's keys and
  * probing it BEFORE the exchange drops those rows map-side, so the
  * shuffle carries ~selectivity × |big| rows instead of all of them.
  *
  * Correctness is free: a Bloom has no false negatives, so every
  * matching row survives the probe; false positives (rate `fpp`)
  * just ride to the exact join and drop there. The filter itself is
  * built with Spark's mergeable `DataFrameStatFunctions.bloomFilter`
  * (one column-pruned pass over the build side, partial filters
  * OR-merged at the driver) and ships to executors as a plan
  * reference object, like a broadcast variable.
  *
  * Spark's own `InjectRuntimeFilter` plants the same shape, but only
  * under AQE thresholds it controls; this operator is the explicit,
  * always-on form for pipelines that KNOW the join is selective.
  */
object RuntimeFilter {

  /** `big` reduced to rows whose `bigKey` MIGHT appear in
    * `small[smallKey]` — no false negatives, `fpp` false positives.
    * Always followed by the exact join. */
  def bloomFiltered(big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String, fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    // expected-insertion sizing needs the true key count; a distinct
    // count here is one column-pruned agg over the (small) build side
    val nKeys = small.select(smallKey).na.drop().distinct().count()
    // empty build side: the inner join is empty; Spark's bloomFilter
    // agg returns null for zero inserts, so short-circuit instead
    if (nKeys == 0L) big.filter(lit(false))
    else {
      val bloom = small.stat.bloomFilter(smallKey, nKeys, fpp)
      big.filter(BloomKeyMightContain(col(bigKey), bloom))
    }
  }

  /** The full reduced join: Bloom-prefilter `big`, then exact
    * inner-join on the keys. Sides are aliased so the join stays
    * resolvable when both key columns share a name (the common
    * `user_id = user_id` shape would otherwise be AMBIGUOUS_REFERENCE). */
  def bloomReducedJoin(big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String, fpp: Double = 0.01): DataFrame =
    bloomFiltered(big, bigKey, small, smallKey, fpp).alias("__rf_big")
      .join(small.alias("__rf_small"),
        col(s"__rf_big.$bigKey") === col(s"__rf_small.$smallKey"))
}
