package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join-key skew profiler — the planning companion to [[Skew]]'s
  * salted join. Before shuffling 100 TB on a key, a pipeline should
  * know the key's distribution: a handful of hot keys (the null
  * surrogate, a default user id, a viral item) can put the whole
  * table's worth of rows into one reducer while the other 999
  * executors idle.
  *
  * For each analyzed key column this emits one summary row:
  * distinct-key count, total rows, max/avg rows per key, the skew
  * ratio (max ÷ avg — 1.0 is perfectly uniform), the hottest key
  * itself, and a recommended salt fan-out
  * (`ceil(max/avg)` capped at `maxSalt`) — the number of sub-keys
  * [[Skew.saltedJoin]] would need to spread the hottest key evenly.
  *
  * Scale shape: one hash aggregation per analyzed column (map-side
  * partial counts), then a constant-size second aggregation — the
  * profile costs one shuffle of (key, count) pairs, never a sort of
  * the raw table. The hottest-key pick is a single-row
  * `orderBy.limit(1)` over the per-key counts with a deterministic
  * tie-break (highest count, then smallest key string).
  */
object SkewAdvisor {

  /** One-row skew profile of `df[keyCol]`, labeled `label`. */
  def analyze(df: DataFrame, keyCol: String, label: String,
      maxSalt: Int = 32): DataFrame = {
    val counts = df
      .filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("string").as("k"))
      .agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(
      count(lit(1)).as("n_keys"),
      sum("cnt").as("n_rows"),
      max("cnt").as("max_cnt"),
      round(avg("cnt"), 4).as("avg_cnt"),
      round(max("cnt") / avg("cnt"), 4).as("skew_ratio"),
      least(ceil(max("cnt") / avg("cnt")), lit(maxSalt.toLong))
        .cast("bigint").as("rec_salt"))
    val top = counts.orderBy(col("cnt").desc, col("k").asc).limit(1)
      .select(col("k").as("top_key"), col("cnt").as("top_cnt"))
    stats.crossJoin(top).select(
      lit(label).as("key_col"), col("n_keys"), col("n_rows"),
      col("max_cnt"), col("avg_cnt"), col("skew_ratio"),
      col("top_key"), col("rec_salt"))
  }

  /** Multi-column report: one profile row per (table, key) pair,
    * ordered by label for stable output. */
  def report(keys: Seq[(DataFrame, String, String)],
      maxSalt: Int = 32): DataFrame =
    keys.map { case (df, c, l) => analyze(df, c, l, maxSalt) }
      .reduce(_.unionByName(_))
      .orderBy("key_col")
}
