package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-join mitigation by key salting.
  *
  * When one join key carries a disproportionate share of rows (hot
  * customer, null-ish default key), a shuffle join puts the whole key on
  * one task. AQE's skew-join split handles sort-merge cases; salting is
  * the explicit, always-works form: the skewed (big) side gets a random
  * salt in [0, n); the small side is exploded n× so every salted key
  * still finds its match. Shuffle keys become (key, salt) — the hot key
  * now spreads over n tasks. Cost: small side inflated n×; use for
  * genuinely skewed keys, broadcast tiny dims instead when they fit.
  *
  * The salt is derived from a hash of the row (monotonically stable
  * columns), not rand(), so results are deterministic and re-runnable.
  */
object Skew {

  /** Inner equi-join of `big` (skewed) with `small` on `key`, salted
    * `n` ways. `saltBy` columns of the big side feed the salt hash —
    * pick something unique-ish per row (a primary key). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      n: Int, saltBy: Seq[String]): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(hash(saltBy.map(col): _*), lit(n)))
    val exploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }
}
