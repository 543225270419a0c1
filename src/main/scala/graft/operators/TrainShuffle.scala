package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seeded deterministic global shuffle — the training-order step of a
  * data pipeline: examples must reach the trainer in a pseudorandom
  * order that is (a) reproducible run-to-run (resume, audits, ablation
  * reruns see the same order), (b) independent of input partitioning
  * and task scheduling, and (c) computable without a global
  * single-partition sort.
  *
  * Order key: a Knuth multiplicative hash of the id,
  * `h = (id * 2654435761) mod 1 000 000 007` — closed-form arithmetic
  * (not an engine-specific hash builtin) so any engine reading the
  * manifest can recompute the exact permutation. The seed folds in as
  * an offset on the id.
  *
  * Scale shape: `shard = h mod nShards` splits the corpus into
  * independent partitions FIRST; each shard is then sorted by
  * `(h, id)` and positions assigned per shard. No stage ever sees a
  * global ordering problem — the big win over
  * `row_number() OVER (ORDER BY h)`, which funnels every row through
  * one reducer. Trainers consume shards round-robin; within-shard
  * order is the deterministic pseudorandom order. At 100 TB,
  * `nShards` scales with the cluster (1024+) and each shard's sort is
  * one task's bounded work.
  */
object TrainShuffle {

  private val Knuth = 2654435761L
  private val Prime = 1000000007L

  /** `(id, shard, pos)` — the deterministic training order manifest.
    * `pos` is 1-based within shard; rows keep the shuffle's physical
    * layout (shard-partitioned) — a consumer needing a presentation
    * order sorts the BOUNDED manifest itself, the operator never pays
    * a global sort.
    *
    * Ids and seed must be non-negative: the id reduces mod the prime
    * BEFORE the Knuth multiply, so the product is bounded by
    * ~2.7e18 < Long.MaxValue for any id — no silent overflow (and no
    * BIGINT-overflow error when another engine recomputes the
    * closed form), and `pmod` keeps shard in [0, nShards) always. */
  def shuffleShards(docs: DataFrame, nShards: Int = 8, seed: Long = 0L,
      idCol: String = "doc_id"): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    require(seed >= 0L, "seed must be non-negative (portable closed form)")
    val h = pmod(pmod(col(idCol) + lit(seed), lit(Prime)) * lit(Knuth),
      lit(Prime))
    val w = Window.partitionBy("shard").orderBy(col("__h"), col(idCol))
    docs
      .select(col(idCol), h.as("__h"))
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w).cast("bigint"))
      .select(col(idCol), col("shard"), col("pos"))
  }
}
