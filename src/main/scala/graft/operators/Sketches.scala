package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Mergeable frequency sketches — the approximate tier for corpus
  * statistics, alongside `approx_count_distinct` (HLL, q25) and
  * `approx_percentile` (q52).
  *
  * Count-min sketch (Cormode/Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications", J.Algorithms
  * 2005): a fixed-size 2-d counter array; per-key estimates
  * overestimate by at most eps·N with probability ≥ confidence. The
  * 100 TB story: the sketch is a few KB per partition, merges
  * associatively (one treeAggregate, no shuffle of the keys), and
  * answers point frequency queries without ever materializing the
  * vocabulary — the exact groupBy it replaces shuffles every distinct
  * token.
  */
object Sketches {

  /** CMS-estimated token frequencies for a fixed term set. Exact
    * per-term counts would shuffle the whole token multiset; the
    * sketch pass is map-side-only + a driver-side merge, and the
    * result is |terms| rows. Deterministic for a fixed seed. */
  def cmsTokenCounts(docs: DataFrame, terms: Seq[String],
      eps: Double = 0.001, confidence: Double = 0.99, seed: Int = 42,
      textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "need at least one term to estimate")
    val spark = docs.sparkSession
    import spark.implicits._
    val tokens = docs.select(
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val sketch = tokens.stat.countMinSketch("term", eps, confidence, seed)
    terms.sorted.map { t =>
      (t, sketch.estimateCount(t), sketch.totalCount())
    }.toDF("term", "est_count", "n_tokens")
  }

  /** Pairwise slice-overlap matrix via HLL inclusion–exclusion:
    * |A∩B| ≈ |A| + |B| − |A∪B| with each cardinality a
    * `hll_sketch` estimate and the union a lossless sketch merge
    * (Flajolet et al. 2007; the Apache DataSketches HLL Spark ships).
    * The registered use is audience overlap — how many distinct
    * `user_id`s event-type slices share — but any (slice, key) works:
    * sources × doc-shingles gives corpus-content overlap.
    *
    * Why sketches and not the exact pairwise `count(distinct)`: exact
    * |A∩B| for all pairs is a self-join of the key universe (quadratic
    * in slices, shuffling the full key set each time — this is what
    * q116's exact n-gram overlap pays deliberately). Here the corpus
    * is read ONCE into one lgK-bounded sketch per slice (a few KB
    * each, partial-aggregated map-side); the |slices|² matrix is then
    * computed over rows the size of a postcard. At 100 TB that's the
    * difference between one scan and |slices|²/2 shuffled scans.
    * Error: rsd ≈ 1.04/√2^lgK (~0.8% at lgK 14), symmetric-bounded in
    * SketchesSpec. Estimates are engine-specific ⇒ rows-only. */
  def overlapMatrix(df: DataFrame, sliceCol: String, keyCol: String,
      lgK: Int = 14): DataFrame = {
    val sk = df.select(col(sliceCol).as("slice"), col(keyCol).as("k"))
      .groupBy("slice")
      .agg(hll_sketch_agg(col("k"), lit(lgK)).as("sk"))
    val a = sk.select(col("slice").as("slice_a"), col("sk").as("sk_a"))
    val b = sk.select(col("slice").as("slice_b"), col("sk").as("sk_b"))
    a.join(b, col("slice_a") < col("slice_b"))
      .select(col("slice_a"), col("slice_b"),
        hll_sketch_estimate(col("sk_a")).cast("double").as("__ea"),
        hll_sketch_estimate(col("sk_b")).cast("double").as("__eb"),
        hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b")))
          .cast("double").as("__eu"))
      .select(col("slice_a"), col("slice_b"),
        round(col("__ea"), 2).as("est_a"),
        round(col("__eb"), 2).as("est_b"),
        round(col("__eu"), 2).as("est_union"),
        round(greatest(lit(0.0), col("__ea") + col("__eb") - col("__eu")), 2)
          .as("est_overlap"),
        round(greatest(lit(0.0), col("__ea") + col("__eb") - col("__eu")) /
          col("__eu"), 6).as("jaccard_est"))
      .orderBy("slice_a", "slice_b")
  }
}
