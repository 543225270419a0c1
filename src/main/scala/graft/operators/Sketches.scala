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
}
