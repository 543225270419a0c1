package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** End-to-end corpus curation: the composed pass a training-data run
  * actually executes — scrub, quality-filter, dedup, split — built
  * entirely from this engine's individually-verified operators, so the
  * whole chain stays one declarative Catalyst plan (filters and
  * projections fuse; nothing materializes between stages).
  *
  * Scale shape: stages 1-2 are map-only (regex rewrite, per-row token
  * stats via [[TextQuality]]'s explode/partial-agg), stage 3 is ONE
  * shuffle on the dedup key, stage 4 is map-only hash assignment. Total
  * wide ops for the whole pipeline: the repetition-metric partial agg +
  * window, and the dedup-key window — both keyed, both AQE-skew-
  * handled.
  */
object Curation {

  /** Scrub with `rules`, drop documents whose distinct-token ratio
    * falls below `minDistinctRatio` (repetition junk), keep the lowest
    * id per `dedupPrefix`-char redacted-text prefix (near-boilerplate
    * collapse), then assign reproducible splits by md5(id) prefix.
    * Output: (idCol, split, n_tokens, distinct_ratio). */
  def pipeline(docs: DataFrame,
      rules: Seq[Scrub.Rule],
      minDistinctRatio: Double = 0.35,
      dedupPrefix: Int = 40,
      splits: Seq[(String, Double)] =
        Seq(("train", 0.90), ("val", 0.07), ("test", 0.03)),
      idCol: String = "doc_id"): DataFrame = {
    val redacted = Scrub.redact(docs, rules)
      .select(col(idCol), col("redacted"))
    val metrics = TextQuality.repetitionMetrics(
      redacted.withColumnRenamed("redacted", "text"), idCol)
      .select(col(idCol), col("n_tokens"), col("distinct_ratio"))
    val kept = redacted.join(metrics, idCol)
      .filter(col("distinct_ratio") >= minDistinctRatio)
    val w = Window
      .partitionBy(substring(col("redacted"), 1, dedupPrefix))
      .orderBy(col(idCol))
    val deduped = kept
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk", "redacted")
    Sampling.hashSplit(deduped, splits, idCol)
      .select(col(idCol), col("split"), col("n_tokens"),
        col("distinct_ratio"))
      .orderBy(col(idCol))
  }
}
