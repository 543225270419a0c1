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
  * Scale shape: stages 1-2 are map-only — the regex rewrite and the
  * token stats both evaluate per-row (`array_distinct` gives the
  * distinct-token ratio without [[TextQuality]]'s bigram explode, which
  * the filter doesn't need — one scan, no join-back). Stage 3's
  * dedup-key window is the pipeline's ONLY wide op before the final
  * sort; stage 4 is map-only hash assignment.
  */
object Curation {

  /** Scrub with `rules`, drop documents whose distinct-token ratio
    * falls below `minDistinctRatio` (repetition junk), keep the lowest
    * id per `dedupPrefix`-char redacted-text prefix (near-boilerplate
    * collapse), then assign reproducible splits by md5(id) prefix.
    * Output: (idCol, split, n_tokens, distinct_ratio), plus the
    * `redacted` text when `withText` is set (the corpus-publishing
    * shape — [[graft.pipeline.CurationJob]] uses it). */
  def pipeline(docs: DataFrame,
      rules: Seq[Scrub.Rule],
      minDistinctRatio: Double = 0.35,
      dedupPrefix: Int = 40,
      splits: Seq[(String, Double)] =
        Seq(("train", 0.90), ("val", 0.07), ("test", 0.03)),
      idCol: String = "doc_id",
      withText: Boolean = false): DataFrame = {
    val redacted = Scrub.redact(docs, rules)
      .select(col(idCol), col("redacted"))
    val kept = redacted
      .withColumn("__toks",
        graft.functions.TextFunctions.tokens(col("redacted")))
      .withColumn("n_tokens", size(col("__toks")).cast("bigint"))
      .filter(col("n_tokens") >= 2)
      .withColumn("distinct_ratio",
        round(size(array_distinct(col("__toks"))).cast("double") /
          col("n_tokens"), 4))
      .drop("__toks")
      .filter(col("distinct_ratio") >= minDistinctRatio)
    val w = Window
      .partitionBy(substring(col("redacted"), 1, dedupPrefix))
      .orderBy(col(idCol))
    val deduped = kept
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk")
    val outCols =
      Seq(col(idCol), col("split"), col("n_tokens"), col("distinct_ratio")) ++
        (if (withText) Seq(col("redacted")) else Nil)
    // no trailing sort: publishing (TableLog merge/overwrite) re-shuffles
    // anyway — callers needing a stable order (the q77 oracle) add it
    Sampling.hashSplit(deduped, splits, idCol)
      .select(outCols: _*)
  }
}
