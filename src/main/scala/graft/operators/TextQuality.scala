package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Repetition-based quality metrics in the style of the Gopher rules
  * (Rae et al., "Scaling Language Models: Methods, Analysis & Insights
  * from Training Gopher", 2021, §A1.1): heavily repetitive documents
  * (boilerplate, keyword stuffing, scraper loops) are poor training
  * data, and the cheap detector is "what fraction of the document is
  * its own most frequent n-gram / how few distinct tokens does it
  * use".
  *
  * Scale shape: the bigram histogram is explode → partial-agg on
  * (doc_id, gram) — map-side combine collapses each document's grams
  * before the exchange, so the shuffle carries at most one row per
  * distinct (doc, gram), and the per-doc top-1 is a bounded window over
  * that. Everything stays in whole-stage codegen (no higher-order
  * lambdas on the hot path).
  */
object TextQuality {

  /** Per-document repetition metrics:
    * n_tokens, n_distinct (tokens), distinct_ratio,
    * top_bigram (lexicographically-first among the most frequent),
    * top_bigram_n, top_bigram_frac (count / total bigrams).
    * Documents with < 2 tokens get no bigram row (inner join drops
    * them) — callers filtering junk want them gone anyway. */
  def repetitionMetrics(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("__toks"))
    // the >= 2 guard matters: sequence(1, size-1) on a 1-token doc is
    // the DESCENDING [1, 0], and ANSI-mode element_at throws on index 0
    val base = toks.select(col(idCol),
      size(col("__toks")).cast("bigint").as("n_tokens"),
      size(array_distinct(col("__toks"))).cast("bigint").as("n_distinct"),
      col("__toks"))
      .filter(col("n_tokens") >= 2)
    // adjacent-pair bigrams, exploded while the array is still in hand
    val grams = base
      .select(col(idCol), col("n_tokens"), col("n_distinct"),
        explode(expr(
          "transform(sequence(1, size(__toks) - 1), " +
            "i -> concat(element_at(__toks, i), ' ', element_at(__toks, i + 1)))"))
          .as("gram"))
      .groupBy(col(idCol), col("n_tokens"), col("n_distinct"), col("gram"))
      .agg(count(lit(1)).as("gram_n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("gram_n").desc, col("gram"))
    grams
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col(idCol), col("n_tokens"), col("n_distinct"),
        round(col("n_distinct").cast("double") / col("n_tokens"), 4)
          .as("distinct_ratio"),
        col("gram").as("top_bigram"),
        col("gram_n").cast("bigint").as("top_bigram_n"),
        round(col("gram_n").cast("double") / (col("n_tokens") - 1), 4)
          .as("top_bigram_frac"))
      .orderBy(col(idCol))
  }
}
