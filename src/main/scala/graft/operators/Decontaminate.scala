package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Benchmark decontamination: flag training documents that share any
  * token n-gram with a held-out evaluation set, so eval questions don't
  * leak into the training mix (the standard n-gram-overlap protocol —
  * e.g. Brown et al., "Language Models are Few-Shot Learners", 2020,
  * §C use 13-gram matching; the n is a parameter here).
  *
  * Scale shape: the corpus side is explode-to-distinct-grams (map-side
  * combine collapses within-doc repeats before any exchange); the
  * benchmark side — tiny by construction, eval suites are MBs against a
  * 100 TB corpus — is collapsed to its distinct gram set and BROADCAST,
  * so the overlap test is a broadcast semi-ish join with no shuffle of
  * the corpus grams at all. The only wide operation is the final
  * per-doc count aggregate, keyed on doc_id.
  */
object Decontaminate {

  /** (id, gram) pairs: every `n`-token window of `textCol`, joined
    * back to a space-separated string. NOT deduplicated — within-doc
    * repeats survive so callers choose where dedup happens (the corpus
    * side must NOT pay a corpus-wide distinct shuffle; see [[overlap]]). */
  private def docGrams(docs: DataFrame, n: Int, idCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      // drop sub-n docs BEFORE sequence(): start > stop would generate
      // a descending index range, not an empty one
      .filter(size(col("__toks")) >= n)
      .select(col(idCol),
        explode(expr(
          s"transform(sequence(1, size(__toks) - ${n - 1}), " +
            s"i -> array_join(slice(__toks, i, $n), ' '))")).as("gram"))

  /** Contaminated corpus docs: for each corpus document sharing at
    * least one `n`-gram with any benchmark document, report how many
    * distinct grams overlap and how many benchmark docs are hit.
    * Requires every corpus/benchmark doc to have >= n tokens to
    * contribute grams (shorter docs can't match and are clean). */
  def overlap(corpus: DataFrame, benchmark: DataFrame, n: Int = 5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(n >= 1, "n-gram order must be >= 1")
    // Corpus grams stay UN-deduplicated: a corpus-wide distinct would
    // shuffle every gram of every document, whereas the broadcast join
    // filters down to benchmark matches first (tiny by construction) —
    // countDistinct in the final agg absorbs within-doc repeats there.
    val corpusGrams = docGrams(corpus, n, idCol, textCol)
    val benchGrams = docGrams(benchmark, n, idCol, textCol)
      .withColumnRenamed(idCol, "bench_id")
      .distinct()
    corpusGrams
      .join(broadcast(benchGrams), "gram")
      .groupBy(col(idCol))
      .agg(
        countDistinct(col("gram")).as("n_shared_grams"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
      .orderBy(col(idCol))
  }
}
