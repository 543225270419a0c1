package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/** Statistical language-model scoring for corpus curation: train an
  * add-k-smoothed bigram model on the corpus itself and score every
  * document by its average per-bigram negative log-probability (and
  * the corresponding perplexity). The standard "does this text look
  * like language" filter in training-data pipelines (CCNet trains a
  * small LM and buckets documents by perplexity; Gopher/RefinedWeb
  * apply the same idea) — fluent, typical text scores low, gibberish
  * and boilerplate-with-rare-tokens score high.
  *
  * Everything is exact relational algebra — no hashing, no sampling —
  * so the whole operator is DuckDB-oracleable end to end (q81).
  *
  * Scale shape at 100 TB:
  *  - bigram extraction is map-only (one `arrays_zip` over the staged
  *    token array — no explode-then-window, no per-doc shuffle);
  *  - model building is one shuffle of (w1, w2) pairs with map-side
  *    partial aggregation; unigram context counts derive from the
  *    bigram table (second, much smaller shuffle);
  *  - scoring joins doc bigrams to the model on (w1, w2). The model is
  *    vocabulary-bounded and power-law-distributed, orders of magnitude
  *    smaller than the corpus; prune it with `minCount` (rare bigrams
  *    carry no mass a smoothed model can't reconstruct) and it
  *    broadcasts, making scoring shuffle-free on the corpus side.
  */
object TextLM {

  /** Per-document LM score over `docs`: (idCol, n_bigrams, avg_nll,
    * ppl), docs with fewer than 2 tokens excluded (no bigrams to
    * score). `alpha` is the add-k smoothing mass; `minCount` drops
    * bigrams seen fewer times from the model (0 keeps all — exact);
    * smaller models trade a slightly coarser score for a broadcastable
    * join. `avg_nll` is in bits (log2); `ppl` = 2^avg_nll. */
  def perplexityScores(docs: DataFrame, alpha: Double = 0.4,
      minCount: Long = 0L, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(alpha > 0.0, "alpha must be positive (zero breaks unseen bigrams)")
    // stage tokens once (filter+project don't share subexpressions)
    val toked = docs
      .withColumn("__toks", tokens(col(textCol)))
      .filter(size(col("__toks")) >= 2)
    val bigrams = toked.select(
      col(idCol),
      explode(arrays_zip(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1).as("w1"),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1).as("w2"))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

    val bigramCounts = bigrams.groupBy("w1", "w2")
      .agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    // context count = total bigram mass per w1 (kept consistent with
    // the bigram table even when minCount prunes it: c1 sums the FULL
    // table so probabilities stay a proper distribution over w2)
    val contextCounts = bigrams.groupBy("w1")
      .agg(count(lit(1)).as("c1"))
    // vocabulary size for the smoothing denominator — a 1-row stats
    // frame cross-joined in (broadcast NLJ of one row, not a collect)
    val vocab = bigrams.select(col("w2").as("w")) // every scored token
      .unionByName(bigrams.select(col("w1").as("w")))
      .agg(countDistinct(col("w")).cast("double").as("v"))

    val scored = bigrams
      .join(bigramCounts, Seq("w1", "w2"), "left")
      .join(contextCounts, Seq("w1")) // w1 always present: same corpus
      .crossJoin(vocab)
      .select(col(idCol),
        (-log2((coalesce(col("c12"), lit(0L)).cast("double") + lit(alpha)) /
          (col("c1").cast("double") + lit(alpha) * col("v")))).as("nll"))

    scored.groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("nll")), 4).as("avg_nll"),
        round(pow(lit(2.0), avg(col("nll"))), 3).as("ppl"))
      .orderBy(idCol)
  }
}
