package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Sliding-window document chunking — the sequence-preparation step of
  * an LLM training pipeline: split each document's token stream into
  * windows of `window` tokens advancing by `stride` (overlap =
  * window − stride), the shape context-window packing and long-doc
  * splitting both consume.
  *
  * Chunk starts are every multiple of `stride` below the token count,
  * so tail chunks shorter than `window` are kept (they carry the
  * document suffix) and a doc shorter than one window yields exactly
  * one chunk.
  *
  * Scale shape: map-only — tokenize once, `sequence` + `explode` the
  * start offsets, `slice` the token array per chunk. No shuffle at
  * all until a downstream consumer groups or writes; row growth is
  * ~nt/stride per doc, the intended output amplification of chunking.
  */
object Chunking {

  /** Concat-and-split sequence packing — the GPT-style pretraining
    * layout: documents are laid end-to-end in deterministic order and
    * the token stream splits into fixed `maxTokens` windows, so docs
    * straddle window boundaries and no window carries padding.
    *
    * Packing is per-SHARD (`shard = id % shards`): a global
    * running-total window would serialize the corpus through one
    * partition, which is exactly the 100 TB anti-pattern — sharding
    * bounds every window partition while keeping the layout
    * deterministic (the production equivalent of "pack per input
    * file"). Returns each doc's (shard, seq_id, token_offset): where
    * its tokens land in the packed stream. */
  def packSequences(docs: DataFrame, maxTokens: Int = 1024, shards: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxTokens >= 1 && shards >= 1, "maxTokens and shards must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .select(col(idCol),
        (col(idCol) % shards).cast("bigint").as("shard"),
        size(TextFunctions.tokens(col(textCol))).cast("bigint").as("n_tokens"))
      .filter(col("n_tokens") >= 1)
      .withColumn("__cum", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col(idCol), col("shard"),
        (col("__cum") / maxTokens).cast("bigint").as("seq_id"),
        (col("__cum") % maxTokens).as("token_offset"),
        col("n_tokens"))
      .orderBy(idCol)
  }

  def slidingWindows(docs: DataFrame, window: Int = 32, stride: Int = 24,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window >= 1 && stride >= 1, "window and stride must be >= 1")
    val toks = docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .withColumn("__nt", size(col("__toks")))
      .filter(col("__nt") >= 1)
    toks
      .select(col(idCol), col("__toks"), col("__nt"),
        explode(sequence(lit(0), col("__nt") - 1, lit(stride))).as("token_start"))
      .select(
        col(idCol),
        (col("token_start") / stride).cast("bigint").as("chunk_idx"),
        col("token_start").cast("bigint").as("token_start"),
        least(lit(window), col("__nt") - col("token_start")).cast("bigint")
          .as("chunk_tokens"),
        concat_ws(" ",
          slice(col("__toks"), col("token_start") + 1, least(lit(window),
            col("__nt") - col("token_start")))).as("chunk_text"))
      .orderBy(col(idCol), col("chunk_idx"))
  }

  /** Padding-efficiency report for length-bucketed batching: assign
    * every document to the smallest power-of-two token bucket that
    * holds it (16 .. `maxBucket`, one overflow bucket above) and
    * aggregate the padding a fixed-shape batch of that bucket wastes.
    * This is the standard alternative to sequence packing when
    * documents must stay contiguous: the report tells you which
    * strategy the corpus shape favors.
    *
    * The bucket ladder is an explicit integer CASE chain, not
    * `ceil(log2(len))` — `log` is a libm call whose exactness at
    * power-of-two inputs is not a cross-engine guarantee, and a
    * one-ulp wobble at a bucket edge silently moves documents between
    * buckets. Map-only until the final ~10-row aggregate. */
  def lengthBuckets(docs: DataFrame, maxBucket: Int = 4096,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxBucket >= 16 && (maxBucket & (maxBucket - 1)) == 0,
      "maxBucket must be a power of two >= 16")
    val edges = Iterator.iterate(16)(_ * 2).takeWhile(_ <= maxBucket).toSeq
    val len = col("__nt")
    val bucket = edges.foldRight(lit(maxBucket * 2): org.apache.spark.sql.Column) {
      case (edge, acc) => when(len <= edge, lit(edge)).otherwise(acc)
    }
    docs
      .select(col(idCol), size(TextFunctions.tokens(col(textCol))).as("__nt"))
      .filter(len >= 1)
      .withColumn("bucket", bucket.cast("bigint"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(len).cast("bigint").as("total_tokens"),
        sum(greatest(col("bucket") - len, lit(0))).cast("bigint")
          .as("total_padding"))
      .withColumn("pad_frac",
        round(col("total_padding") /
          (col("n_docs") * col("bucket")).cast("double"), 4))
      .orderBy("bucket")
  }
}
