package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Data Selection via Importance Resampling (DSIR, Xie et al.,
  * NeurIPS 2023): score every corpus document by how much more likely
  * its hashed-token distribution is under a TARGET distribution
  * (a trusted high-quality slice) than under the raw corpus, then
  * keep the top-k. This is the principled replacement for binary
  * quality classifiers when the goal is "make the 100 TB crawl look
  * like the 10 GB trusted set".
  *
  * log-importance of document D with bucket counts c_b:
  *   w(D) = Σ_b c_b · ( ln p_target(b) − ln p_corpus(b) )
  * with add-α smoothing over `numBuckets` hashed feature buckets.
  *
  * Scale shape:
  *   - Feature extraction is map-side (tokenize → md5-bucket → local
  *     count); the only event-sized shuffle is the per-(doc, bucket)
  *     aggregation.
  *   - Both distributions are bucket-sized aggregates (≤ numBuckets
  *     rows); the log-ratio table is BROADCAST into the per-doc
  *     scoring join, so scoring is one more shuffle of the
  *     (doc, bucket) table, never a corpus × corpus comparison.
  *   - Selection avoids a global sort: the k-th largest (rounded)
  *     weight is a k-row bounded top-k, broadcast back as a 1-row
  *     threshold.
  *
  * Buckets use the first 6 hex chars of md5 — deterministic and
  * engine-portable (same value computable in DuckDB), unlike
  * xxhash64/murmur which differ across engines.
  */
object ImportanceResampling {

  /** `(idCol, b, c)` hashed-token bucket counts per document. */
  private[operators] def docBuckets(docs: DataFrame, numBuckets: Int,
      idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("__tok"))
      .filter(col("__tok") =!= "")
      .select(col(idCol),
        (expr("CAST(conv(substring(md5(__tok), 1, 6), 16, 10) AS BIGINT)")
          % numBuckets).as("b"))
      .groupBy(col(idCol), col("b"))
      .agg(count(lit(1)).as("c"))

  /** Per-document log-importance weights of `corpus` toward `target`,
    * plus a `selected` flag for the top-`k` (rounded-weight threshold,
    * ties inclusive). Returns `(idCol, li_weight, selected)` for every
    * corpus document — token-less docs weigh 0. */
  def selectTopK(corpus: DataFrame, target: DataFrame, k: Int,
      numBuckets: Int = 4096, alpha: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // NOTE: an r14o1 persist of cb (and of scored below) regressed the
    // close bench 0.70x (q153) — reverted; the tokenize+hash pass
    // replays rather than paying the cache round-trip
    val cb = docBuckets(corpus, numBuckets, idCol, textCol)
    val tb = docBuckets(target, numBuckets, idCol, textCol)

    val cs = cb.groupBy("b").agg(sum("c").as("cs"))
    val ct = tb.groupBy("b").agg(sum("c").as("ct"))
    val totals = cs.agg(sum("cs").as("s")).crossJoin(
      ct.agg(sum("ct").as("t")))

    // log-ratio per bucket OBSERVED IN THE CORPUS (a per-doc join can
    // only ever ask for those); unobserved-in-target buckets smooth to α
    val lr = cs.join(ct, Seq("b"), "left_outer")
      .crossJoin(broadcast(totals))
      .select(col("b"),
        (log((coalesce(col("ct"), lit(0L)) + lit(alpha)) /
             (col("t") + lit(alpha * numBuckets))) -
         log((col("cs") + lit(alpha)) /
             (col("s") + lit(alpha * numBuckets)))).as("lr"))

    val w = cb.join(broadcast(lr), "b")
      .groupBy(col(idCol))
      .agg(round(sum(col("c") * col("lr")), 6).as("li_weight"))

    val scored = corpus.select(col(idCol))
      .join(w, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("li_weight"), lit(0.0)).as("li_weight"))

    // k-th largest ROUNDED weight: bounded k-row collect shape, no
    // global row_number; comparing rounded-to-rounded keeps the flag
    // engine-stable at the threshold
    val thr = scored.select(col("li_weight"))
      .orderBy(col("li_weight").desc)
      .limit(k)
      .agg(min(col("li_weight")).as("__thr"))

    scored.crossJoin(broadcast(thr))
      .select(col(idCol), col("li_weight"),
        (col("li_weight") >= col("__thr")).as("selected"))
      .orderBy(col(idCol))
  }

  /** The registered query: select the 500 most target-like documents
    * where the target distribution is the corpus' own English slice —
    * "make the mixed-language crawl look like the English set". */
  def englishTopK(docs: DataFrame, k: Int = 500): DataFrame =
    selectTopK(docs, docs.filter(col("lang") === "en"), k)
}
