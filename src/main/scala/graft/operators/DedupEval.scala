package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dedup-pipeline quality harness — the text-tier analog of
  * [[RetrievalEval]]: against an exact-Jaccard ground truth on a
  * BOUNDED document slice, score the MinHash-LSH candidate stage
  * (did banding find the truly-similar pairs?) and the
  * candidates+verify pipeline (did verification keep exactly the
  * right ones?). One row per stage: pair counts,
  * precision / recall / F1.
  *
  * Why this exists as a query and not just a spec: banding
  * parameters (hashes × bands × rows, shingle k, threshold τ) trade
  * recall against candidate volume (MMDS ch. 3's S-curve), and the
  * right operating point depends on the CORPUS — this harness is the
  * measurement a pipeline owner reruns after retuning, on a sample
  * of their own data.
  *
  * Scale contract: ground truth is all-pairs exact Jaccard and is
  * therefore deliberately bounded (`maxDocId` slice — the q19/q22
  * bounded-baseline pattern); the staged pipeline under test is the
  * production one. Hash-seeded MinHash ⇒ rows-only; exactness of the
  * scoring itself is pinned in DedupEvalSpec on constructed corpora.
  */
object DedupEval {

  /** `(stage, n_truth, n_found, n_correct, precision, recall, f1)`
    * for stages `candidates` and `verified`, ordered by stage. */
  def lshQuality(docs: DataFrame, maxDocId: Long = 300L,
      threshold: Double = 0.5, k: Int = 3, numHashes: Int = 32,
      bands: Int = 8): DataFrame = {
    val slice = docs.filter(col("doc_id") < maxDocId)
      .select("doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // exact ground truth: all ordered pairs (a < b) with Jaccard ≥ τ
    val ids = slice.select(col("doc_id").as("id_a"))
    val allPairs = ids.join(slice.select(col("doc_id").as("id_b")),
      col("id_a") < col("id_b"))
    val truth = Dedup.jaccardVerify(slice, allPairs, k, threshold)
      .select("id_a", "id_b")

    val candidates = Dedup.minHashCandidates(slice, k, numHashes, bands)
      .select("id_a", "id_b")
    val verified = Dedup.jaccardVerify(slice, candidates, k, threshold)
      .select("id_a", "id_b")

    val spark = docs.sparkSession
    import spark.implicits._
    def score(stage: String, found: DataFrame) = {
      val nTruth = truth.count()
      val nFound = found.count()
      val nCorrect = found.intersect(truth).count()
      val p = if (nFound == 0) 0.0 else nCorrect.toDouble / nFound
      val r = if (nTruth == 0) 0.0 else nCorrect.toDouble / nTruth
      val f1 = if (p + r == 0.0) 0.0 else 2 * p * r / (p + r)
      (stage, nTruth, nFound, nCorrect,
        math.rint(p * 1e6) / 1e6, math.rint(r * 1e6) / 1e6,
        math.rint(f1 * 1e6) / 1e6)
    }
    val out = Seq(score("candidates", candidates),
      score("verified", verified))
      .toDF("stage", "n_truth", "n_found", "n_correct",
        "precision", "recall", "f1")
      .orderBy("stage")
    slice.unpersist()
    out
  }
}
