package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ProjectVector

/** Johnson–Lindenstrauss dimensionality reduction for the embedding
  * tier: project `array<float>` vectors through a seeded ±1
  * (Rademacher) matrix scaled by 1/√k — "database-friendly random
  * projections" (Achlioptas, JCSS 2003; JL lemma, 1984). Distances
  * and inner products are preserved in expectation, so any of the
  * ANN operators ([[Similarity]], [[ProductQuantization]],
  * [[VectorIndex]]) can run over k ≪ d dims: at 100 TB the win is
  * direct — a 64→16 reduction cuts every downstream vector shuffle,
  * cache working set, and distance loop by 4×, for one map-only
  * codegen'd pass ([[graft.functions.ProjectVector]], zero shuffle,
  * matrix rides with the plan).
  *
  * Unlike [[graft.functions.HyperplaneSignatureExpression]] (sign
  * LSH → bit signatures for BUCKETING), this keeps continuous
  * reduced vectors usable for actual distance math — the two compose:
  * project first, bucket the projections after.
  *
  * The matrix is derived from `scala.util.Random(seed)` — the
  * JDK-specified LCG, identical on every JVM — so executors, reruns,
  * and incremental batches all project identically; that determinism
  * is what makes a persisted reduced-vector index valid across
  * ingests. [[recallEval]] is the bounded quality probe (the q20/q22
  * exact-baseline pattern): exact cosine top-k vs projected-space
  * top-k over a capped query set, one recall row per query. */
object RandomProjection {

  /** Seeded k×d Rademacher (±1) matrix. */
  def rademacherMatrix(dim: Int, k: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(k)(Array.fill(dim)(if (rnd.nextBoolean()) 1.0f else -1.0f))
  }

  /** Adds `projCol` = the k-dim JL projection of `vecCol`. */
  def project(df: DataFrame, dim: Int, k: Int, seed: Long = 42L,
      vecCol: String = "embedding", projCol: String = "proj"): DataFrame =
    df.withColumn(projCol,
      ProjectVector.projectVector(col(vecCol), rademacherMatrix(dim, k, seed)))

  /** Per-query recall@k of projected-space search vs exact search:
    * `(query_id, recall)` over the first `nQueries` vectors, ordered
    * by query. Both sides use the same deterministic tie rule
    * (cos desc, id asc). The exact baseline is the capped
    * brute-force harness — the ANN tiers are the scale path. */
  def recallEval(emb: DataFrame, dim: Int = 64, k: Int = 16,
      topK: Int = 10, nQueries: Int = 20, seed: Long = 42L): DataFrame = {
    val queries = emb.filter(col("vec_id") < nQueries)

    val exact = Similarity.bruteForceTopK(emb, queries, topK)
      .select(col("query_id"), col("neighbor_id"))

    val projected = project(emb, dim, k, seed)
      .select(col("vec_id"), col("proj").as("embedding"))
    val projQueries = projected.filter(col("vec_id") < nQueries)
    val approx = Similarity.bruteForceTopK(projected, projQueries, topK)
      .select(col("query_id"), col("neighbor_id").as("approx_id"))

    exact.join(approx,
        exact("query_id") === approx("query_id") &&
          exact("neighbor_id") === approx("approx_id"), "left")
      .groupBy(exact("query_id"))
      .agg(round(count(col("approx_id")).cast("double") / topK, 4)
        .as("recall"))
      .orderBy("query_id")
  }
}
