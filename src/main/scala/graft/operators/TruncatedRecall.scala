package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Truncated-dimension retrieval evaluation — the Matryoshka audit
  * (Kusupati et al., NeurIPS 2022): if the store keeps only the first
  * m dimensions of each embedding (the cheapest ANN speedup there
  * is — shorter vectors, same index), what recall@k survives against
  * full-dimension ground truth? The output is the m-vs-recall curve a
  * capacity planner reads before slicing a 100 TB vector corpus in
  * half.
  *
  * Scale shape: one [[Similarity.bruteForceTopK]] pass per m over the
  * same broadcast query set (|dims| passes, each the q20 baseline
  * shape — sub-linear probing composes via [[VectorIndex]] exactly as
  * it does for the full vectors); recall reduces to a (query, rank)-
  * bounded join between two k-row-per-query lists. */
object TruncatedRecall {

  /** Recall@k of first-`m`-dimension retrieval vs full-dimension
    * ground truth, per m: `(m, n_queries, n_hits, recall)` ordered by
    * m. recall = overlapping (query, neighbor) pairs / (n_queries·k)
    * — the pooled form, so a query with zero survivors still counts
    * in the denominator. The final m should equal the native
    * dimension, pinning recall = 1 as the self-check row. */
  def recallCurve(candidates: DataFrame, queries: DataFrame, k: Int,
      dims: Seq[Int], idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // the full-dim ground truth joins EVERY truncated-dim branch —
    // persist, or the heaviest brute-force pass replays once per dim
    val full = Similarity.bruteForceTopK(candidates, queries, k,
      idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nq = queries.select(col(idCol)).distinct().count()
    dims.map { m =>
      def sliced(df: DataFrame) =
        df.withColumn(vecCol, slice(col(vecCol), 1, m))
      val hits = Similarity
        .bruteForceTopK(sliced(candidates), sliced(queries), k,
          idCol, vecCol)
        .select(col("query_id"), col("neighbor_id"))
        .join(full, Seq("query_id", "neighbor_id"))
        .agg(count(lit(1)).as("n_hits"))
      hits.select(lit(m.toLong).as("m"), lit(nq).as("n_queries"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double") /
          (nq.toDouble * k), 6).as("recall"))
    }.reduce(_.unionByName(_)).orderBy("m")
  }

  /** DuckDB oracle for the q322 registration: queries `vec_id < 8`,
    * k = 10, m ∈ {8, 16, 32, 64} on the 64-dim embeddings table. */
  val recallCurveOracleSql: String =
    """WITH ms AS (SELECT UNNEST([8, 16, 32, 64]) AS m),
      |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      |  FROM embeddings),
      |q AS (SELECT * FROM e WHERE vec_id < 8),
      |full_rank AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |      ORDER BY ROUND(list_cosine_similarity(q.v, c.v), 6) DESC,
      |        c.vec_id) AS rnk
      |  FROM q JOIN e c ON c.vec_id <> q.vec_id),
      |full_top AS (
      |  SELECT query_id, neighbor_id FROM full_rank WHERE rnk <= 10),
      |trunc_rank AS (
      |  SELECT ms.m, q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    ROW_NUMBER() OVER (PARTITION BY ms.m, q.vec_id
      |      ORDER BY ROUND(list_cosine_similarity(
      |          q.v[1:ms.m], c.v[1:ms.m]), 6) DESC,
      |        c.vec_id) AS rnk
      |  FROM ms CROSS JOIN q JOIN e c ON c.vec_id <> q.vec_id),
      |trunc_top AS (
      |  SELECT m, query_id, neighbor_id
      |  FROM trunc_rank WHERE rnk <= 10),
      |hits AS (
      |  SELECT t.m, COUNT(*) AS n_hits
      |  FROM trunc_top t JOIN full_top f
      |    ON t.query_id = f.query_id
      |      AND t.neighbor_id = f.neighbor_id
      |  GROUP BY 1),
      |nq AS (SELECT COUNT(*) AS n FROM q)
      |SELECT CAST(ms.m AS BIGINT) AS m,
      |  CAST(nq.n AS BIGINT) AS n_queries,
      |  COALESCE(hits.n_hits, 0) AS n_hits,
      |  ROUND(CAST(COALESCE(hits.n_hits, 0) AS DOUBLE)
      |    / (nq.n * 10.0), 6) AS recall
      |FROM ms CROSS JOIN nq LEFT JOIN hits ON ms.m = hits.m
      |ORDER BY m""".stripMargin
}
