package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation over the embedding corpus: per-query
  * Precision@k, MRR, and nDCG@k of the exact cosine ranking, with
  * same-label membership as graded-binary relevance (the standard
  * label-as-relevance protocol when no judgment set exists; metrics
  * per Järvelin & Kekäläinen TOIS '02 for nDCG, Voorhees TREC-8 for
  * MRR). This is the quality harness the ANN tiers
  * ([[Similarity]], [[ProductQuantization]], [[RandomProjection]])
  * are tuned against: recall says "did the approximation keep the
  * exact neighborhood"; THIS says whether that neighborhood was any
  * good to begin with.
  *
  * Determinism/oracle contract: the ranking is the q20 convention —
  * cosine rounded to 6 BEFORE ranking, ties to the lower neighbor id
  * — so engine and DuckDB rank identically. The iDCG denominators
  * are shared literal constants generated from one Scala table
  * (identical literals parse to identical doubles in both engines).
  *
  * Scale shape: the exact ranking is the bounded eval harness
  * (broadcast query set × corpus — q20/q22's deliberate shape);
  * label joins broadcast label-table-sized frames; per-query metric
  * aggregation is k rows per query. At 100 TB the same metrics run
  * unchanged over any ANN tier's output instead of the brute
  * ranking. */
object RetrievalEval {

  /** Cumulative ideal DCG at ranks 1..10: Σ_{i≤r} 1/log2(i+1),
    * rendered once and embedded as literals in BOTH engines. */
  private val idcgTable: Seq[Double] =
    (1 to 10).scanLeft(0.0)((acc, i) =>
      acc + 1.0 / (math.log(i + 1.0) / math.log(2.0))).tail

  /** Per-query metrics of the exact cosine top-`k` ranking:
    * `(query_id, label, n_rel, p_at_k, mrr, ndcg)`. `n_rel` is the
    * corpus count of same-label vectors (the query excluded) —
    * nDCG's ideal normalizes by `min(n_rel, k)`. */
  def bruteMetrics(emb: DataFrame, nQueries: Int = 20,
      k: Int = 10): DataFrame = {
    require(k <= 10, "idcg table is materialized through rank 10")
    val queries = emb.filter(col("vec_id") < nQueries)
    val ranked = Similarity.bruteForceTopK(emb, queries, k)
    val qLabels = queries.select(col("vec_id").as("query_id"),
      col("label").as("__ql"))
    val nLabels = emb.select(col("vec_id").as("neighbor_id"),
      col("label").as("__nl"))
    val labelCounts = emb.groupBy(col("label").as("__ql"))
      .agg(count(lit(1)).as("__lc"))

    val idcgArr = array(idcgTable.map(lit): _*)
    ranked
      .join(broadcast(qLabels), "query_id")
      .join(broadcast(nLabels), "neighbor_id")
      .withColumn("__rel",
        when(col("__ql") === col("__nl"), 1.0).otherwise(0.0))
      .groupBy(col("query_id"), col("__ql"))
      .agg(
        round(sum(col("__rel")) / k, 6).as("p_at_k"),
        round(coalesce(
          lit(1.0) / min(when(col("__rel") === 1.0, col("rank"))),
          lit(0.0)), 6).as("mrr"),
        sum(col("__rel") / log2(col("rank") + 1)).as("__dcg"))
      .join(broadcast(labelCounts), "__ql")
      .withColumn("n_rel", greatest(col("__lc") - 1, lit(0L)))
      .withColumn("ndcg",
        when(col("n_rel") === 0, 0.0).otherwise(round(
          col("__dcg") /
            element_at(idcgArr, least(col("n_rel"), lit(k.toLong))
              .cast("int")), 6)))
      .select(col("query_id"), col("__ql").as("label"), col("n_rel"),
        col("p_at_k"), col("mrr"), col("ndcg"))
      .orderBy("query_id")
  }

  /** DuckDB oracle for [[bruteMetrics]] — same rounded-rank
    * convention as q20, same idcg literals. */
  def oracleSql(nQueries: Int = 20, k: Int = 10): String = {
    val idcgList = idcgTable.mkString("[", ", ", "]")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
       |  FROM embeddings),
       |r AS (
       |  SELECT q.vec_id AS query_id, q.label AS ql, c.label AS nl,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY ROUND(list_cosine_similarity(q.v, c.v), 6) DESC,
       |        c.vec_id) AS rank
       |  FROM e q JOIN e c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < $nQueries),
       |t AS (SELECT * FROM r WHERE rank <= $k),
       |lc AS (SELECT label, COUNT(*) AS n FROM e GROUP BY label),
       |m AS (
       |  SELECT query_id, ql,
       |    ROUND(SUM(CASE WHEN ql = nl THEN 1.0 ELSE 0.0 END) / $k, 6)
       |      AS p_at_k,
       |    ROUND(COALESCE(1.0 / MIN(CASE WHEN ql = nl THEN rank END),
       |      0.0), 6) AS mrr,
       |    SUM(CASE WHEN ql = nl THEN 1.0 ELSE 0.0 END
       |        / LOG2(rank + 1)) AS dcg
       |  FROM t GROUP BY query_id, ql)
       |SELECT m.query_id, m.ql AS label,
       |  CAST(GREATEST(lc.n - 1, 0) AS BIGINT) AS n_rel,
       |  m.p_at_k, m.mrr,
       |  CASE WHEN lc.n - 1 <= 0 THEN 0.0 ELSE ROUND(m.dcg /
       |    list_extract($idcgList,
       |      CAST(LEAST(lc.n - 1, $k) AS INTEGER)), 6) END AS ndcg
       |FROM m JOIN lc ON m.ql = lc.label
       |ORDER BY m.query_id""".stripMargin
  }
}
