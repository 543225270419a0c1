package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Keyword search over the document corpus: TF-IDF statistics and BM25
  * ranking (Robertson/Sparck Jones probabilistic relevance framework;
  * the k1/b form follows Robertson & Zaragoza, "The Probabilistic
  * Relevance Framework: BM25 and Beyond", FnTIR 2009).
  *
  * Scale shape: the corpus-wide work is ONE explode → filter to the
  * query's terms (the filter lands immediately on the generator output,
  * so the per-(doc, term) aggregate only ever sees query-term hits —
  * for a q-term query that's ≤ q rows per doc into the shuffle, not the
  * vocabulary). Document frequencies and corpus stats (N, avgdl) are
  * tiny aggregates broadcast back; the final score is a per-doc sum
  * over ≤ q matched terms. No vocabulary-sized state anywhere, so the
  * same plan runs at 100 TB: the one real shuffle is the (doc, term)
  * partial-agg, bounded by matches, and everything else is broadcast.
  */
object TextSearch {

  /** BM25 top-k: rank documents containing any of `terms`.
    * Output: (idCol, n_terms = distinct query terms matched, bm25). */
  def bm25(docs: DataFrame, terms: Seq[String], topK: Int = 20,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = docs.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("__toks"))
    // per-(doc, matched term) frequency; dl rides along via first()
    val ft = toks
      .select(col(idCol),
        size(col("__toks")).cast("double").as("dl"),
        explode(col("__toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
    // document frequency per query term (≤ |terms| rows) + corpus stats
    val dfs = ft.groupBy("term").agg(countDistinct(col(idCol)).as("df"))
    val stats = toks.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(size(col("__toks"))).as("avgdl"))
    val idf = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val termScore = idf * col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    ft.join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_terms"),
        round(sum(termScore), 4).as("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(topK)
  }

  /** Per-term TF-IDF weights for the matched terms of each document —
    * the raw statistics view (same pruned-explode shape as [[bm25]]).
    * tf_idf = tf × ln(N / df). */
  def tfIdf(docs: DataFrame, terms: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "tfIdf needs at least one query term")
    val ft = docs
      .select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfs = ft.groupBy("term").agg(countDistinct(col(idCol)).as("df"))
    val n = docs.select(count(lit(1)).cast("double").as("n_docs"))
    ft.join(broadcast(dfs), "term")
      .crossJoin(broadcast(n))
      .select(col(idCol), col("term"),
        col("tf").cast("bigint").as("tf"),
        round(col("tf") * log(col("n_docs") / col("df")), 4).as("tf_idf"))
      .orderBy(col(idCol), col("term"))
  }

  /** Hybrid retrieval by reciprocal-rank fusion (Cormack/Clarke/
    * Büttcher, SIGIR 2009): fuse a lexical BM25 ranking with a
    * semantic embedding-cosine ranking as
    * `rrf = Σ_lists 1/(kRrf + rank)`, summing only lists the doc
    * appears in. Rank-based fusion needs no score calibration between
    * the two retrievers — the reason RRF is the default hybrid in
    * production search.
    *
    * Both input rankings are bounded pools of `poolSize` (candidate
    * generation is each retriever's own top-k machinery — BM25's
    * pruned explode, cosine's broadcast top-k), so the fusion join and
    * windows touch ≤ 2·poolSize rows no matter the corpus size. Ranks
    * break ties by id on ROUNDED scores, keeping the ordering
    * engine-portable. */
  def hybridRrf(docs: DataFrame, vectors: DataFrame, terms: Seq[String],
      queryVecId: Long, kRrf: Int = 60, poolSize: Int = 100,
      topK: Int = 20, idCol: String = "doc_id",
      vecIdCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val lexPool = bm25(docs, terms, topK = poolSize, idCol = idCol)
      .withColumn("lex_rank", row_number().over(
        Window.orderBy(col("bm25").desc, col(idCol))))
      .select(col(idCol), col("lex_rank"))
    val semPool = Similarity.bruteForceTopK(
        vectors, vectors.filter(col(vecIdCol) === queryVecId), k = poolSize,
        idCol = vecIdCol, vecCol = vecCol)
      .select(col("neighbor_id").as(idCol), col("rank").as("sem_rank"))
    lexPool.join(semPool, Seq(idCol), "full_outer")
      .select(col(idCol),
        coalesce(col("lex_rank"), lit(0)).cast("bigint").as("lex_rank"),
        coalesce(col("sem_rank"), lit(0)).cast("bigint").as("sem_rank"),
        round(
          coalesce(lit(1.0) / (lit(kRrf) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("sem_rank")), lit(0.0)), 6)
          .as("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(topK)
  }
}
