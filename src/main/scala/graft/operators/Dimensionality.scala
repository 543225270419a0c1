package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{cosine, dot}

/** How many dimensions is the embedding space REALLY using? Three
  * complementary readouts a training-data pipeline checks before
  * spending index/storage budget on a vector column:
  *
  *  - participation ratio PR = (tr C)² / ‖C‖²F (Gao et al., "A
  *    theory of multineuronal dimensionality", 2017 preprint; the
  *    standard linear effective-dimension measure): how many
  *    covariance eigen-directions carry the variance — WITHOUT an
  *    eigensolve, since both traces are sums over the covariance
  *    entries themselves.
  *  - TwoNN intrinsic dimension (Facco et al., Scientific Reports
  *    2017): the MANIFOLD dimension from 1st/2nd-neighbor distance
  *    ratios μ = d₂/d₁ — Pareto-distributed with shape = ID under
  *    local uniformity, MLE = n / Σ ln μ. Linear PR high + TwoNN low
  *    = curved low-dim manifold in a big ambient space (normal for
  *    text embeddings); both low = collapsed encoder.
  *  - hubness (Radovanović et al., JMLR 2010): the skewness of the
  *    k-occurrence distribution (how often each point shows up in
  *    OTHER points' k-NN lists). High-dimensional spaces grow hubs —
  *    points that are "everyone's neighbor" — which silently poison
  *    kNN dedup/retrieval (the same few docs match everything).
  *
  * Scale shapes: PR is the [[Pca.covariance]] single-scan d²-group
  * dataflow plus a d²-row reduction; TwoNN and hubness probe a
  * BOUNDED deterministic sample against the corpus (the
  * [[EmbeddingAudit.knnLabelNoise]] broadcast shape — probe count is
  * the caller's scale knob, exactly the fitCentroids contract). */
object Dimensionality {

  /** One row `(d, trace, frob_sq, participation_ratio, pr_share)`
    * from the centered covariance upper triangle: PR = tr²/‖C‖²F,
    * pr_share = PR/d (1 = isotropic, →0 = rank-collapsed). Both
    * engines square and sum IDENTICAL 6-rounded covariance entries,
    * so parity is exact by construction (the [[EmbeddingAudit.cka]]
    * precedent). */
  def participationRatio(emb: DataFrame,
      vecCol: String = "embedding"): DataFrame = {
    val cov = Pca.covariance(emb, vecCol)
    val s = cov.agg(
      sum(when(col("i") === col("j"), col("cov"))).as("__tr"),
      sum(when(col("i") === col("j"), col("cov") * col("cov"))
        .otherwise(col("cov") * col("cov") * 2.0)).as("__fr"),
      sum(when(col("i") === col("j"), 1L).otherwise(0L)).as("__d"))
    val pr = col("__tr") * col("__tr") / col("__fr")
    s.select(
      col("__d").cast("bigint").as("d"),
      round(col("__tr"), 6).as("trace"),
      round(col("__fr"), 6).as("frob_sq"),
      round(when(col("__fr") > 0.0, pr), 6)
        .as("participation_ratio"),
      round(when(col("__fr") > 0.0, pr / col("__d")), 6)
        .as("pr_share"))
  }

  /** DuckDB oracle for [[participationRatio]] on embeddings — the
    * [[EmbeddingAudit.ckaOracleSql]] covariance CTE reduced to the
    * two trace sums. */
  val participationRatioOracleSql: String =
    """WITH e AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
      |    CAST(UNNEST(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |cov AS (
      |  SELECT a.i AS i, b.i AS j,
      |    ROUND(covar_pop(a.x, b.x), 6) AS cov
      |  FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
      |  GROUP BY 1, 2),
      |s AS (
      |  SELECT
      |    SUM(CASE WHEN i = j THEN cov END) AS tr,
      |    SUM(CASE WHEN i = j THEN cov * cov
      |        ELSE 2.0 * cov * cov END) AS fr,
      |    SUM(CASE WHEN i = j THEN 1 ELSE 0 END) AS d
      |  FROM cov)
      |SELECT CAST(d AS BIGINT) AS d,
      |  ROUND(tr, 6) AS trace,
      |  ROUND(fr, 6) AS frob_sq,
      |  ROUND(CASE WHEN fr > 0 THEN tr * tr / fr END, 6)
      |    AS participation_ratio,
      |  ROUND(CASE WHEN fr > 0 THEN tr * tr / fr / d END, 6)
      |    AS pr_share
      |FROM s""".stripMargin

  /** TwoNN intrinsic-dimension MLE over a deterministic probe sample
    * (`vec_id % probeMod = 0`): per probe, the exact 1st/2nd nearest
    * Euclidean distances (6-rounded for cross-engine rank/ratio
    * stability, ties broken by neighbor id), μ = d₂/d₁; probes with
    * d₁ = 0 (exact duplicates) are excluded — their ratio is
    * undefined, the standard TwoNN preprocessing. One row
    * `(n_probes, n_used, mean_log_mu, id_mle)` with
    * id_mle = n_used / Σ ln μ. */
  def twoNN(emb: DataFrame, probeMod: Int = 7,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // distance via the norm identity ‖q−c‖² = ‖q‖² + ‖c‖² − 2 q·c:
    // each norm is computed ONCE per row and the cross term rides the
    // native codegen dot — the elementwise (x−y)² HOF fold costs 10×
    // on the hot N×Q loop (the BPE-regex lesson). The oracle mirrors
    // the same identity with list_inner_product.
    val probes = emb.filter(pmod(col(idCol), lit(probeMod)) === 0)
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        dot(col(vecCol), col(vecCol)).as("q_nn"))
    val c = emb.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("c_vec"),
      dot(col(vecCol), col(vecCol)).as("c_nn"))
    val scored = c.join(broadcast(probes),
        col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"),
        round(sqrt(greatest(col("q_nn") + col("c_nn") -
          dot(col("q_vec"), col("c_vec")) * 2.0, lit(0.0))), 6)
          .as("dist"),
        col("neighbor_id"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("dist").asc, col("neighbor_id"))
    val top2 = scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 2)
      .groupBy("query_id")
      .agg(min(when(col("rnk") === 1, col("dist"))).as("d1"),
        min(when(col("rnk") === 2, col("dist"))).as("d2"))
    val used = top2.filter(col("d1") > 0.0)
      .select(log(col("d2") / col("d1")).as("__lnmu"))
    val nProbes = top2.agg(count(lit(1)).as("n_probes"))
    used.agg(count(lit(1)).as("n_used"),
        sum("__lnmu").as("__slm"))
      .crossJoin(nProbes)   // two 1-row stat factors
      .select(col("n_probes"), col("n_used"),
        round(col("__slm") / col("n_used"), 6).as("mean_log_mu"),
        round(when(col("__slm") > 0.0,
          col("n_used") / col("__slm")), 6).as("id_mle"))
  }

  /** DuckDB oracle for [[twoNN]] (probeMod = 7). */
  val twoNNOracleSql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
      |    list_inner_product(CAST(embedding AS DOUBLE[]),
      |      CAST(embedding AS DOUBLE[])) AS nn
      |  FROM embeddings),
      |q AS (SELECT * FROM e WHERE vec_id % 7 = 0),
      |nn AS (
      |  SELECT * FROM (
      |    SELECT query_id, dist,
      |      ROW_NUMBER() OVER (PARTITION BY query_id
      |        ORDER BY dist ASC, neighbor_id) AS rnk
      |    FROM (
      |      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |        ROUND(SQRT(GREATEST(q.nn + c.nn -
      |          2.0 * list_inner_product(q.v, c.v), 0.0)), 6) AS dist
      |      FROM q JOIN e c ON c.vec_id <> q.vec_id))
      |  WHERE rnk <= 2),
      |top2 AS (
      |  SELECT query_id,
      |    MIN(CASE WHEN rnk = 1 THEN dist END) AS d1,
      |    MIN(CASE WHEN rnk = 2 THEN dist END) AS d2
      |  FROM nn GROUP BY 1),
      |used AS (
      |  SELECT LN(d2 / d1) AS lnmu FROM top2 WHERE d1 > 0),
      |s AS (
      |  SELECT COUNT(*) AS n_used, SUM(lnmu) AS slm FROM used),
      |np AS (SELECT COUNT(*) AS n_probes FROM top2)
      |SELECT np.n_probes, s.n_used,
      |  ROUND(s.slm / s.n_used, 6) AS mean_log_mu,
      |  ROUND(CASE WHEN s.slm > 0 THEN s.n_used / s.slm END, 6)
      |    AS id_mle
      |FROM s CROSS JOIN np""".stripMargin

  /** k-occurrence hubness audit: over a deterministic query sample
    * (`vec_id % queryMod = 0`), count how often each corpus point
    * appears in a query's cosine top-k (q20/q332 tie rules), then
    * the distribution of that count over ALL points — zeros
    * included, they ARE the anti-hubs. One row `(k, n_queries,
    * n_points, mean_occ, sd_occ, skew_occ, max_occ, never_share)`;
    * skew_occ ≳ 1 is the Radovanović high-hubness regime where kNN
    * candidate lists need hub down-weighting before dedup trusts
    * them. */
  def hubness(emb: DataFrame, k: Int = 10, queryMod: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val queries = emb.filter(pmod(col(idCol), lit(queryMod)) === 0)
    val nn = Similarity.bruteForceTopK(emb, queries, k, idCol, vecCol)
    val occ = nn.groupBy("neighbor_id")
      .agg(count(lit(1)).as("__occ"))
    val all = emb.select(col(idCol).as("neighbor_id"))
      .join(occ, Seq("neighbor_id"), "left_outer")
      .select(coalesce(col("__occ"), lit(0L)).cast("double")
        .as("occ"))
    val nQ = queries.agg(count(lit(1)).as("n_queries"))
    val m = all.agg(count(lit(1)).as("__n"), avg("occ").as("__m1"),
      avg(col("occ") * col("occ")).as("__m2"),
      avg(col("occ") * col("occ") * col("occ")).as("__m3"),
      max("occ").as("__mx"))
    val mu = col("__m1")
    val v = col("__m2") - mu * mu
    val m3c = col("__m3") - mu * col("__m2") * 3.0 +
      mu * mu * mu * 2.0
    m.crossJoin(nQ)   // two 1-row stat factors
      .crossJoin(all.agg(
        sum(when(col("occ") === 0.0, 1L).otherwise(0L))
          .as("__zero")))
      .select(lit(k.toLong).as("k"), col("n_queries"),
        col("__n").cast("bigint").as("n_points"),
        round(mu, 6).as("mean_occ"),
        round(sqrt(greatest(v, lit(0.0))), 6).as("sd_occ"),
        round(when(v > 0.0, m3c / pow(v, 1.5)), 6).as("skew_occ"),
        col("__mx").cast("bigint").as("max_occ"),
        round(col("__zero").cast("double") / col("__n"), 6)
          .as("never_share"))
  }

  /** DuckDB oracle for [[hubness]] (k = 10, queryMod = 5). */
  val hubnessOracleSql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      |  FROM embeddings),
      |q AS (SELECT * FROM e WHERE vec_id % 5 = 0),
      |nn AS (
      |  SELECT * FROM (
      |    SELECT c.vec_id AS neighbor_id,
      |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |        ORDER BY ROUND(list_cosine_similarity(q.v, c.v), 6)
      |          DESC, c.vec_id) AS rnk
      |    FROM q JOIN e c ON c.vec_id <> q.vec_id)
      |  WHERE rnk <= 10),
      |occ AS (
      |  SELECT e.vec_id,
      |    CAST(COALESCE(o.c, 0) AS DOUBLE) AS occ
      |  FROM e LEFT JOIN (
      |    SELECT neighbor_id, COUNT(*) AS c FROM nn GROUP BY 1) o
      |    ON e.vec_id = o.neighbor_id),
      |m AS (
      |  SELECT COUNT(*) AS n, AVG(occ) AS m1,
      |    AVG(occ * occ) AS m2, AVG(occ * occ * occ) AS m3,
      |    MAX(occ) AS mx,
      |    SUM(CASE WHEN occ = 0 THEN 1 ELSE 0 END) AS zero
      |  FROM occ),
      |nq AS (SELECT COUNT(*) AS n_queries FROM q),
      |f AS (
      |  SELECT n, m1, mx, zero,
      |    m2 - m1 * m1 AS v,
      |    m3 - 3.0 * m1 * m2 + 2.0 * m1 * m1 * m1 AS m3c
      |  FROM m)
      |SELECT CAST(10 AS BIGINT) AS k, nq.n_queries,
      |  CAST(f.n AS BIGINT) AS n_points,
      |  ROUND(f.m1, 6) AS mean_occ,
      |  ROUND(SQRT(GREATEST(f.v, 0.0)), 6) AS sd_occ,
      |  ROUND(CASE WHEN f.v > 0 THEN f.m3c / POW(f.v, 1.5) END, 6)
      |    AS skew_occ,
      |  CAST(f.mx AS BIGINT) AS max_occ,
      |  ROUND(CAST(f.zero AS DOUBLE) / f.n, 6) AS never_share
      |FROM f CROSS JOIN nq""".stripMargin
}
