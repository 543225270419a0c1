package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosine

/** Embedding-space quality audits for contrastive/retrieval training
  * corpora — the readouts that say whether an embedding column is
  * WORTH indexing before [[Similarity]] spends a cluster on it:
  *
  *  - alignment / uniformity (Wang & Isola, ICML 2020): positives
  *    should sit close (alignment ↓), everything should spread over
  *    the hypersphere (uniformity ↓). The pair of numbers that
  *    separates "collapsed encoder" from "usable space".
  *  - linear CKA between two dimension blocks (Kornblith et al.,
  *    ICML 2019): are the halves of the vector redundant copies or
  *    complementary features? The slicing dial behind
  *    [[TruncatedRecall]].
  *  - kNN label disagreement (confident-learning-lite, Northcutt et
  *    al. JAIR 2021): labels whose neighborhoods vote against them —
  *    the label-noise shortlist.
  *
  * Scale shapes: alignment pairs join on LABEL (equi), uniformity
  * pairs join on a deterministic hash bucket (equi, 1/`buckets`
  * sample of all pairs — never the full N²); CKA is the [[Pca]]
  * centered pair-product dataflow (d²-bounded groups); label noise
  * probes a bounded sample against the corpus (the q20 broadcast
  * shape). */
object EmbeddingAudit {

  /** One row: `(n_pos_pairs, alignment, n_sample_pairs, uniformity)`.
    * alignment = E‖x̂−ŷ‖² over same-label pairs, with x̂ the
    * unit-normalized vector — on the unit sphere ‖x̂−ŷ‖² = 2−2cos,
    * so the raw-vector cosine computes it without materializing the
    * normalization; uniformity = log E exp(−2‖x̂−ŷ‖²) over all
    * pairs. BOTH expectations run over a deterministic 1/`buckets`
    * pair sample (vec_id-hash bucket equi-join — the full N², or the
    * full class², is never materialized): pair counts scale as
    * N²/buckets, so a caller holding the sampled-pair budget fixed
    * sets `buckets ∝ N` — the knob IS the scale contract, same as
    * the codebook-∝-N rule in [[Similarity.semDeDup]]. */
  def alignmentUniformity(emb: DataFrame, buckets: Int = 101,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val u = emb.select(col(idCol).as("id"), col(labelCol).as("lbl"),
      col(vecCol).as("v"))
    val bu = u.withColumn("bkt", pmod(col("id"), lit(buckets)))
    val pos = bu.as("a").join(bu.as("b"),
        col("a.lbl") === col("b.lbl") &&
          col("a.bkt") === col("b.bkt") && col("a.id") < col("b.id"))
      .select((lit(2.0) - cosine(col("a.v"), col("b.v")) * 2.0)
        .as("sq"))
      .agg(count(lit(1)).as("n_pos_pairs"),
        avg("sq").as("__align"))
    val unif = bu.as("a").join(bu.as("b"),
        col("a.bkt") === col("b.bkt") && col("a.id") < col("b.id"))
      .select((lit(2.0) - cosine(col("a.v"), col("b.v")) * 2.0)
        .as("sq"))
      .agg(count(lit(1)).as("n_sample_pairs"),
        log(avg(exp(col("sq") * -2.0))).as("__unif"))
    pos.crossJoin(unif)   // two 1-row stat factors
      .select(col("n_pos_pairs"), round(col("__align"), 6)
        .as("alignment"), col("n_sample_pairs"),
        round(col("__unif"), 6).as("uniformity"))
  }

  /** DuckDB oracle for [[alignmentUniformity]] on embeddings with the
    * default 101 buckets. */
  val alignmentUniformityOracleSql: String =
    """WITH u AS (
      |  SELECT vec_id AS id, label AS lbl,
      |    embedding AS v
      |  FROM embeddings),
      |pos AS (
      |  SELECT COUNT(*) AS n_pos_pairs,
      |    AVG(2.0 - 2.0 * list_cosine_similarity(
      |      CAST(a.v AS DOUBLE[]), CAST(b.v AS DOUBLE[]))) AS al
      |  FROM u a JOIN u b ON a.lbl = b.lbl
      |    AND a.id % 101 = b.id % 101 AND a.id < b.id),
      |unif AS (
      |  SELECT COUNT(*) AS n_sample_pairs,
      |    LN(AVG(EXP(-2.0 * (2.0 - 2.0 * list_cosine_similarity(
      |      CAST(a.v AS DOUBLE[]), CAST(b.v AS DOUBLE[])))))) AS un
      |  FROM u a JOIN u b
      |    ON a.id % 101 = b.id % 101 AND a.id < b.id)
      |SELECT pos.n_pos_pairs, ROUND(pos.al, 6) AS alignment,
      |  unif.n_sample_pairs, ROUND(unif.un, 6) AS uniformity
      |FROM pos CROSS JOIN unif""".stripMargin

  /** Linear CKA between the first `split` dimensions (X) and the rest
    * (Y) of the embedding: CKA = ‖Cxy‖²F / (‖Cxx‖F·‖Cyy‖F) over the
    * population covariance blocks. One row: `(dims_x, dims_y,
    * hsic_xy, norm_xx, norm_yy, cka)`. Built on [[Pca.covariance]]'s
    * centered, 6-rounded upper triangle — both engines square and sum
    * IDENTICAL rounded entries, so the parity is exact by
    * construction. Off-diagonal within-block entries count twice
    * (symmetry); cross-block entries appear exactly once in the
    * upper triangle. */
  def cka(emb: DataFrame, split: Int,
      vecCol: String = "embedding"): DataFrame = {
    val cov = Pca.covariance(emb, vecCol)
    val cls = cov.withColumn("blk",
      when(col("i") <= split && col("j") <= split, "xx")
        .when(col("i") > split && col("j") > split, "yy")
        .otherwise("xy"))
      .withColumn("w",
        when(col("blk") === "xy" || col("i") === col("j"), 1.0)
          .otherwise(2.0))
    val s = cls.groupBy("blk")
      .agg(sum(col("w") * col("cov") * col("cov")).as("ss"))
    val one = s.groupBy()
      .pivot("blk", Seq("xx", "xy", "yy")).agg(first("ss"))
    // dimension from one row — NOT cov.agg(max), which would replay
    // the whole covariance dataflow a second time
    val dMax = emb.select(size(col(vecCol))).head().getInt(0).toLong
    one.select(
      lit(split.toLong).as("dims_x"), lit(dMax - split).as("dims_y"),
      round(col("xy"), 6).as("hsic_xy"),
      round(sqrt(col("xx")), 6).as("norm_xx"),
      round(sqrt(col("yy")), 6).as("norm_yy"),
      round(when(col("xx") > 0.0 && col("yy") > 0.0,
        col("xy") / (sqrt(col("xx")) * sqrt(col("yy")))), 6).as("cka"))
  }

  /** DuckDB oracle for [[cka]] with split = 32 on embeddings. */
  val ckaOracleSql: String =
    """WITH e AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
      |    CAST(UNNEST(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |cov AS (
      |  SELECT a.i AS i, b.i AS j,
      |    ROUND(covar_pop(a.x, b.x), 6) AS cov
      |  FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
      |  GROUP BY 1, 2),
      |cls AS (
      |  SELECT cov,
      |    CASE WHEN i <= 32 AND j <= 32 THEN 'xx'
      |         WHEN i > 32 AND j > 32 THEN 'yy'
      |         ELSE 'xy' END AS blk,
      |    CASE WHEN (i > 32) <> (j > 32) OR i = j
      |      THEN 1.0 ELSE 2.0 END AS w
      |  FROM cov),
      |s AS (
      |  SELECT
      |    SUM(CASE WHEN blk = 'xx' THEN w * cov * cov END) AS xx,
      |    SUM(CASE WHEN blk = 'xy' THEN w * cov * cov END) AS xy,
      |    SUM(CASE WHEN blk = 'yy' THEN w * cov * cov END) AS yy
      |  FROM cls)
      |SELECT CAST(32 AS BIGINT) AS dims_x,
      |  CAST(32 AS BIGINT) AS dims_y,
      |  ROUND(xy, 6) AS hsic_xy,
      |  ROUND(sqrt(xx), 6) AS norm_xx,
      |  ROUND(sqrt(yy), 6) AS norm_yy,
      |  ROUND(CASE WHEN xx > 0 AND yy > 0
      |    THEN xy / (sqrt(xx) * sqrt(yy)) END, 6) AS cka
      |FROM s""".stripMargin

  /** kNN label-noise audit: for a deterministic probe sample
    * (`vec_id % probeMod = 0` — production passes a bounded sample,
    * the fitCentroids precedent), the fraction of each probe's k
    * nearest neighbors (cosine, q20 tie rules) that DISAGREE with its
    * label, aggregated per label: `(label, n_probes, mean_disagree,
    * max_disagree)` ordered by label. A label whose neighborhoods
    * vote against it is either noisy or not clustered — both mean
    * "don't trust it for stratification". */
  def knnLabelNoise(emb: DataFrame, k: Int = 10, probeMod: Int = 7,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val probes = emb.filter(pmod(col(idCol), lit(probeMod)) === 0)
    val nn = Similarity.bruteForceTopK(emb, probes, k, idCol, vecCol)
    val lbl = emb.select(col(idCol), col(labelCol))
    val scored = nn
      .join(lbl.select(col(idCol).as("query_id"),
        col(labelCol).as("q_lbl")), Seq("query_id"))
      .join(lbl.select(col(idCol).as("neighbor_id"),
        col(labelCol).as("n_lbl")), Seq("neighbor_id"))
      .groupBy("query_id", "q_lbl")
      .agg(avg(when(col("n_lbl") =!= col("q_lbl"), 1.0)
        .otherwise(0.0)).as("disagree"))
    scored.groupBy(col("q_lbl").as("label"))
      .agg(count(lit(1)).as("n_probes"),
        round(avg("disagree"), 6).as("mean_disagree"),
        round(max("disagree"), 6).as("max_disagree"))
      .orderBy("label")
  }

  /** DuckDB oracle for [[knnLabelNoise]] (k = 10, probeMod = 7). */
  val knnLabelNoiseOracleSql: String =
    """WITH e AS (
      |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      |  FROM embeddings),
      |q AS (SELECT * FROM e WHERE vec_id % 7 = 0),
      |nn AS (
      |  SELECT * FROM (
      |    SELECT q.vec_id AS query_id, q.label AS q_lbl,
      |      c.label AS n_lbl,
      |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |        ORDER BY ROUND(list_cosine_similarity(q.v, c.v), 6)
      |          DESC, c.vec_id) AS rnk
      |    FROM q JOIN e c ON c.vec_id <> q.vec_id)
      |  WHERE rnk <= 10),
      |per_q AS (
      |  SELECT query_id, q_lbl,
      |    AVG(CASE WHEN n_lbl <> q_lbl THEN 1.0 ELSE 0.0 END)
      |      AS disagree
      |  FROM nn GROUP BY 1, 2)
      |SELECT q_lbl AS label, COUNT(*) AS n_probes,
      |  ROUND(AVG(disagree), 6) AS mean_disagree,
      |  ROUND(MAX(disagree), 6) AS max_disagree
      |FROM per_q GROUP BY 1 ORDER BY 1""".stripMargin
}
