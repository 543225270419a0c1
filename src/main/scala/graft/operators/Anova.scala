package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-dimension one-way ANOVA over a labeled embedding column — the
  * class-separability audit: before training on (or stratifying by) a
  * label, measure how much of each embedding dimension's variance the
  * label actually explains. F = MSB/MSW (Fisher 1925) ranks
  * dimensions; η² = SSB/SST is the effect size ("this dimension is 0.3
  * label, 0.7 noise"). Near-zero F across all dimensions means the
  * label is not linearly visible in this space — fix the embedding
  * before tuning the classifier ([[graft.operators.QualityModel]]'s
  * upstream sanity check).
  *
  * Scale shape: one explode to (label, dim, x) with map-side partial
  * aggregation into |labels|·d groups, then a dim-keyed reduction of
  * that class-cardinality table. No windows, no joins against the
  * corpus, driver sees nothing. */
object Anova {

  /** `(dim, n, k, f_stat, eta_sq)` per embedding dimension (1-based),
    * ordered by dim. Degenerate dimensions (zero within-class
    * variance) pin F to NULL rather than ∞ — mirrored in the
    * oracle. */
  def classSeparation(emb: DataFrame, vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val perClass = emb
      .select(col(labelCol).as("__g"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .withColumn("x", col("x").cast("double"))
      .groupBy("__g", "dim")
      .agg(count(lit(1)).as("n_g"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"))
    // per-dim reduction over the class-cardinality table:
    // SST = Σx² − N·μ², SSW = Σ_g (Σx²_g − n_g·μ_g²), SSB = SST − SSW
    perClass
      .groupBy("dim")
      .agg(
        sum("n_g").as("n"),
        count(lit(1)).as("k"),
        sum("sxx").as("__sxx"),
        sum("sx").as("__sx"),
        sum(col("sxx") - col("sx") * col("sx") / col("n_g")).as("__ssw"))
      .withColumn("__sst",
        col("__sxx") - col("__sx") * col("__sx") / col("n"))
      .withColumn("__ssb", col("__sst") - col("__ssw"))
      .select(
        (col("dim") + 1).cast("bigint").as("dim"),
        col("n").cast("bigint").as("n"),
        col("k").cast("bigint").as("k"),
        round(when(col("__ssw") > 0.0,
          (col("__ssb") / (col("k") - 1)) /
            (col("__ssw") / (col("n") - col("k"))))
          .otherwise(lit(null).cast("double")), 6).as("f_stat"),
        round(when(col("__sst") > 0.0, col("__ssb") / col("__sst"))
          .otherwise(lit(null).cast("double")), 6).as("eta_sq"))
      .orderBy("dim")
  }

  /** DuckDB oracle for [[classSeparation]] on the embeddings table. */
  val classSeparationOracleSql: String =
    """WITH e AS (
      |  SELECT label AS g, generate_subscripts(embedding, 1) AS dim,
      |    CAST(UNNEST(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |pc AS (
      |  SELECT g, dim, COUNT(*) AS n_g, SUM(x) AS sx,
      |    SUM(x * x) AS sxx
      |  FROM e GROUP BY 1, 2),
      |agg AS (
      |  SELECT dim, SUM(n_g) AS n, COUNT(*) AS k,
      |    SUM(sxx) AS sxx, SUM(sx) AS sx,
      |    SUM(sxx - sx * sx / n_g) AS ssw
      |  FROM pc GROUP BY 1)
      |SELECT CAST(dim AS BIGINT) AS dim, CAST(n AS BIGINT) AS n,
      |  CAST(k AS BIGINT) AS k,
      |  ROUND(CASE WHEN ssw > 0 THEN
      |    ((sxx - sx * sx / n - ssw) / (k - 1)) / (ssw / (n - k))
      |    ELSE NULL END, 6) AS f_stat,
      |  ROUND(CASE WHEN (sxx - sx * sx / n) > 0 THEN
      |    (sxx - sx * sx / n - ssw) / (sxx - sx * sx / n)
      |    ELSE NULL END, 6) AS eta_sq
      |FROM agg ORDER BY dim""".stripMargin
}
