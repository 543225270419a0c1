package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Internal cluster-validity indices over the LABELED embedding
  * table: simplified (centroid-based) silhouette (Rousseeuw 1987 —
  * the medoid-free variant evaluated against centroids, the form
  * that scales), Davies–Bouldin (1979) and Calinski–Harabasz (1974).
  * q244 answers "which DIMENSIONS separate the classes"; these are
  * the whole-space verdict on a labeling/clustering — the numbers a
  * pipeline owner reads before trusting k-means cells (q57), IVF
  * partitions (q21) or SemDeDup buckets (q89) as semantic units.
  *
  * Scale shape: every per-point distance uses the expansion
  * ‖x−μ‖² = Σx² − 2⟨x,μ⟩ + Σμ², so the corpus-scale work is one
  * posexplode pass for Σx² and one dim-keyed join against the (k×d)
  * centroid table for the dot products — point×k×d intermediate rows,
  * LINEAR in the corpus for fixed k and d. Everything after lives on
  * k- or point-cardinality frames. */
object ClusterQuality {

  /** Per-point distance table `(id, own label g0, candidate label g,
    * dist)` — shared stage of both indices. */
  private def distances(emb: DataFrame, vecCol: String,
      labelCol: String): (DataFrame, DataFrame) = {
    val pts = emb.select(col("vec_id").as("id"),
        col(labelCol).as("g0"),
        posexplode(col(vecCol)).as(Seq("d", "x")))
      .withColumn("x", col("x").cast("double"))
    val mu = pts.groupBy(col("g0").as("g"), col("d"))
      .agg((sum("x") / count(lit(1))).as("mu"))
    val mu2 = mu.groupBy("g").agg(sum(col("mu") * col("mu")).as("mu2"))
    val ssq = pts.groupBy("id", "g0")
      .agg(sum(col("x") * col("x")).as("ssq"))
    val dots = pts.join(mu, "d")
      .groupBy("id", "g")
      .agg(sum(col("x") * col("mu")).as("dot"))
    val dist = dots.join(ssq, "id").join(mu2, "g")
      .select(col("id"), col("g0"), col("g"),
        sqrt(greatest(col("ssq") - col("dot") * 2.0 + col("mu2"),
          lit(0.0))).as("dist"))
    (dist, mu)
  }

  /** Simplified silhouette per label: `(label, n, mean_a, mean_b,
    * silhouette)` with a = distance to the OWN centroid, b = distance
    * to the nearest OTHER centroid, s = (b−a)/max(a,b). */
  def silhouette(emb: DataFrame, vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val (dist, _) = distances(emb, vecCol, labelCol)
    val perPoint = dist.groupBy("id", "g0").agg(
      sum(when(col("g") === col("g0"), col("dist"))).as("a"),
      min(when(col("g") =!= col("g0"), col("dist"))).as("b"))
    perPoint
      .withColumn("__s",
        when(greatest(col("a"), col("b")) > 0.0,
          (col("b") - col("a")) / greatest(col("a"), col("b")))
          .otherwise(0.0))
      .groupBy(col("g0").as("label"))
      .agg(count(lit(1)).as("n"),
        round(avg("a"), 6).as("mean_a"),
        round(avg("b"), 6).as("mean_b"),
        round(avg("__s"), 6).as("silhouette"))
      .orderBy("label")
  }

  /** Whole-clustering verdict: one row `(k, n, db_index,
    * calinski_harabasz)` — DB = mean over clusters of the worst
    * (sᵢ+sⱼ)/dᵢⱼ ratio (lower better), CH = (SSB/(k−1))/(SSW/(n−k))
    * (higher better), both from the same centroid geometry. */
  def daviesBouldin(emb: DataFrame, vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val (dist, mu) = distances(emb, vecCol, labelCol)
    val own = dist.where(col("g") === col("g0"))
    val sG = own.groupBy("g").agg(avg("dist").as("s"),
      count(lit(1)).as("n_g"), sum(col("dist") * col("dist")).as("ssw"))
    val muA = mu.select(col("g").as("ga"), col("d"), col("mu").as("ma"))
    val muB = mu.select(col("g").as("gb"), col("d"), col("mu").as("mb"))
    val cDist = muA.join(muB, "d")
      .where(col("ga") =!= col("gb"))
      .groupBy("ga", "gb")
      .agg(sqrt(sum((col("ma") - col("mb")) * (col("ma") - col("mb"))))
        .as("cd"))
    val r = cDist
      .join(sG.select(col("g").as("ga"), col("s").as("sa")), "ga")
      .join(sG.select(col("g").as("gb"), col("s").as("sb")), "gb")
      .groupBy("ga")
      .agg(max((col("sa") + col("sb")) / col("cd")).as("rmax"))
    val db = r.agg(avg("rmax").as("__db"), count(lit(1)).as("k"))
    // CH from the pooled scatter: SST via the global centroid
    val pts = emb.select(col("vec_id").as("id"),
        posexplode(col(vecCol)).as(Seq("d", "x")))
      .withColumn("x", col("x").cast("double"))
    val gmu = pts.groupBy("d")
      .agg((sum("x") / count(lit(1))).as("gm"))
    val sst = pts.join(gmu, "d")
      .agg(sum((col("x") - col("gm")) * (col("x") - col("gm")))
        .as("__sst"))
    val ssw = sG.agg(sum("ssw").as("__ssw"), sum("n_g").as("n"))
    db.crossJoin(broadcast(ssw))    // 1-row stat factors
      .crossJoin(broadcast(sst))
      .select(col("k"), col("n"),
        round(col("__db"), 6).as("db_index"),
        round(((col("__sst") - col("__ssw")) / (col("k") - 1)) /
          (col("__ssw") / (col("n") - col("k"))), 6)
          .as("calinski_harabasz"))
  }

  /** DuckDB oracle for [[silhouette]] on embeddings. */
  val silhouetteOracleSql: String =
    """WITH pts AS (
      |  SELECT vec_id AS id, label AS g0,
      |    generate_subscripts(embedding, 1) AS d,
      |    CAST(UNNEST(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |mu AS (
      |  SELECT g0 AS g, d, SUM(x) / COUNT(*) AS mu
      |  FROM pts GROUP BY 1, 2),
      |mu2 AS (SELECT g, SUM(mu * mu) AS mu2 FROM mu GROUP BY 1),
      |ssq AS (
      |  SELECT id, g0, SUM(x * x) AS ssq FROM pts GROUP BY 1, 2),
      |dots AS (
      |  SELECT id, g, SUM(x * mu) AS dot
      |  FROM pts JOIN mu USING (d) GROUP BY 1, 2),
      |dist AS (
      |  SELECT id, g0, g,
      |    sqrt(GREATEST(ssq - dot * 2.0 + mu2, 0.0)) AS dist
      |  FROM dots JOIN ssq USING (id) JOIN mu2 USING (g)),
      |pp AS (
      |  SELECT id, g0,
      |    SUM(CASE WHEN g = g0 THEN dist END) AS a,
      |    MIN(CASE WHEN g <> g0 THEN dist END) AS b
      |  FROM dist GROUP BY 1, 2)
      |SELECT g0 AS label, COUNT(*) AS n,
      |  ROUND(AVG(a), 6) AS mean_a,
      |  ROUND(AVG(b), 6) AS mean_b,
      |  ROUND(AVG(CASE WHEN GREATEST(a, b) > 0.0
      |    THEN (b - a) / GREATEST(a, b) ELSE 0.0 END), 6)
      |    AS silhouette
      |FROM pp GROUP BY 1 ORDER BY 1""".stripMargin

  /** DuckDB oracle for [[daviesBouldin]] on embeddings. */
  val daviesBouldinOracleSql: String =
    """WITH pts AS (
      |  SELECT vec_id AS id, label AS g0,
      |    generate_subscripts(embedding, 1) AS d,
      |    CAST(UNNEST(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |mu AS (
      |  SELECT g0 AS g, d, SUM(x) / COUNT(*) AS mu
      |  FROM pts GROUP BY 1, 2),
      |mu2 AS (SELECT g, SUM(mu * mu) AS mu2 FROM mu GROUP BY 1),
      |ssq AS (
      |  SELECT id, g0, SUM(x * x) AS ssq FROM pts GROUP BY 1, 2),
      |dots AS (
      |  SELECT id, g, SUM(x * mu) AS dot
      |  FROM pts JOIN mu USING (d) GROUP BY 1, 2),
      |dist AS (
      |  SELECT id, g0, g,
      |    sqrt(GREATEST(ssq - dot * 2.0 + mu2, 0.0)) AS dist
      |  FROM dots JOIN ssq USING (id) JOIN mu2 USING (g)),
      |sg AS (
      |  SELECT g, AVG(dist) AS s, COUNT(*) AS n_g,
      |    SUM(dist * dist) AS ssw
      |  FROM dist WHERE g = g0 GROUP BY 1),
      |cd AS (
      |  SELECT a.g AS ga, b.g AS gb,
      |    sqrt(SUM((a.mu - b.mu) * (a.mu - b.mu))) AS cd
      |  FROM mu a JOIN mu b ON a.d = b.d AND a.g <> b.g
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT ga, MAX((sa.s + sb.s) / cd) AS rmax
      |  FROM cd
      |  JOIN sg sa ON sa.g = ga
      |  JOIN sg sb ON sb.g = gb
      |  GROUP BY 1),
      |db AS (SELECT AVG(rmax) AS db, COUNT(*) AS k FROM r),
      |gmu AS (
      |  SELECT d, SUM(x) / COUNT(*) AS gm FROM pts GROUP BY 1),
      |sst AS (
      |  SELECT SUM((x - gm) * (x - gm)) AS sst
      |  FROM pts JOIN gmu USING (d)),
      |sw AS (SELECT SUM(ssw) AS ssw, SUM(n_g) AS n FROM sg)
      |SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
      |  ROUND(db, 6) AS db_index,
      |  ROUND(((sst - ssw) / (k - 1)) / (ssw / (n - k)), 6)
      |    AS calinski_harabasz
      |FROM db, sw, sst""".stripMargin
}
