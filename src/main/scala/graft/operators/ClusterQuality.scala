package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
      labelCol: String): (DataFrame, DataFrame, DataFrame) = {
    // NOTE: r14o1 persisted pts and mu here; the close bench regressed
    // 0.77x/0.67x (q317/q318) — caching the exploded point table cost
    // more than replaying the explode/mean branches. Reverted.
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
    (dist, mu, pts)
  }

  /** Simplified silhouette per label: `(label, n, mean_a, mean_b,
    * silhouette)` with a = distance to the OWN centroid, b = distance
    * to the nearest OTHER centroid, s = (b−a)/max(a,b). */
  def silhouette(emb: DataFrame, vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val (dist, _, _) = distances(emb, vecCol, labelCol)
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
    val (dist, mu, pts0) = distances(emb, vecCol, labelCol)
    val own = dist.where(col("g") === col("g0"))
    // k-row table read by three branches; the r14o1 persist regressed
    // the close bench (q318 0.67x) — reverted
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
    val pts = pts0.select(col("id"), col("d"), col("x"))   // cached above
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

  /** Partition agreement: adjusted Rand index (Hubert & Arabie,
    * J. Classif. 1985), Fowlkes–Mallows (JASA 1983) and the raw Rand
    * index between two labelings of the same rows — "do two
    * partitionings of the corpus tell the same story", the
    * external-validity companion to [[silhouette]]'s internal
    * geometry. All three are pair-counting measures computed in
    * CLOSED FORM from the contingency table: TP = Σᵢⱼ C(nᵢⱼ,2),
    * row/column comb sums a, b, and C(n,2) — never a row-pair join.
    * ARI is the chance-corrected one (0 expected under independent
    * labelings, 1 iff identical partitions).
    *
    * Scale shape: one grouped count to the |A|×|B| contingency, two
    * marginal reductions, a scalar combine. One row `(n, k_a, k_b,
    * rand, ari, fowlkes_mallows)`; ARI NULL when the chance
    * correction degenerates (either side a single cluster). */
  def partitionAgreement(df: DataFrame, labelA: Column,
      labelB: Column): DataFrame = {
    val pairs = df.select(labelA.as("__a"), labelB.as("__b"))
      .where(col("__a").isNotNull && col("__b").isNotNull)
    val cells = pairs.groupBy("__a", "__b")
      .agg(count(lit(1)).as("__nij"))
    def comb(c: Column): Column =
      c.cast("double") * (c.cast("double") - 1.0) / 2.0
    val tp = cells.agg(
      sum("__nij").as("__n"),
      countDistinct("__a").as("__ka"),
      countDistinct("__b").as("__kb"),
      sum(comb(col("__nij"))).as("__tp"))
    val am = cells.groupBy("__a").agg(sum("__nij").as("__ai"))
      .agg(sum(comb(col("__ai"))).as("__acomb"))
    val bm = cells.groupBy("__b").agg(sum("__nij").as("__bj"))
      .agg(sum(comb(col("__bj"))).as("__bcomb"))
    val j = tp.crossJoin(broadcast(am)).crossJoin(broadcast(bm))
    val nD = col("__n").cast("double")
    val total = nD * (nD - 1.0) / 2.0
    val exp = col("__acomb") * col("__bcomb") / total
    val ariDen = (col("__acomb") + col("__bcomb")) / 2.0 - exp
    j.select(
      col("__n").cast("bigint").as("n"),
      col("__ka").cast("bigint").as("k_a"),
      col("__kb").cast("bigint").as("k_b"),
      round((total + col("__tp") * 2.0 - col("__acomb") -
        col("__bcomb")) / total, 6).as("rand"),
      round(when(abs(ariDen) > 1e-12,
        (col("__tp") - exp) / ariDen), 6).as("ari"),
      round(when(col("__acomb") * col("__bcomb") > 0.0,
        col("__tp") / sqrt(col("__acomb") * col("__bcomb"))), 6)
        .as("fowlkes_mallows"))
  }

  /** DuckDB oracle for the q411 registration: documents `lang`
    * (clustering A) vs `source` (clustering B). */
  val partitionAgreementOracleSql: String =
    """WITH cells AS (
      |  SELECT lang AS a, source AS b, COUNT(*) AS nij
      |  FROM documents
      |  WHERE lang IS NOT NULL AND source IS NOT NULL
      |  GROUP BY 1, 2),
      |tp AS (
      |  SELECT CAST(SUM(nij) AS DOUBLE) AS n,
      |    COUNT(DISTINCT a) AS ka, COUNT(DISTINCT b) AS kb,
      |    SUM(nij * (nij - 1.0) / 2.0) AS tp
      |  FROM cells),
      |am AS (
      |  SELECT SUM(ai * (ai - 1.0) / 2.0) AS acomb FROM (
      |    SELECT CAST(SUM(nij) AS DOUBLE) AS ai FROM cells
      |    GROUP BY a)),
      |bm AS (
      |  SELECT SUM(bj * (bj - 1.0) / 2.0) AS bcomb FROM (
      |    SELECT CAST(SUM(nij) AS DOUBLE) AS bj FROM cells
      |    GROUP BY b)),
      |f AS (
      |  SELECT n, ka, kb, tp, acomb, bcomb,
      |    n * (n - 1.0) / 2.0 AS total,
      |    acomb * bcomb / (n * (n - 1.0) / 2.0) AS ex
      |  FROM tp, am, bm)
      |SELECT CAST(n AS BIGINT) AS n, CAST(ka AS BIGINT) AS k_a,
      |  CAST(kb AS BIGINT) AS k_b,
      |  ROUND((total + 2.0 * tp - acomb - bcomb) / total, 6) AS rand,
      |  ROUND(CASE WHEN ABS((acomb + bcomb) / 2.0 - ex) > 1e-12
      |    THEN (tp - ex) / ((acomb + bcomb) / 2.0 - ex) END, 6)
      |    AS ari,
      |  ROUND(CASE WHEN acomb * bcomb > 0
      |    THEN tp / SQRT(acomb * bcomb) END, 6) AS fowlkes_mallows
      |FROM f""".stripMargin
}
