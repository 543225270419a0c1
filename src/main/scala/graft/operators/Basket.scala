package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket affinity over co-ordered parts: association-rule
  * strength (support / confidence / lift — Agrawal et al., SIGMOD'93)
  * plus the Adamic–Adar common-neighbor score (Adamic & Adar 2003)
  * with orders as the shared neighbors, the standard link-prediction
  * weighting that discounts promiscuous baskets by 1/ln(basket size).
  * The reference's mart layer stops at per-store rollups
  * (fct_daily_store_metrics.sql); which products CO-OCCUR is the next
  * question a merchandiser asks of the same fact table.
  *
  * Scale shape: the pair generation is a self-join ON THE ORDER KEY,
  * so the blowup is Σ size(order)² — bounded by the max basket size
  * (TPC-H ≤ 7 lineitems), never corpus-quadratic. One distinct
  * shuffle, one pair-group shuffle, two joins against the
  * part-frequency table (AQE picks broadcast when the part dimension
  * fits), and a global top-k on the filtered pair set. */
object Basket {

  /** Top part pairs by lift: `(part_a, part_b, n_both, n_a, n_b,
    * support, confidence, lift, adamic_adar)`, pairs appearing in at
    * least `minBoth` orders, ties broken by the pair key. */
  def partAffinity(lineitem: DataFrame, minBoth: Long = 3L,
      topK: Int = 50): DataFrame = {
    val items = lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val orderSize = items.groupBy("ok")
      .agg(count(lit(1)).as("__sz"))
    val partN = items.groupBy("pk").agg(count(lit(1)).as("__n"))
    val total = items.agg(countDistinct(col("ok")).as("__N"))
    val a = items.select(col("ok"), col("pk").as("part_a"))
    val b = items.select(col("ok"), col("pk").as("part_b"))
    val pairs = a.join(b, "ok")
      .where(col("part_a") < col("part_b"))
      .join(orderSize, "ok")
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("n_both"),
        sum(lit(1.0) / log(col("__sz").cast("double"))).as("__aa"))
      .where(col("n_both") >= minBoth)
    pairs
      .join(partN.withColumnRenamed("pk", "part_a")
        .withColumnRenamed("__n", "n_a"), "part_a")
      .join(partN.withColumnRenamed("pk", "part_b")
        .withColumnRenamed("__n", "n_b"), "part_b")
      .crossJoin(broadcast(total))   // 1-row stat factor
      .select(col("part_a"), col("part_b"), col("n_both"),
        col("n_a"), col("n_b"),
        round(col("n_both").cast("double") / col("__N"), 6)
          .as("support"),
        round(col("n_both").cast("double") / col("n_a"), 6)
          .as("confidence"),
        round(col("n_both").cast("double") * col("__N") /
          (col("n_a") * col("n_b")), 6).as("lift"),
        round(col("__aa"), 6).as("adamic_adar"))
      .orderBy(col("lift").desc, col("part_a"), col("part_b"))
      .limit(topK)
  }

  /** DuckDB oracle for [[partAffinity]] (defaults). */
  val partAffinityOracleSql: String =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |  FROM lineitem),
      |osz AS (SELECT ok, COUNT(*) AS sz FROM items GROUP BY 1),
      |pn AS (SELECT pk, COUNT(*) AS n FROM items GROUP BY 1),
      |tot AS (SELECT COUNT(DISTINCT ok) AS nn FROM items),
      |pairs AS (
      |  SELECT a.pk AS part_a, b.pk AS part_b,
      |    COUNT(*) AS n_both,
      |    SUM(1.0 / ln(CAST(osz.sz AS DOUBLE))) AS aa
      |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      |  JOIN osz ON osz.ok = a.ok
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 3)
      |SELECT part_a, part_b, n_both, na.n AS n_a, nb.n AS n_b,
      |  ROUND(CAST(n_both AS DOUBLE) / tot.nn, 6) AS support,
      |  ROUND(CAST(n_both AS DOUBLE) / na.n, 6) AS confidence,
      |  ROUND(CAST(n_both AS DOUBLE) * tot.nn / (na.n * nb.n), 6)
      |    AS lift,
      |  ROUND(aa, 6) AS adamic_adar
      |FROM pairs
      |JOIN pn na ON na.pk = part_a
      |JOIN pn nb ON nb.pk = part_b, tot
      |ORDER BY lift DESC, part_a, part_b LIMIT 50""".stripMargin
}
