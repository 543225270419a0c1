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
    // items anchors five plan branches; an r14o1 persist here REGRESSED
    // the close bench 0.83x (cache write + InMemoryTableScan read cost
    // more than replaying the scan+distinct at this size) — reverted
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

  /** Temporal evaluation of the affinity score as a LINK PREDICTOR
    * (Liben-Nowell & Kleinberg, CIKM 2003 methodology): split orders
    * at the span midpoint, score every part pair co-ordered in H1 by
    * its Adamic–Adar weight, label it by whether the pair co-occurs
    * again in H2, and report ranking quality as AUC (the q202
    * rank-formula engine). This is the honest check that q302's
    * affinity table predicts FUTURE baskets rather than describing
    * past ones.
    *
    * Scale shape: the [[partAffinity]] pair budget twice (bounded by
    * basket size), one pair-key left join for labels, then the
    * score-cardinality AUC windows; the split date is a 1-row
    * min/max stat factor. The AA score is rounded to 6 decimals
    * BEFORE the AUC grouping so both engines form identical score
    * ties. */
  def linkPredictionEval(lineitem: DataFrame,
      orders: DataFrame): DataFrame = {
    val li = lineitem
      .join(orders.select(col("o_orderkey"),
        to_date(col("o_orderdate")).as("__od")),
        col("l_orderkey") === col("o_orderkey"))
    val span = li.agg(min("__od").as("__lo"), max("__od").as("__hi"))
      .withColumn("__mid",
        date_add(col("__lo"),
          floor(datediff(col("__hi"), col("__lo")) / 2).cast("int")))
    val items = li.crossJoin(broadcast(span))   // 1-row stat factor
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"),
        (col("__od") <= col("__mid")).as("h1"))
      .distinct()
      // NOTE: an r14o1 persist of this table regressed the close bench
      // 0.80x (materialization outweighed branch-replay savings) —
      // reverted, the branches replay the scan+join+distinct instead
    def pairs(half: DataFrame) = {
      val a = half.select(col("ok"), col("pk").as("part_a"))
      val b = half.select(col("ok"), col("pk").as("part_b"))
      a.join(b, "ok").where(col("part_a") < col("part_b"))
    }
    val h1 = items.where(col("h1")).select("ok", "pk")
    val h2 = items.where(!col("h1")).select("ok", "pk")
    val h1size = h1.groupBy("ok").agg(count(lit(1)).as("__sz"))
    val scored = pairs(h1)
      .join(h1size, "ok")
      .groupBy("part_a", "part_b")
      .agg(round(sum(lit(1.0) / log(col("__sz").cast("double"))), 6)
        .as("score"))
    val future = pairs(h2).select("part_a", "part_b").distinct()
      .withColumn("__hit", lit(true))
    val labeled = scored
      .join(future, Seq("part_a", "part_b"), "left")
      .select(col("score"), coalesce(col("__hit"), lit(false))
        .as("label"))
    ClassifierEval.aucSummary(labeled, "score", "label")
  }

  /** DuckDB oracle for [[linkPredictionEval]]. */
  val linkPredictionOracleSql: String =
    """WITH li AS (
      |  SELECT l_orderkey AS ok, l_partkey AS pk,
      |    CAST(o_orderdate AS DATE) AS od
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |span AS (
      |  SELECT MIN(od) AS lo, MAX(od) AS hi FROM li),
      |mid AS (SELECT lo + CAST((hi - lo) // 2 AS INTEGER) AS m
      |  FROM span),
      |items AS (
      |  SELECT DISTINCT ok, pk, od <= (SELECT m FROM mid) AS h1
      |  FROM li),
      |h1sz AS (
      |  SELECT ok, COUNT(*) AS sz FROM items WHERE h1 GROUP BY 1),
      |scored AS (
      |  SELECT a.pk AS part_a, b.pk AS part_b,
      |    ROUND(SUM(1.0 / ln(CAST(sz AS DOUBLE))), 6) AS score
      |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      |  JOIN h1sz ON h1sz.ok = a.ok
      |  WHERE a.h1 AND b.h1 GROUP BY 1, 2),
      |future AS (
      |  SELECT DISTINCT a.pk AS part_a, b.pk AS part_b
      |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      |  WHERE NOT a.h1 AND NOT b.h1),
      |lab AS (
      |  SELECT score, f.part_a IS NOT NULL AS label
      |  FROM scored s LEFT JOIN future f
      |    ON s.part_a = f.part_a AND s.part_b = f.part_b),
      |bys AS (
      |  SELECT score,
      |    SUM(CASE WHEN label THEN 1 ELSE 0 END) AS n_pos,
      |    SUM(CASE WHEN label THEN 0 ELSE 1 END) AS n_neg
      |  FROM lab GROUP BY score),
      |acc AS (
      |  SELECT score, n_pos, n_neg,
      |    COALESCE(SUM(n_neg) OVER (ORDER BY score
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS cneg
      |  FROM bys),
      |summ AS (
      |  SELECT
      |    CAST(SUM(n_pos) AS BIGINT) AS n_pos,
      |    CAST(SUM(n_neg) AS BIGINT) AS n_neg,
      |    CAST(COUNT(*) AS BIGINT) AS n_scores,
      |    ROUND(CASE WHEN SUM(n_pos) = 0 OR SUM(n_neg) = 0 THEN 0.5
      |      ELSE SUM(n_pos * (CAST(cneg AS DOUBLE) +
      |                        CAST(n_neg AS DOUBLE) / 2.0)) /
      |           (CAST(SUM(n_pos) AS DOUBLE) *
      |            CAST(SUM(n_neg) AS DOUBLE))
      |      END, 6) AS auc
      |  FROM acc)
      |SELECT n_pos, n_neg, n_scores, auc,
      |  ROUND(auc * 2.0 - 1.0, 6) AS gini
      |FROM summ""".stripMargin

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
