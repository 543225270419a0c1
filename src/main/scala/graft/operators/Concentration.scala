package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.TextFunctions

/** Token-mass concentration per corpus slice — the Gini coefficient of
  * document token counts within each source, the "is this source a
  * few giant documents or many small ones" diagnostic that sits beside
  * the mix-share reports (q82/q167/q168): two sources with the same
  * TOTAL token mass train very differently when one is 10⁶ uniform
  * pages and the other is 10² book-sized dumps (packing, dedup and
  * per-doc loss weighting all feel the skew).
  *
  * Scale shape — the textbook Gini ranks every document (corpus-wide
  * sort → single-task window, banned). Like [[ClassifierEval]]'s AUC,
  * Gini only depends on the VALUE DISTRIBUTION, so the engine
  * aggregates to the distinct-(source, n_tokens) histogram first (one
  * corpus-scale grouped agg; token counts are integers, so the
  * histogram is bounded by the longest document, not the corpus) and
  * evaluates the rank identity group-wise over that bounded table:
  * ascending ranks of a value-group with count c starting after R
  * rows contribute Σi·x = v·(c·R + c(c+1)/2), which is exact — the
  * histogram path is bit-identical to the sorted-document definition,
  * not an approximation.
  */
object Concentration {

  /** Per-group Gini over the weighted value histogram `(grp, v, c)`.
    * G = (2·Σ i·xᵢ)/(n·Σx) − (n+1)/n with i ranked ascending by v —
    * the standard population form (0 = uniform, → 1 = one doc holds
    * all mass). */
  private def giniOverHistogram(hist: DataFrame): DataFrame = {
    val w = Window.partitionBy("grp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("__r", coalesce(sum("c").over(w), lit(0L)))
      .withColumn("__si",
        col("v").cast("double") * (col("c") * col("__r") +
          col("c") * (col("c") + 1L) / lit(2.0)))
      .groupBy("grp")
      .agg(
        sum("c").as("n_docs"),
        sum(col("v") * col("c")).as("total"),
        sum("__si").as("__s"))
      .withColumn("gini",
        round(
          when(col("total") === 0, 0.0).otherwise(
            lit(2.0) * col("__s") /
              (col("n_docs").cast("double") * col("total").cast("double")) -
              (col("n_docs") + 1L).cast("double") /
                col("n_docs").cast("double")), 6))
      .drop("__s")
  }

  /** Per-source token-mass report: `(source, n_docs, total, gini)`,
    * ordered by source. */
  def tokenGiniBySource(docs: DataFrame,
      textCol: String = "text"): DataFrame = {
    val nTok = size(filter(TextFunctions.tokens(col(textCol)),
      t => t =!= "")).cast("long")
    giniOverHistogram(
      docs.select(col("source").as("grp"), nTok.as("v"))
        .groupBy("grp", "v").agg(count(lit(1)).as("c")))
      .withColumnRenamed("grp", "source")
      .orderBy("source")
  }

  /** DuckDB oracle for [[tokenGiniBySource]] — the sorted-document
    * definition directly (the oracle can afford the global sort; the
    * engine's histogram path must match it bit-for-bit). */
  val tokenGiniOracleSql: String =
    """WITH d AS (
      |  SELECT source,
      |    CAST(len(list_filter(str_split_regex(trim(text), '\s+'),
      |      x -> x <> '')) AS BIGINT) AS v
      |  FROM documents),
      |r AS (
      |  SELECT source, v,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY v) AS i
      |  FROM d)
      |SELECT source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(v) AS BIGINT) AS total,
      |  ROUND(CASE WHEN SUM(v) = 0 THEN 0.0 ELSE
      |    2.0 * SUM(CAST(v AS DOUBLE) * i) /
      |      (COUNT(*) * CAST(SUM(v) AS DOUBLE)) -
      |    CAST(COUNT(*) + 1 AS DOUBLE) / COUNT(*) END, 6) AS gini
      |FROM r GROUP BY source ORDER BY source""".stripMargin

  /** Hill tail-index estimator over the top of a value distribution
    * (Hill, Ann. Stat. 1975): α̂ = k / Σ_{i≤k} ln(x₍ᵢ₎/x₍ₖ₊₁₎) on the
    * k largest order statistics. α̂ ≲ 2 means infinite variance — a
    * revenue/latency column whose mean is a lie; the one-number
    * heavy-tail audit next to [[tokenGiniBySource]]'s inequality and
    * q212's digit test. Returns one row `(k, xmin, alpha)`.
    *
    * Scale shape: a distributed top-(k+1) (`orderBy.limit` — Spark
    * takes per-partition heads, never a global sort) then arithmetic
    * on k+1 rows. Ties at the k/k+1 boundary are value-identical, so
    * membership churn cannot move the estimate. */
  def hillTailIndex(df: DataFrame, valueCol: String,
      k: Int = 100): DataFrame = {
    val top = df.select(col(valueCol).cast("double").as("x"))
      .orderBy(desc("x")).limit(k + 1)
    val w = Window.orderBy(desc("x"))   // k+1 rows: bounded window
    val ranked = top.withColumn("__rn", row_number().over(w))
    val xmin = ranked.where(col("__rn") === k + 1)
      .select(col("x").as("__xmin"))
    ranked.where(col("__rn") <= k)
      .crossJoin(broadcast(xmin))   // 1-row stat factor
      .agg(
        count(lit(1)).as("k"),
        round(min("__xmin"), 2).as("xmin"),
        round(count(lit(1)) / sum(log(col("x") / col("__xmin"))), 6)
          .as("alpha"))
  }

  /** DuckDB oracle for [[hillTailIndex]]. */
  def hillOracleSql(table: String, valueCol: String,
      k: Int = 100): String =
    s"""WITH r AS (
       |  SELECT CAST($valueCol AS DOUBLE) AS x,
       |    ROW_NUMBER() OVER (ORDER BY $valueCol DESC) AS rn
       |  FROM $table),
       |xm AS (SELECT x AS xmin FROM r WHERE rn = ${k + 1})
       |SELECT COUNT(*) AS k, ROUND(MIN(xmin), 2) AS xmin,
       |  ROUND(COUNT(*) / SUM(ln(x / xmin)), 6) AS alpha
       |FROM r CROSS JOIN xm WHERE rn <= $k""".stripMargin

  /** Market-concentration report per segment: the Herfindahl–
    * Hirschman index (Σ shareᵢ², the antitrust standard — 1/n for
    * perfect competition, 1.0 for monopoly), its equivalent-
    * competitor count 1/HHI, and the CR-k top-k concentration ratio
    * of customer revenue within each nation. [[tokenGiniBySource]]
    * measures inequality of the whole curve; HHI/CR-k are the
    * square-weighted and top-mass summaries a revenue-risk review
    * actually quotes ("how much walks if the top 5 accounts churn").
    *
    * Scale shape: one grouped agg to the (nation, customer) grain,
    * per-nation totals as a grouped (not windowed-unpartitioned)
    * stat table joined back, and a rank window PARTITIONED by nation
    * — member-cardinality windows, never a global single-partition
    * sort. Ties on revenue at the k boundary are broken by customer
    * key so both engines pick the same k rows. */
  def revenueConcentration(orders: DataFrame, customer: DataFrame,
      nation: DataFrame, topK: Int = 5): DataFrame = {
    val cust = orders
      .join(broadcast(customer),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_custkey"))
      .agg(sum("o_totalprice").as("__rev"))
    val tot = cust.groupBy("n_name")
      .agg(sum("__rev").as("__tot"), count(lit(1)).as("n_customers"))
    val w = Window.partitionBy("n_name")
      .orderBy(desc("__rev"), col("c_custkey"))
    cust.withColumn("__rn", row_number().over(w))
      .join(tot, "n_name")
      .groupBy(col("n_name"), col("n_customers"))
      .agg(
        sum(pow(col("__rev") / col("__tot"), 2.0)).as("__hhi"),
        sum(when(col("__rn") <= topK, col("__rev") / col("__tot"))
          .otherwise(lit(0.0))).as("__crk"))
      .select(col("n_name"), col("n_customers"),
        round(col("__hhi"), 6).as("hhi"),
        round(lit(1.0) / col("__hhi"), 6).as("effective_competitors"),
        round(col("__crk"), 6).as(s"cr$topK"))
      .orderBy("n_name")
  }

  /** DuckDB oracle for [[revenueConcentration]] (topK = 5). */
  val revenueConcentrationOracleSql: String =
    """WITH cust AS (
      |  SELECT n_name, c_custkey, SUM(o_totalprice) AS rev
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1, 2),
      |tot AS (
      |  SELECT n_name, SUM(rev) AS tot, COUNT(*) AS n_customers
      |  FROM cust GROUP BY 1),
      |r AS (
      |  SELECT cust.n_name, rev, tot, n_customers,
      |    ROW_NUMBER() OVER (PARTITION BY cust.n_name
      |      ORDER BY rev DESC, c_custkey) AS rn
      |  FROM cust JOIN tot USING (n_name))
      |SELECT n_name, n_customers,
      |  ROUND(SUM(pow(rev / tot, 2)), 6) AS hhi,
      |  ROUND(1.0 / SUM(pow(rev / tot, 2)), 6)
      |    AS effective_competitors,
      |  ROUND(SUM(CASE WHEN rn <= 5 THEN rev / tot ELSE 0.0 END), 6)
      |    AS cr5
      |FROM r GROUP BY 1, 2 ORDER BY 1""".stripMargin
}
