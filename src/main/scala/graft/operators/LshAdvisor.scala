package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{JaccardSimilarity, ShingleHashes}

/** MinHash-LSH parameter advisor — the (bands, rows) planner every
  * dedup pipeline runs before committing a 100 TB pass (MMDS §3.4.3):
  * for a fixed signature budget S, a pair with Jaccard similarity j
  * becomes a candidate with probability 1−(1−jʳ)ᵇ. The advisor
  * evaluates that S-curve at the DUP threshold (what we must catch)
  * and at the corpus's OBSERVED background similarity (what we must
  * not drown in), for every (b, r) factorization of S, and flags the
  * separation-maximizing row. The background level is measured, not
  * guessed: mean pairwise Jaccard over a deterministic hash-bucket
  * pair sample of a bounded doc probe (never the full N²).
  *
  * Companion to [[Dedup.minHashCandidates]] (which CONSUMES a chosen
  * (b, r)) and the skew/layout/width advisors: measure first, then
  * spend the cluster. */
object LshAdvisor {

  /** `(bands, rows_per_band, bg_similarity, catch_prob, false_prob,
    * separation, s_curve_mid, is_best)` for every divisor split of
    * `signatureBudget`, ordered by rows_per_band. `catch_prob` is the
    * candidate probability at `dupThreshold`; `false_prob` at the
    * measured background mean; `s_curve_mid` = (1/b)^(1/r), the
    * similarity where the curve crosses ~50%. Ties in separation go
    * to the smaller r (cheaper verification load). */
  def advise(docs: DataFrame, dupThreshold: Double = 0.8,
      signatureBudget: Int = 128, shingleK: Int = 3,
      probeIds: Int = 1000, buckets: Int = 211,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val probe = docs.where(col(idCol) < probeIds)
      .select(col(idCol).as("id"),
        ShingleHashes.shingleHashes(
          split(trim(col(textCol)), "\\s+"), shingleK).as("sh"),
        pmod(col(idCol), lit(buckets)).as("bkt"))
    val bg = probe.as("a").join(probe.as("b"),
        col("a.bkt") === col("b.bkt") && col("a.id") < col("b.id"))
      .select(round(JaccardSimilarity.jaccardSim(
        col("a.sh"), col("b.sh")), 4).as("j"))
      .agg(round(avg("j"), 6).as("s"))
    val grid = (1 to signatureBudget)
      .filter(signatureBudget % _ == 0)
      .map(r => (signatureBudget / r, r))
      .toDF("bands", "rows_per_band")
    val curve = grid.crossJoin(broadcast(bg))   // 1-row stat factor
      .withColumn("catch_prob", round(lit(1.0) -
        pow(lit(1.0) - pow(lit(dupThreshold), col("rows_per_band")),
          col("bands")), 6))
      .withColumn("false_prob", round(lit(1.0) -
        pow(lit(1.0) - pow(col("s"), col("rows_per_band")),
          col("bands")), 6))
      .withColumn("separation",
        round(col("catch_prob") - col("false_prob"), 6))
      .withColumn("s_curve_mid", round(
        pow(lit(1.0) / col("bands"),
          lit(1.0) / col("rows_per_band")), 6))
    // 8-row frame: the single-partition ranking window is bounded
    curve.withColumn("is_best",
        rank().over(Window.orderBy(col("separation").desc,
          col("rows_per_band").asc)) === 1)
      .select(col("bands").cast("bigint").as("bands"),
        col("rows_per_band").cast("bigint").as("rows_per_band"),
        col("s").as("bg_similarity"), col("catch_prob"),
        col("false_prob"), col("separation"), col("s_curve_mid"),
        col("is_best"))
      .orderBy("rows_per_band")
  }

  /** DuckDB oracle for [[advise]] with the q337 defaults. The
    * background mean recomputes Jaccard on raw shingle STRINGS (the
    * q19 hash≡string equivalence — xxhash collisions don't occur at
    * probe size). */
  val adviseOracleSql: String =
    """WITH d AS (
      |  SELECT doc_id AS id, doc_id % 211 AS bkt,
      |    str_split_regex(trim(text), '\s+') AS toks
      |  FROM documents WHERE doc_id < 1000),
      |s AS (
      |  SELECT id, bkt,
      |    list_distinct(list_transform(range(1, len(toks) - 1),
      |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS sh
      |  FROM d),
      |bg AS (
      |  SELECT ROUND(AVG(ROUND(
      |      CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
      |      CAST(len(list_distinct(list_concat(a.sh, b.sh)))
      |        AS DOUBLE), 4)), 6) AS s
      |  FROM s a JOIN s b ON a.bkt = b.bkt AND a.id < b.id),
      |grid AS (
      |  SELECT CAST(128 / r AS BIGINT) AS bands,
      |    CAST(r AS BIGINT) AS rows_per_band
      |  FROM (SELECT UNNEST([1, 2, 4, 8, 16, 32, 64, 128]) AS r)),
      |curve AS (
      |  SELECT bands, rows_per_band, bg.s,
      |    ROUND(1.0 - POWER(1.0 - POWER(0.8, rows_per_band), bands),
      |      6) AS catch_prob,
      |    ROUND(1.0 - POWER(1.0 - POWER(bg.s, rows_per_band), bands),
      |      6) AS false_prob,
      |    ROUND(POWER(1.0 / bands, 1.0 / rows_per_band), 6)
      |      AS s_curve_mid
      |  FROM grid CROSS JOIN bg),
      |sep AS (
      |  SELECT *, ROUND(catch_prob - false_prob, 6) AS separation
      |  FROM curve)
      |SELECT bands, rows_per_band, s AS bg_similarity, catch_prob,
      |  false_prob, separation, s_curve_mid,
      |  RANK() OVER (ORDER BY separation DESC, rows_per_band ASC) = 1
      |    AS is_best
      |FROM sep ORDER BY rows_per_band""".stripMargin
}
