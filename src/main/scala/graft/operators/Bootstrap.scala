package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Poisson bootstrap confidence intervals for corpus statistics — THE
  * distributed resampling scheme (Chamandy et al., "Estimating
  * Uncertainty for Massive Data Streams", Google 2012; Kleiner et
  * al.'s BLB is the heavier cousin): a classical bootstrap resample
  * needs a corpus-wide multinomial draw (global coordination), but for
  * large n the per-row resample count converges to Poisson(1), which
  * is INDEPENDENT per row — so every row computes its B replicate
  * weights locally from a seeded hash and each replicate reduces with
  * an ordinary weighted aggregate. No resample is ever materialized;
  * the whole thing is one map + one B-group aggregate.
  *
  * Determinism discipline: the per-(row, replicate) uniform is the
  * first 8 hex chars of `md5(id || '_' || rep)` over 2³² — the repo's
  * oracleable-randomness convention — and the Poisson(1) inverse-CDF
  * thresholds are shared literals between the engine and the generated
  * oracle SQL, so the two cannot drift.
  */
object Bootstrap {

  /** Cumulative Poisson(1) probabilities P(X ≤ k), k = 0..6 (weights
    * cap at 7; P(X > 7) ≈ 1e-5 — negligible and identically negligible
    * in both engines). Literal-shared with [[oracleSqlFor]]. */
  private val Cum: Seq[Double] = Seq(
    0.36787944, 0.73575888, 0.91969860, 0.98101184,
    0.99634015, 0.99940582, 0.99991676)

  private def uniform(id: Column, rep: Column): Column =
    (conv(substring(md5(concat(id.cast("string"), lit("_"),
      rep.cast("string"))), 1, 8), 16, 10).cast("long") /
      lit(4294967296.0))

  private def poissonWeight(u: Column): Column =
    Cum.map(t => when(u >= t, 1).otherwise(0))
      .reduce(_ + _).cast("double")

  /** One-row CI report `(n_rows, n_replicates, est, boot_mean, se,
    * ci_lo, ci_hi)` for the MEAN of `valueCol`: point estimate from
    * the full data, standard error and percentile interval from `b`
    * Poisson replicates. */
  def meanCi(df: DataFrame, idCol: String, valueCol: String,
      b: Int = 32, alpha: Double = 0.05): DataFrame = {
    require(b >= 8, "need a non-trivial replicate count")
    val base = df.select(col(idCol).as("__id"),
      col(valueCol).cast("double").as("__v"))
    val est = base.agg(count(lit(1)).as("n_rows"),
      avg("__v").as("__est"))
    val repMeans = base
      .select(col("__id"), col("__v"),
        explode(sequence(lit(0), lit(b - 1))).as("__rep"))
      .withColumn("__w", poissonWeight(uniform(col("__id"), col("__rep"))))
      .groupBy("__rep")
      .agg((sum(col("__w") * col("__v")) / sum("__w")).as("__m"))
    val lo = alpha / 2.0
    val hi = 1.0 - alpha / 2.0
    repMeans
      .agg(
        count(lit(1)).as("n_replicates"),
        avg("__m").as("__bm"),
        stddev_samp(col("__m")).as("__se"),
        expr(s"percentile(__m, $lo)").as("__lo"),
        expr(s"percentile(__m, $hi)").as("__hi"))
      .crossJoin(broadcast(est))   // 1-row stat factor
      .select(
        col("n_rows"), col("n_replicates"),
        round(col("__est"), 6).as("est"),
        round(col("__bm"), 6).as("boot_mean"),
        round(col("__se"), 6).as("se"),
        round(col("__lo"), 6).as("ci_lo"),
        round(col("__hi"), 6).as("ci_hi"))
  }

  /** DuckDB oracle for the registered fixture (mean token count over
    * documents). Thresholds and hash convention are generated from the
    * same literals the engine uses. */
  def oracleSql(b: Int = 32, alpha: Double = 0.05): String = {
    val wExpr = Cum.map(t => s"CASE WHEN u >= $t THEN 1 ELSE 0 END")
      .mkString("(", " + ", ")")
    val lo = alpha / 2.0
    val hi = 1.0 - alpha / 2.0
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(str_split_regex(trim(text), '\\s+'),
       |      x -> x <> '')) AS DOUBLE) AS v
       |  FROM documents),
       |est AS (SELECT COUNT(*) AS n_rows, AVG(v) AS e FROM d),
       |reps AS (SELECT CAST(UNNEST(range(0, $b)) AS BIGINT) AS rep),
       |x AS (
       |  SELECT rep, v,
       |    CAST(('0x' || substr(md5(doc_id || '_' || rep), 1, 8))
       |      AS UBIGINT) / 4294967296.0 AS u
       |  FROM d CROSS JOIN reps),
       |m AS (
       |  SELECT rep,
       |    SUM(CAST($wExpr AS DOUBLE) * v) / SUM(CAST($wExpr AS DOUBLE)) AS mv
       |  FROM x GROUP BY rep)
       |SELECT
       |  CAST((SELECT n_rows FROM est) AS BIGINT) AS n_rows,
       |  CAST(COUNT(*) AS BIGINT) AS n_replicates,
       |  ROUND((SELECT e FROM est), 6) AS est,
       |  ROUND(AVG(mv), 6) AS boot_mean,
       |  ROUND(stddev_samp(mv), 6) AS se,
       |  ROUND(quantile_cont(mv, $lo), 6) AS ci_lo,
       |  ROUND(quantile_cont(mv, $hi), 6) AS ci_hi
       |FROM m""".stripMargin
  }
}
