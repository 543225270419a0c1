package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benford first-digit audit of a positive numeric feed — the
  * fabricated-data screen (Nigrini, "Digital Analysis Using Benford's
  * Law"): naturally-grown magnitudes (transaction amounts, populations,
  * file sizes) put digit d first with probability log10(1 + 1/d),
  * while invented or template-generated numbers land near-uniform.
  * For a data pipeline it is a cheap upstream-feed forensic: a vendor
  * feed whose amounts stop being Benford after a version bump was
  * probably re-synthesized, truncated, or unit-shifted.
  *
  * Dataflow: first digit via two codegen'd log/pow expressions, one
  * grouped count to a ≤9-row table, expected shares as literals —
  * digit-cardinality output at any corpus size. Reported per digit
  * with chi-square contributions plus Nigrini's MAD in every row (the
  * statistic his conformity thresholds are calibrated on: < 0.006
  * close, > 0.015 nonconformity for first digits). */
object Benford {

  /** Per-digit report `(digit, n, obs_p, exp_p, chi2_term, mad)` over
    * the strictly-positive values of `valueCol`; zero/negative/null
    * rows are excluded (Benford is defined on magnitudes). */
  def firstDigitReport(df: DataFrame, valueCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    val digit = floor(x / pow(lit(10.0), floor(log10(x)))).cast("int")
    val spark = df.sparkSession
    import spark.implicits._
    // full 1..9 spine: a digit the feed never produces still owes its
    // expected share to chi² and MAD (absence IS the anomaly)
    val spine = (1 to 9).toDF("digit")
    val counted = spine.join(
      df.where(x.isNotNull && x > 0.0)
        .select(digit.as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n")),
      Seq("digit"), "left_outer")
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"))
    val total = sum(col("n")).over()
    val expP = log10(lit(1.0) + lit(1.0) / col("digit"))
    val withP = counted
      .withColumn("obs_p", col("n").cast("double") / total)
      .withColumn("exp_p", expP)
      .withColumn("chi2_term",
        (col("obs_p") - col("exp_p")) * (col("obs_p") - col("exp_p")) /
          col("exp_p") * total)
    withP
      .withColumn("mad", avg(abs(col("obs_p") - col("exp_p"))).over())
      .select(col("digit"), col("n"),
        round(col("obs_p"), 6).as("obs_p"),
        round(col("exp_p"), 6).as("exp_p"),
        round(col("chi2_term"), 6).as("chi2_term"),
        round(col("mad"), 6).as("mad"))
      .orderBy("digit")
  }

  /** DuckDB oracle for [[firstDigitReport]] on a named table/column. */
  def oracleSql(table: String, valueCol: String): String =
    s"""WITH v AS (
       |  SELECT CAST(floor($valueCol /
       |    power(10.0, floor(log10($valueCol)))) AS INTEGER) AS digit
       |  FROM $table WHERE $valueCol IS NOT NULL AND $valueCol > 0),
       |c AS (SELECT digit, COUNT(*) AS n FROM v GROUP BY digit),
       |spine AS (SELECT CAST(UNNEST(range(1, 10)) AS INTEGER) AS digit),
       |f AS (
       |  SELECT spine.digit, COALESCE(c.n, 0) AS n
       |  FROM spine LEFT JOIN c ON spine.digit = c.digit),
       |p AS (
       |  SELECT digit, n,
       |    CAST(n AS DOUBLE) / SUM(n) OVER () AS obs_p,
       |    log10(1.0 + 1.0 / digit) AS exp_p,
       |    SUM(n) OVER () AS tot
       |  FROM f)
       |SELECT digit, CAST(n AS BIGINT) AS n,
       |  ROUND(obs_p, 6) AS obs_p,
       |  ROUND(exp_p, 6) AS exp_p,
       |  ROUND((obs_p - exp_p) * (obs_p - exp_p) / exp_p * tot, 6)
       |    AS chi2_term,
       |  ROUND(AVG(abs(obs_p - exp_p)) OVER (), 6) AS mad
       |FROM p ORDER BY digit""".stripMargin
}
