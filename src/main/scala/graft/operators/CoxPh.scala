package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cox proportional-hazards fit for a BINARY covariate (Cox, JRSS-B
  * 1972; Breslow tie handling) — the regression the survival panel
  * (q247 KM, q251 log-rank, q312 Nelson–Aalen, q341 competing risks)
  * was missing: the log-rank test says WHETHER the treated arm's
  * hazard differs, the Cox hazard ratio says BY HOW MUCH, with a
  * standard error. Fixture: time from a user's first event to first
  * purchase (censored at last activity), treatment = odd user id.
  *
  * Newton–Raphson on the Breslow partial likelihood, FIXED 6
  * iterations from β = 0. For a binary covariate the risk-set sums
  * collapse to S0(t) = n₀(≥t) + n₁(≥t)·eᵝ and S1 = S2 = n₁(≥t)·eᵝ,
  * so each iteration is two cumulative sums over the DISTINCT-TIME
  * table — which is calendar-bounded, so the engine collects it once
  * and iterates on the driver (the PACF/forecast precedent) while
  * the corpus-sized work is a single per-user aggregate.
  *
  * The DuckDB oracle replays the SAME Newton iterations as unrolled
  * CTEs (β carried as a 1-row scalar, cumsums as time-DESC ordered
  * windows — sequential, hence bit-deterministic; the BPE/MMR
  * training-replay discipline). Engine and oracle share every
  * expression shape, so β agrees to well under the 1e-6 canon grid. */
object CoxPh {

  val Iterations = 6

  /** One row `(n, n_events, n_treated, beta, hazard_ratio, se, z,
    * sig_95)`: β fitted on (T = days first event → first purchase,
    * censored at last event; x = user_id % 2). NULL β when the
    * information is zero (no events, or a degenerate arm). */
  def fit(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val per = events.groupBy("user_id").agg(
      min(to_date(col("ts"))).as("__f"),
      min(when(col("event_type") === "purchase", to_date(col("ts"))))
        .as("__p"),
      max(to_date(col("ts"))).as("__l"))
    val subj = per.select(
      when(col("__p").isNotNull, datediff(col("__p"), col("__f")))
        .otherwise(datediff(col("__l"), col("__f")))
        .cast("long").as("t"),
      when(col("__p").isNotNull, 1L).otherwise(0L).as("d"),
      (col("user_id") % 2).cast("long").as("x"))
    // distinct-time table: calendar-bounded however large the corpus
    val tbl = subj.groupBy("t").agg(
        sum(when(col("x") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("x") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("x") === 0 && col("d") === 1, 1L).otherwise(0L))
          .as("d0"),
        sum(when(col("x") === 1 && col("d") === 1, 1L).otherwise(0L))
          .as("d1"))
      .orderBy(col("t").desc)
      .collect()
    val n = tbl.map(r => r.getLong(1) + r.getLong(2)).sum
    val nEvents = tbl.map(r => r.getLong(3) + r.getLong(4)).sum
    val nTreated = tbl.map(_.getLong(2)).sum

    // Newton, mirroring the oracle's expression shapes exactly
    var beta = 0.0
    var info = 0.0
    var degenerate = false
    for (_ <- 1 to Iterations if !degenerate) {
      val e = math.exp(beta)
      var s0 = 0.0; var s1 = 0.0
      var u = 0.0; var i2 = 0.0
      tbl.foreach { r =>   // time-DESC: cumsums are sequential
        val (n0, n1) = (r.getLong(1), r.getLong(2))
        val (d0, d1) = (r.getLong(3), r.getLong(4))
        s0 += n0 + n1 * e
        s1 += n1 * e
        val d = d0 + d1
        if (d > 0) {
          val ratio = s1 / s0
          u += d1 - d * ratio
          i2 += d * (ratio - ratio * ratio)
        }
      }
      info = i2
      if (i2 > 0.0) beta = beta + u / i2 else degenerate = true
    }
    def r6(v: Double) = BigDecimal(v).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val ok = !degenerate && info > 0.0
    val se = if (ok) 1.0 / math.sqrt(info) else Double.NaN
    Seq((n, nEvents, nTreated,
      if (ok) Some(r6(beta)) else None,
      if (ok) Some(r6(math.exp(beta))) else None,
      if (ok) Some(r6(se)) else None,
      if (ok) Some(r6(beta / se)) else None,
      ok && math.abs(beta / se) > 1.96))
      .toDF("n", "n_events", "n_treated", "beta", "hazard_ratio",
        "se", "z", "sig_95")
  }

  /** DuckDB oracle for [[fit]]: the Newton iterations unrolled, β
    * carried as a 1-row scalar per step. */
  def oracleSql: String = {
    val base =
      """WITH per AS MATERIALIZED (
        |  SELECT user_id,
        |    MIN(CAST(ts AS DATE)) AS f,
        |    MIN(CASE WHEN event_type = 'purchase'
        |        THEN CAST(ts AS DATE) END) AS p,
        |    MAX(CAST(ts AS DATE)) AS l
        |  FROM events GROUP BY 1),
        |subj AS MATERIALIZED (
        |  SELECT CASE WHEN p IS NOT NULL THEN p - f ELSE l - f END
        |      AS t,
        |    CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END AS d,
        |    user_id % 2 AS x
        |  FROM per),
        |tbl AS MATERIALIZED (
        |  SELECT t,
        |    SUM(CASE WHEN x = 0 THEN 1 ELSE 0 END) AS n0,
        |    SUM(CASE WHEN x = 1 THEN 1 ELSE 0 END) AS n1,
        |    SUM(CASE WHEN x = 0 AND d = 1 THEN 1 ELSE 0 END) AS d0,
        |    SUM(CASE WHEN x = 1 AND d = 1 THEN 1 ELSE 0 END) AS d1
        |  FROM subj GROUP BY 1),
        |tot AS (
        |  SELECT CAST(SUM(n0 + n1) AS BIGINT) AS n,
        |    CAST(SUM(d0 + d1) AS BIGINT) AS n_events,
        |    CAST(SUM(n1) AS BIGINT) AS n_treated
        |  FROM tbl),
        |b0 AS (SELECT 0.0 AS b)""".stripMargin
    val iters = (1 to Iterations).map { k =>
      val pb = s"b${k - 1}"
      s"""s$k AS MATERIALIZED (
         |  SELECT t, d0, d1,
         |    SUM(n0 + n1 * EXP((SELECT b FROM $pb)))
         |      OVER (ORDER BY t DESC
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS s0,
         |    SUM(n1 * EXP((SELECT b FROM $pb)))
         |      OVER (ORDER BY t DESC
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS s1
         |  FROM tbl),
         |ui$k AS (
         |  SELECT SUM(d1 - (d0 + d1) * (s1 / s0)) AS u,
         |    SUM((d0 + d1) * (s1 / s0 - (s1 / s0) * (s1 / s0)))
         |      AS i
         |  FROM s$k WHERE d0 + d1 > 0),
         |b$k AS (
         |  SELECT (SELECT b FROM $pb) + u / i AS b, i FROM ui$k)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$iters
       |SELECT tot.n, tot.n_events, tot.n_treated,
       |  ROUND(CASE WHEN f.i > 0 THEN f.b END, 6) AS beta,
       |  ROUND(CASE WHEN f.i > 0 THEN EXP(f.b) END, 6)
       |    AS hazard_ratio,
       |  ROUND(CASE WHEN f.i > 0 THEN 1.0 / SQRT(f.i) END, 6)
       |    AS se,
       |  ROUND(CASE WHEN f.i > 0 THEN f.b / (1.0 / SQRT(f.i)) END,
       |    6) AS z,
       |  COALESCE(f.i > 0 AND
       |    ABS(f.b / (1.0 / SQRT(f.i))) > 1.96, FALSE) AS sig_95
       |FROM b$Iterations f CROSS JOIN tot""".stripMargin
  }
}
