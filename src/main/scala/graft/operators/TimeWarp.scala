package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dynamic time warping between two event-type daily-count series
  * (Sakoe & Chiba, IEEE TASSP 1978): the alignment distance that
  * tolerates PHASE SHIFT — "clicks follow views with a lag that
  * drifts" reads as near-zero DTW but a poor lag-0 Euclidean/CCF
  * match (q228 measures fixed lags; this measures the elastic
  * alignment). Sakoe-Chiba band |i−j| ≤ band bounds the warp.
  *
  * Bit-parity discipline: the series are INTEGER daily counts on a
  * shared dense calendar spine and the cost is |aᵢ − bⱼ| — the whole
  * DP stays in exact integer arithmetic, so the min() tie behavior
  * is identical in both engines by construction (a z-normalized
  * float cost would put every min() one ulp from a different warp
  * path). The calendar is the scale bound: the DP is |days|², run on
  * the driver over the collected series (the PACF/forecast
  * precedent); the corpus-sized work is the one grouped count that
  * builds the series.
  *
  * The DuckDB oracle replays the SAME DP with one MATERIALIZED CTE
  * per anti-diagonal (cells of diagonal t depend only on diagonals
  * t−1 and t−2 — no recursion, just named CTEs, the HITS/pagerank
  * unroll pattern), pre-generated up to a fixed max length. */
object TimeWarp {

  /** Max series length the generated oracle supports (the events
    * fixture spans ~30 days; headroom for driver-data regeneration).
    * The ENGINE handles any length — only the oracle SQL is bounded,
    * and the parity gate catches a span that outgrows it. */
  val OracleMaxLen = 48

  /** One row `(n_days, band, dtw_distance, dtw_per_day)` — the
    * banded DTW between the daily-count series of `typeA` and
    * `typeB`. Cells outside the band are unreachable; both series
    * ride the same dense day spine (missing days count 0), so the
    * band always contains the corner. */
  def dtwDaily(events: DataFrame, typeA: String, typeB: String,
      band: Int = 7): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    require(band >= 0, "band must be >= 0")
    val daily = events
      .filter(col("event_type").isin(typeA, typeB))
      .groupBy(to_date(col("ts")).as("d"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    // dense spine: every day in [min, max] for BOTH series
    val rows = daily.groupBy("d")
      .agg(
        sum(when(col("event_type") === typeA, col("c"))
          .otherwise(0L)).as("a"),
        sum(when(col("event_type") === typeB, col("c"))
          .otherwise(0L)).as("b"))
      .orderBy("d")
      .collect()   // calendar-bounded
    require(rows.nonEmpty, "no events for either type")
    val lo = rows.head.getDate(0).toLocalDate
    val byDay = rows.map(r => (java.time.temporal.ChronoUnit.DAYS
      .between(lo, r.getDate(0).toLocalDate).toInt,
      (r.getLong(1), r.getLong(2)))).toMap
    val w = byDay.keys.max + 1
    val as = Array.tabulate(w)(i => byDay.getOrElse(i, (0L, 0L))._1)
    val bs = Array.tabulate(w)(i => byDay.getOrElse(i, (0L, 0L))._2)
    // banded DP, exact longs; Long.MaxValue/4 as the unreachable
    // sentinel (never overflows when added to a cost)
    val inf = Long.MaxValue / 4
    var prev = Array.fill(w + 1)(inf)
    prev(0) = 0L
    val cur = Array.fill(w + 1)(inf)
    for (i <- 1 to w) {
      java.util.Arrays.fill(cur, inf)
      val jLo = math.max(1, i - band)
      val jHi = math.min(w, i + band)
      for (j <- jLo to jHi) {
        val cost = math.abs(as(i - 1) - bs(j - 1))
        val best = math.min(prev(j), math.min(cur(j - 1), prev(j - 1)))
        if (best < inf) cur(j) = cost + best
        else if (i == 1 && j == 1) cur(j) = cost
      }
      System.arraycopy(cur, 0, prev, 0, w + 1)
    }
    val dtw = prev(w)
    Seq((w.toLong, band.toLong, dtw,
      BigDecimal(dtw.toDouble / w).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("n_days", "band", "dtw_distance", "dtw_per_day")
  }

  /** DuckDB oracle for [[dtwDaily]]: the banded DP unrolled one
    * MATERIALIZED CTE per anti-diagonal up to [[OracleMaxLen]]. */
  def dtwOracleSql(typeA: String, typeB: String,
      band: Int = 7): String = {
    val base =
      s"""WITH daily AS MATERIALIZED (
         |  SELECT CAST(ts AS DATE) AS d,
         |    SUM(CASE WHEN event_type = '$typeA' THEN 1 ELSE 0 END)
         |      AS a,
         |    SUM(CASE WHEN event_type = '$typeB' THEN 1 ELSE 0 END)
         |      AS b
         |  FROM events WHERE event_type IN ('$typeA', '$typeB')
         |  GROUP BY 1),
         |spine AS MATERIALIZED (
         |  SELECT ROW_NUMBER() OVER (ORDER BY dd) AS i, dd
         |  FROM (SELECT UNNEST(generate_series(MIN(d), MAX(d),
         |    INTERVAL 1 DAY))::DATE AS dd FROM daily)),
         |s AS MATERIALIZED (
         |  SELECT spine.i,
         |    COALESCE(daily.a, 0) AS a, COALESCE(daily.b, 0) AS b
         |  FROM spine LEFT JOIN daily ON spine.dd = daily.d),
         |w AS (SELECT CAST(MAX(i) AS BIGINT) AS w FROM s),
         |cost AS MATERIALIZED (
         |  SELECT x.i AS i, y.i AS j, ABS(x.a - y.b) AS c
         |  FROM s x JOIN s y ON ABS(x.i - y.i) <= $band),
         |d2 AS MATERIALIZED (
         |  SELECT i, j, c AS d FROM cost WHERE i = 1 AND j = 1)""".stripMargin
    // diagonal t holds cells with i+j = t; t runs 3..2*MaxLen. Each
    // references only the two previous diagonals by name.
    val diags = (3 to 2 * OracleMaxLen).map { t =>
      val p1 = s"d${t - 1}"
      val p2 = if (t == 3) "d2" else s"d${t - 2}"
      // the diagonal predecessor table is empty/absent for t = 3
      // (d1 doesn't exist): reuse d2 — its (i,j) never matches a
      // (i-1, j-1) predecessor of a t=3 cell, so it contributes
      // nothing, it just keeps every CTE shape identical
      s"""d$t AS MATERIALIZED (
         |  SELECT cost.i, cost.j, cost.c + LEAST(
         |    COALESCE(up.d, 4611686018427387903),
         |    COALESCE(lf.d, 4611686018427387903),
         |    COALESCE(dg.d, 4611686018427387903)) AS d
         |  FROM cost
         |  LEFT JOIN $p1 up ON up.i = cost.i - 1 AND up.j = cost.j
         |  LEFT JOIN $p1 lf ON lf.i = cost.i AND lf.j = cost.j - 1
         |  LEFT JOIN $p2 dg ON dg.i = cost.i - 1 AND dg.j = cost.j - 1
         |  WHERE cost.i + cost.j = $t
         |    AND (up.d IS NOT NULL OR lf.d IS NOT NULL
         |         OR dg.d IS NOT NULL))""".stripMargin
    }.mkString(",\n")
    val unions = (2 to 2 * OracleMaxLen)
      .map(t => s"SELECT * FROM d$t").mkString("\n  UNION ALL "
        + "\n  ")
    s"""$base,
       |$diags,
       |cells AS (
       |  $unions)
       |SELECT w.w AS n_days, CAST($band AS BIGINT) AS band,
       |  CAST(cells.d AS BIGINT) AS dtw_distance,
       |  ROUND(CAST(cells.d AS DOUBLE) / w.w, 6) AS dtw_per_day
       |FROM cells CROSS JOIN w
       |WHERE cells.i = w.w AND cells.j = w.w""".stripMargin
  }
}
