package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-time disorder profile — "how out-of-order is this stream,
  * and what watermark delay would keep it?" The sizing input every
  * watermarked streaming job in this repo (q13/q40/q110/q114/…)
  * needs but the reference pipeline never measures: its 6-hourly
  * batch re-ingest (`airflow/dags/lakehouse_pipelines.py:105`) hides
  * disorder entirely, so moving that domain to Structured Streaming
  * without a lateness profile means guessing the watermark.
  *
  * Lateness of a row = how far its event time lags the maximum event
  * time already seen at its ARRIVAL position (arrival order proxied
  * by `event_id`, the generator's monotone sequence) — exactly the
  * quantity `withWatermark` compares against. A watermark of the
  * p99 lateness admits ~99% of rows; `max_late_s` is the
  * zero-drop delay.
  *
  * Scale shape (100 TB events): the naive form (running max over ALL
  * rows by arrival order) is a single-task global window — unusable.
  * Instead arrival order is coarsened to fixed-size buckets
  * (`event_id DIV bucketSize`): per-bucket max event time is one
  * partial-aggregated shuffle into a BUCKET-COUNT-sized table, the
  * running high-water mark is a window over that tiny table, and
  * rows join back to their PREVIOUS bucket's high-water via
  * broadcast. Lateness is thus measured against a high-water mark
  * that is at most one bucket stale — a conservative (never
  * over-reported) disorder estimate whose cost is one shuffle + one
  * broadcast join at any scale. Exact `percentile` per event_type is
  * the oracle pin; swap `approx_percentile` for the mergeable-sketch
  * scale path exactly as q52 does for q29. */
object EventTime {

  private def epochSec(c: Column): Column = c.cast("long")

  /** Per-event-type lateness profile: count, late fraction,
    * avg/p50/p95/p99/max lateness seconds, and the suggested
    * watermark (`ceil(p99)`). */
  def disorderProfile(events: DataFrame,
      bucketSize: Long = 1000L): DataFrame = {
    val base = events.select(
      col("event_type"),
      epochSec(col("ts")).as("es"),
      expr(s"event_id DIV $bucketSize").as("bucket"))

    // High-water mark BEFORE each bucket: |events|/bucketSize rows,
    // aggregated map-side first; the unpartitioned window is over the
    // bucket table, not the event table.
    val hwWin = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val hw = base.groupBy("bucket")
      .agg(max(col("es")).as("bmax"))
      .withColumn("hwm", max(col("bmax")).over(hwWin))
      .select("bucket", "hwm")

    val late = base.join(broadcast(hw), "bucket")
      .withColumn("late_s",
        greatest(lit(0L), coalesce(col("hwm") - col("es"), lit(0L))))

    late.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      round(avg(when(col("late_s") > 0, 1.0).otherwise(0.0)), 6)
        .as("late_frac"),
      round(avg(col("late_s")), 4).as("avg_late_s"),
      expr("round(percentile(late_s, 0.5), 4)").as("p50_late_s"),
      expr("round(percentile(late_s, 0.95), 4)").as("p95_late_s"),
      expr("round(percentile(late_s, 0.99), 4)").as("p99_late_s"),
      max(col("late_s")).as("max_late_s"),
      ceil(expr("percentile(late_s, 0.99)")).cast("bigint")
        .as("watermark_s"))
      .orderBy("event_type")
  }

  /** DuckDB oracle for [[disorderProfile]] — identical bucketing,
    * identical conservative previous-bucket high-water mark. */
  /** Per-user burstiness of inter-event gaps, aggregated per event
    * type — the Goh–Barabási burstiness parameter B = (σ−μ)/(σ+μ) of a
    * user's inter-arrival times (Goh & Barabási, EPL 81, 2008): B→−1
    * is a metronome (bot-like perfectly regular traffic), B≈0 is a
    * memoryless Poisson visitor, B→+1 is extreme burst-and-silence
    * (human sessions). The report is the clickstream bot-vs-human
    * screen: an event type whose users cluster near −1 is scripted.
    *
    * Dataflow: gaps via one `lag` window PARTITIONED by user (parallel
    * across users, no global window), per-user moment agg, then a
    * type-cardinality agg of user-level B. Users need ≥ `minEvents`
    * events (≥ 2 gaps) for a defined σ; population σ (not sample) so
    * two gaps are enough. */
  def burstiness(events: DataFrame, minEvents: Int = 5): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type").orderBy(col("ts"), col("event_id"))
    val gaps = events
      .withColumn("__prev", lag(epochSec(col("ts")), 1).over(w))
      .where(col("__prev").isNotNull)
      .withColumn("__gap", (epochSec(col("ts")) - col("__prev")).cast("double"))
    val perUser = gaps
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("__n"),
        avg("__gap").as("__mu"),
        // population variance via moments: E[x²] − E[x]²
        avg(col("__gap") * col("__gap")).as("__m2"))
      .where(col("__n") >= minEvents - 1)   // n gaps = events − 1
      .withColumn("__sigma",
        sqrt(greatest(col("__m2") - col("__mu") * col("__mu"), lit(0.0))))
      .withColumn("__b",
        when(col("__sigma") + col("__mu") === 0.0, 0.0)
          .otherwise((col("__sigma") - col("__mu")) /
            (col("__sigma") + col("__mu"))))
    perUser
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_users"),
        round(avg("__b"), 6).as("mean_burstiness"),
        round(min("__b"), 6).as("min_burstiness"),
        round(max("__b"), 6).as("max_burstiness"))
      .orderBy("event_type")
  }

  /** DuckDB oracle for [[burstiness]] — same windows, same population
    * moments. */
  def burstinessOracleSql(minEvents: Int = 5): String =
    s"""WITH e AS (
       |  SELECT user_id, event_type, ts, event_id,
       |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS es
       |  FROM events),
       |g AS (
       |  SELECT user_id, event_type,
       |    es - LAG(es) OVER (
       |        PARTITION BY user_id, event_type
       |        ORDER BY ts, event_id) AS gap
       |  FROM e),
       |pu AS (
       |  SELECT user_id, event_type,
       |    COUNT(*) AS n,
       |    AVG(CAST(gap AS DOUBLE)) AS mu,
       |    AVG(CAST(gap AS DOUBLE) * CAST(gap AS DOUBLE)) AS m2
       |  FROM g WHERE gap IS NOT NULL
       |  GROUP BY 1, 2
       |  HAVING COUNT(*) >= ${minEvents - 1}),
       |b AS (
       |  SELECT event_type,
       |    CASE WHEN sqrt(GREATEST(m2 - mu * mu, 0.0)) + mu = 0.0 THEN 0.0
       |      ELSE (sqrt(GREATEST(m2 - mu * mu, 0.0)) - mu) /
       |           (sqrt(GREATEST(m2 - mu * mu, 0.0)) + mu) END AS bb
       |  FROM pu)
       |SELECT event_type,
       |  CAST(COUNT(*) AS BIGINT) AS n_users,
       |  ROUND(AVG(bb), 6) AS mean_burstiness,
       |  ROUND(MIN(bb), 6) AS min_burstiness,
       |  ROUND(MAX(bb), 6) AS max_burstiness
       |FROM b GROUP BY event_type ORDER BY event_type""".stripMargin

  def oracleSql(bucketSize: Long = 1000L): String =
    s"""WITH base AS (
       |  SELECT event_type,
       |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS es,
       |    event_id // $bucketSize AS bucket
       |  FROM events),
       |hw AS (
       |  SELECT bucket, MAX(MAX(es)) OVER (ORDER BY bucket
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
       |  FROM base GROUP BY bucket),
       |l AS (
       |  SELECT b.event_type,
       |    GREATEST(0, COALESCE(h.hwm - b.es, 0)) AS late_s
       |  FROM base b JOIN hw h USING (bucket))
       |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |  ROUND(AVG(CASE WHEN late_s > 0 THEN 1.0 ELSE 0.0 END), 6)
       |    AS late_frac,
       |  ROUND(AVG(late_s), 4) AS avg_late_s,
       |  ROUND(quantile_cont(late_s, 0.5), 4) AS p50_late_s,
       |  ROUND(quantile_cont(late_s, 0.95), 4) AS p95_late_s,
       |  ROUND(quantile_cont(late_s, 0.99), 4) AS p99_late_s,
       |  CAST(MAX(late_s) AS BIGINT) AS max_late_s,
       |  CAST(CEIL(quantile_cont(late_s, 0.99)) AS BIGINT) AS watermark_s
       |FROM l GROUP BY event_type ORDER BY event_type""".stripMargin
}
