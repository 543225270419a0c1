package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Watermark late-drop audit — "if this pipeline ran as a stream with
  * watermark W and an upstream re-delivered old data, how much would
  * silently drop?" The reference handles late data by brute force: a
  * 7-day re-merge window on a 6-hourly batch
  * (`fct_daily_store_metrics.sql:34-36`); a streaming port replaces
  * that with a watermark, and the failure mode CHANGES — late rows
  * are not re-merged, they are discarded, and the only trace is the
  * engine counter. This operator makes that counter
  * (`numRowsDroppedByWatermark`, the number a production monitor
  * scrapes from the progress log) a first-class pipeline artifact.
  *
  * Consumer choice matters for the counter's unit: a windowed
  * AGGREGATION partial-aggregates before its state operator, so its
  * drop counter counts window-GROUPS, not rows (measured live on
  * this engine). The audit therefore runs the streaming exact-dedup
  * consumer ([[Streams.dedupedEvents]]'s shape): its state input is
  * the raw rows, so dropped-late counts are exact row counts.
  *
  * Watermark propagation lag (measured, and why staging has a
  * settling tranche): the late-row filter of micro-batch N uses the
  * watermark PUBLISHED after batch N−2 — the value advanced by batch
  * N−1's max event time only filters batch N+1. A backfill arriving
  * immediately after the tranche that advanced the watermark is
  * still admitted; one more tranche in between and it is dropped.
  * The audit's arrival sequence includes that settling step so the
  * drop measurement reflects steady-state behavior, not the
  * propagation race.
  *
  * Scale shape: the audit adds NOTHING to the streaming job — drops
  * are counted by the state operator the query already runs; the
  * progress log is driver-side metadata (one row per micro-batch
  * regardless of batch size). The staging step is a bounded fixture
  * for the bounded replay; a production audit points the same
  * consumer at the real source and reads the same counters. */
object LateAudit {

  /** Split `events` into four arrival tranches by day-of-month:
    *   0. days 1-10   — history
    *   1. days 21-30  — recent data; advances the watermark
    *   2. days 29-30  — re-delivery (deduped away; lets the advanced
    *                    watermark propagate into the filter)
    *   3. days 11-20  — the LATE backfill, now below the watermark
    * written as sequential single files so the file source replays
    * them in exactly this order (listing is by modification time). */
  def stageBackfillArrival(spark: SparkSession, events: DataFrame,
      outDir: String): Unit = {
    val d = dayofmonth(col("ts"))
    val tranches = Seq(
      events.where(d <= 10),
      events.where(d >= 21),
      events.where(d >= 29),
      events.where(d > 10 && d < 21))
    tranches.zipWithIndex.foreach { case (df, i) =>
      val mode = if (i == 0) "overwrite" else "append"
      df.coalesce(1).write.mode(mode).parquet(outDir)
      // a same-millisecond tie between two sequential writes would
      // reorder tranches in the file listing — space them out
      Thread.sleep(5)
    }
  }

  /** Run the watermarked exact-dedup consumer over the staged arrival
    * dir, one file per micro-batch, and return the per-batch audit:
    * `(batch_id, input_rows, dropped_late)` — raw rows the watermark
    * discarded before they reached state. */
  def auditRun(spark: SparkSession, stagedDir: String,
      watermark: String = "2 days"): DataFrame = {
    val ss = Streams.streamSession(spark)
    val stream = graft.io.Sources.repairEventTs(
      Streams.parquetStream(ss, stagedDir, "*.parquet", Some(1)))
    val dedup = stream
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")
    val sink = s"graft_late_${Streams.counter.incrementAndGet()}"
    val q = dedup.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sink)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = q.recentProgress.toSeq.map { p =>
      val dropped = Option(p.stateOperators).toSeq.flatten
        .map(_.numRowsDroppedByWatermark).sum
      (p.batchId, p.numInputRows, dropped)
    }.filter { case (_, in, dr) => in > 0 || dr > 0 }
    import spark.implicits._
    rows.toDF("batch_id", "input_rows", "dropped_late")
      .orderBy("batch_id")
  }

  /** The registered query: stage the bounded events table as a
    * backfill-last arrival sequence in a fresh temp dir, audit it
    * with a 2-day watermark. The final batch (days 11-20) arrives
    * under a propagated watermark near day 28, so
    * `dropped_late == input_rows` for it — the quantified cost of
    * replacing the reference's re-merge window with this watermark. */
  def backfillAudit(spark: SparkSession, dir: String): DataFrame = {
    val staged = graft.util.TempDirs.create("graft_late_audit").toString
    // the audit is pure row accounting — the consumer touches only the
    // dedup key and the event time, so stage exactly those two columns:
    // identical (batch_id, input_rows, dropped_late) output, a fraction
    // of the staging/replay bytes (events' payload columns dominate)
    stageBackfillArrival(spark,
      graft.io.Sources.table(spark, dir, "events")
        .select(col("event_id"), col("ts")), staged)
    auditRun(spark, staged)
  }
}
