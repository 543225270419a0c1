package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.lake.TableLog
import graft.operators.Drift

/** Continuous distribution-drift monitoring: every micro-batch of a
  * stream is PSI-scored against a pinned baseline snapshot and the
  * per-bucket report (tagged with the batch id) appends to a versioned
  * report table — the streaming form of [[graft.operators.Drift]], and
  * what a data-quality pager actually watches ("alert when an input
  * feed's value distribution walks away from the snapshot it was
  * validated against").
  *
  * The baseline is read ONCE per batch from a TableLog snapshot pinned
  * at `baselineVersion` — later commits to the baseline table never
  * silently move the goalposts mid-stream. Crash-replays are
  * effectively-once: each report commit carries action
  * `drift-<batchId>`, so a replayed batch that already reported skips
  * the commit (the same manifest-action idempotence recipe as
  * [[CorpusIngest]]).
  *
  * Scale shape per batch: one grouped count over the BATCH (bounded by
  * trigger size), one over the baseline (prunable via manifest stats),
  * join + window on the tiny bucket table. State lives in the report
  * table, not the state store — the stream itself is stateless.
  */
object DriftMonitor {

  private def driftAction(batchId: Long) = s"drift-$batchId"

  /** One batch's report, replay-safe. Returns the rows reported this
    * call (0 on a fully-replayed batch). Exposed for the spec's
    * crash-window simulations. */
  private[graft] def reportOnce(spark: SparkSession, batch: DataFrame,
      baselinePath: String, baselineVersion: Int, reportPath: String,
      valueCol: String, bucketWidth: Double, batchId: Long): Long = {
    val act = driftAction(batchId)
    val hist = TableLog.history(spark, reportPath)
    if (hist.exists(_.action == act)) return 0L
    val baseline = TableLog.read(spark, baselinePath, Some(baselineVersion))
    val report = Drift.psiReport(baseline, batch, valueCol, bucketWidth)
      .withColumn("batch_id", lit(batchId))
    val prevDirs = hist.lastOption.map(_.dirs.toSet).getOrElse(Set.empty[String])
    val c = TableLog.commitAppend(spark, reportPath, report, act)
    // the commit already materialized the report once; its file stats
    // carry the row count — re-evaluating would scan the baseline again
    TableLog.newDirRows(c, prevDirs).getOrElse(report.count())
  }

  /** Watch a parquet stream directory; one PSI report per micro-batch
    * against `baselinePath@baselineVersion`, appended to `reportPath`.
    * AvailableNow + `maxFilesPerTrigger` gives a bounded replayable
    * run; remove the trigger for a long-running monitor. */
  def monitor(spark: SparkSession, sourceDir: String, glob: String,
      baselinePath: String, baselineVersion: Int, reportPath: String,
      valueCol: String, bucketWidth: Double, checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None): Unit = {
    val ss = Streams.streamSession(spark)
    val q = Streams.parquetStream(ss, sourceDir, glob, maxFilesPerTrigger)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        reportOnce(batch.sparkSession, batch, baselinePath, baselineVersion,
          reportPath, valueCol, bucketWidth, batchId)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  // ---- embedding-space variant: same monitoring contract (pinned
  // baseline, per-batch report commits, action-tag idempotence), the
  // report is [[Drift.embeddingDrift]] instead of PSI — what a
  // vector-ingest pipeline watches ("did this batch of re-embedded
  // documents land where the validated snapshot says its labels
  // live"). Per batch: two labels·dims aggs, nothing stateful. ----

  private def embDriftAction(batchId: Long) = s"embdrift-$batchId"

  /** One batch's embedding-drift report, replay-safe (0 rows on a
    * fully-replayed batch). */
  private[graft] def reportEmbeddingOnce(spark: SparkSession,
      batch: DataFrame, baselinePath: String, baselineVersion: Int,
      reportPath: String, batchId: Long,
      labelCol: String = "label", vecCol: String = "embedding"): Long = {
    val act = embDriftAction(batchId)
    val hist = TableLog.history(spark, reportPath)
    if (hist.exists(_.action == act)) return 0L
    val baseline = TableLog.read(spark, baselinePath, Some(baselineVersion))
    val report = Drift.embeddingDrift(baseline, batch, labelCol, vecCol)
      .withColumn("batch_id", lit(batchId))
    val prevDirs = hist.lastOption.map(_.dirs.toSet).getOrElse(Set.empty[String])
    val c = TableLog.commitAppend(spark, reportPath, report, act)
    TableLog.newDirRows(c, prevDirs).getOrElse(report.count())
  }

  // ---- categorical variant: same monitoring contract, the report is
  // [[Drift.mixDivergence]] (Jensen–Shannon bits over a discrete
  // column) — what a feed-mix pager watches ("did the event-type /
  // language MIX of this feed walk away from the validated
  // snapshot"), the finite-under-new-categories complement of PSI's
  // floored numeric buckets. Per batch: two category-cardinality
  // aggs, nothing stateful. ----

  private def mixDriftAction(batchId: Long) = s"mixdrift-$batchId"

  /** One batch's mix-divergence report, replay-safe (0 rows on a
    * fully-replayed batch). */
  private[graft] def reportMixOnce(spark: SparkSession, batch: DataFrame,
      baselinePath: String, baselineVersion: Int, reportPath: String,
      catCol: String, batchId: Long): Long = {
    val act = mixDriftAction(batchId)
    val hist = TableLog.history(spark, reportPath)
    if (hist.exists(_.action == act)) return 0L
    val baseline = TableLog.read(spark, baselinePath, Some(baselineVersion))
    val report = Drift.mixDivergence(baseline, batch, catCol)
      .withColumn("batch_id", lit(batchId))
    val prevDirs = hist.lastOption.map(_.dirs.toSet).getOrElse(Set.empty[String])
    val c = TableLog.commitAppend(spark, reportPath, report, act)
    TableLog.newDirRows(c, prevDirs).getOrElse(report.count())
  }

  /** Streaming categorical-mix monitor over a parquet stream; same
    * trigger/replay contract as [[monitor]]. */
  def monitorMix(spark: SparkSession, sourceDir: String, glob: String,
      baselinePath: String, baselineVersion: Int, reportPath: String,
      catCol: String, checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None): Unit = {
    val ss = Streams.streamSession(spark)
    val q = Streams.parquetStream(ss, sourceDir, glob, maxFilesPerTrigger)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        reportMixOnce(batch.sparkSession, batch, baselinePath,
          baselineVersion, reportPath, catCol, batchId)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  // ---- Wasserstein variant: same monitoring contract, the report is
  // [[Drift.wassersteinReport]] — the monitor that answers "how far
  // did the feed move, in the column's units" where the PSI lane
  // answers "how surprising is the move". Per batch: one grouped
  // count each side + a cumulative window over the bucket table. ----

  private def w1Action(batchId: Long) = s"w1-$batchId"

  /** One batch's Wasserstein report, replay-safe (0 rows on a fully
    * replayed batch). */
  private[graft] def reportW1Once(spark: SparkSession, batch: DataFrame,
      baselinePath: String, baselineVersion: Int, reportPath: String,
      valueCol: String, bucketWidth: Double, batchId: Long): Long = {
    val act = w1Action(batchId)
    val hist = TableLog.history(spark, reportPath)
    if (hist.exists(_.action == act)) return 0L
    val baseline = TableLog.read(spark, baselinePath, Some(baselineVersion))
    val report = Drift
      .wassersteinReport(baseline, batch, valueCol, bucketWidth)
      .withColumn("batch_id", lit(batchId))
    val prevDirs = hist.lastOption.map(_.dirs.toSet).getOrElse(Set.empty[String])
    val c = TableLog.commitAppend(spark, reportPath, report, act)
    TableLog.newDirRows(c, prevDirs).getOrElse(report.count())
  }

  /** Streaming Wasserstein monitor over a parquet stream; same
    * trigger/replay contract as [[monitor]]. */
  def monitorW1(spark: SparkSession, sourceDir: String, glob: String,
      baselinePath: String, baselineVersion: Int, reportPath: String,
      valueCol: String, bucketWidth: Double, checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None): Unit = {
    val ss = Streams.streamSession(spark)
    val q = Streams.parquetStream(ss, sourceDir, glob, maxFilesPerTrigger)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        reportW1Once(batch.sparkSession, batch, baselinePath,
          baselineVersion, reportPath, valueCol, bucketWidth, batchId)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  // ---- separability variant: same monitoring contract, the report
  // is one [[graft.operators.ClassifierEval.aucSummary]] row per
  // batch beside the pinned baseline's AUC — what a quality-scorer
  // owner watches ("is the score still SEPARATING the classes it was
  // validated on, or has the feed drifted under it"). AUC can decay
  // while every marginal distribution looks stable, which is exactly
  // the failure PSI/KS/mix monitors cannot see. Per batch: one
  // grouped agg to the distinct-score table each side, nothing
  // stateful. ----

  private def aucAction(batchId: Long) = s"auc-$batchId"

  /** One batch's separability report, replay-safe (0 rows on a
    * fully-replayed batch). `scoredBatch` and the baseline table both
    * carry `scoreCol` (discretized numeric) and boolean `labelCol`;
    * the report row is the batch AUC summary plus the pinned
    * baseline's AUC and the delta. */
  private[graft] def reportAucOnce(spark: SparkSession,
      scoredBatch: DataFrame, baselinePath: String, baselineVersion: Int,
      reportPath: String, scoreCol: String, labelCol: String,
      batchId: Long): Long = {
    val act = aucAction(batchId)
    val hist = TableLog.history(spark, reportPath)
    if (hist.exists(_.action == act)) return 0L
    val baseline = TableLog.read(spark, baselinePath, Some(baselineVersion))
    val baseAuc = graft.operators.ClassifierEval
      .aucSummary(baseline, scoreCol, labelCol)
      .select(col("auc").as("base_auc"))
    val report = graft.operators.ClassifierEval
      .aucSummary(scoredBatch, scoreCol, labelCol)
      .crossJoin(broadcast(baseAuc))   // 1-row × 1-row stat factor
      .withColumn("delta", round(col("auc") - col("base_auc"), 6))
      .withColumn("batch_id", lit(batchId))
    val prevDirs = hist.lastOption.map(_.dirs.toSet).getOrElse(Set.empty[String])
    val c = TableLog.commitAppend(spark, reportPath, report, act)
    TableLog.newDirRows(c, prevDirs).getOrElse(report.count())
  }

  /** Streaming separability monitor over a parquet stream: `score`
    * derives (scoreCol, labelCol) from each raw batch (the scorer
    * under watch); same trigger/replay contract as [[monitor]]. */
  def monitorAuc(spark: SparkSession, sourceDir: String, glob: String,
      score: DataFrame => DataFrame,
      baselinePath: String, baselineVersion: Int, reportPath: String,
      scoreCol: String, labelCol: String, checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None): Unit = {
    val ss = Streams.streamSession(spark)
    val q = Streams.parquetStream(ss, sourceDir, glob, maxFilesPerTrigger)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        reportAucOnce(batch.sparkSession, score(batch), baselinePath,
          baselineVersion, reportPath, scoreCol, labelCol, batchId)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming embedding-drift monitor over a parquet vector stream;
    * same trigger/replay contract as [[monitor]]. */
  def monitorEmbeddings(spark: SparkSession, sourceDir: String,
      glob: String, baselinePath: String, baselineVersion: Int,
      reportPath: String, checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None,
      labelCol: String = "label", vecCol: String = "embedding"): Unit = {
    val ss = Streams.streamSession(spark)
    val q = Streams.parquetStream(ss, sourceDir, glob, maxFilesPerTrigger)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        reportEmbeddingOnce(batch.sparkSession, batch, baselinePath,
          baselineVersion, reportPath, batchId, labelCol, vecCol)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
