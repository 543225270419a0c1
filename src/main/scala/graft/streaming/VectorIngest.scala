package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.lake.TableLog
import graft.operators.VectorIndex

/** Streaming embedding admission into a persisted
  * [[graft.operators.VectorIndex]] — the vector-side twin of
  * [[CorpusIngest]]: each micro-batch assigns against the PERSISTED
  * codebook (map-only, never a refit) and appends postings, so index
  * growth is one scan of each batch regardless of index size.
  *
  * Replay safety is SIMPLER than the corpus path: assignment is a pure
  * function of (batch, codebook) and the codebook is fixed between
  * explicit rebuilds, so a replayed batch recomputes identical
  * postings — the only guard needed is the batch-id-tagged commit that
  * makes the append itself idempotent.
  *
  * Drift policy: each batch's quantization-error ratio is checked
  * against [[VectorIndex.needsRefit]]. `failOnDrift = true` stops the
  * stream loudly (operator rebuilds via [[VectorIndex.build]] and
  * restarts); the default records admission and keeps going — drift
  * degrades recall, not correctness, and a nightly rebuild is the
  * typical cadence.
  */
object VectorIngest {

  private def admitAction(batchId: Long) = s"admit-$batchId"

  /** One batch's admission, replay-safe. Returns (rows appended this
    * call — 0 on replay, drift ratio — NaN on replay/empty). */
  private[graft] def admitBatchOnce(spark: SparkSession, batch: DataFrame,
      indexRoot: String, batchId: Long, failOnDrift: Boolean = false,
      idCol: String = "vec_id", vecCol: String = "embedding"): (Long, Double) = {
    val act = admitAction(batchId)
    val postings = VectorIndex.postingsPath(indexRoot)
    val hist = TableLog.history(spark, postings)
    if (hist.exists(_.action == act)) return (0L, Double.NaN)
    if (batch.isEmpty) return (0L, Double.NaN)
    val (cents, buildErr) = VectorIndex.loadCodebook(spark, indexRoot)
    // assigned feeds both the drift aggregate and the postings write —
    // pay the centroid assignment once per batch, not twice
    val assigned = graft.operators.Similarity
      .assignToCentroids(batch, cents, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val drift = VectorIndex.batchDrift(assigned, cents, buildErr, vecCol)
      if (failOnDrift && VectorIndex.needsRefit(drift))
        throw new IllegalStateException(
          f"embedding drift $drift%.2f exceeds refit tolerance — rebuild the " +
            "codebook (VectorIndex.build) and restart the stream")
      val prevDirs = hist.lastOption.map(_.dirs.toSet).getOrElse(Set.empty[String])
      val c = TableLog.commitAppend(spark, postings, assigned, act)
      (TableLog.newDirRows(c, prevDirs).getOrElse(assigned.count()), drift)
    } finally assigned.unpersist(blocking = false)
  }

  /** Continuous admission of a parquet embedding stream into the index
    * (which must already be [[VectorIndex.build]]t). AvailableNow +
    * `maxFilesPerTrigger` gives the bounded replayable run; remove the
    * trigger for a long-running ingest. */
  def admitEmbeddings(spark: SparkSession, sourceDir: String,
      indexRoot: String, checkpointDir: String,
      glob: String = "embeddings.parquet",
      maxFilesPerTrigger: Option[Int] = None,
      failOnDrift: Boolean = false): Unit = {
    val ss = Streams.streamSession(spark)
    val q = Streams.parquetStream(ss, sourceDir, glob, maxFilesPerTrigger)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitBatchOnce(batch.sparkSession, batch, indexRoot, batchId,
          failOnDrift)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
