package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, Trigger, TTLConfig, ValueState}

/** Streaming hot-key monitor — the continuous form of
  * [[graft.operators.SkewAdvisor]]: maintain the stream's heaviest
  * keys under BOUNDED state with a Misra–Gries summary per tracker
  * shard. An unbounded `groupBy(key).count()` over a 100 TB stream
  * keeps state per DISTINCT key (the thing that grows without limit);
  * Misra–Gries keeps at most `k` counters per shard and still
  * guarantees every key with true frequency > N/(k+1) is present,
  * with per-key undercount at most the accumulated eviction offset
  * (published alongside as `err`).
  *
  * Sharding: each key hashes to exactly ONE tracker shard
  * (`key mod nShards`), so a shard's summary sees every occurrence of
  * its keys and summaries never overlap — global top-k is a plain
  * sort-limit over the union of shard candidates. State is ≤
  * nShards × k counters TOTAL whatever the key cardinality.
  *
  * Batch merge rule (Agarwal et al., "Mergeable Summaries", PODS'12):
  * the micro-batch's exact local counts merge into the stored summary
  * by addition; if the merged table exceeds `k` entries, every
  * counter drops by the (k+1)-th largest value and non-positive
  * entries evict. The subtracted value accumulates into `err` — the
  * uniform undercount bound for every surviving counter.
  *
  * With `k` at least the per-shard distinct-key count nothing ever
  * evicts, `err` stays 0 and counts are EXACT — the contract that
  * makes the bounded single-batch run DuckDB-oracleable (q149), same
  * pattern as [[StreamingFunnel]]/q114.
  */
object HotKeys extends Serializable {

  case class Ev(shard: Int, key: Long)
  /** Candidate hot key: stored count `est` (underestimates the true
    * count by at most `err`); `batch` is the shard's batch sequence
    * number — a key's CURRENT estimate is its emission in the shard's
    * latest batch (under eviction, older emissions are stale and a
    * key absent from the latest batch has left the summary). */
  case class Candidate(shard: Int, key: Long, est: Long, err: Long,
      batch: Long)

  class MgProcessor(k: Int)
      extends StatefulProcessor[Int, Ev, Candidate] {
    @transient private var counters: MapState[Long, Long] = _
    @transient private var evictedOffset: ValueState[Long] = _
    @transient private var batchSeq: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counters = getHandle.getMapState[Long, Long]("mg",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      evictedOffset = getHandle.getValueState[Long]("err",
        Encoders.scalaLong, TTLConfig.NONE)
      batchSeq = getHandle.getValueState[Long]("batch",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(shard: Int, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[Candidate] = {
      val merged = mutable.LongMap.empty[Long]
      counters.iterator().foreach { case (key, c) => merged(key) = c }
      rows.foreach(e => merged(e.key) = merged.getOrElse(e.key, 0L) + 1L)
      var err = if (evictedOffset.exists()) evictedOffset.get() else 0L
      val batch = (if (batchSeq.exists()) batchSeq.get() else 0L) + 1L
      val kept =
        if (merged.size <= k) merged
        else {
          // (k+1)-th largest merged count becomes the uniform decrement
          val cut = merged.values.toArray.sorted(Ordering[Long].reverse)(k)
          err += cut
          merged.collect { case (key, c) if c > cut => (key, c - cut) }
        }
      counters.clear()
      kept.foreach { case (key, c) => counters.updateValue(key, c) }
      evictedOffset.update(err)
      batchSeq.update(batch)
      kept.toArray.sortBy { case (key, c) => (-c, key) }
        .map { case (key, c) => Candidate(shard, key, c, err, batch) }
        .iterator
    }
  }

  /** The FINAL summary across a bounded run's emissions: per shard,
    * only the latest batch's rows — exactly the end-of-stream state.
    * Update-mode re-emissions from earlier batches are stale the
    * moment an eviction decrements a counter, so any cross-batch
    * aggregate (max, last-seen) over raw emissions is wrong; this is
    * the one correct projection. */
  def finalSummary(cands: Dataset[Candidate]): Dataset[Candidate] = {
    // window instead of a groupBy+self-join: memory-sink views don't
    // dedup attribute ids across a self-join, and the candidate table
    // is bounded (≤ nShards × k rows per batch) anyway
    val w = org.apache.spark.sql.expressions.Window.partitionBy("shard")
    cands.toDF()
      .withColumn("__maxb", max("batch").over(w))
      .filter(col("batch") === col("__maxb"))
      .drop("__maxb")
      .as[Candidate](Encoders.product[Candidate])
  }

  /** Bounded run over a key stream → every batch's candidate summary
    * rows. RocksDB provider pinned like the other transformWithState
    * operators. */
  def run(spark: SparkSession, keys: Dataset[Ev], k: Int,
      sinkName: String): Dataset[Candidate] = {
    // the query runs under the DATASET's session conf — pin the state
    // provider there (the passed session may be its parent)
    val ss = keys.sparkSession
    val conf = "spark.sql.streaming.stateStore.providerClass"
    val previous = ss.conf.getOption(conf)
    ss.conf.set(conf,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import spark.implicits._
      val q = keys
        .groupByKey(_.shard)
        .transformWithState(new MgProcessor(k),
          TimeMode.None(), OutputMode.Update())
        .writeStream
        .outputMode("update")
        .format("memory")
        .queryName(sinkName)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      ss.table(sinkName).as[Candidate]
    } finally {
      previous match {
        case Some(p) => ss.conf.set(conf, p)
        case None => ss.conf.unset(conf)
      }
    }
  }

  /** Global top-`n` hot users of the events file by event count,
    * streamed through the bounded-state monitor. With `k` sized above
    * the per-shard distinct-user count the summary is exact (err 0),
    * so the result equals the batch `GROUP BY` top-n. */
  def topEventUsers(spark: SparkSession, sfDir: String, nShards: Int = 8,
      k: Int = 4096, topN: Int = 20): Dataset[org.apache.spark.sql.Row] = {
    val ss = Streams.streamSession(spark)
    import ss.implicits._
    val ev = Streams.eventStream(ss, sfDir)
      .select(pmod(col("user_id"), lit(nShards)).cast("int").as("shard"),
        col("user_id").as("key"))
      .as[Ev]
    finalSummary(
      run(ss, ev, k, s"graft_hotkeys_${Streams.counter.incrementAndGet()}"))
      .select(col("key").as("user_id"), col("est").as("n_events"))
      .orderBy(col("n_events").desc, col("user_id"))
      .limit(topN)
  }
}
