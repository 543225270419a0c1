package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, Trigger, TTLConfig, ValueState}

/** Streaming per-user profiles on the `transformWithState` API
  * (Spark 4's arbitrary-stateful-processing operator, the successor to
  * flatMapGroupsWithState): a typed [[ValueState]] accumulates each
  * user's running event count / value sum / latest event time, and the
  * updated profile is emitted per micro-batch.
  *
  * Why this API for the 100 TB shape: state is declared through a
  * handle (named, typed, per-key) with a TTL config — idle keys
  * expire WITHOUT hand-rolled timer bookkeeping, which is the
  * state-bound story for a corpus of transient users; and the
  * processor composes multiple state variables per key where
  * GroupState holds exactly one. State lives in the per-partition
  * state store exactly like the other stateful operators — one
  * shuffle on the key, bounded by live-key cardinality.
  *
  * Over a bounded single-batch run the emitted profiles equal the
  * batch group-by, which makes the operator DuckDB-oracleable (q69).
  */
object UserProfiles extends Serializable {

  case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class Profile(user_id: Long, n_events: Long, total_value: Double,
      last_ts: java.sql.Timestamp)

  /** Running accumulator per user; emits the post-batch profile. */
  class ProfileProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, Event, Profile] {
    @transient private var state: ValueState[(Long, Double, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Double, Long)](
        "profile", Encoders.product[(Long, Double, Long)], ttl)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[Profile] = {
      var (n, total, lastUs) =
        if (state.exists()) state.get() else (0L, 0.0, Long.MinValue)
      rows.foreach { e =>
        n += 1
        total += e.value
        val us = e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L
        if (us > lastUs) lastUs = us
      }
      state.update((n, total, lastUs))
      // rebuild at full microsecond precision (Timestamp(millis) alone
      // would truncate and break batch/oracle equality)
      val t = new java.sql.Timestamp(lastUs / 1000000L * 1000L)
      t.setNanos((lastUs % 1000000L).toInt * 1000)
      Iterator.single(Profile(key, n, total, t))
    }
  }

  /** Bounded run → final profiles, batch-equivalent on a single-file
    * source (one micro-batch). transformWithState's named state
    * variables map to state-store column families, which the default
    * HDFS-backed provider lacks — the stream session pins the RocksDB
    * provider (how this operator runs in production too: RocksDB is
    * the large-state store). */
  def run(spark: SparkSession, events: Dataset[Event],
      sinkName: String, ttl: TTLConfig = TTLConfig.NONE): Dataset[Profile] = {
    // the provider must be set on the dataset's session for this run,
    // but it is shared mutable conf — restore the caller's value so
    // unrelated streams on the same session keep their provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val previous = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import spark.implicits._
      val q = events
        .groupByKey(_.user_id)
        .transformWithState(new ProfileProcessor(ttl),
          TimeMode.None(), OutputMode.Update())
        .writeStream
        .outputMode("update")
        .format("memory")
        .queryName(sinkName)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(sinkName).as[Profile]
    } finally {
      previous match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    }
  }

  /** Oracle path for q69: profiles over the bounded events backlog,
    * equal to the batch per-user aggregate. */
  def userProfiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ss = Streams.streamSession(spark)
    val events = {
      import org.apache.spark.sql.functions.col
      Streams.eventStream(ss, dir)
        .select(col("user_id"), col("ts"), col("value"))
        .as[Event](Encoders.product[Event])
    }
    val name = s"graft_profiles_${Streams.counter.incrementAndGet()}"
    run(ss, events, name)
      .toDF()
      .select(col("user_id"), col("n_events"),
        round(col("total_value"), 2).as("total_value"), col("last_ts"))
      .orderBy("user_id")
  }
}
