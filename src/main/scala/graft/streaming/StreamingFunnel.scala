package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, Trigger, TTLConfig, ValueState}

/** Streaming ordered-funnel tracking on `transformWithState`: each
  * user's state is (highest completed step, its conversion time); a
  * micro-batch advances the state through the step sequence in
  * event-time order and emits one completion row per step newly
  * reached — the continuous form of [[graft.operators.Funnel]], for
  * the dashboard that watches conversions accumulate live instead of
  * recomputing the batch funnel per refresh.
  *
  * Semantics equal the batch funnel's greedy earliest-qualifying-event
  * rule (a step counts only STRICTLY after the previous step's
  * conversion time) provided events arrive in event-time order ACROSS
  * batches — the in-order-source contract; within a batch, arrival
  * order doesn't matter (rows are sorted by event time before the
  * state walk). A bounded single-batch run is therefore exactly the
  * batch funnel, which keeps the operator DuckDB-oracleable (q114).
  *
  * Scale shape: one shuffle on the user key; state is two numbers per
  * live user (the smallest of any stateful operator here), and each
  * user emits at most |steps| rows EVER, so the sink side is bounded
  * by conversions, not events.
  */
object StreamingFunnel extends Serializable {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  /** User `user_id` newly completed `step` (1-based) at `ts`. */
  case class Completion(user_id: Long, step: Int, ts: java.sql.Timestamp)

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  class FunnelProcessor(steps: Seq[String])
      extends StatefulProcessor[Long, Ev, Completion] {
    @transient private var state: ValueState[(Int, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Int, Long)](
        "funnel", Encoders.product[(Int, Long)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[Completion] = {
      var (step, us) = if (state.exists()) state.get() else (0, Long.MinValue)
      val completions = Seq.newBuilder[Completion]
      // batch arrival order is arbitrary; the funnel's strict-after
      // rule needs the event-time walk
      rows.toArray.sortBy(e => micros(e.ts)).foreach { e =>
        if (step < steps.length && e.event_type == steps(step) &&
            (step == 0 || micros(e.ts) > us)) {
          step += 1
          us = micros(e.ts)
          completions += Completion(key, step, e.ts)
        }
      }
      state.update((step, us))
      completions.result().iterator
    }
  }

  /** Bounded run over `events` → all completions (one row per user per
    * step reached). RocksDB provider pinned for the run like the other
    * transformWithState operators (named state = column families). */
  def run(spark: SparkSession, events: Dataset[Ev], steps: Seq[String],
      sinkName: String): Dataset[Completion] = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val previous = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import spark.implicits._
      val q = events
        .groupByKey(_.user_id)
        .transformWithState(new FunnelProcessor(steps),
          TimeMode.None(), OutputMode.Update())
        .writeStream
        .outputMode("update")
        .format("memory")
        .queryName(sinkName)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(sinkName).as[Completion]
    } finally {
      previous match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    }
  }

  /** q114 path: per-step conversion counts over the bounded events
    * backlog — equal to [[graft.operators.Funnel.funnel]] (and its SQL
    * oracle) on a single-batch source. Steps with zero conversions
    * still report (count 0). */
  def funnelCounts(spark: SparkSession, dir: String,
      steps: Seq[String], glob: String = "events.parquet"): DataFrame = {
    import spark.implicits._
    val ss = Streams.streamSession(spark)
    val events = Streams.eventStream(ss, dir, glob)
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[Ev](Encoders.product[Ev])
    val name = s"graft_funnel_${Streams.counter.incrementAndGet()}"
    val completions = run(ss, events, steps, name).toDF()
    val stepNames = steps.zipWithIndex
      .map { case (s, i) => (i + 1, s) }.toDF("step", "event_type")
    stepNames.join(completions.groupBy("step")
        .agg(count(lit(1)).as("users")), Seq("step"), "left")
      .na.fill(0L, Seq("users"))
      .select(col("step"), col("event_type"), col("users"))
      .orderBy("step")
  }
}
