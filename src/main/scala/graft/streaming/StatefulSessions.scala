package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Custom streaming state: gap-based session windows via
  * flatMapGroupsWithState — the stateful-processing tier the batch
  * Sessionize operator cannot express incrementally.
  *
  * Per user, an open session lives in [[GroupState]]; an event either
  * extends it or closes it (gap exceeded) and emits the closed session.
  * With event-time timeout the state is bounded by the watermark — this
  * is the piece that lets session detection run continuously over an
  * unbounded stream instead of re-sorting history per batch.
  */
object StatefulSessions extends Serializable {

  case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(start: Long, lastTs: Long, n: Long, total: Double)
  case class Session(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, total_value: Double)

  // full microsecond precision: getTime alone truncates to millis,
  // diverging from the batch Sessionize operator's unix_micros math
  // (and breaking same-millisecond ordering) for TIMESTAMP_MICROS data
  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  def sessionsFor(events: Iterator[Event], gapUs: Long,
      userId: Long, existing: Option[SessionState]):
      (Seq[Session], Option[SessionState]) = {
    var state = existing
    val closed = Seq.newBuilder[Session]
    events.toSeq.sortBy(e => (micros(e.ts), e.value)).foreach { e =>
      val us = micros(e.ts)
      state match {
        case Some(s) if us - s.lastTs <= gapUs =>
          state = Some(s.copy(lastTs = us, n = s.n + 1, total = s.total + e.value))
        case Some(s) =>
          closed += Session(userId, s.start, s.lastTs, s.n, s.total)
          state = Some(SessionState(us, us, 1, e.value))
        case None =>
          state = Some(SessionState(us, us, 1, e.value))
      }
    }
    (closed.result(), state)
  }

  /** Run gap-sessionization over a bounded stream of events. Returns
    * every CLOSED session, plus open sessions whose event-time timeout
    * (last event + gap) falls at or before the final watermark
    * (max event time − `latenessSeconds`). The trailing open session
    * of a user active within `gap + lateness` of stream end stays in
    * the state store — a drained AvailableNow run cannot advance the
    * watermark past its own max event time, so that timeout never
    * fires; it flushes only when a later run's data moves the
    * watermark. Callers comparing against batch Sessionize must
    * compare closed sessions.
    *
    * `latenessSeconds` is the disorder tolerance: flatMapGroupsWithState
    * with an event-time timeout DROPS rows older than the watermark, so
    * cross-batch disorder beyond it silently loses events — while a
    * larger value delays (or, in a bounded run, prevents) timeout
    * flushes. Single-batch runs are insensitive to it; multi-batch
    * sources should size it to their real out-of-orderness. */
  def run(spark: SparkSession, events: Dataset[Event], gapSeconds: Long,
      sinkName: String, latenessSeconds: Long = 60L): Dataset[Session] = {
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L

    def update(userId: Long, events: Iterator[Event],
        state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(Session(userId, s.start, s.lastTs, s.n, s.total))
      } else {
        val (closed, next) = sessionsFor(events, gapUs, userId, state.getOption)
        next match {
          case Some(s) =>
            state.update(s)
            state.setTimeoutTimestamp(s.lastTs / 1000L + gapSeconds * 1000L)
          case None => if (state.exists) state.remove()
        }
        closed.iterator
      }
    }

    val q = events
      .withWatermark("ts", s"$latenessSeconds seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sinkName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sinkName).as[Session]
  }
}
