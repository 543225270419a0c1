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

  def sessionsFor(events: Iterator[Event], gapUs: Long,
      userId: Long, existing: Option[SessionState]):
      (Seq[Session], Option[SessionState]) = {
    var state = existing
    val closed = Seq.newBuilder[Session]
    events.toSeq.sortBy(e => (e.ts.getTime, e.value)).foreach { e =>
      val us = e.ts.getTime * 1000L
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

  /** Run gap-sessionization over a bounded stream of events and return
    * all sessions (open ones flushed at end via state timeout when the
    * stream is drained with AvailableNow). */
  def run(spark: SparkSession, events: Dataset[Event], gapSeconds: Long,
      sinkName: String): Dataset[Session] = {
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
      .withWatermark("ts", "1 minute")
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
