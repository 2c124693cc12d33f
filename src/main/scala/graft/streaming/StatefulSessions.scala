package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via `flatMapGroupsWithState` — the
  * escape hatch for session semantics `session_window` can't express
  * (here: per-session event cap + value accumulator emitted at
  * timeout). SURVEY §2.8 / the driver mandate's "custom state" surface.
  *
  * State per user: open session (start, last event time, count, value
  * sum). An event extends the session if within `gapMs` of the last
  * one, else the closed session is emitted and a new one opens. On
  * event-time timeout (watermark passed last + gap) the open session is
  * emitted and state cleared — bounded state, the only streaming-safe
  * contract at scale.
  */
object StatefulSessions {

  case class EventIn(event_id: Long, ts: Timestamp, user_id: Long,
                     event_type: String, value: Double)

  case class SessionState(start: Long, lastTs: Long, nEvents: Long, sumValue: Double)

  case class SessionOut(user_id: Long, session_start: Timestamp,
                        session_end: Timestamp, n_events: Long,
                        sum_value: Double, closed_by: String)

  /** Sessionize a (possibly streaming) Dataset of events. On streams,
    * call with a watermark on `ts` and OutputMode.Append.
    */
  def sessionize(events: Dataset[EventIn], gapMs: Long): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._

    def emit(userId: Long, st: SessionState, closedBy: String): SessionOut =
      SessionOut(userId, new Timestamp(st.start), new Timestamp(st.lastTs + gapMs),
        st.nEvents, st.sumValue, closedBy)

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[EventIn], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(emit(userId, _, "timeout")).toSeq
            state.remove()
            out.iterator
          } else {
            var st = state.getOption.orNull
            val closed = Seq.newBuilder[SessionOut]
            rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val t = e.ts.getTime
              st match {
                case null =>
                  st = SessionState(t, t, 1L, e.value)
                case s if t - s.lastTs < gapMs =>
                  st = s.copy(lastTs = math.max(s.lastTs, t),
                    nEvents = s.nEvents + 1, sumValue = s.sumValue + e.value)
                case s =>
                  closed += emit(userId, s, "gap")
                  st = SessionState(t, t, 1L, e.value)
              }
            }
            if (st != null) {
              state.update(st)
              // evict once the watermark passes the session end
              state.setTimeoutTimestamp(st.lastTs + gapMs)
            }
            closed.result().iterator
          }
      }(Encoders.product[SessionState], Encoders.product[SessionOut])
  }
}
