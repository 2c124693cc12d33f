package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CEP pattern matcher: A-then-B-within-T per key via
  * `flatMapGroupsWithState` — the fraud/funnel-alert shape (Flink CEP's
  * `A followedBy B within T`, SQL MATCH_RECOGNIZE's two-step pattern)
  * that windowed aggregation cannot express because the match condition
  * relates two individual EVENTS, not a window's aggregate. SURVEY §2.8
  * / r17 verdict #3.
  *
  * Semantics (deliberately SQL-replayable, so the stream can be gated
  * against a one-shot batch oracle): a B event matches the LATEST
  * preceding A of the same key when 0 < b.ts − a.ts ≤ withinMs, with
  * timestamps compared at millisecond precision and ms-ties broken by
  * event_id (the deterministic total order). An A is NOT consumed by a
  * match — every B inside the latest A's window emits — and a newer A
  * replaces the pending one (last-A-wins). That is exactly the batch
  * join "B × argmax_{a.ts < b.ts, gap ≤ T} A", so the two-batch replay
  * must reproduce the one-shot SQL row-for-row.
  *
  * Scale shape: state is ONE (ts, id) pair per key — constant per key
  * regardless of event volume — and is evicted by EVENT-TIME timeout
  * the moment the watermark passes a.ts + withinMs (a pending A that
  * can no longer match anything: every accepted future B has
  * ts ≥ watermark). Each micro-batch pays one key-partitioned shuffle;
  * matches emit incrementally in append mode. Expired partial matches
  * emit NOTHING (the alert never fired) — the timeout exists purely to
  * bound state.
  */
object PatternMatch {

  case class EventIn(event_id: Long, ts: Timestamp, user_id: Long,
                     event_type: String)

  /** Pending first-step match: the latest A seen for this key, in
    * epoch-ms (the same precision the match condition uses).
    */
  case class PendingA(aTs: Long, aId: Long)

  case class MatchOut(user_id: Long, a_event_id: Long, a_ts: Timestamp,
                      b_event_id: Long, b_ts: Timestamp, gap_ms: Long)

  /** Match `aType`-then-`bType` within `withinMs` per user. On streams,
    * call with a watermark on `ts` and OutputMode.Append (EventTime
    * timeout requires the watermark). Works unchanged on a batch
    * Dataset (one "micro-batch", no timeouts) — the spec uses that for
    * the stream ≡ batch differential.
    */
  def matchAThenB(events: Dataset[EventIn], aType: String, bType: String,
                  withinMs: Long): Dataset[MatchOut] = {
    require(aType != bType, s"pattern steps must differ, got $aType twice")
    require(withinMs > 0, s"withinMs=$withinMs must be > 0")
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[PendingA, MatchOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[EventIn], state: GroupState[PendingA]) =>
          if (state.hasTimedOut) {
            // the pending A expired unmatched: evict, emit nothing
            state.remove()
            Iterator.empty
          } else {
            var pending = state.getOption.orNull
            val out = Seq.newBuilder[MatchOut]
            // deterministic processing order: (ms, event_id) — the same
            // total order the oracle's argmax uses
            rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val t = e.ts.getTime
              if (e.event_type == bType && pending != null) {
                val gap = t - pending.aTs
                if (gap > 0 && gap <= withinMs)
                  out += MatchOut(userId, pending.aId,
                    new Timestamp(pending.aTs), e.event_id, new Timestamp(t),
                    gap)
              }
              if (e.event_type == aType &&
                  (pending == null || t > pending.aTs ||
                    (t == pending.aTs && e.event_id > pending.aId)))
                pending = PendingA(t, e.event_id)
            }
            if (pending != null) {
              val expiry = pending.aTs + withinMs
              // batch-mode replay has no watermark (the accessor throws
              // rather than returning a sentinel) — treat it as -∞
              val wm = scala.util.Try(state.getCurrentWatermarkMs())
                .getOrElse(Long.MinValue)
              if (wm > expiry) {
                // STRICTLY unmatchable (ADVICE r18): the match window
                // is inclusive (gap ≤ withinMs), so a pending A is only
                // provably dead once wm has passed BEYOND its expiry.
                // At wm == expiry a boundary B (ts == expiry) that
                // rides the SAME micro-batch has already matched above;
                // one in a LATER batch is dropped by Spark's ts <= wm
                // late filter (measured on 4.1.2) — evicting at
                // wm > expiry keeps the operator correct under either
                // reading of the filter boundary instead of depending
                // on it, at the cost of one extra batch of state in the
                // exact-ms-coincidence case
                if (state.exists) state.remove()
              } else {
                state.update(pending)
                // batch mode also rejects timeout registration (no
                // watermark machinery); timeouts are moot there.
                // max(expiry, wm+1): setTimeoutTimestamp requires a
                // beyond-watermark timestamp, and at wm == expiry the
                // state must survive this batch (see above)
                if (wm != Long.MinValue)
                  state.setTimeoutTimestamp(math.max(expiry, wm + 1L))
              }
            }
            out.result().iterator
          }
      }(Encoders.product[PendingA], Encoders.product[MatchOut])
  }

  /** Alert emitted by [[matchAThenNotB]]: the pending A that saw no B
    * inside its window. `deadline_ts` = a_ts + withinMs (the moment the
    * alert became certain).
    */
  case class AlertOut(user_id: Long, a_event_id: Long, a_ts: Timestamp,
                      deadline_ts: Timestamp)

  /** CEP NEGATION: `aType`-then-NO-`bType`-within-`withinMs` per key —
    * the churn/abandonment alert (Flink CEP's `notFollowedBy` closed by
    * a time window), and the complement of [[matchAThenB]]: where the
    * matcher deliberately emits nothing on timeout, THIS operator emits
    * ON timeout — `state.hasTimedOut` is the trigger, not just the
    * state bound (r18 verdict #3).
    *
    * Semantics (SQL-replayable, so the stream gates against a one-shot
    * batch anti-join): an A alerts iff
    *   - no B of the same key has 0 < b.ts − a.ts ≤ withinMs
    *     (a B inside the inclusive window SUPPRESSES the alert), and
    *   - no newer A of the same key sits inside that window (a'.ts −
    *     a.ts in (0, withinMs], or same-ms with a larger event_id — the
    *     [[matchAThenB]] last-A-wins replacement, which supersedes the
    *     pending A silently: the user re-engaged with a fresh A, so the
    *     clock restarts rather than double-alerting), and
    *   - the stream's final watermark passed a.ts + withinMs (an A whose
    *     window is still open at shutdown is undecided — the batch
    *     oracle applies the same cut).
    * An A superseded by a LATER-than-window A′, or followed only by an
    * out-of-window B, alerts inline the moment that later event proves
    * the window closed — same rows as the timeout path, just earlier,
    * so output is invariant to which micro-batch carries the proof.
    *
    * Scale shape: identical to [[matchAThenB]] — ONE (ts, id) pair of
    * state per key, event-time timeout eviction, one key-partitioned
    * shuffle per micro-batch; alerts emit in append mode.
    */
  def matchAThenNotB(events: Dataset[EventIn], aType: String, bType: String,
                     withinMs: Long): Dataset[AlertOut] = {
    require(aType != bType, s"pattern steps must differ, got $aType twice")
    require(withinMs > 0, s"withinMs=$withinMs must be > 0")
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[PendingA, AlertOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[EventIn], state: GroupState[PendingA]) =>
          def alert(p: PendingA) = AlertOut(userId, p.aId,
            new Timestamp(p.aTs), new Timestamp(p.aTs + withinMs))
          if (state.hasTimedOut) {
            // the watermark passed a.ts + withinMs with no suppressing
            // B: the negation FIRED — emit, then evict
            val p = state.get
            state.remove()
            Iterator.single(alert(p))
          } else {
            var pending = state.getOption.orNull
            val out = Seq.newBuilder[AlertOut]
            rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val t = e.ts.getTime
              // any event past the pending window proves the negation
              // before the timeout does: emit inline (same row the
              // timeout would emit — batching-invariant output)
              if (pending != null && t - pending.aTs > withinMs) {
                out += alert(pending)
                pending = null
              }
              if (e.event_type == bType && pending != null) {
                val gap = t - pending.aTs
                if (gap > 0 && gap <= withinMs) pending = null // suppressed
              }
              if (e.event_type == aType &&
                  (pending == null || t > pending.aTs ||
                    (t == pending.aTs && e.event_id > pending.aId)))
                pending = PendingA(t, e.event_id)
            }
            val wm = scala.util.Try(state.getCurrentWatermarkMs())
              .getOrElse(Long.MinValue)
            if (pending == null) {
              // satisfied or superseded-and-emitted: clear any stored
              // pending or it would time out later and double-emit
              if (state.exists) state.remove()
            } else {
              val expiry = pending.aTs + withinMs
              if (wm > expiry) {
                // watermark already proves the negation (every accepted
                // future B has ts ≥ wm > expiry): emit now, don't park
                // state for a timeout that setTimeoutTimestamp would
                // reject. Strict >: at wm == expiry a boundary B with
                // ts == expiry is still admissible and would suppress.
                out += alert(pending)
                if (state.exists) state.remove()
              } else {
                state.update(pending)
                if (wm != Long.MinValue)
                  state.setTimeoutTimestamp(math.max(expiry, wm + 1L))
              }
            }
            out.result().iterator
          }
      }(Encoders.product[PendingA], Encoders.product[AlertOut])
  }
}
