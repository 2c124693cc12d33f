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

  /** State for [[matchAThenBThenC]]: the latest pending A and the
    * latest VALID (A,B) partial, flat with presence flags (one fixed
    * 6-long record per key — no per-event growth).
    */
  case class Pending3(hasA: Boolean, aTs: Long, aId: Long,
                      hasAB: Boolean, abATs: Long, abAId: Long,
                      abBTs: Long, abBId: Long)

  case class Match3Out(user_id: Long, a_event_id: Long, a_ts: Timestamp,
                       b_event_id: Long, b_ts: Timestamp,
                       c_event_id: Long, c_ts: Timestamp,
                       gap_ab_ms: Long, gap_bc_ms: Long)

  /** THREE-step CEP: A-then-B-then-C with each step within `withinMs`
    * of the previous (Flink CEP's `A followedBy B followedBy C`, the
    * funnel with an intermediate stage — r19 widening of
    * [[matchAThenB]]). Semantics compose the two-step rule twice, and
    * stay SQL-replayable:
    *   - a B is VALID iff its latest lex-preceding A (by (ts, id) — the
    *     processing order) sits within (0, withinMs]; the latest valid
    *     B becomes the pending (A,B) partial (last-valid-B-wins; an
    *     INVALID B changes nothing);
    *   - a C matches the pending partial iff 0 < c.ts − b.ts ≤
    *     withinMs; neither A nor the partial is consumed (every C in
    *     window emits), exactly the batch double-argmax join.
    * State is ONE flat record per key (latest A + latest valid (A,B)),
    * each piece independently evicted by event-time timeout once the
    * watermark passes ITS expiry (a.ts + withinMs / b.ts + withinMs —
    * strict >, the [[matchAThenB]] boundary discipline); expired
    * partials emit nothing. The registered timeout is the EARLIEST
    * live expiry, re-armed as pieces die, so state cannot outlive
    * max(expiries) + one watermark advance.
    */
  def matchAThenBThenC(events: Dataset[EventIn], aType: String,
                       bType: String, cType: String,
                       withinMs: Long): Dataset[Match3Out] = {
    require(Set(aType, bType, cType).size == 3,
      s"pattern steps must be distinct, got ($aType, $bType, $cType)")
    require(withinMs > 0, s"withinMs=$withinMs must be > 0")
    val empty = Pending3(hasA = false, 0L, 0L, hasAB = false, 0L, 0L, 0L, 0L)
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[Pending3, Match3Out](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[EventIn], state: GroupState[Pending3]) =>
          // drop pieces the watermark has strictly passed; None = empty
          def sweep(p: Pending3, wm: Long): Pending3 = p.copy(
            hasA = p.hasA && !(wm > p.aTs + withinMs),
            hasAB = p.hasAB && !(wm > p.abBTs + withinMs))
          def park(p: Pending3, wm: Long): Unit =
            if (!p.hasA && !p.hasAB) { if (state.exists) state.remove() }
            else {
              state.update(p)
              if (wm != Long.MinValue) {
                val exps = Seq(
                  if (p.hasA) Some(p.aTs + withinMs) else None,
                  if (p.hasAB) Some(p.abBTs + withinMs) else None).flatten
                state.setTimeoutTimestamp(math.max(exps.min, wm + 1L))
              }
            }
          val wm = scala.util.Try(state.getCurrentWatermarkMs())
            .getOrElse(Long.MinValue)
          if (state.hasTimedOut) {
            // expired partials emit NOTHING; surviving pieces re-arm
            park(sweep(state.get, wm), wm)
            Iterator.empty
          } else {
            var p = state.getOption.getOrElse(empty)
            val out = Seq.newBuilder[Match3Out]
            rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val t = e.ts.getTime
              if (e.event_type == cType && p.hasAB) {
                val gap = t - p.abBTs
                if (gap > 0 && gap <= withinMs)
                  out += Match3Out(userId, p.abAId, new Timestamp(p.abATs),
                    p.abBId, new Timestamp(p.abBTs), e.event_id,
                    new Timestamp(t), p.abBTs - p.abATs, gap)
              }
              if (e.event_type == bType && p.hasA) {
                val gap = t - p.aTs
                if (gap > 0 && gap <= withinMs)
                  p = p.copy(hasAB = true, abATs = p.aTs, abAId = p.aId,
                    abBTs = t, abBId = e.event_id)
              }
              if (e.event_type == aType &&
                  (!p.hasA || t > p.aTs ||
                    (t == p.aTs && e.event_id > p.aId)))
                p = p.copy(hasA = true, aTs = t, aId = e.event_id)
            }
            park(sweep(p, wm), wm)
            out.result().iterator
          }
      }(Encoders.product[Pending3], Encoders.product[Match3Out])
  }
}
