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
    *
    * DELIVERY-ORDER CONTRACT: cross-batch arrival must be event-time
    * monotone per key (a micro-batch never carries a row older than a
    * previous batch's maximum for that key — the shape of a time-split
    * file replay or a per-key-ordered log). The single-pending-A state
    * is what makes this operator O(1) per key, and it is exactly what
    * an out-of-order-above-watermark delivery can break: a late
    * in-window A arriving after a newer A was processed can no longer
    * be the argmax for a B between them. Exact matching under
    * arbitrary admissible disorder needs a buffer of every in-horizon
    * A (state ∝ event rate × watermark lag — the Flink CEP cost); use
    * the batch join when the source cannot guarantee per-key order.
    * ([[matchAThenNotB]] does NOT need this contract — negation's
    * suppressors compress into bounded spans, so it is exact under any
    * admissible delivery order.)
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

  /** A suppression interval for [[matchAThenNotB]]: every OBSERVED A or
    * B event at ts covers `[ts − withinMs, ts)` — any pending or future
    * A whose timestamp falls inside is suppressed (a B in its window,
    * or a superseding newer A; the oracle's two NOT EXISTS clauses have
    * the same half-open form). Spans are kept merged and disjoint, and
    * pruned once the watermark passes them, so the per-key span count
    * is ≤ watermarkLag/withinMs + 2 — merged spans are ≥ withinMs long.
    */
  case class BSpan(from: Long, until: Long)

  /** State for [[matchAThenNotB]]: the undecided As (none suppressed,
    * none past the watermark) + the merged suppression spans. Both
    * lists are bounded by watermarkLag/withinMs + 2 REGARDLESS of event
    * rate: undecided As are pairwise > withinMs apart (a closer pair
    * means the later one's span suppressed the earlier), and spans are
    * merged ≥ withinMs-long disjoint intervals — all inside the
    * (wm − withinMs, maxSeenTs] horizon.
    */
  case class NotBState(items: Seq[PendingA], spans: Seq[BSpan])

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
    *
    * The ONLY emission proof is the WATERMARK (ADVICE r19): an observed
    * event's timestamp passing the window proves nothing — with a
    * non-zero watermark delay, an in-window suppressing B (or
    * superseding A) that is above the watermark can still arrive in a
    * LATER micro-batch. So alerts fire exclusively once wm > a.ts +
    * withinMs (end-of-batch sweep or event-time timeout), suppressors
    * persist as merged [[BSpan]]s until the watermark passes them, and
    * the output is INVARIANT to any admissible delivery order — not
    * just event-time-monotone micro-batches (PatternMatchSpec's
    * property test replays random out-of-order-above-watermark
    * schedules against the batch anti-join). A batch Dataset replay has
    * no watermark and emits NOTHING — batch negation is the anti-join
    * itself, not this operator.
    *
    * Scale shape: state per key is ≤ 2·(watermarkLag/withinMs + 2) flat
    * records ([[NotBState]]) — constant for a given lag/window ratio,
    * independent of event volume; with an in-order source and a small
    * delay it is one pending A + one span. Event-time timeout eviction,
    * one key-partitioned shuffle per micro-batch, append-mode alerts.
    */
  def matchAThenNotB(events: Dataset[EventIn], aType: String, bType: String,
                     withinMs: Long): Dataset[AlertOut] = {
    require(aType != bType, s"pattern steps must differ, got $aType twice")
    require(withinMs > 0, s"withinMs=$withinMs must be > 0")
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[NotBState, AlertOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[EventIn], state: GroupState[NotBState]) =>
          def alert(p: PendingA) = AlertOut(userId, p.aId,
            new Timestamp(p.aTs), new Timestamp(p.aTs + withinMs))
          // insert [from, until) keeping spans merged and disjoint
          // (half-open adjacency [a,b)+[b,c) merges exactly to [a,c))
          def addSpan(spans: List[BSpan], from: Long, until: Long): List[BSpan] = {
            val (overlap, rest) = spans.partition(s =>
              s.from <= until && from <= s.until)
            BSpan((from :: overlap.map(_.from)).min,
              (until :: overlap.map(_.until)).max) :: rest
          }
          val wm = scala.util.Try(state.getCurrentWatermarkMs())
            .getOrElse(Long.MinValue)
          var items = state.getOption.map(_.items.toList).getOrElse(Nil)
          var spans = state.getOption.map(_.spans.toList).getOrElse(Nil)
          val out = Seq.newBuilder[AlertOut]
          if (!state.hasTimedOut) {
            rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val t = e.ts.getTime
              if (e.event_type == bType || e.event_type == aType) {
                // every observed A or B suppresses As in [t−W, t) —
                // pending ones now, out-of-order future ones via the
                // span (suppressors count even when themselves
                // suppressed, exactly like the oracle's EXISTS)
                items = items.filterNot(p =>
                  t - p.aTs > 0 && t - p.aTs <= withinMs)
                spans = addSpan(spans, t - withinMs, t)
              }
              if (e.event_type == aType) {
                // same-ms tie: the higher event_id supersedes (spans
                // are ms-granular and half-open, so the tie is handled
                // on the live items; a REMOVED same-ms suppressor's own
                // remover always covers this ms — closure by induction)
                items = items.filterNot(p =>
                  p.aTs == t && e.event_id > p.aId)
                val dead = spans.exists(s => s.from <= t && t < s.until) ||
                  items.exists(p => p.aTs == t && p.aId > e.event_id)
                if (!dead) items ::= PendingA(t, e.event_id)
              }
            }
          }
          // watermark sweep — the only proof that fires an alert:
          // every admissible future suppressor has ts > wm, so an A
          // with wm > a.ts + withinMs can no longer be suppressed.
          // Strict >: at wm == expiry a boundary B (ts == expiry) is
          // still admissible and would suppress.
          val (dead, live) = items.partition(p => wm > p.aTs + withinMs)
          dead.sortBy(p => (p.aTs, p.aId)).foreach(p => out += alert(p))
          // a span is useful while it covers some admissible ts > wm
          val liveSpans = spans.filter(_.until > wm + 1)
          if (live.isEmpty && liveSpans.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(NotBState(live.sortBy(p => (p.aTs, p.aId)),
              liveSpans.sortBy(_.from)))
            if (wm != Long.MinValue) {
              // wake at the earliest decision point: an item's expiry
              // (alert) or a span's end (prune) — re-armed every sweep
              val wake = (live.map(_.aTs + withinMs) ++
                liveSpans.map(_.until)).min
              state.setTimeoutTimestamp(math.max(wake, wm + 1L))
            }
          }
          out.result().iterator
      }(Encoders.product[NotBState], Encoders.product[AlertOut])
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
    *
    * Same DELIVERY-ORDER CONTRACT as [[matchAThenB]] (documented
    * there): cross-batch arrival must be event-time monotone per key —
    * a late in-window B arriving after its C was processed misses the
    * match under the one-partial state this operator's O(1)-per-key
    * bound buys.
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
