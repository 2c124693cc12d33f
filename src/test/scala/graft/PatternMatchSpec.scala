package graft

import java.sql.Timestamp
import graft.streaming.PatternMatch
import graft.streaming.PatternMatch.EventIn
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** CEP A-then-B-within-T (flatMapGroupsWithState): match semantics,
  * cross-batch pending state, and TIMEOUT-EXPIRED partial matches over
  * MemoryStream micro-batches (r17 verdict #3).
  */
class PatternMatchSpec extends SparkSpec {
  import spark.implicits._

  private val Within = 10L * 60L * 1000L // 10 minutes

  private def ev(id: Long, minute: Int, typ: String, user: Long = 1L,
                 hour: Int = 10): EventIn =
    EventIn(id, Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00"),
      user, typ)

  private def run(batches: Seq[EventIn]*): (Seq[(Long, Long, Long, Long)], Long) = {
    val input = MemoryStream[EventIn](spark)
    val matches = PatternMatch.matchAThenB(
      input.toDS().withWatermark("ts", "0 seconds"), "view", "purchase",
      Within)
    val name = s"t_cep_${System.nanoTime()}"
    val q = matches.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val rows = spark.table(name).collect().map(r =>
        (r.getAs[Long]("user_id"), r.getAs[Long]("a_event_id"),
          r.getAs[Long]("b_event_id"), r.getAs[Long]("gap_ms"))).toSeq.sorted
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      (rows, stateRows)
    } finally q.stop()
  }

  test("B matches the LATEST preceding A in window; A is not consumed; ties and bounds hold") {
    val (rows, _) = run(Seq(
      ev(1, 0, "view"), ev(2, 3, "view"), // A1 then A2 (A2 is latest)
      ev(3, 5, "purchase"), // matches A2 (2 min), not A1
      ev(4, 8, "purchase"), // A2 again (not consumed)
      ev(5, 13, "purchase"), // exactly 10 min after A2 → boundary match
      ev(6, 3, "click"), // non-pattern noise
      ev(7, 30, "purchase"))) // 27 min after A2 → out of window
    assert(rows == Seq(
      (1L, 2L, 3L, 2L * 60000L),
      (1L, 2L, 4L, 5L * 60000L),
      (1L, 2L, 5L, 10L * 60000L)))
  }

  test("same-timestamp A and B do not match (strict precedence); per-user isolation") {
    val (rows, _) = run(Seq(
      ev(1, 0, "view", user = 1), ev(2, 0, "purchase", user = 1), // tie → no match
      ev(3, 0, "view", user = 2), ev(4, 4, "purchase", user = 2), // user 2 matches
      ev(5, 4, "purchase", user = 3))) // B with no A → nothing
    assert(rows == Seq((2L, 3L, 4L, 4L * 60000L)))
  }

  test("pending A crosses the batch boundary and matches a batch-2 B") {
    val (rows, _) = run(
      Seq(ev(1, 0, "view")),
      Seq(ev(2, 7, "purchase")))
    assert(rows == Seq((1L, 1L, 2L, 7L * 60000L)))
  }

  test("timeout-expired partial match: emits nothing, state is evicted, late B cannot match") {
    // batch 1: a lone A for user 1. batch 2: unrelated user-2 traffic
    // advances the watermark past A's expiry (10:00 + 10 min). batch 3:
    // the expired state's timeout fires (hasTimedOut), and user 1's
    // late-window purchase at 10:30 finds nothing to match.
    val (rows, stateRows) = run(
      Seq(ev(1, 0, "view", user = 1)),
      Seq(ev(2, 20, "click", user = 2)),
      Seq(ev(3, 30, "purchase", user = 1), ev(4, 31, "click", user = 2)))
    assert(rows.isEmpty, s"expired partial matches must emit nothing: $rows")
    // after the final batch the expired A is gone from the store; user
    // 2's noise holds no state (no pending A was ever created for it)
    assert(stateRows == 0L,
      s"state must be evicted once the watermark passes a.ts + within: $stateRows rows")
  }

  test("a newer A replaces the pending one and resets the eviction clock") {
    val (rows, stateRows) = run(
      Seq(ev(1, 0, "view")),
      // 9 min later: new A — pending becomes A2, expiry moves to 10:19
      Seq(ev(2, 9, "view")),
      // 10:15 purchase: 6 min after A2 (match), 15 after A1 (not kept)
      Seq(ev(3, 15, "purchase")))
    assert(rows == Seq((1L, 2L, 3L, 6L * 60000L)))
    assert(stateRows == 1L, "A2 still pending (watermark at 10:15 < 10:19 expiry)")
  }

  test("watermark exactly at expiry does NOT evict (inclusive window); state clears one advance later") {
    // ADVICE r18: eviction at wm >= expiry contradicted the inclusive
    // match window (a boundary B with gap == within is a legal match
    // while wm == expiry). Spark's ts <= wm late filter (measured on
    // 4.1.2 — WmProbe) means such a B can only ride the SAME batch,
    // where it matches inline — so the observable contract of the fix
    // is retention: at wm == expiry the pending A must still be in
    // state (old code evicted it), and it must still evict cleanly
    // once the watermark moves past.
    val input = MemoryStream[EventIn](spark)
    val matches = PatternMatch.matchAThenB(
      input.toDS().withWatermark("ts", "0 seconds"), "view", "purchase",
      Within)
    val name = s"t_cep_bnd_${System.nanoTime()}"
    val q = matches.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: A at 10:00 (expiry 10:10) + user-2 noise at 10:10 →
      // the watermark lands EXACTLY on the expiry
      input.addData(Seq(ev(1, 0, "view", user = 1), ev(2, 10, "click", user = 2)))
      q.processAllAvailable()
      // batch 2: a user-1 row invokes the function at wm == expiry —
      // the pending A must survive (setTimeoutTimestamp goes to wm+1)
      input.addData(Seq(ev(3, 10, "click", user = 1)))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.head.numRowsTotal == 1L,
        "pending A must be RETAINED at wm == expiry (inclusive window)")
      // batch 3: watermark moves beyond → timeout fires, state clears,
      // and the expired partial still emits nothing
      input.addData(Seq(ev(4, 30, "click", user = 2)))
      q.processAllAvailable()
      input.addData(Seq(ev(5, 31, "click", user = 2)))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.head.numRowsTotal == 0L,
        "state must evict once wm > expiry")
      assert(spark.table(name).isEmpty, "expired partial must emit nothing")
    } finally q.stop()
  }

  test("batch Dataset replay equals the streaming result (one-shot differential)") {
    val events = Seq(
      ev(1, 0, "view"), ev(2, 3, "view"), ev(3, 5, "purchase"),
      ev(4, 30, "purchase"), ev(5, 40, "view", user = 2),
      ev(6, 45, "purchase", user = 2))
    val batch = PatternMatch.matchAThenB(events.toDS(), "view", "purchase",
      Within).collect().map(m =>
      (m.user_id, m.a_event_id, m.b_event_id, m.gap_ms)).toSeq.sorted
    val (streamed, _) = run(events.take(3), events.drop(3))
    assert(batch == streamed)
  }

  // ---- matchAThenNotB (negation / churn alert; r18 verdict #3) ----

  /** (user_id, a_event_id, a_ts_ms, deadline_ms) alerts + final state rows. */
  private def runNot(batches: Seq[EventIn]*): (Seq[(Long, Long, Long, Long)], Long) = {
    val input = MemoryStream[EventIn](spark)
    val alerts = PatternMatch.matchAThenNotB(
      input.toDS().withWatermark("ts", "0 seconds"), "view", "purchase",
      Within)
    val name = s"t_cepnot_${System.nanoTime()}"
    val q = alerts.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val rows = spark.table(name).collect().map(r =>
        (r.getAs[Long]("user_id"), r.getAs[Long]("a_event_id"),
          r.getAs[java.sql.Timestamp]("a_ts").getTime,
          r.getAs[java.sql.Timestamp]("deadline_ts").getTime)).toSeq.sorted
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      (rows, stateRows)
    } finally q.stop()
  }

  private def ms(minute: Int, hour: Int = 10): Long =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00").getTime

  test("negation: unanswered A alerts on TIMEOUT once the watermark passes its deadline") {
    val (rows, stateRows) = runNot(
      Seq(ev(1, 0, "view", user = 1)),
      Seq(ev(2, 25, "click", user = 2)), // wm → 10:25 > 10:10 deadline
      Seq(ev(3, 26, "click", user = 2))) // timeout fires with wm = 10:25
    assert(rows == Seq((1L, 1L, ms(0), ms(10))),
      s"expired unanswered A must EMIT (timeout-emission semantics): $rows")
    assert(stateRows == 0L, s"alerted state must be evicted: $stateRows")
  }

  test("negation: a B arriving in a LATER micro-batch before the timeout suppresses the alert") {
    val (rows, stateRows) = runNot(
      Seq(ev(1, 0, "view", user = 1)),
      Seq(ev(2, 7, "purchase", user = 1)), // in-window B, cross-batch
      Seq(ev(3, 30, "click", user = 2))) // wm sails past the deadline
    assert(rows.isEmpty, s"suppressed A must never alert: $rows")
    assert(stateRows == 0L, s"suppressed state must clear: $stateRows")
  }

  test("negation: boundary B at gap == within suppresses; same-ms B does not") {
    // user 1: B exactly at the deadline (inclusive window) → suppressed.
    // user 2: B at the same ms as its A (gap 0 — strict precedence) →
    // that A stays unanswered and alerts.
    val (rows, _) = runNot(
      Seq(ev(1, 0, "view", user = 1), ev(2, 10, "purchase", user = 1),
        ev(3, 0, "view", user = 2), ev(4, 0, "purchase", user = 2)),
      Seq(ev(5, 30, "click", user = 3)),
      Seq(ev(6, 31, "click", user = 3)))
    assert(rows == Seq((2L, 3L, ms(0), ms(10))), s"got $rows")
  }

  test("negation: an in-window newer A supersedes silently; an out-of-window one leaves the old A to the watermark proof") {
    // user 1: A1 10:00, A2 10:05 (in window — replaces silently), no B
    //   → only A2 alerts (deadline 10:15).
    // user 2: A1 10:00, A2 10:20 (past A1's window — A1 stays UNDECIDED
    //   until the watermark passes 10:10: a suppressing B above the
    //   watermark could still arrive; ADVICE r19), then B 10:25
    //   suppresses A2. Both As alert/suppress identically to the batch
    //   anti-join, just on the watermark's clock.
    val (rows, stateRows) = runNot(
      Seq(ev(1, 0, "view", user = 1), ev(2, 5, "view", user = 1),
        ev(3, 0, "view", user = 2)),
      Seq(ev(4, 20, "view", user = 2)),
      Seq(ev(5, 25, "purchase", user = 2)),
      Seq(ev(6, 40, "click", user = 3)),
      Seq(ev(7, 41, "click", user = 3)))
    assert(rows == Seq(
      (1L, 2L, ms(5), ms(15)),
      (2L, 3L, ms(0), ms(10))), s"got $rows")
    assert(stateRows == 0L, s"all state resolved: $stateRows")
  }

  // ---- matchAThenBThenC (three-step funnel; r19) ----

  /** (user, aId, bId, cId, gapAb, gapBc) matches + final state rows. */
  private def run3(batches: Seq[EventIn]*): (Seq[(Long, Long, Long, Long, Long, Long)], Long) = {
    val input = MemoryStream[EventIn](spark)
    val matches = PatternMatch.matchAThenBThenC(
      input.toDS().withWatermark("ts", "0 seconds"),
      "view", "click", "purchase", Within)
    val name = s"t_cep3_${System.nanoTime()}"
    val q = matches.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val rows = spark.table(name).collect().map(r =>
        (r.getAs[Long]("user_id"), r.getAs[Long]("a_event_id"),
          r.getAs[Long]("b_event_id"), r.getAs[Long]("c_event_id"),
          r.getAs[Long]("gap_ab_ms"), r.getAs[Long]("gap_bc_ms"))).toSeq.sorted
      (rows, q.lastProgress.stateOperators.head.numRowsTotal)
    } finally q.stop()
  }

  test("3-step: chain matches across batches; invalid B arms nothing; nothing is consumed") {
    val (rows, _) = run3(
      // A 10:00, B 10:04 (valid, partial armed), noise
      Seq(ev(1, 0, "view"), ev(2, 4, "click"), ev(3, 5, "error")),
      // C 10:08 completes the batch-1 partial; second C also emits
      // (nothing consumed); a LATER valid B re-arms with the same A
      Seq(ev(4, 8, "purchase"), ev(5, 9, "purchase"), ev(6, 10, "click")),
      Seq(ev(7, 12, "purchase")))
    assert(rows == Seq(
      (1L, 1L, 2L, 4L, 4L * 60000L, 4L * 60000L),
      (1L, 1L, 2L, 5L, 4L * 60000L, 5L * 60000L),
      (1L, 1L, 6L, 7L, 10L * 60000L, 2L * 60000L)))
  }

  test("3-step: a B whose latest preceding A is out of window does NOT arm the partial") {
    val (rows, _) = run3(
      Seq(ev(1, 0, "view", hour = 9)), // A at 09:00
      // B at 10:00 — 60 min after A, outside the 10-min window
      Seq(ev(2, 0, "click")),
      Seq(ev(3, 5, "purchase"))) // C finds no partial
    assert(rows.isEmpty, s"invalid B must not arm the funnel: $rows")
  }

  test("3-step: pieces expire independently — the (A,B) partial outlives the A slot") {
    // A 10:00 (A-slot expiry 10:10), B 10:09 (partial expiry 10:19):
    // at wm 10:12 the A slot is dead but the partial still matches a
    // C at 10:15; after wm passes 10:19 all state clears.
    val (rows, stateRows) = run3(
      Seq(ev(1, 0, "view"), ev(2, 9, "click")),
      Seq(ev(3, 12, "click", user = 2)), // wm → 10:12 (A slot dies)
      Seq(ev(4, 15, "purchase")),
      Seq(ev(5, 40, "click", user = 2)),
      Seq(ev(6, 41, "click", user = 2)))
    assert(rows == Seq((1L, 1L, 2L, 4L, 9L * 60000L, 6L * 60000L)))
    assert(stateRows == 0L, s"all pieces past expiry must evict: $stateRows")
  }

  test("3-step: batch Dataset replay equals the streaming result") {
    val events = Seq(
      ev(1, 0, "view"), ev(2, 3, "click"), ev(3, 5, "view"),
      ev(4, 7, "click"), ev(5, 9, "purchase"), ev(6, 20, "purchase"),
      ev(7, 2, "view", user = 2), ev(8, 30, "click", user = 2))
    val batch = PatternMatch.matchAThenBThenC(events.toDS(),
      "view", "click", "purchase", Within).collect().map(m =>
      (m.user_id, m.a_event_id, m.b_event_id, m.c_event_id,
        m.gap_ab_ms, m.gap_bc_ms)).toSeq.sorted
    val (streamed, _) = run3(events.sortBy(e => e.ts.getTime).take(5),
      events.sortBy(e => e.ts.getTime).drop(5))
    assert(batch == streamed && batch.nonEmpty)
  }

  test("negation: output is invariant to micro-batch splits") {
    // ts-ordered so every split point is event-time monotone (a batch
    // never carries rows older than the previous batch's watermark —
    // the same discipline the gated file replay uses)
    val events = Seq(
      ev(1, 0, "view", user = 1), ev(3, 2, "view", user = 2),
      ev(2, 7, "purchase", user = 1), ev(4, 20, "click", user = 2),
      ev(5, 21, "view", user = 3), ev(6, 45, "click", user = 4),
      ev(7, 50, "click", user = 4))
    val (a, _) = runNot(events.take(3), events.slice(3, 5), events.drop(5))
    val (b, _) = runNot(events.take(5), events.drop(5))
    val (c, _) = runNot(events)
    assert(a == b && b == c, s"split-dependent alerts: $a vs $b vs $c")
    // user 2's A (10:02, deadline 10:12) is proven by the 10:20 click /
    // watermark; user 3's A (10:21, deadline 10:31) by the 10:45 noise
    assert(a == Seq((2L, 3L, ms(2), ms(12)), (3L, 5L, ms(21), ms(31))))
  }
}
