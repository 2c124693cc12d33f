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
}
