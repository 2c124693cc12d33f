package graft

import java.sql.Timestamp
import graft.streaming.PatternMatch
import graft.streaming.PatternMatch.EventIn
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Property-based CEP differential (r19 verdict #2): random event
  * soups, random micro-batch schedules — INCLUDING out-of-order-above-
  * watermark deliveries — streamed through the three CEP operators and
  * compared against independent Scala batch oracles (the same algebra
  * the gated DuckDB oracles implement).
  *
  * Contract split (PatternMatch Scaladoc): [[PatternMatch.matchAThenNotB]]
  * must be exact under ANY admissible delivery order (its suppressors
  * compress into watermark-pruned spans), so its property runs fully
  * disordered schedules — the exact shape that caught r19's finding #2
  * (an in-window suppressing B arriving in a later micro-batch than the
  * event that "proved" the window closed). The two matchers guarantee
  * batch-oracle equality only under per-key event-time-MONOTONE
  * cross-batch delivery (one pending A / one partial is what makes them
  * O(1) per key), so their properties randomize the SPLIT POINTS of a
  * time-ordered replay.
  */
class CepPropertySpec extends SparkSpec {
  import spark.implicits._

  private val W = 10L * 60L * 1000L // 10-minute pattern window
  private val base = Timestamp.valueOf("2024-01-01 10:00:00").getTime

  private def evAt(id: Long, minute: Int, typ: String, user: Long): EventIn =
    EventIn(id, new Timestamp(base + minute * 60000L), user, typ)

  /** Random soup: nEvents over nUsers within 90 minutes; ~40% A (view),
    * ~30% B (purchase), ~30% noise (click). Minute granularity makes
    * same-ms ties common on purpose.
    */
  private def soup(rnd: scala.util.Random, nEvents: Int, nUsers: Int): Seq[EventIn] =
    (1 to nEvents).map { i =>
      val typ = rnd.nextInt(10) match {
        case x if x < 4 => "view"
        case x if x < 7 => "purchase"
        case _          => "click"
      }
      evAt(i.toLong, rnd.nextInt(90), typ, 1L + rnd.nextInt(nUsers))
    }

  /** Random ADMISSIBLE schedule under watermark delay `delayMs`: every
    * event is delivered in a batch where its ts is strictly above the
    * watermark (max ts of prior batches − delay). Events whose ts would
    * fall behind the post-batch watermark are force-shipped with the
    * batch that would strand them, so disorder is maximal while nothing
    * is ever late-filtered — the oracle then must match exactly.
    */
  private def admissibleSchedule(rnd: scala.util.Random, events: Seq[EventIn],
                                 delayMs: Long): Seq[Seq[EventIn]] = {
    var remaining = rnd.shuffle(events.toList)
    var wm = Long.MinValue
    val batches = Seq.newBuilder[Seq[EventIn]]
    while (remaining.nonEmpty) {
      val take = 1 + rnd.nextInt(math.min(5, remaining.size))
      var batch = remaining.take(take)
      remaining = remaining.drop(take)
      val wmNext = math.max(wm, batch.map(_.ts.getTime).max - delayMs)
      val (forced, rest) = remaining.partition(_.ts.getTime <= wmNext)
      batch ++= forced
      remaining = rest
      wm = wmNext
      batches += batch
    }
    batches.result()
  }

  /** Monotone schedule: random split points over the (ts, id)-sorted
    * soup — the matchers' documented cross-batch delivery contract.
    */
  private def monotoneSchedule(rnd: scala.util.Random,
                               events: Seq[EventIn]): Seq[Seq[EventIn]] = {
    val sorted = events.sortBy(e => (e.ts.getTime, e.event_id))
    val cuts = (0 until sorted.size - 1).filter(_ => rnd.nextBoolean()).toSet
    val batches = Seq.newBuilder[Seq[EventIn]]
    var cur = List.newBuilder[EventIn]
    sorted.zipWithIndex.foreach { case (e, i) =>
      cur += e
      if (cuts.contains(i)) { batches += cur.result(); cur = List.newBuilder }
    }
    val last = cur.result()
    if (last.nonEmpty) batches += last
    batches.result()
  }

  // ---- independent Scala batch oracles (the gated DuckDB algebra) ----

  /** Anti-join negation: A alerts iff no B in (0, W], no superseding A
    * (in (0, W] or same-ms-higher-id), and deadline strictly behind the
    * final watermark.
    */
  private def oracleNotB(events: Seq[EventIn], finalWm: Long): Set[(Long, Long)] = {
    val byUser = events.groupBy(_.user_id)
    events.filter(_.event_type == "view").filter { a =>
      val peers = byUser(a.user_id)
      val t = a.ts.getTime
      val suppressed = peers.exists(b => b.event_type == "purchase" && {
        val g = b.ts.getTime - t; g > 0 && g <= W
      })
      val superseded = peers.exists(a2 => a2.event_type == "view" && {
        val g = a2.ts.getTime - t
        (g > 0 && g <= W) || (g == 0 && a2.event_id > a.event_id)
      })
      !suppressed && !superseded && t + W < finalWm
    }.map(a => (a.user_id, a.event_id)).toSet
  }

  /** Lex-argmax match: each B pairs with the latest (ts, id)-preceding
    * A of its user, window tested at match time (the stream-exact form
    * the stream_pattern_match oracle uses).
    */
  private def oracleAThenB(events: Seq[EventIn]): Set[(Long, Long, Long)] = {
    val byUser = events.groupBy(_.user_id)
    events.filter(_.event_type == "purchase").flatMap { b =>
      val key = (b.ts.getTime, b.event_id)
      byUser(b.user_id).filter(a => a.event_type == "view" &&
          Ordering[(Long, Long)].lt((a.ts.getTime, a.event_id), key))
        .sortBy(a => (a.ts.getTime, a.event_id)).lastOption
        .filter { a => val g = b.ts.getTime - a.ts.getTime; g > 0 && g <= W }
        .map(a => (b.user_id, a.event_id, b.event_id))
    }.toSet
  }

  /** Double lex-argmax funnel: a B is valid iff its latest lex-preceding
    * A is in window; each C pairs with the latest lex-preceding VALID B.
    */
  private def oracleA3(events: Seq[EventIn]): Set[(Long, Long, Long, Long)] = {
    val byUser = events.groupBy(_.user_id)
    def lexLt(x: EventIn, y: (Long, Long)) =
      Ordering[(Long, Long)].lt((x.ts.getTime, x.event_id), y)
    val validB = events.filter(_.event_type == "click").flatMap { b =>
      byUser(b.user_id).filter(a => a.event_type == "view" &&
          lexLt(a, (b.ts.getTime, b.event_id)))
        .sortBy(a => (a.ts.getTime, a.event_id)).lastOption
        .filter { a => val g = b.ts.getTime - a.ts.getTime; g > 0 && g <= W }
        .map(a => (b, a))
    }
    val validByUser = validB.groupBy(_._1.user_id)
    events.filter(_.event_type == "purchase").flatMap { c =>
      validByUser.getOrElse(c.user_id, Seq.empty)
        .filter { case (b, _) => lexLt(b, (c.ts.getTime, c.event_id)) }
        .sortBy { case (b, _) => (b.ts.getTime, b.event_id) }.lastOption
        .filter { case (b, _) =>
          val g = c.ts.getTime - b.ts.getTime; g > 0 && g <= W }
        .map { case (b, a) => (c.user_id, a.event_id, b.event_id, c.event_id) }
    }.toSet
  }

  // ---- stream runners ----

  private def streamNotB(batches: Seq[Seq[EventIn]],
                         delay: String,
                         maxStatePerUser: Int = Int.MaxValue,
                         nUsers: Int = 0): Set[(Long, Long)] = {
    val input = MemoryStream[EventIn](spark)
    val alerts = PatternMatch.matchAThenNotB(
      input.toDS().withWatermark("ts", delay), "view", "purchase", W)
    val name = s"t_cepprop_${System.nanoTime()}"
    val q = alerts.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b =>
        input.addData(b); q.processAllAvailable()
        // the scale contract: state is keys × one flat NotBState record
        // — never event-rate-proportional (numRowsTotal counts keys)
        if (nUsers > 0) {
          val rows = q.lastProgress.stateOperators.head.numRowsTotal
          assert(rows <= nUsers.toLong * maxStatePerUser,
            s"negation state exploded: $rows rows for $nUsers users")
        }
      }
      spark.table(name).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("a_event_id"))).toSet
    } finally q.stop()
  }

  private def streamAThenB(batches: Seq[Seq[EventIn]],
                           delay: String): Set[(Long, Long, Long)] = {
    val input = MemoryStream[EventIn](spark)
    val matches = PatternMatch.matchAThenB(
      input.toDS().withWatermark("ts", delay), "view", "purchase", W)
    val name = s"t_cepprop2_${System.nanoTime()}"
    val q = matches.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("a_event_id"), r.getAs[Long]("b_event_id"))).toSet
    } finally q.stop()
  }

  private def streamA3(batches: Seq[Seq[EventIn]],
                       delay: String): Set[(Long, Long, Long, Long)] = {
    val input = MemoryStream[EventIn](spark)
    val matches = PatternMatch.matchAThenBThenC(
      input.toDS().withWatermark("ts", delay),
      "view", "click", "purchase", W)
    val name = s"t_cepprop3_${System.nanoTime()}"
    val q = matches.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("a_event_id"), r.getAs[Long]("b_event_id"),
        r.getAs[Long]("c_event_id"))).toSet
    } finally q.stop()
  }

  // ---- properties ----

  test("negation property: random OUT-OF-ORDER admissible schedules reproduce the batch anti-join") {
    val rnd = new scala.util.Random(20260816L)
    val delayMs = 5L * 60L * 1000L
    (1 to 10).foreach { round =>
      val events = soup(rnd, nEvents = 24, nUsers = 3)
      val batches = admissibleSchedule(rnd, events, delayMs)
      val finalWm = events.map(_.ts.getTime).max - delayMs
      val got = streamNotB(batches, "5 minutes", maxStatePerUser = 1,
        nUsers = 3)
      val want = oracleNotB(events, finalWm)
      assert(got == want,
        s"round $round diverged\nschedule=${batches.map(_.map(e =>
          (e.event_id, e.ts, e.user_id, e.event_type)))}\ngot=$got\nwant=$want")
    }
  }

  test("negation regression (r19 finding #2): an above-watermark in-window B in a LATER batch than the 'proving' event still suppresses") {
    // A u1 @10:00 (deadline 10:10); noise u1 @10:11 rides batch 1 — the
    // event the old inline path took as proof the window closed. With a
    // 5-minute delay the watermark is only 10:06, so the suppressing B
    // @10:08 in batch 2 is ADMISSIBLE — the alert must not fire.
    val batches = Seq(
      Seq(evAt(1, 0, "view", 1), evAt(2, 11, "click", 1)),
      Seq(evAt(3, 8, "purchase", 1)),
      Seq(evAt(4, 40, "click", 2)), // advance wm far past the deadline
      Seq(evAt(5, 41, "click", 2)))
    assert(streamNotB(batches, "5 minutes").isEmpty,
      "suppressing B above the watermark arrived after the 'proof' — the eager inline alert is the r19 bug")
    // and the batch anti-join agrees: suppressed
    val finalWm = base + 41 * 60000L - 5L * 60000L
    assert(oracleNotB(batches.flatten, finalWm).isEmpty)
  }

  test("matcher property: random MONOTONE splits reproduce the lex-argmax batch join (the documented delivery contract)") {
    val rnd = new scala.util.Random(4242L)
    (1 to 6).foreach { round =>
      val events = soup(rnd, nEvents = 24, nUsers = 3)
      val batches = monotoneSchedule(rnd, events)
      val got = streamAThenB(batches, "2 minutes")
      val want = oracleAThenB(events)
      assert(got == want, s"round $round diverged\ngot=$got\nwant=$want")
    }
  }

  test("3-step property: random MONOTONE splits reproduce the double lex-argmax funnel") {
    val rnd = new scala.util.Random(777L)
    (1 to 6).foreach { round =>
      val events = soup(rnd, nEvents = 24, nUsers = 3)
      val batches = monotoneSchedule(rnd, events)
      val got = streamA3(batches, "2 minutes")
      val want = oracleA3(events)
      assert(got == want, s"round $round diverged\ngot=$got\nwant=$want")
    }
  }
}
