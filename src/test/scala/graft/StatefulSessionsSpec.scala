package graft

import java.sql.Timestamp
import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.EventIn
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Custom stateful sessionization (flatMapGroupsWithState): gap-close
  * and event-time-timeout emission over MemoryStream micro-batches.
  */
class StatefulSessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, minute: Int, user: Long = 1L, value: Double = 1.0,
                 hour: Int = 10): EventIn =
    EventIn(id, Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00"), user, "click", value)

  test("gap-closed sessions emit inline; open sessions emit on watermark timeout") {
    val input = MemoryStream[EventIn](spark)
    val sessions = StatefulSessions.sessionize(
      input.toDS().withWatermark("ts", "1 minute"), gapMs = 10 * 60 * 1000L)
    val q = sessions.writeStream.format("memory").queryName("t_fmgws")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: user 1 events at 10:00/10:05 (one session), 10:30 (new
      // session — the 25-minute gap closes the first inline)
      input.addData(Seq(ev(1, 0), ev(2, 5), ev(3, 30)))
      q.processAllAvailable()
      // batch 2: 10:55 (user 1) gap-closes the 10:30 session inline and
      // opens a new one ending 11:05
      input.addData(Seq(ev(4, 55)))
      q.processAllAvailable()
      // batch 3: user 2 event at 11:30 → watermark 11:29 passes 11:05 →
      // user 1's open 10:55 session emits via EventTimeTimeout
      input.addData(Seq(ev(5, 30, user = 2L, hour = 11)))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("t_fmgws")
      .collect()
      .map(r => (r.getAs[Timestamp]("session_start").toString,
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"),
        r.getAs[String]("closed_by")))
      .sortBy(_._1)
    assert(out.contains(("2024-01-01 10:00:00.0", 2L, 2.0, "gap")),
      s"missing gap-closed session; got ${out.toSeq}")
    assert(out.contains(("2024-01-01 10:30:00.0", 1L, 1.0, "gap")),
      s"missing second gap-closed session; got ${out.toSeq}")
    assert(out.exists(s => s._1 == "2024-01-01 10:55:00.0" && s._2 == 1L && s._4 == "timeout"),
      s"missing timed-out session; got ${out.toSeq}")
  }

  test("batch-mode sessionize: gap-closed sessions agree with session_window") {
    val events = Seq(ev(1, 0), ev(2, 5), ev(3, 30), ev(4, 55), ev(5, 59, user = 2L))
    // batch queries never fire timeouts, so only gap-closed sessions
    // emit — they must be a subset of the built-in session_window result
    val custom = StatefulSessions.sessionize(events.toDS(), gapMs = 10 * 60 * 1000L)
      .collect().map(s => (s.user_id, s.session_start.toString, s.n_events)).toSet
    val builtin = graft.streaming.EventPipeline.sessions(
      events.toDF().withColumn("props", org.apache.spark.sql.functions.lit("{}")), "10 minutes")
      .collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("session_start").toString, r.getAs[Long]("n_events"))).toSet
    assert(custom == Set((1L, "2024-01-01 10:00:00.0", 2L), (1L, "2024-01-01 10:30:00.0", 1L)),
      s"custom=$custom")
    assert(custom.subsetOf(builtin), s"custom=$custom builtin=$builtin")
  }
}
