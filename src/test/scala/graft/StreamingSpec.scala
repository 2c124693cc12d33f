package graft

import java.sql.Timestamp
import graft.streaming.EventPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming tests: the SAME EventPipeline transforms the
  * batch oracle queries use, executed incrementally over MemoryStream
  * micro-batches (SURVEY §2.8).
  */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double, props: String)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, minute: Int, user: Long = 1L, typ: String = "click",
                 value: Double = 1.0): Ev =
    Ev(id, Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"), user, typ, value, """{"k": 1}""")

  private def runQuery(df: org.apache.spark.sql.DataFrame, name: String,
                       mode: OutputMode)(feeds: (() => Unit)*): org.apache.spark.sql.DataFrame = {
    val query = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    try {
      feeds.foreach { f => f(); query.processAllAvailable() }
    } finally query.stop()
    spark.table(name)
  }

  test("tumbling stats over a stream equal the batch computation on the same data") {
    val input = MemoryStream[Ev](spark)
    val events = Seq(ev(1, 0), ev(2, 2, typ = "view"), ev(3, 7), ev(4, 8), ev(5, 13))
    val streamed = runQuery(
      EventPipeline.tumblingStats(input.toDF(), "5 minutes"),
      "t_tumbling", OutputMode.Complete())(() => input.addData(events))
    val batch = EventPipeline.tumblingStats(events.toDF(), "5 minutes")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))
    assert(streamed.collect().map(key).toSet == batch.collect().map(key).toSet)
    assert(batch.collect().map(key).toSet.nonEmpty)
  }

  test("stream-static enrichment joins the broadcast dimension per micro-batch") {
    val input = MemoryStream[Ev](spark)
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val out = runQuery(
      EventPipeline.enrich(input.toDF(), dim, "user_id"),
      "t_enrich", OutputMode.Append())(
      () => input.addData(Seq(ev(1, 0, user = 1L), ev(2, 1, user = 2L), ev(3, 2, user = 9L))))
    val got = out.select("event_id", "tier").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> Some("gold"), 2L -> Some("basic"), 3L -> None),
      "unknown keys must survive the left join with a null tier")
  }

  test("stream-stream interval join with watermarks equals the batch range join") {
    val clicksIn = MemoryStream[Ev](spark)
    val viewsIn = MemoryStream[Ev](spark)
    val clicks = clicksIn.toDF().select($"event_id".as("click_id"), $"user_id", $"ts".as("c_ts"))
      .withWatermark("c_ts", "30 minutes")
    val views = viewsIn.toDF().select($"user_id", $"ts".as("v_ts"))
      .withWatermark("v_ts", "30 minutes")
    val joined = EventPipeline.intervalJoin(clicks, views, Seq("user_id"),
      "c_ts", "v_ts", before = "10 MINUTES", after = "0 SECONDS")
    val clickEvents = Seq(ev(1, 15, user = 1), ev(2, 40, user = 1), ev(3, 5, user = 2))
    val viewEvents = Seq(
      ev(10, 8, user = 1, typ = "view"),  // within 10 min of click@15
      ev(11, 14, user = 1, typ = "view"), // within both? click@15 yes; click@40 no
      ev(12, 35, user = 1, typ = "view"), // within 10 min of click@40
      ev(13, 50, user = 2, typ = "view")) // after user 2's click — excluded
    val streamed = runQuery(joined, "t_ivjoin", OutputMode.Append())(
      () => { clicksIn.addData(clickEvents); viewsIn.addData(viewEvents) })
      .select("click_id", "v_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString)).toSet
    // batch equivalence: same operator over batch frames
    val bClicks = clickEvents.toDF().select($"event_id".as("click_id"), $"user_id", $"ts".as("c_ts"))
    val bViews = viewEvents.toDF().select($"user_id", $"ts".as("v_ts"))
    val batch = EventPipeline.intervalJoin(bClicks, bViews, Seq("user_id"),
      "c_ts", "v_ts", before = "10 MINUTES", after = "0 SECONDS")
      .select("click_id", "v_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString)).toSet
    assert(streamed == batch)
    assert(batch == Set(
      1L -> "2024-01-01 10:08:00.0", 1L -> "2024-01-01 10:14:00.0",
      2L -> "2024-01-01 10:35:00.0"))
  }

  test("sliding-window counts over a stream equal the batch computation") {
    val input = MemoryStream[Ev](spark)
    val events = Seq(ev(1, 0), ev(2, 3), ev(3, 7, typ = "view"), ev(4, 12))
    val streamed = runQuery(
      EventPipeline.slidingCounts(input.toDF(), "10 minutes", "5 minutes"),
      "t_sliding", OutputMode.Complete())(() => input.addData(events))
    val batch = EventPipeline.slidingCounts(events.toDF(), "10 minutes", "5 minutes")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))
    assert(streamed.collect().map(key).toSet == batch.collect().map(key).toSet)
    // every event lands in exactly width/slide = 2 windows
    assert(batch.agg(sum("n")).collect()(0).getLong(0) == events.length * 2)
  }

  test("watermarked session windows emit once the watermark passes the gap") {
    val input = MemoryStream[Ev](spark)
    val sessions = EventPipeline.sessions(
      EventPipeline.withEventTimeWatermark(input.toDF(), "1 minute"), "10 minutes")
    val result = runQuery(sessions, "t_sessions", OutputMode.Append())(
      () => input.addData(Seq(ev(1, 0), ev(2, 5), ev(3, 30))), // session A: 0–5; B starts 30
      () => input.addData(Seq(ev(4, 55))))                     // watermark past A and B → both final
    val rows = result.collect().map(r =>
      (r.getAs[Timestamp]("session_start").toString, r.getAs[Long]("n_events")))
    assert(rows.contains(("2024-01-01 10:00:00.0", 2L)), s"got: ${rows.toSeq}")
    assert(rows.contains(("2024-01-01 10:30:00.0", 1L)), s"got: ${rows.toSeq}")
  }

  test("dropDuplicatesWithinWatermark dedups keys across micro-batches") {
    val input = MemoryStream[Ev](spark)
    val deduped = EventPipeline.dedupWithinWatermark(
      EventPipeline.withEventTimeWatermark(input.toDF(), "30 minutes"),
      Seq("user_id", "event_type"))
    val result = runQuery(deduped, "t_dedup", OutputMode.Append())(
      () => input.addData(Seq(ev(1, 0), ev(2, 1), ev(3, 2, typ = "view"))),
      () => input.addData(Seq(ev(4, 3), ev(5, 4, user = 2L))))
    val ids = result.collect().map(_.getAs[Long]("event_id")).toSet
    assert(ids == Set(1L, 3L, 5L), s"got: $ids") // 2 and 4 are dup (user 1, click)
  }

  test("batch fallback of dedupWithinWatermark uses dropDuplicates") {
    val df = Seq(ev(1, 0), ev(2, 1)).toDF()
    assert(EventPipeline.dedupWithinWatermark(df, Seq("user_id", "event_type")).count() == 1)
  }

  test("parsedProps extracts typed JSON keys on streams") {
    val input = MemoryStream[Ev](spark)
    val parsed = runQuery(EventPipeline.parsedProps(input.toDF()),
      "t_props", OutputMode.Append())(() => input.addData(Seq(ev(1, 0))))
    assert(parsed.select("k").collect()(0).getLong(0) == 1L)
  }

  test("streaming HDR bucket counts are batch-split-insensitive (complete mode)") {
    // r18 verdict #2: bucket counts merge by addition, so HOW the
    // stream is micro-batched must not matter — any split's final
    // complete-mode snapshot equals the one-shot batch bucket table.
    import org.apache.spark.sql.functions._
    val events = (1 to 60).map(i =>
      ev(i.toLong, i % 50, typ = if (i % 3 == 0) "view" else "click",
        value = 0.01 * ((i * 37) % 900 + 1)))
    def buckets(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Sketches.hdrBuckets(
        df.withColumn("c",
          (col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
            .cast("long") + lit(1L)), "c", 16)
        .groupBy(col("event_type"), col("hdr_bucket"))
        .agg(count(lit(1)).as("cnt"))
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getString(0), r.getLong(1), r.getLong(2))
    val expected = buckets(events.toDF()).collect().map(key).toSet
    assert(expected.nonEmpty)
    Seq(Seq(events), Seq(events.take(7), events.drop(7)),
      events.grouped(13).toSeq).zipWithIndex.foreach { case (split, i) =>
      val input = MemoryStream[Ev](spark)
      val got = runQuery(buckets(input.toDF()), s"t_hdr_split_$i",
        OutputMode.Complete())(split.map(b => () => { input.addData(b); () }): _*)
      assert(got.collect().map(key).toSet == expected,
        s"split $i diverged from the one-shot bucket table")
    }
  }
}
