package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-stream transforms (SURVEY §2.8 — the reference has no
  * streaming; this is driver-mandated surface over the `events`
  * fixture).
  *
  * Every transform is a pure `DataFrame → DataFrame` over the schema
  * `(event_id long, ts timestamp, user_id long, event_type string,
  * value double, props string-json)` and works identically on a batch
  * read and on `readStream` input — the batch oracle queries
  * (`EventQueries`) and the Structured Streaming tests
  * (`StreamingSpec`, via `MemoryStream`) run the SAME code. On a
  * stream, add `withEventTimeWatermark` first so state (windows,
  * dedup sets) can be evicted; on batch the watermark is a no-op.
  */
object EventPipeline {

  /** Exact decimal sum surfaced as double (cross-engine determinism —
    * see Queries.dsum).
    */
  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(38, 6))).cast(DecimalType(38, 2)).cast("double")

  /** Event-time watermark (streaming state-eviction bound; no-op on
    * batch). Late events beyond `delay` are dropped by stateful ops.
    */
  def withEventTimeWatermark(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay)

  /** Parse the JSON `props` payload into a typed `k` column
    * (`from_json` — P4's JSON-parse analog for the event surface).
    */
  def parsedProps(events: DataFrame): DataFrame =
    events.withColumn("k",
      get_json_object(col("props"), "$.k").cast("long"))

  /** Tumbling-window counts/sums per event type. One shuffle on
    * (window, event_type); map-side partial aggregation means the
    * shuffled volume is |windows × types|, not |events|.
    */
  def tumblingStats(events: DataFrame, width: String): DataFrame =
    events.groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window event counts (width / slide); each event lands in
    * width/slide windows.
    */
  def slidingCounts(events: DataFrame, width: String, slide: String): DataFrame =
    events.groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Session windows per user: events merge while the gap to the
    * session end stays under `gap` (end = last event + gap). Streaming:
    * requires a watermark; batch: exact.
    */
  def sessions(events: DataFrame, gap: String): DataFrame =
    events.groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), min(col("event_id")).as("first_event_id"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("first_event_id"))

  /** Per-user session statistics (a second, tiny aggregation over
    * [[sessions]]).
    */
  def sessionStats(events: DataFrame, gap: String): DataFrame =
    sessions(events, gap)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_singleton_sessions"),
        max(col("n_events")).as("max_session_events"),
        sum(col("n_events")).as("total_events"))

  /** First event per (user, type). Batch form: ranked window. The
    * streaming equivalent is `dropDuplicatesWithinWatermark(user_id,
    * event_type)` after sorting cannot apply — streams use arrival
    * order; see StreamingSpec for that path.
    */
  def firstEventPerUserType(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    events.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        col("event_id").as("first_event_id"), col("ts").as("first_ts"))
  }

  /** Streaming dedup on a key set within the watermark horizon
    * (`dropDuplicatesWithinWatermark`) — state is evicted once the
    * watermark passes, so the dedup set stays bounded. Falls back to
    * plain `dropDuplicates` on batch frames (where the API is absent).
    */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String]): DataFrame =
    if (events.isStreaming) events.dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
    else events.dropDuplicates(keys)

  /** Stream–static enrichment: left-join each event against a static
    * dimension on `key`. The dimension is broadcast per micro-batch —
    * events never shuffle (stateless, no watermark requirement); at
    * scale the static side is re-read each batch, so updates to the
    * dimension table are picked up without restarting the query.
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key), "left")

  /** Stream–stream interval join: pairs with
    * `right.ts ∈ [left.ts − before, left.ts + after]` per key — the
    * streaming counterpart of `operators.RangeJoin`. On streams, BOTH
    * inputs must carry event-time watermarks; the time-bound condition
    * is what lets Spark evict join state (each side keeps only rows
    * whose window can still match — state is bounded by
    * watermark + span, not unbounded). The same expression runs on
    * batch frames, where Catalyst plans it as an ordinary join.
    * Column names apart from `keys` must be disjoint.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   before: String, after: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val keyCond = keys.map(k => left(k) === right(k)).reduce(_ && _)
    val timeCond =
      col(rightTs) >= col(leftTs) - expr(s"INTERVAL $before") &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $after")
    val rightKeys = keys.map(right(_))
    left.join(right, keyCond && timeCond)
      .drop(rightKeys.head, rightKeys.tail: _*)
  }
}
