package graft.queries

import graft.Tables
import graft.streaming.EventPipeline
import org.apache.spark.sql.functions._

/** Batch query surface over the `events` fixture, running the SAME
  * transforms as the Structured Streaming path
  * ([[graft.streaming.EventPipeline]]) — the oracle checks the
  * window/session semantics; StreamingSpec checks the incremental
  * execution of the identical code.
  *
  * Timestamp parity: the fixture stores TIMESTAMP(NANOS); Spark reads
  * raw nanos and floor-truncates to µs (Tables.events), DuckDB's
  * `::TIMESTAMP` cast truncates the same way. Window starts serialize
  * to ISO strings for the cross-engine hash. DuckDB `time_bucket`'s
  * default origin (2000-01-01) is epoch-aligned for the widths used
  * here (5 m / 30 m / 2 h), matching Spark's epoch-aligned `window()`.
  */
object EventQueries {

  private val iso = "yyyy-MM-dd HH:mm:ss"

  private val tumbling = QueryDef(
    "ev_tumbling_5min",
    "Tumbling 5-minute windows × event type: count + exact-decimal value " +
      "sum; the streaming-identical aggregation (EventPipeline" +
      ".tumblingStats).",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      EventPipeline.tumblingStats(ev, "5 minutes")
        .select(date_format(col("window_start"), iso).as("window_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("window_start"), col("event_type"))
    },
    Some("""
      |SELECT strftime(time_bucket(INTERVAL '5 minutes', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS window_start,
      |       event_type, count(*) AS n,
      |       CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2 ORDER BY 1, 2
      """.stripMargin.trim))

  private val sliding = QueryDef(
    "ev_sliding_10x5",
    "Sliding windows (10-minute width, 5-minute slide) × event type: " +
      "every event lands in exactly two windows.",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      EventPipeline.slidingCounts(ev, "10 minutes", "5 minutes")
        .select(date_format(col("window_start"), iso).as("window_start"),
          col("event_type"), col("n"))
        .orderBy(col("window_start"), col("event_type"))
    },
    Some("""
      |WITH e AS (
      |  SELECT event_type,
      |         unnest([time_bucket(INTERVAL '5 minutes', ts::TIMESTAMP),
      |                 time_bucket(INTERVAL '5 minutes', ts::TIMESTAMP) - INTERVAL '5 minutes']) AS wstart
      |  FROM events
      |)
      |SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start, event_type, count(*) AS n
      |FROM e GROUP BY 1, 2 ORDER BY 1, 2
      """.stripMargin.trim))

  private val sessionsQ = QueryDef(
    "ev_session_stats",
    "Per-user session statistics under a 2-hour inactivity gap " +
      "(session_window; oracle = gaps-and-islands). New session iff " +
      "ts − prev_ts ≥ gap (session end is exclusive at last + gap).",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      EventPipeline.sessionStats(ev, "2 hours")
        .orderBy(col("user_id"))
    },
    Some("""
      |WITH x AS (
      |  SELECT user_id, ts,
      |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |                   >= INTERVAL '2 hours' OR
      |                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |), y AS (
      |  SELECT user_id, ts,
      |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |                                ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM x
      |), sess AS (
      |  SELECT user_id, session_id, count(*) AS n_events FROM y GROUP BY 1, 2
      |)
      |SELECT user_id, count(*) AS n_sessions,
      |       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singleton_sessions,
      |       max(n_events) AS max_session_events,
      |       CAST(sum(n_events) AS BIGINT) AS total_events
      |FROM sess GROUP BY user_id ORDER BY user_id
      """.stripMargin.trim))

  private val propsQ = QueryDef(
    "ev_props_json",
    "JSON payload extraction (from_json / get_json_object on the props " +
      "column) + bucketed aggregation over the extracted key.",
    (s, dir) => {
      val ev = EventPipeline.parsedProps(Tables.events(s, dir))
      ev.withColumn("k_bucket", (col("k") / 10L).cast("long"))
        .groupBy(col("k_bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(38, 6))).cast(org.apache.spark.sql.types.DecimalType(38, 2)).cast("double").as("sum_value"))
        .orderBy(col("k_bucket"))
    },
    Some("""
      |SELECT (json_extract_string(props, '$.k')::BIGINT // 10) AS k_bucket,
      |       count(*) AS n,
      |       CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1 ORDER BY 1
      """.stripMargin.trim))

  private val firstQ = QueryDef(
    "ev_first_per_user_type",
    "Earliest event per (user, type) — the batch analog of streaming " +
      "dropDuplicatesWithinWatermark keyed on (user_id, event_type).",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      EventPipeline.firstEventPerUserType(ev)
        .select(col("user_id"), col("event_type"), col("first_event_id"),
          date_format(col("first_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("first_ts"))
        .orderBy(col("user_id"), col("event_type"))
    },
    Some("""
      |SELECT user_id, event_type, event_id AS first_event_id,
      |       strftime(ts::TIMESTAMP, '%Y-%m-%d %H:%M:%S.%f') AS first_ts
      |FROM events
      |QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
      |ORDER BY user_id, event_type
      """.stripMargin.trim))

  private val valueStats = QueryDef(
    "ev_value_stats",
    "Distribution statistics per event type: mean and sample stddev from " +
      "exact decimal sums (order-independent — the naive stddev " +
      "aggregate is accumulation-order-sensitive across engines), plus " +
      "exact interpolated median (percentile ≡ quantile_cont).",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val dec = org.apache.spark.sql.types.DecimalType(38, 6)
      ev.groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast(dec)).cast(org.apache.spark.sql.types.DecimalType(38, 2)).cast("double").as("sum_v"),
          sum((col("value") * col("value")).cast(dec)).cast(org.apache.spark.sql.types.DecimalType(38, 4)).cast("double").as("sum_v2"),
          expr("percentile(value, 0.5)").as("median_value"))
        .select(
          col("event_type"), col("n"),
          round(col("sum_v") / col("n"), 6).as("mean_value"),
          round(sqrt((col("sum_v2") - col("sum_v") * col("sum_v") / col("n")) /
            (col("n") - 1)), 6).as("stddev_value"),
          round(col("median_value"), 6).as("median_value"))
        .orderBy(col("event_type"))
    },
    Some("""
      |WITH a AS (
      |  SELECT event_type, count(*) AS n,
      |         CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_v,
      |         CAST(CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_v2,
      |         quantile_cont(value, 0.5) AS median_value
      |  FROM events GROUP BY event_type
      |)
      |SELECT event_type, n,
      |       round(sum_v / n, 6) AS mean_value,
      |       round(sqrt((sum_v2 - sum_v * sum_v / n) / (n - 1)), 6) AS stddev_value,
      |       round(median_value, 6) AS median_value
      |FROM a ORDER BY event_type
      """.stripMargin.trim))

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  private val pivotQ = QueryDef(
    "ev_pivot_daily",
    "Pivoted daily event-type counts (groupBy().pivot() with an explicit " +
      "value list — the explicit list keeps the plan single-pass; an " +
      "unlisted pivot needs a values-discovery job first).",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      ev.withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .groupBy(col("day"))
        .pivot("event_type", eventTypes)
        .agg(count(lit(1)))
        .na.fill(0L, eventTypes)
        .orderBy(col("day"))
        .limit(14)
    },
    Some {
      val cases = eventTypes.map(t =>
        s"CAST(SUM(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS $t").mkString(",\n       ")
      s"""
      |SELECT strftime(ts::TIMESTAMP, '%Y-%m-%d') AS day,
      |       $cases
      |FROM events
      |GROUP BY 1 ORDER BY day LIMIT 14
      """.stripMargin.trim
    })

  private val asofQ = QueryDef(
    "ev_asof_last_view",
    "As-of join: every click gains the latest same-user view at-or-" +
      "before it, via a running-max window over ONE user-keyed shuffle " +
      "(Spark's default RANGE frame = ASOF '>=' semantics, ties " +
      "included) — never a per-key range join, so hot users stay " +
      "linear at 100 TB. Aggregated per user: click count, matched " +
      "count, exact lag sum in integer microseconds.",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      graft.operators.AsOf.selfAsOf(ev, "user_id", "ts",
          probePred = col("event_type") === "click",
          matchPred = col("event_type") === "view")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_clicks"),
          count(col("asof_ts")).as("n_with_view"),
          // exact integer µs (decimal accumulate → BIGINT): a seconds
          // double would hit engine-specific decimal→double rounding
          sum(coalesce(col("asof_lag_us"), lit(0L)).cast("decimal(38,6)"))
            .cast("long").as("lag_us_sum"))
        .orderBy(col("user_id"))
    },
    Some("""
      |WITH ev AS (
      |  SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type FROM events
      |), w AS (
      |  SELECT event_id, user_id, event_type, ts,
      |         max(CASE WHEN event_type = 'view' THEN ts END)
      |           OVER (PARTITION BY user_id ORDER BY ts
      |                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_ts
      |  FROM ev
      |)
      |SELECT user_id, count(*) AS n_clicks,
      |       count(asof_ts) AS n_with_view,
      |       CAST(SUM(CAST(COALESCE(date_diff('microsecond', asof_ts, ts), 0) AS DECIMAL(38,6))) AS BIGINT) AS lag_us_sum
      |FROM w WHERE event_type = 'click'
      |GROUP BY user_id ORDER BY user_id
      """.stripMargin.trim))

  private val rangeQ = QueryDef(
    "ev_range_clicks_views",
    "Time-range join: per user, (click, view) pairs with the view in " +
      "the 10 minutes up to the click — bucketized into an EQUALITY " +
      "join on (user, time bucket) with left fanout ≤ 2 " +
      "(operators.RangeJoin), never a per-key nested loop; hot users " +
      "spread across time buckets.",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("v_ts"))
      graft.operators.RangeJoin.timeRangeJoin(clicks, views, "c_ts", "v_ts",
          beforeUs = 600000000L, afterUs = 0L, keys = Seq("user_id"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("click_id")).as("n_clicks_matched"))
        .orderBy(col("user_id"))
    },
    Some("""
      |WITH ev AS (
      |  SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type FROM events
      |)
      |SELECT c.user_id, count(*) AS n_pairs,
      |       count(DISTINCT c.event_id) AS n_clicks_matched
      |FROM ev c JOIN ev v
      |  ON c.event_type = 'click' AND v.event_type = 'view'
      | AND c.user_id = v.user_id
      | AND v.ts BETWEEN c.ts - INTERVAL '10 minutes' AND c.ts
      |GROUP BY c.user_id ORDER BY c.user_id
      """.stripMargin.trim))

  private val movingQ = QueryDef(
    "ev_moving_avg_daily",
    "3-day moving average of daily event value (ROWS frame window over " +
      "the daily pre-aggregate): the heavy aggregation happens first " +
      "(map-side partials to |days| rows), the window then runs over " +
      "the tiny aggregate — never over raw events.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, dir)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(sum(col("value").cast("decimal(38,6)")).cast("decimal(38,2)").cast("double").as("day_value"))
      val w = Window.orderBy(col("day")).rowsBetween(-2, 0)
      daily
        .withColumn("avg3", round(avg(col("day_value")).over(w), 6))
        .select(col("day"), round(col("day_value"), 6).as("day_value"), col("avg3"))
        .orderBy(col("day"))
    },
    Some("""
      |WITH daily AS (
      |  SELECT strftime(ts::TIMESTAMP, '%Y-%m-%d') AS day,
      |         CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DECIMAL(38,2)) AS DOUBLE) AS day_value
      |  FROM events GROUP BY 1
      |)
      |SELECT day, round(day_value, 6) AS day_value,
      |       round(AVG(day_value) OVER (ORDER BY day
      |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS avg3
      |FROM daily ORDER BY day
      """.stripMargin.trim))

  private val gapsQ = QueryDef(
    "ev_gaps_lag_pctrank",
    "Window-function breadth as the Spark-side query under test: " +
      "lag/lead over the per-user event sequence (inter-event gap in " +
      "exact integer µs, next event type) — one user-keyed shuffle — " +
      "then percent_rank + cume_dist over the PER-USER AGGREGATE " +
      "(|users| rows), so the unpartitioned ranking window never sees " +
      "raw events, only the pre-aggregated relation.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
      val wUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gaps = ev
        .withColumn("gap_us",
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(wUser)))
        .withColumn("next_type", lead(col("event_type"), 1).over(wUser))
      val perUser = gaps.groupBy(col("user_id"))
        .agg(count(col("gap_us")).as("n_gaps"),
          coalesce(sum(col("gap_us").cast("decimal(38,6)")).cast("long"), lit(0L))
            .as("gap_us_sum"),
          sum(when(col("next_type") === "click", 1L).otherwise(0L)).as("n_click_next"))
      val wRank = Window.orderBy(col("gap_us_sum"), col("user_id"))
      perUser
        .withColumn("pr", round(percent_rank().over(wRank), 6))
        .withColumn("cd", round(cume_dist().over(wRank), 6))
        .orderBy(col("user_id"))
    },
    Some("""
      |WITH ev AS (
      |  SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type FROM events
      |), g AS (
      |  SELECT user_id,
      |         date_diff('microsecond', lag(ts) OVER w, ts) AS gap_us,
      |         lead(event_type) OVER w AS next_type
      |  FROM ev
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), a AS (
      |  SELECT user_id, count(gap_us) AS n_gaps,
      |         COALESCE(CAST(SUM(CAST(gap_us AS DECIMAL(38,6))) AS BIGINT), 0) AS gap_us_sum,
      |         CAST(SUM(CASE WHEN next_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click_next
      |  FROM g GROUP BY user_id
      |)
      |SELECT user_id, n_gaps, gap_us_sum, n_click_next,
      |       round(percent_rank() OVER (ORDER BY gap_us_sum, user_id), 6) AS pr,
      |       round(cume_dist() OVER (ORDER BY gap_us_sum, user_id), 6) AS cd
      |FROM a ORDER BY user_id
      """.stripMargin.trim))

  private val funnelQ = QueryDef(
    "ev_funnel_conversion",
    "Sequential funnel (view → click → purchase, strictly ordered per " +
      "user): staged first-reach timestamps via chained unbounded " +
      "windows over ONE user-keyed shuffle (the later windows and the " +
      "per-user collapse reuse the same hash partitioning), then a " +
      "single-row global rollup — the per-user relation, not raw " +
      "events, is all that crosses the final (tiny) aggregation. At " +
      "100 TB the only data-sized exchange is the one user_id shuffle.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
      val ev = Tables.events(s, dir).select(col("user_id"), col("event_type"), col("ts"))
      val staged = ev
        .withColumn("v_ts",
          min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("c_ts",
          min(when(col("event_type") === "click" && col("ts") > col("v_ts"), col("ts"))).over(w))
      val perUser = staged
        .groupBy(col("user_id"), col("v_ts"), col("c_ts"))
        .agg(min(when(col("event_type") === "purchase" && col("ts") > col("c_ts"), col("ts")))
          .as("p_ts"))
      perUser.agg(
        count(lit(1)).as("n_users"),
        count(col("v_ts")).as("n_viewed"),
        count(col("c_ts")).as("n_clicked_after_view"),
        count(col("p_ts")).as("n_purchased_full_funnel"))
    },
    Some("""
      |WITH e AS (
      |  SELECT user_id, event_type, ts::TIMESTAMP AS ts FROM events
      |), u1 AS (
      |  SELECT user_id, event_type, ts,
      |         min(CASE WHEN event_type = 'view' THEN ts END)
      |           OVER (PARTITION BY user_id) AS v_ts
      |  FROM e
      |), u2 AS (
      |  SELECT user_id, event_type, ts, v_ts,
      |         min(CASE WHEN event_type = 'click' AND ts > v_ts THEN ts END)
      |           OVER (PARTITION BY user_id) AS c_ts
      |  FROM u1
      |), per_user AS (
      |  SELECT user_id, v_ts, c_ts,
      |         min(CASE WHEN event_type = 'purchase' AND ts > c_ts THEN ts END) AS p_ts
      |  FROM u2 GROUP BY user_id, v_ts, c_ts
      |)
      |SELECT count(*) AS n_users, count(v_ts) AS n_viewed,
      |       count(c_ts) AS n_clicked_after_view,
      |       count(p_ts) AS n_purchased_full_funnel
      |FROM per_user
      """.stripMargin.trim))

  private val percentilesQ = QueryDef(
    "ev_value_percentiles",
    "Exact order-statistic percentiles (p25/p50/p75/p90/p99, linear " +
      "interpolation at rank p·(n−1)) of event value per type — Spark's " +
      "exact `percentile` aggregate vs DuckDB `quantile_cont`, both " +
      "rounded to 6 decimals. Exact percentile buffers per-group values " +
      "(with map-side partial merge); at 100 TB the per-group counts " +
      "here are bounded by the type cardinality, and the approximate " +
      "path (approx_percentile / t-digest) is the documented fallback " +
      "for unbounded groups.",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      ev.groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          round(expr("percentile(value, 0.25)"), 6).as("p25"),
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.75)"), 6).as("p75"),
          round(expr("percentile(value, 0.9)"), 6).as("p90"),
          round(expr("percentile(value, 0.99)"), 6).as("p99"))
        .orderBy(col("event_type"))
    },
    Some("""
      |SELECT event_type, count(*) AS n,
      |       round(quantile_cont(value, 0.25), 6) AS p25,
      |       round(quantile_cont(value, 0.5),  6) AS p50,
      |       round(quantile_cont(value, 0.75), 6) AS p75,
      |       round(quantile_cont(value, 0.9),  6) AS p90,
      |       round(quantile_cont(value, 0.99), 6) AS p99
      |FROM events GROUP BY event_type ORDER BY event_type
      """.stripMargin.trim))

  private val histogramQ = QueryDef(
    "ev_value_histogram",
    "Fixed-width value histogram (25-unit buckets): bucket id from " +
      "IEEE-identical floor(value/25) in both engines, per-bucket count " +
      "+ exact-decimal sum. One map-side-combinable aggregation whose " +
      "output is bounded by the bucket count, not the data — the " +
      "canonical distribution-profile shape at any scale.",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      ev.withColumn("bucket", floor(col("value") / lit(25.0)).cast("long"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(38, 6)))
            .cast(org.apache.spark.sql.types.DecimalType(38, 2))
            .cast("double").as("sum_value"))
        .orderBy(col("bucket"))
    },
    Some("""
      |SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket, count(*) AS n,
      |       CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1 ORDER BY 1
      """.stripMargin.trim))

  private val outliersQ = QueryDef(
    "ev_value_outliers",
    "Z-score outlier detection per event type: exact-decimal moments " +
      "(Σv, Σv²) in ONE map-side-combinable pass, threshold mean+3σ " +
      "derived in double with a term-by-term IEEE-identical formula in " +
      "both engines, then the 5-row stats relation is BROADCAST back " +
      "onto the events scan to count exceedances — the second pass " +
      "never shuffles the data. The anomaly-gate shape (compute global " +
      "stats, broadcast, filter) is the 100 TB pattern for any " +
      "distribution-relative filter.",
    (s, dir) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 6)
      val ev = Tables.events(s, dir)
      val stats = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec)).cast(org.apache.spark.sql.types.DecimalType(38, 2)).cast("double").as("s"),
          sum((col("value") * col("value")).cast(dec)).cast(org.apache.spark.sql.types.DecimalType(38, 4)).cast("double").as("s2"))
        .withColumn("mean", col("s") / col("n"))
        .withColumn("thr", col("mean") +
          lit(3.0) * sqrt((col("s2") - col("s") * col("s") / col("n")) / (col("n") - lit(1))))
      ev.join(broadcast(stats), "event_type")
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n"),
          sum(when(col("value") > col("thr"), 1L).otherwise(0L)).as("n_outliers"),
          round(max(col("mean")), 6).as("mean_value"),
          round(max(col("thr")), 6).as("threshold"))
        .orderBy(col("event_type"))
    },
    Some("""
      |WITH st AS (
      |  SELECT event_type, count(*) AS n,
      |         CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DECIMAL(38,2)) AS DOUBLE) AS s,
      |         CAST(CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DECIMAL(38,4)) AS DOUBLE) AS s2
      |  FROM events GROUP BY event_type
      |), thr AS (
      |  SELECT event_type, n, s / n AS mean,
      |         s / n + 3.0 * sqrt((s2 - s * s / n) / (n - 1)) AS thr
      |  FROM st
      |)
      |SELECT e.event_type, max(t.n) AS n,
      |       CAST(SUM(CASE WHEN e.value > t.thr THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |       round(max(t.mean), 6) AS mean_value,
      |       round(max(t.thr), 6) AS threshold
      |FROM events e JOIN thr t USING (event_type)
      |GROUP BY e.event_type ORDER BY e.event_type
      """.stripMargin.trim))

  private val cohortsQ = QueryDef(
    "ev_retention_cohorts",
    "Retention cohort matrix: each user joins the cohort of their first " +
      "active day; per (cohort_day, day_offset) count distinct " +
      "returning users. One user-keyed shuffle derives the cohort via " +
      "an unbounded min-window, the (user, cohort, offset) relation is " +
      "deduped on the SAME partitioning, and only the deduped relation " +
      "reaches the cohort aggregate — events never shuffle twice.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
      val ev = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      ev.withColumn("cohort_day", min(col("day")).over(w))
        .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
        .select(col("user_id"), col("cohort_day"), col("day_offset"))
        .distinct()
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .withColumn("cohort_day", date_format(col("cohort_day"), "yyyy-MM-dd"))
        .orderBy(col("cohort_day"), col("day_offset"))
    },
    Some("""
      |WITH e AS (
      |  SELECT user_id, CAST(ts::TIMESTAMP AS DATE) AS day FROM events
      |), c AS (
      |  SELECT user_id, day,
      |         min(day) OVER (PARTITION BY user_id) AS cohort_day
      |  FROM e
      |), d AS (
      |  SELECT DISTINCT user_id, cohort_day,
      |         date_diff('day', cohort_day, day) AS day_offset
      |  FROM c
      |)
      |SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
      |       CAST(day_offset AS INT) AS day_offset, count(*) AS n_users
      |FROM d GROUP BY cohort_day, day_offset ORDER BY cohort_day, day_offset
      """.stripMargin.trim))

  private val gapfillQ = QueryDef(
    "ev_daily_gapfill",
    "Time-series gap-fill with forward-fill: per-user daily value sums, " +
      "missing calendar days generated from each user's own [min, max] " +
      "span (sequence+explode — the day scaffold is derived per key, " +
      "never a driver-built calendar), then last-observation-carried-" +
      "forward via an ignore-nulls running window. Values stay " +
      "DECIMAL(38,6) end-to-end (zero double drift). Every stage — " +
      "daily rollup, span, scaffold join, fill window, final collapse — " +
      "is keyed by user_id, so the whole pipeline lives in one " +
      "partitioning family; output is |users| rows.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val dec = org.apache.spark.sql.types.DecimalType(38, 6)
      val ev = Tables.events(s, dir)
      val daily = ev.groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast(dec)).as("v"))
      val span = daily.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val scaffold = span.select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      scaffold.join(daily, Seq("user_id", "day"), "left")
        .withColumn("vf", last(col("v"), ignoreNulls = true).over(w))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_days"),
          count(col("v")).as("n_observed"),
          sum(col("vf")).cast("decimal(38,2)").cast("double").as("filled_sum"))
        .orderBy(col("user_id"))
    },
    Some("""
      |WITH daily AS (
      |  SELECT user_id, CAST(ts::TIMESTAMP AS DATE) AS day,
      |         SUM(CAST(value AS DECIMAL(38,6))) AS v
      |  FROM events GROUP BY 1, 2
      |), span AS (
      |  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
      |), scaffold AS (
      |  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      |  FROM span
      |), filled AS (
      |  SELECT s.user_id, d.v,
      |         last_value(d.v IGNORE NULLS) OVER (
      |           PARTITION BY s.user_id ORDER BY s.day
      |           ROWS UNBOUNDED PRECEDING) AS vf
      |  FROM scaffold s LEFT JOIN daily d
      |    ON s.user_id = d.user_id AND s.day = d.day
      |)
      |SELECT user_id, count(*) AS n_days, count(v) AS n_observed,
      |       CAST(CAST(SUM(vf) AS DECIMAL(38,2)) AS DOUBLE) AS filled_sum
      |FROM filled GROUP BY user_id ORDER BY user_id
      """.stripMargin.trim))

  private val rfmQ = QueryDef(
    "ev_rfm_segments",
    "RFM user segmentation (recency / frequency / monetary): one " +
      "user-keyed aggregate builds the per-user profile (last-seen µs, " +
      "event count, exact-decimal value sum), quartile CUTOFFS come from " +
      "one broadcast single-row percentile aggregate (NOT an " +
      "unpartitioned ntile window — a global sort over all users is the " +
      "thing that doesn't scale), and each user is scored 1-4 per axis " +
      "by comparing against the broadcast cutoffs. Parity: recency is " +
      "exact integer µs arithmetic (div truncation ≡ // on non-negative " +
      "diffs); interpolated percentile ≡ quantile_cont; a 2-decimal " +
      "monetary double round-trips through DECIMAL(38,2) exactly, so " +
      "the per-segment re-sum stays order-independent.",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val dec = org.apache.spark.sql.types.DecimalType(38, 6)
      val dec2 = org.apache.spark.sql.types.DecimalType(38, 2)
      val perUser = ev.groupBy(col("user_id")).agg(
        max(unix_micros(col("ts"))).as("last_us"),
        count(lit(1)).as("frequency"),
        sum(col("value").cast(dec)).cast(dec2).cast("double").as("monetary"))
      val gmax = ev.agg(max(unix_micros(col("ts"))).as("g_us"))
      val r = perUser.crossJoin(broadcast(gmax))
        .withColumn("recency_days", expr("(g_us - last_us) div 86400000000"))
      val cuts = r.agg(
        expr("percentile(recency_days, 0.25)").as("r25"),
        expr("percentile(recency_days, 0.50)").as("r50"),
        expr("percentile(recency_days, 0.75)").as("r75"),
        expr("percentile(frequency, 0.25)").as("f25"),
        expr("percentile(frequency, 0.50)").as("f50"),
        expr("percentile(frequency, 0.75)").as("f75"),
        expr("percentile(monetary, 0.25)").as("m25"),
        expr("percentile(monetary, 0.50)").as("m50"),
        expr("percentile(monetary, 0.75)").as("m75"))
      val scored = r.crossJoin(broadcast(cuts)).select(
        col("user_id"), col("frequency"), col("monetary"),
        when(col("recency_days") <= col("r25"), 4)
          .when(col("recency_days") <= col("r50"), 3)
          .when(col("recency_days") <= col("r75"), 2).otherwise(1).as("rs"),
        when(col("frequency") >= col("f75"), 4)
          .when(col("frequency") >= col("f50"), 3)
          .when(col("frequency") >= col("f25"), 2).otherwise(1).as("fs"),
        when(col("monetary") >= col("m75"), 4)
          .when(col("monetary") >= col("m50"), 3)
          .when(col("monetary") >= col("m25"), 2).otherwise(1).as("ms"))
      scored
        .groupBy(concat_ws("-", col("rs"), col("fs"), col("ms")).as("segment"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("frequency")).as("sum_freq"),
          sum(col("monetary").cast(dec2)).cast(dec2).cast("double").as("total_monetary"),
          min(col("user_id")).as("min_user"), max(col("user_id")).as("max_user"))
        .orderBy(col("segment"))
    },
    Some("""
      |WITH pu AS (
      |  SELECT user_id, max(epoch_us(ts::TIMESTAMP)) AS last_us, count(*) AS frequency,
      |         CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DECIMAL(38,2)) AS DOUBLE) AS monetary
      |  FROM events GROUP BY user_id
      |), g AS (SELECT max(epoch_us(ts::TIMESTAMP)) AS g_us FROM events),
      |r AS (SELECT user_id, (g_us - last_us) // 86400000000 AS recency_days, frequency, monetary FROM pu, g),
      |c AS (SELECT quantile_cont(recency_days, 0.25) AS r25, quantile_cont(recency_days, 0.50) AS r50, quantile_cont(recency_days, 0.75) AS r75,
      |             quantile_cont(frequency, 0.25) AS f25, quantile_cont(frequency, 0.50) AS f50, quantile_cont(frequency, 0.75) AS f75,
      |             quantile_cont(monetary, 0.25) AS m25, quantile_cont(monetary, 0.50) AS m50, quantile_cont(monetary, 0.75) AS m75
      |      FROM r),
      |s AS (
      |  SELECT user_id, frequency, monetary,
      |    CASE WHEN recency_days <= r25 THEN 4 WHEN recency_days <= r50 THEN 3 WHEN recency_days <= r75 THEN 2 ELSE 1 END AS rs,
      |    CASE WHEN frequency >= f75 THEN 4 WHEN frequency >= f50 THEN 3 WHEN frequency >= f25 THEN 2 ELSE 1 END AS fs,
      |    CASE WHEN monetary >= m75 THEN 4 WHEN monetary >= m50 THEN 3 WHEN monetary >= m25 THEN 2 ELSE 1 END AS ms
      |  FROM r, c)
      |SELECT rs || '-' || fs || '-' || ms AS segment, count(*) AS n_users,
      |       CAST(SUM(frequency) AS BIGINT) AS sum_freq,
      |       CAST(CAST(SUM(CAST(monetary AS DECIMAL(38,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_monetary,
      |       min(user_id) AS min_user, max(user_id) AS max_user
      |FROM s GROUP BY 1 ORDER BY 1
      """.stripMargin.trim))

  private val rangeFrameQ = QueryDef(
    "ev_burst_range_frame",
    "Per-event burst detection with a RANGE window frame — the " +
      "value-based frame §2.7 breadth item next to the ROWS frames " +
      "(moving avg) and the tumbling/sliding/session windows: for each " +
      "event, the count and exact-cents value of the SAME USER's events " +
      "in the strictly-preceding 10 minutes (RANGE on epoch-µs, " +
      "[-600 s, -1 µs] — numeric frame bounds so both engines resolve " +
      "identical membership; an INTERVAL frame vs epoch-µs frame could " +
      "disagree at µs edges). One user-keyed window shuffle; top-100 " +
      "burstiest rows presented on (n DESC, event_id).",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("vc", (col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
          .cast("long"))
      val fr = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-600000000L, -1L)
      e.select(col("event_id"), col("user_id"), col("event_type"),
          count(lit(1)).over(fr).as("n_prev_10m"),
          coalesce(sum(col("vc")).over(fr), lit(0L)).as("cents_prev_10m"))
        .orderBy(col("n_prev_10m").desc, col("event_id")).limit(100)
    },
    Some("""
      |WITH e AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
      |         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS vc
      |  FROM events
      |), w AS (
      |  SELECT event_id, user_id, event_type,
      |         count(*) OVER fr AS n_prev_10m,
      |         COALESCE(SUM(vc) OVER fr, 0) AS cents_prev_10m
      |  FROM e
      |  WINDOW fr AS (PARTITION BY user_id ORDER BY us
      |                RANGE BETWEEN 600000000 PRECEDING AND 1 PRECEDING)
      |)
      |SELECT event_id, user_id, event_type, n_prev_10m,
      |       cents_prev_10m::BIGINT AS cents_prev_10m
      |FROM w ORDER BY n_prev_10m DESC, event_id LIMIT 100
      """.stripMargin.trim))

  private val trigramsQ = QueryDef(
    "ev_journey_trigrams",
    "Sequential-pattern mining: the 20 most frequent per-user event-type " +
      "TRIGRAMS (the journey motifs one step beyond ev_markov_transitions' " +
      "bigram matrix). Two leads from ONE user-keyed window pass — same " +
      "single shuffle as the Markov estimator, (ts, event_id)-ordered so " +
      "timestamp ties are deterministic; the |types|³-bounded count " +
      "aggregation is a rounding error at any scale.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("t2", lead(col("event_type"), 1).over(w))
        .withColumn("t3", lead(col("event_type"), 2).over(w))
        .filter(col("t3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("t2"), col("t3")).as("trigram"))
        .groupBy(col("trigram")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("trigram"))
        .limit(20)
    },
    Some("""
      |WITH o AS (
      |  SELECT event_type,
      |         lead(event_type, 1) OVER w AS t2,
      |         lead(event_type, 2) OVER w AS t3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |)
      |SELECT event_type || '>' || t2 || '>' || t3 AS trigram, count(*) AS n
      |FROM o WHERE t3 IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, trigram LIMIT 20
      """.stripMargin.trim))

  private val madQ = QueryDef(
    "ev_anomaly_mad",
    "Robust anomaly detection by Median Absolute Deviation per event " +
      "type: median and MAD via the exact interpolated percentile (the " +
      "ev_value_percentiles parity channel), then outliers = values " +
      "with |x − med| > 3·MAD — the heavy-tail-safe alternative to the " +
      "z-score gate in ev_value_outliers. Both downstream comparisons " +
      "use the 6-dp-ROUNDED med/MAD so every operand is bit-identical " +
      "cross-engine; two grouped aggregation passes + one broadcast " +
      "join back, per-group state bounded by the type cardinality.",
    (s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
      val med = ev.groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.5)"), 6).as("med"))
      val dev = ev.join(broadcast(med), Seq("event_type"))
        .withColumn("adev", abs(col("value") - col("med")))
        .drop("med")
      val mad = dev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(expr("percentile(adev, 0.5)"), 6).as("mad"))
      dev.join(broadcast(mad.join(med, Seq("event_type"))), Seq("event_type"))
        .withColumn("is_out",
          (round(col("adev"), 6) > lit(3.0) * col("mad")).cast("long"))
        .groupBy(col("event_type"))
        .agg(first(col("n")).as("n"), first(col("med")).as("med"),
          first(col("mad")).as("mad"), sum(col("is_out")).as("n_outliers"))
        .withColumn("outlier_rate",
          round(col("n_outliers").cast("double") / col("n").cast("double"), 6))
        .orderBy(col("event_type"))
    },
    Some("""
      |WITH med AS (
      |  SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
      |  FROM events GROUP BY 1
      |), dev AS (
      |  SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
      |  FROM events e JOIN med m USING (event_type)
      |), mad AS (
      |  SELECT event_type, count(*) AS n, round(quantile_cont(adev, 0.5), 6) AS mad
      |  FROM dev GROUP BY 1
      |), f AS (
      |  SELECT d.event_type, a.n, d.med, a.mad,
      |         CASE WHEN round(d.adev, 6) > 3.0 * a.mad THEN 1 ELSE 0 END AS is_out
      |  FROM dev d JOIN mad a USING (event_type)
      |)
      |SELECT event_type, any_value(n) AS n, any_value(med) AS med,
      |       any_value(mad) AS mad, SUM(is_out)::BIGINT AS n_outliers,
      |       round(SUM(is_out)::DOUBLE / any_value(n)::DOUBLE, 6) AS outlier_rate
      |FROM f GROUP BY event_type ORDER BY event_type
      """.stripMargin.trim))

  private val reachQ = QueryDef(
    "ev_cumulative_reach",
    "Daily active users and cumulative reach — the growth-dashboard " +
      "pair: DAU = per-day distinct users (one day-keyed distinct " +
      "aggregate), new users = count by each user's FIRST day (one " +
      "user-keyed min), cumulative reach = prefix sum of new users " +
      "over the day grid (a window over ≤|calendar| rows — the " +
      "row-sized work is two keyed shuffles, the cumulative window is " +
      "calendar-bounded). Exact integers throughout; the cumulative " +
      "column's last row equals the corpus-wide distinct-user count " +
      "by construction.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
        .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      val dau = ev.groupBy(col("day")).agg(countDistinct(col("user_id")).as("dau"))
      val newU = ev.groupBy(col("user_id")).agg(min(col("day")).as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
      dau.join(newU, Seq("day"), "left")
        .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
        .withColumn("cum_reach", sum(col("new_users")).over(
          Window.orderBy(col("day"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy(col("day"))
    },
    Some("""
      |WITH ev AS (
      |  SELECT user_id, strftime(ts::TIMESTAMP, '%Y-%m-%d') AS day FROM events
      |), dau AS (
      |  SELECT day, count(DISTINCT user_id) AS dau FROM ev GROUP BY 1
      |), firsts AS (
      |  SELECT user_id, min(day) AS day FROM ev GROUP BY 1
      |), newu AS (
      |  SELECT day, count(*) AS new_users FROM firsts GROUP BY 1
      |)
      |SELECT dau.day, dau.dau, COALESCE(newu.new_users, 0) AS new_users,
      |       SUM(COALESCE(newu.new_users, 0)) OVER (ORDER BY dau.day
      |         ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_reach
      |FROM dau LEFT JOIN newu ON dau.day = newu.day
      |ORDER BY dau.day
      """.stripMargin.trim))

  private val entropyDaily = QueryDef(
    "ev_type_entropy_daily",
    "Daily Shannon entropy of the event-type mix — the behavioral-" +
      "diversity series (entropy collapse flags a bot surge or an " +
      "instrumentation break; complements ev_pivot_daily's raw counts " +
      "with the one-number mix summary). H = −Σ p·ln(p) from exact " +
      "per-(day, type) BIGINT counts: each p·ln(p) term rounds at 6 " +
      "and accumulates in DECIMAL(38,6) (order-independent — the " +
      "cross-engine ln discipline), normalized entropy divides by " +
      "ln(n_types) in one fixed shape. Two scan-side shuffles (day-" +
      "type rollup, day rollup); everything runs on the calendar-" +
      "bounded day grid.",
    (s, dir) => {
      val ct = Tables.events(s, dir)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .groupBy(col("day"), col("event_type")).agg(count(lit(1)).as("c"))
      val nd = ct.groupBy(col("day")).agg(
        sum(col("c")).as("n_events"), count(lit(1)).as("n_types"))
      ct.join(nd, Seq("day"))
        .withColumn("term", expr(
          "round((CAST(c AS DOUBLE) / CAST(n_events AS DOUBLE)) * " +
            "ln(CAST(c AS DOUBLE) / CAST(n_events AS DOUBLE)), 6)"))
        .groupBy(col("day"))
        .agg(max(col("n_events")).as("n_events"),
          max(col("n_types")).as("n_types"),
          round(-sum(col("term").cast(
            org.apache.spark.sql.types.DecimalType(38, 6))).cast("double"), 6)
            .as("entropy"))
        .withColumn("entropy_norm", expr(
          "CASE WHEN n_types > 1 THEN round(entropy / ln(CAST(n_types AS DOUBLE)), 6) ELSE 0.0 END"))
        .orderBy(col("day"))
    },
    Some("""
      |WITH ct AS (
      |  SELECT strftime(ts::TIMESTAMP, '%Y-%m-%d') AS day, event_type, count(*) AS c
      |  FROM events GROUP BY 1, 2
      |), nd AS (
      |  SELECT day, SUM(c)::BIGINT AS n_events, count(*)::BIGINT AS n_types
      |  FROM ct GROUP BY 1
      |), terms AS (
      |  SELECT ct.day, nd.n_events, nd.n_types,
      |         round((CAST(c AS DOUBLE) / CAST(n_events AS DOUBLE)) * ln(CAST(c AS DOUBLE) / CAST(n_events AS DOUBLE)), 6) AS term
      |  FROM ct JOIN nd ON nd.day = ct.day
      |), h AS (
      |  SELECT day, MAX(n_events)::BIGINT AS n_events, MAX(n_types)::BIGINT AS n_types,
      |         round(-CAST(SUM(CAST(term AS DECIMAL(38,6))) AS DOUBLE), 6) AS entropy
      |  FROM terms GROUP BY 1
      |)
      |SELECT day, n_events, n_types, entropy,
      |       CASE WHEN n_types > 1 THEN round(entropy / ln(CAST(n_types AS DOUBLE)), 6) ELSE 0.0 END AS entropy_norm
      |FROM h ORDER BY day
      """.stripMargin.trim))

  private val retentionHalflife = QueryDef(
    "ev_retention_halflife",
    "Retention half-life: fit r(o) ≈ K·e^(−λo) to the day-offset " +
      "return rates and report ln2/λ — the ONE-NUMBER summary of " +
      "ev_retention_cohorts' matrix that product analytics actually " +
      "tracks week over week. Rates are exact-count ratios with a " +
      "censoring-correct denominator (a user is eligible for offset o " +
      "only when their cohort is ≥ o days old — naive division " +
      "understates late offsets); the log-linear OLS runs over ≤14 " +
      "(offset, round-6 ln rate) points with the txt_zipf_fit float " +
      "discipline (round-6 terms into DECIMAL(38,6), one fixed closed " +
      "form). A NON-decaying series fits a slope ≥ 0 and reports a " +
      "NEGATIVE half-life — the honest readout (the synthetic fixture " +
      "does exactly this; spec-locked), not a clamped plausible " +
      "number. One user-keyed shuffle + two offset-keyed rollups; the " +
      "regression is O(14) at any scale.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val dec6 = org.apache.spark.sql.types.DecimalType(38, 6)
      val w = Window.partitionBy(col("user_id"))
      val ev = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val c = ev.withColumn("cohort_day", min(col("day")).over(w))
        .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
        .select(col("user_id"), col("cohort_day"), col("day_offset"))
        .distinct()
      val mxd = ev.agg(max(col("day")).as("mxd"))
      val active = c.filter(col("day_offset").between(1, 14))
        .groupBy(col("day_offset")).agg(count(lit(1)).as("n_active"))
      val elig = c.filter(col("day_offset") === 0)
        .crossJoin(broadcast(mxd))
        .withColumn("tenure", least(lit(14), datediff(col("mxd"), col("cohort_day"))))
        .filter(col("tenure") >= 1)
        .select(col("user_id"), explode(sequence(lit(1), col("tenure"))).as("day_offset"))
        .groupBy(col("day_offset")).agg(count(lit(1)).as("n_elig"))
      val pts = active.join(elig, Seq("day_offset"))
        .filter(col("n_active") > 0)
        .select(col("day_offset").cast("double").as("x"),
          round(log(col("n_active").cast("double") / col("n_elig").cast("double")), 6)
            .as("y"))
      val st = pts.agg(
        count(lit(1)).as("k"),
        sum(col("x").cast(dec6)).cast("double").as("sx"),
        sum(col("y").cast(dec6)).cast("double").as("sy"),
        sum(round(col("x") * col("y"), 6).cast(dec6)).cast("double").as("sxy"),
        sum(round(col("x") * col("x"), 6).cast(dec6)).cast("double").as("sxx"),
        sum(round(col("y") * col("y"), 6).cast(dec6)).cast("double").as("syy"))
      val slope = (col("k").cast("double") * col("sxy") - col("sx") * col("sy")) /
        (col("k").cast("double") * col("sxx") - col("sx") * col("sx"))
      st.select(col("k").as("n_offsets"),
        round(slope, 6).as("decay_rate"),
        round(-log(lit(2.0)) / slope, 4).as("halflife_days"),
        round((col("k").cast("double") * col("sxy") - col("sx") * col("sy")) *
          (col("k").cast("double") * col("sxy") - col("sx") * col("sy")) /
          ((col("k").cast("double") * col("sxx") - col("sx") * col("sx")) *
            (col("k").cast("double") * col("syy") - col("sy") * col("sy"))), 6)
          .as("r2"))
    },
    Some("""
      |WITH e AS (
      |  SELECT user_id, CAST(ts::TIMESTAMP AS DATE) AS day FROM events
      |), c AS (
      |  SELECT DISTINCT user_id,
      |         min(day) OVER (PARTITION BY user_id) AS cohort_day,
      |         date_diff('day', min(day) OVER (PARTITION BY user_id), day) AS day_offset
      |  FROM e
      |), mx AS (SELECT max(day) AS mxd FROM e),
      |active AS (
      |  SELECT day_offset, count(*) AS n_active FROM c
      |  WHERE day_offset BETWEEN 1 AND 14 GROUP BY 1
      |), elig AS (
      |  SELECT day_offset, count(*) AS n_elig FROM (
      |    SELECT user_id, unnest(range(1, least(14,
      |             date_diff('day', cohort_day, mxd)) + 1)) AS day_offset
      |    FROM (SELECT user_id, cohort_day FROM c WHERE day_offset = 0) u, mx
      |    WHERE date_diff('day', cohort_day, mxd) >= 1
      |  ) GROUP BY 1
      |), pts AS (
      |  SELECT day_offset::DOUBLE AS x,
      |         round(ln(n_active::DOUBLE / n_elig::DOUBLE), 6) AS y
      |  FROM active JOIN elig USING (day_offset)
      |  WHERE n_active > 0
      |), st AS (
      |  SELECT count(*)::BIGINT AS k,
      |         CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
      |         CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
      |         CAST(SUM(CAST(round(x * y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
      |         CAST(SUM(CAST(round(x * x, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
      |         CAST(SUM(CAST(round(y * y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS syy
      |  FROM pts
      |), f AS (
      |  SELECT k, sx, sy, sxy, sxx, syy,
      |         (k::DOUBLE * sxy - sx * sy) / (k::DOUBLE * sxx - sx * sx) AS slope
      |  FROM st
      |)
      |SELECT k AS n_offsets,
      |       round(slope, 6) AS decay_rate,
      |       round(-ln(2.0) / slope, 4) AS halflife_days,
      |       round((k::DOUBLE * sxy - sx * sy) * (k::DOUBLE * sxy - sx * sy) /
      |             ((k::DOUBLE * sxx - sx * sx) * (k::DOUBLE * syy - sy * sy)), 6) AS r2
      |FROM f
      """.stripMargin.trim))

  private val interarrival = QueryDef(
    "ev_interarrival_poisson",
    "Poisson-process check per event type: mean and coefficient of " +
      "variation of inter-arrival gaps — CV ≈ 1 reads as a memoryless " +
      "(Poisson) arrival stream, CV ≫ 1 as bursty/bot traffic, CV ≪ 1 " +
      "as scheduled/machine cadence; the arrival-PROCESS probe beside " +
      "txt_burstiness' per-document token view. Gaps are exact integer " +
      "epoch-second differences via one type-keyed lag window (ties " +
      "order arbitrarily but the gap MULTISET is permutation-invariant " +
      "under equal timestamps, and the sufficient statistics n, Σg, " +
      "Σg² are multiset functions — deterministic without a tiebreak); " +
      "mean and CV evaluate in one fixed double shape from exact " +
      "BIGINTs. One keyed shuffle.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type")).orderBy(col("sec"))
      val g = Tables.events(s, dir)
        .select(col("event_type"), col("ts").cast("long").as("sec"))
        .withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
        .filter(col("gap").isNotNull)
      g.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_gaps"),
          sum(col("gap")).as("sg"),
          sum(col("gap") * col("gap")).as("sg2"))
        .select(col("event_type"), col("n_gaps"),
          round(col("sg").cast("double") / col("n_gaps").cast("double"), 6)
            .as("mean_gap_s"),
          round(sqrt(greatest(lit(0.0),
            col("sg2").cast("double") / col("n_gaps").cast("double") -
              (col("sg").cast("double") / col("n_gaps").cast("double")) *
              (col("sg").cast("double") / col("n_gaps").cast("double")))) /
            (col("sg").cast("double") / col("n_gaps").cast("double")), 6)
            .as("cv"))
        .orderBy(col("event_type"))
    },
    Some("""
      |WITH e AS (
      |  SELECT event_type, epoch_us(ts::TIMESTAMP) // 1000000 AS sec FROM events
      |), g AS (
      |  SELECT event_type,
      |         sec - lag(sec, 1) OVER (PARTITION BY event_type ORDER BY sec) AS gap
      |  FROM e
      |), s AS (
      |  SELECT event_type, count(*)::BIGINT AS n_gaps,
      |         SUM(gap)::BIGINT AS sg, SUM(gap * gap)::BIGINT AS sg2
      |  FROM g WHERE gap IS NOT NULL GROUP BY 1
      |)
      |SELECT event_type, n_gaps,
      |       round(sg::DOUBLE / n_gaps::DOUBLE, 6) AS mean_gap_s,
      |       round(sqrt(greatest(0.0,
      |               sg2::DOUBLE / n_gaps::DOUBLE -
      |               (sg::DOUBLE / n_gaps::DOUBLE) * (sg::DOUBLE / n_gaps::DOUBLE))) /
      |             (sg::DOUBLE / n_gaps::DOUBLE), 6) AS cv
      |FROM s ORDER BY event_type
      """.stripMargin.trim))

  val defs: Seq[QueryDef] =
    Seq(tumbling, sliding, sessionsQ, propsQ, firstQ, valueStats, pivotQ, asofQ,
      rangeQ, movingQ, gapsQ, funnelQ, percentilesQ, histogramQ, outliersQ,
      cohortsQ, gapfillQ, rfmQ, rangeFrameQ, trigramsQ, madQ, reachQ,
      entropyDaily, retentionHalflife, interarrival)
}
