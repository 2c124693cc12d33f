package graft.queries

import graft.Tables
import graft.operators.PageRank
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Statistical / analytical modeling queries: closed-form OLS trend,
  * Pearson correlation, Markov transition estimation, exponential
  * smoothing, iterative graph centrality, and the centroid geometry of
  * the embedding space. These are the "analytics on top of the engine"
  * layer a warehouse user expects once the relational+vector surface
  * exists.
  *
  * Cross-engine float discipline (see Queries scaladoc): every
  * sufficient statistic (n, Σx, Σy, Σxy, Σx², Σy²) is accumulated
  * EXACTLY — integer/decimal sums, order-independent — and only the
  * final closed-form formula runs in double, with the identical
  * parenthesization on both engines, so the doubles are bit-equal.
  * Where raw magnitudes would push an exact sum past 2⁵³ (where
  * decimal→double conversion becomes engine-dependent), inputs are
  * deterministically decimated FIRST (integer `div` — truncation is
  * mode-free), and the decimation is part of the query's definition.
  */
object StatQueries {

  private val dec6 = DecimalType(38, 6)
  private val dec2 = DecimalType(38, 2)

  /** Daily value totals per event type, in exact integer cents. */
  private def dailyCents(s: SparkSession, dir: String) =
    Tables.events(s, dir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy(col("event_type"), col("day"))
      .agg((sum(col("value").cast(dec6)).cast(dec2) * 100).cast("long").as("yc"))

  private val dailyCentsSql = """
    |  SELECT event_type, strftime(ts::TIMESTAMP, '%Y-%m-%d') AS day,
    |         CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DECIMAL(38,2)) * 100 AS BIGINT) AS yc
    |  FROM events GROUP BY 1, 2""".stripMargin.trim

  private val forecastMase = QueryDef(
    "ev_forecast_mase",
    "Forecast-baseline selection via scaled absolute error — the " +
      "one-number answer to 'does weekly seasonality help' that " +
      "routes between ev_holt_forecast and ev_holt_winters before " +
      "either model is fit: per event type, the one-step naive " +
      "(lag-1) and seasonal-naive (lag-7) baselines score on their " +
      "COMMON support (days with both lags defined — same count, so " +
      "the MASE-style ratio is a pure Σ|error| ratio and the day " +
      "counts cancel), MAE in exact BIGINT cents, ratio < 1 ⟹ " +
      "yesterday beats last-week ⟹ the seasonal component is not " +
      "earning its keep. ONE type-keyed window pass (both lags share " +
      "the shuffle, the stat_acf_daily discipline); output is " +
      "|types| rows at any scale; the only doubles are the two " +
      "fixed-shape presentation divisions.",
    (s, dir) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val d = dailyCents(s, dir)
        .withColumn("y1", lag(col("yc"), 1).over(w))
        .withColumn("y7", lag(col("yc"), 7).over(w))
        .filter(col("y7").isNotNull)
      d.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(abs(col("yc") - col("y1"))).as("sae1"),
          sum(abs(col("yc") - col("y7"))).as("sae7"))
        .select(col("event_type"), col("n_days"),
          round(col("sae1").cast("double") / col("n_days").cast("double") / lit(100.0), 6)
            .as("mae_naive1"),
          round(col("sae7").cast("double") / col("n_days").cast("double") / lit(100.0), 6)
            .as("mae_seasonal7"),
          when(col("sae7") > 0,
            round(col("sae1").cast("double") / col("sae7").cast("double"), 6))
            .as("mase_1_vs_7"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      |WITH daily AS (
      |$dailyCentsSql
      |), l AS (
      |  SELECT event_type, yc,
      |         lag(yc, 1) OVER (PARTITION BY event_type ORDER BY day) AS y1,
      |         lag(yc, 7) OVER (PARTITION BY event_type ORDER BY day) AS y7
      |  FROM daily
      |), g AS (
      |  SELECT event_type, count(*) AS n_days,
      |         SUM(abs(yc - y1)) AS sae1, SUM(abs(yc - y7)) AS sae7
      |  FROM l WHERE y7 IS NOT NULL GROUP BY 1
      |)
      |SELECT event_type, n_days::BIGINT AS n_days,
      |       round(sae1::DOUBLE / n_days::DOUBLE / 100.0, 6) AS mae_naive1,
      |       round(sae7::DOUBLE / n_days::DOUBLE / 100.0, 6) AS mae_seasonal7,
      |       CASE WHEN sae7 > 0 THEN round(sae1::DOUBLE / sae7::DOUBLE, 6) END
      |         AS mase_1_vs_7
      |FROM g ORDER BY event_type
      """.stripMargin.trim))

  private val trendOls = QueryDef(
    "ev_trend_ols",
    "Per-type linear trend of daily event value: closed-form OLS " +
      "(slope/intercept from the five sufficient statistics) over " +
      "day-indexed exact-cents daily totals. x = days since the group's " +
      "first day (window min — no fixture date literal), all Σ exact " +
      "BIGINT, formula evaluated in double with one fixed shape. Two " +
      "scan-side shuffles (daily rollup, per-type stats): the regression " +
      "itself is O(|types|) — this is how you fit 10⁶ per-key trends on " +
      "100 TB without a driver loop.",
    (s, dir) => {
      val daily = dailyCents(s, dir)
      val idx = daily.withColumn("x",
        datediff(to_date(col("day")),
          min(to_date(col("day"))).over(Window.partitionBy(col("event_type"))))
          .cast("long"))
      val st = idx.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
        sum(col("yc")).as("sy"), sum(col("x") * col("yc")).as("sxy"))
      val slope = (col("n").cast("double") * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")) /
        (col("n").cast("double") * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double"))
      st.select(col("event_type"), col("n").as("n_days"),
          round(slope / lit(100.0), 6).as("slope_per_day"),
          round(((col("sy").cast("double") - slope * col("sx").cast("double")) /
            col("n").cast("double")) / lit(100.0), 6).as("intercept"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      |WITH daily AS (
      |$dailyCentsSql
      |), idx AS (
      |  SELECT event_type, yc,
      |         date_diff('day', min(day::DATE) OVER (PARTITION BY event_type), day::DATE) AS x
      |  FROM daily
      |), s AS (
      |  SELECT event_type, count(*) AS n,
      |         SUM(x) AS sx, SUM(x*x) AS sxx, SUM(yc) AS sy, SUM(x * yc) AS sxy
      |  FROM idx GROUP BY 1
      |), f AS (
      |  SELECT event_type, n, sx, sy,
      |         (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
      |         (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) AS slope
      |  FROM s
      |)
      |SELECT event_type, n AS n_days,
      |       round(slope / 100.0, 6) AS slope_per_day,
      |       round(((sy::DOUBLE - slope * sx::DOUBLE) / n::DOUBLE) / 100.0, 6) AS intercept
      |FROM f ORDER BY event_type
      """.stripMargin.trim))

  private val dailyCorr = QueryDef(
    "stat_daily_corr",
    "Pearson correlation between daily order volume (quantity) and " +
      "daily revenue per return flag — the data-profiling association " +
      "statistic from exact sufficient statistics. Day-level totals are " +
      "exact integers, then DETERMINISTICALLY decimated (qty div 100, " +
      "cents div 10⁶) so every Σx², Σy², Σxy stays far inside 2⁵³ even " +
      "decades past sf10 (corr is scale-invariant up to the truncation, " +
      "which the decimation makes part of the definition); the final " +
      "formula runs in double with one fixed shape on both engines.",
    (s, dir) => {
      val daily = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_shipdate").cast("date").as("day"))
        .agg(sum(col("l_quantity").cast(DecimalType(12, 0))).cast("long").as("qty"),
          (sum(col("l_extendedprice").cast(Queries.Money.price)).cast(dec2) * 100)
            .cast("long").as("rev_cents"))
      val d = daily.select(col("l_returnflag"),
        expr("qty div 100").as("x"), expr("rev_cents div 1000000").as("y"))
      val st = d.groupBy(col("l_returnflag")).agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("x")).cast("double").as("sx"), sum(col("y")).cast("double").as("sy"),
        sum(col("x") * col("x")).cast("double").as("sxx"),
        sum(col("y") * col("y")).cast("double").as("syy"),
        sum(col("x") * col("y")).cast("double").as("sxy"))
      st.select(col("l_returnflag"), col("n").cast("long").as("n_days"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("corr_qty_rev"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      |WITH daily AS (
      |  SELECT l_returnflag, l_shipdate::DATE AS day,
      |         CAST(SUM(CAST(l_quantity AS DECIMAL(12,0))) AS BIGINT) AS qty,
      |         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) * 100 AS BIGINT) AS rev_cents
      |  FROM lineitem GROUP BY 1, 2
      |), d AS (
      |  SELECT l_returnflag, qty // 100 AS x, rev_cents // 1000000 AS y FROM daily
      |), s AS (
      |  SELECT l_returnflag, count(*)::DOUBLE AS n,
      |         SUM(x)::DOUBLE AS sx, SUM(y)::DOUBLE AS sy,
      |         SUM(x*x)::DOUBLE AS sxx, SUM(y*y)::DOUBLE AS syy, SUM(x*y)::DOUBLE AS sxy
      |  FROM d GROUP BY 1
      |)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n_days,
      |       round((n * sxy - sx * sy) /
      |             sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_qty_rev
      |FROM s ORDER BY l_returnflag
      """.stripMargin.trim))

  /** Memoized per-(fixture, JVM) transition-count store (prev_type,
    * next_type, n) — the ONE user-keyed lag-window pass over every
    * event that BOTH markov consumers (ev_markov_transitions,
    * ev_markov_stationary) would otherwise re-pay in full (the r16
    * sf100 probe measured that pass at ~300 s per query). Same
    * discipline as the trade-graph / co-purchase memos: a
    * deterministic rollup of a deterministic scan, invisible to the
    * hash gate; both oracles keep deriving the counts from raw events.
    */
  private[graft] def markovCounts(s: SparkSession, dir: String): DataFrame = {
    val table = TmpStores.memoizedTable("graft_markov_counts", dir) { root =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val path = s"$root/counts"
      Tables.events(s, dir)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .select(col("prev_type"), col("event_type").as("next_type"))
        .groupBy(col("prev_type"), col("next_type")).agg(count(lit(1)).as("n"))
        .write.parquet(path)
      path
    }
    s.read.parquet(table)
  }

  private val markov = QueryDef(
    "ev_markov_transitions",
    "First-order Markov transition matrix over per-user event sequences " +
      "(the behavioral-model estimation query): lag window ordered by " +
      "(ts, event_id) — the unique id makes timestamp ties " +
      "deterministic — then transition counts and row-normalized " +
      "probabilities (one exact integer division pair per cell). The " +
      "counts come from the memoized per-(fixture, JVM) store shared " +
      "with ev_markov_stationary (ONE user-keyed window pass serves " +
      "both consumers — the trade-graph memo discipline); the " +
      "|types|² matrix aggregation is a rounding error at any scale.",
    (s, dir) => {
      markovCounts(s, dir)
        .withColumn("p", round(col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy(col("prev_type"))).cast("double"), 6))
        .orderBy(col("prev_type"), col("next_type"))
    },
    Some("""
      |WITH o AS (
      |  SELECT user_id, event_type,
      |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM events
      |), c AS (
      |  SELECT prev_type, event_type AS next_type, count(*) AS n
      |  FROM o WHERE prev_type IS NOT NULL GROUP BY 1, 2
      |)
      |SELECT prev_type, next_type, n,
      |       round(n::DOUBLE / (SUM(n) OVER (PARTITION BY prev_type))::DOUBLE, 6) AS p
      |FROM c ORDER BY prev_type, next_type
      """.stripMargin.trim))

  private val ewma = QueryDef(
    "ev_ewma_daily",
    "Exponentially weighted moving average of daily value per event " +
      "type, α = 1/2 truncated at 6 terms (weights 32..1 in 64ths — " +
      "residual tail mass 1/64 dropped by definition). The " +
      "integer-weights trick: daily cents × {32,16,8,4,2,1} summed in " +
      "BIGINT is exact and order-free; the ONLY float op is one final " +
      "division by 6400 (64ths→cents→dollars), identical in both " +
      "engines. No decimal-typing surface at all.",
    (s, dir) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      dailyCents(s, dir)
        .select(col("event_type"), col("day"), col("yc"),
          lag(col("yc"), 1, 0L).over(w).as("y1"),
          lag(col("yc"), 2, 0L).over(w).as("y2"),
          lag(col("yc"), 3, 0L).over(w).as("y3"),
          lag(col("yc"), 4, 0L).over(w).as("y4"),
          lag(col("yc"), 5, 0L).over(w).as("y5"))
        .select(col("event_type"), col("day"),
          ((lit(32L) * col("yc") + lit(16L) * col("y1") + lit(8L) * col("y2") +
            lit(4L) * col("y3") + lit(2L) * col("y4") + col("y5")).cast("double") /
            lit(6400.0)).as("ewma"))
        .orderBy(col("event_type"), col("day"))
    },
    Some(s"""
      |WITH daily AS (
      |$dailyCentsSql
      |), l AS (
      |  SELECT event_type, day, yc,
      |         lag(yc, 1, 0) OVER w AS y1, lag(yc, 2, 0) OVER w AS y2,
      |         lag(yc, 3, 0) OVER w AS y3, lag(yc, 4, 0) OVER w AS y4,
      |         lag(yc, 5, 0) OVER w AS y5
      |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
      |)
      |SELECT event_type, day,
      |       (32*yc + 16*y1 + 8*y2 + 4*y3 + 2*y4 + y5)::DOUBLE / 6400.0 AS ewma
      |FROM l ORDER BY event_type, day
      """.stripMargin.trim))

  /** The nation trade graph, memoized per (fixture, JVM) as TWO small
    * parquet tables built from ONE pass over the
    * orders⋈customer⋈lineitem⋈supplier fact join:
    *   - `weighted`  (src, dst, w): customer-nation → supplier-nation
    *     with lineitem-count weights — consumed by PageRank and HITS;
    *   - `selective` (src, dst): the DISTINCT urgent-high-quantity
    *     subgraph (o_orderpriority = '1-URGENT' AND l_quantity > 45) —
    *     consumed by BFS, closeness, eccentricity and betweenness.
    * Before the memo each of the SIX nation-graph queries re-paid the
    * identical fact join (the round-14 verdict measured the graph
    * family at 71.7 s with the repeated build as the dominant cost;
    * graph_hits_nations alone was 14.4 s of mostly this join). The
    * selective table is derived in the same aggregation via a
    * conditional count, so the combined build costs ONE unfiltered
    * fact pass — the same work the weighted build alone cost. Both
    * relations are deterministic rollups of deterministic scans, so
    * the memo is invisible to the hash gate and the oracles are
    * untouched. ≤ |nations|² = 625 rows each; consumers broadcast or
    * cache freely.
    */
  private[graft] def tradeGraphRoot(s: SparkSession, dir: String): String =
    TmpStores.memoizedTable("graft_trade_graph", dir) { root =>
      val agg = tradeGraphAgg(s, dir).cache()
      agg.select(col("src"), col("dst"), col("w")).write.parquet(s"$root/weighted")
      agg.filter(col("n_sel") > 0).select(col("src"), col("dst"))
        .write.parquet(s"$root/selective")
      agg.unpersist()
      root
    }

  /** The ONE fact-join pass behind [[tradeGraphRoot]] — factored out so
    * PlanShapeSpec asserts the build plan (dims broadcast, lineitem
    * never a broadcast build side) against the production builder.
    */
  private[graft] def tradeGraphAgg(s: SparkSession, dir: String): DataFrame = {
    val sel = col("o_orderpriority") === "1-URGENT" && col("l_quantity") > 45
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"),
        sum(when(sel, lit(1L)).otherwise(lit(0L))).as("n_sel"))
  }

  /** (src, dst, w) — the full weighted trade graph (see [[tradeGraphRoot]]). */
  private[graft] def nationTradeWeighted(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"${tradeGraphRoot(s, dir)}/weighted")

  /** (src, dst) DISTINCT — the urgent-high-quantity trade subgraph
    * (see [[tradeGraphRoot]]).
    */
  private[graft] def nationTradeSelective(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"${tradeGraphRoot(s, dir)}/selective")

  /** (src, dst) with src < dst — the UNDIRECTED deduplicated trade
    * graph, derived from the weighted store (distinct unordered pairs
    * of the directed fact pairs ≡ distinct unordered pairs of the fact
    * rows, so the derivation is exact). Consumed by the triangle census
    * and clustering coefficient; ≤ |nations|²/2 rows, so the distinct
    * is trivial and no cache is needed (the round-14 ADVICE leak —
    * cached edges never unpersisted — disappears with the cache).
    */
  private[graft] def nationTradeUndirected(s: SparkSession, dir: String): DataFrame =
    nationTradeWeighted(s, dir)
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .select(col("a").as("src"), col("b").as("dst"))

  /** One oracle iteration of the integer power step — must mirror
    * PageRank.weighted's two-step truncation EXACTLY (a one-step
    * `(r*85*w)//(100*totw)` truncates differently).
    */
  private def prIter(next: Int, prev: Int, teleport: Long): String = s""",
    |r$next AS (
    |  SELECT v.id,
    |         $teleport + COALESCE(SUM((((r$prev.r * 85) // 100) * e.w) // deg.totw), 0) AS r
    |  FROM v
    |  LEFT JOIN edges e ON e.dst = v.id
    |  LEFT JOIN r$prev ON r$prev.id = e.src
    |  LEFT JOIN deg ON deg.src = e.src
    |  GROUP BY v.id
    |)""".stripMargin

  private val pagerank = QueryDef(
    "graph_pagerank_nations",
    "Weighted PageRank over the customer-nation → supplier-nation trade " +
      "graph (edge weight = lineitem count), 3 power iterations, " +
      "damping 0.85 — the iterative-graph operator next to connected " +
      "components. Deterministic integer micro-unit arithmetic end to " +
      "end (see PageRank scaladoc): bit-identical under any " +
      "partitioning, so the iterative algorithm itself sits under the " +
      "hash gate. Edges come from the memoized per-(fixture, JVM) " +
      "trade-graph store (ONE fact join shared by all six nation-graph " +
      "queries); one groupBy(dst) shuffle per iteration.",
    (s, dir) => {
      val nation = Tables.nation(s, dir)
      val edges = nationTradeWeighted(s, dir)
      val ranks = PageRank.weighted(
        nation.select(col("n_nationkey").as("id")), edges, iterations = 3)
      ranks.join(broadcast(nation), col("id") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("rank_micro"))
        .orderBy(col("rank_micro").desc, col("nation"))
    },
    Some("""
      |WITH edges AS (
      |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  GROUP BY 1, 2
      |), deg AS (
      |  SELECT src, SUM(w) AS totw FROM edges GROUP BY 1
      |), v AS (SELECT n_nationkey AS id FROM nation),
      |r0 AS (SELECT id, CAST(40000000000 AS BIGINT) AS r FROM v)
      """.stripMargin.trim +
      prIter(1, 0, 6000000000L) + prIter(2, 1, 6000000000L) + prIter(3, 2, 6000000000L) + """
      |SELECT n.n_name AS nation, r3.r::BIGINT AS rank_micro
      |FROM r3 JOIN nation n ON n.n_nationkey = r3.id
      |ORDER BY rank_micro DESC, nation
      """.stripMargin))

  private val centroidMatrix = QueryDef(
    "vec_centroid_sim_matrix",
    "Pairwise cosine distance between per-label centroids — the " +
      "embedding-space geometry report (which clusters are close = " +
      "which labels will confuse an ANN probe). Centroids via the exact " +
      "posexplode/decimal-mean formulation (≡ vec_centroids_by_label, " +
      "unrounded, so both engines hold bit-identical means), then an " +
      "upper-triangle self-join over |labels| rows — driver-free, " +
      "broadcast-sized by construction.",
    (s, dir) => {
      import graft.functions.VectorFunctions.cosineDistance
      val cents = Tables.embeddings(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos"))
        .agg((sum(col("v").cast(DecimalType(38, 12))).cast("double") /
          count(lit(1))).as("m"))
        .groupBy(col("label"))
        .agg(transform(sort_array(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("vv"))
      val a = cents.select(col("label").as("label_a"), col("vv").as("va"))
      val b = cents.select(col("label").as("label_b"), col("vv").as("vb"))
      a.join(b, col("label_a") < col("label_b"))
        .select(col("label_a"), col("label_b"),
          round(cosineDistance(col("va"), col("vb")), 6).as("cos_dist"))
        .orderBy(col("label_a"), col("label_b"))
    },
    Some("""
      |WITH ex AS (
      |  SELECT label, generate_subscripts(embedding, 1) - 1 AS pos, unnest(embedding) AS v
      |  FROM embeddings
      |), m AS (
      |  SELECT label, pos,
      |         CAST(SUM(CAST(v AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS m
      |  FROM ex GROUP BY label, pos
      |), c AS (
      |  SELECT label, list(m ORDER BY pos) AS v FROM m GROUP BY label
      |)
      |SELECT a.label AS label_a, b.label AS label_b,
      |       round(1.0 - list_dot_product(a.v, b.v) /
      |             (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_dist
      |FROM c a JOIN c b ON a.label < b.label
      |ORDER BY label_a, label_b
      """.stripMargin.trim))

  private val centroidDrift = QueryDef(
    "vec_centroid_drift",
    "Embedding-distribution drift monitor: per-label cosine distance " +
      "between the centroid of the REFERENCE half of the corpus and " +
      "the CURRENT half (deterministic vec_id-parity split standing in " +
      "for yesterday's-snapshot vs today's) — the check a serving " +
      "pipeline runs before trusting an ANN index built on last week's " +
      "geometry: a label whose centroid moved is a label whose IVF " +
      "cells / NSW neighborhoods are stale. Same exact posexplode/" +
      "decimal-mean centroid formulation as vec_centroid_sim_matrix " +
      "(bit-identical means on both engines), one |labels|-row join, " +
      "round-6 cosine; n per half reported so a thin label can't hide " +
      "behind a noisy centroid.",
    (s, dir) => {
      import graft.functions.VectorFunctions.cosineDistance
      def half(par: Int) = Tables.embeddings(s, dir)
        .filter(pmod(col("vec_id"), lit(2)) === par)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos"))
        .agg(count(lit(1)).as("n"),
          (sum(col("v").cast(DecimalType(38, 12))).cast("double") /
            count(lit(1))).as("m"))
        .groupBy(col("label"))
        .agg(first(col("n")).as("n"),
          transform(sort_array(collect_list(struct(col("pos"), col("m")))),
            x => x.getField("m")).as("vv"))
      val ref = half(0).select(col("label"), col("n").as("n_ref"), col("vv").as("vr"))
      val cur = half(1).select(col("label"), col("n").as("n_cur"), col("vv").as("vc"))
      ref.join(cur, Seq("label"))
        .select(col("label"), col("n_ref"), col("n_cur"),
          round(cosineDistance(col("vr"), col("vc")), 6).as("drift"))
        .orderBy(col("drift").desc, col("label"))
    },
    Some("""
      |WITH ex AS (
      |  SELECT vec_id % 2 AS half, label,
      |         generate_subscripts(embedding, 1) - 1 AS pos, unnest(embedding) AS v
      |  FROM embeddings
      |), m AS (
      |  SELECT half, label, pos, count(*) AS n,
      |         CAST(SUM(CAST(v AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS m
      |  FROM ex GROUP BY 1, 2, 3
      |), c AS (
      |  SELECT half, label, any_value(n)::BIGINT AS n, list(m ORDER BY pos) AS v
      |  FROM m GROUP BY 1, 2
      |)
      |SELECT r.label, r.n AS n_ref, cu.n AS n_cur,
      |       round(1.0 - list_dot_product(r.v, cu.v) /
      |             (sqrt(list_dot_product(r.v, r.v)) *
      |              sqrt(list_dot_product(cu.v, cu.v))), 6) AS drift
      |FROM c r JOIN c cu ON r.label = cu.label AND r.half = 0 AND cu.half = 1
      |ORDER BY drift DESC, r.label
      """.stripMargin.trim))

  private val tukeyHsd = QueryDef(
    "stat_tukey_hsd",
    "Tukey HSD post-hoc q statistics for every priority pair — the " +
      "step AFTER stat_anova_f rejects 'all means equal': WHICH of " +
      "the C(5,2)=10 pairs differ. Reuses the ANOVA machinery " +
      "verbatim: exact BIGINT per-group (n, Σx, Σx²) on the same " +
      "decimated values, the exact (Σx)²·100 div n cross-group term " +
      "for MSW, unequal-n studentized range " +
      "q = |m_a − m_b| / sqrt(MSW/2 · (1/n_a + 1/n_b)) " +
      "(Tukey–Kramer) in one fixed double shape from exact-integer " +
      "inputs. One scan-side aggregation shuffle; the pair join runs " +
      "on the k-row group relation.",
    (s, dir) => {
      val x = Tables.orders(s, dir)
        .select(col("o_orderpriority").as("grp"),
          expr("floor(o_totalprice) div 100").as("x"))
      val g = x.groupBy(col("grp")).agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sx2"))
      val tot = g.agg(
        count(lit(1)).as("k"), sum(col("n")).as("n_total"),
        sum(col("sx2")).as("t2_all"),
        (sum(expr("CAST((CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0)) * 100) " +
          "div CAST(n AS DECIMAL(38,0)) AS BIGINT)")).cast("double") / lit(100.0))
          .as("a_groups"))
        .select(((col("t2_all").cast("double") - col("a_groups")) /
          (col("n_total").cast("double") - col("k").cast("double"))).as("msw"))
      val a = g.select(col("grp").as("grp_a"), col("n").as("n_a"), col("sx").as("sx_a"))
      val b = g.select(col("grp").as("grp_b"), col("n").as("n_b"), col("sx").as("sx_b"))
      a.join(b, col("grp_a") < col("grp_b"))
        .crossJoin(broadcast(tot))
        .select(col("grp_a"), col("grp_b"), col("n_a"), col("n_b"),
          round(col("sx_a").cast("double") / col("n_a").cast("double") -
            col("sx_b").cast("double") / col("n_b").cast("double"), 6).as("mean_diff"),
          round(abs(col("sx_a").cast("double") / col("n_a").cast("double") -
            col("sx_b").cast("double") / col("n_b").cast("double")) /
            sqrt(col("msw") / lit(2.0) *
              (lit(1.0) / col("n_a").cast("double") +
                lit(1.0) / col("n_b").cast("double"))), 6).as("q_stat"))
        .orderBy(col("grp_a"), col("grp_b"))
    },
    Some("""
      |WITH x AS (
      |  SELECT o_orderpriority AS grp,
      |         CAST(FLOOR(o_totalprice) AS BIGINT) // 100 AS x
      |  FROM orders
      |), g AS (
      |  SELECT grp, count(*) AS n, SUM(x)::BIGINT AS sx,
      |         SUM(x * x)::BIGINT AS sx2
      |  FROM x GROUP BY 1
      |), tot AS (
      |  SELECT ((SUM(sx2)::DOUBLE) -
      |          (CAST(SUM((sx::HUGEINT * sx::HUGEINT * 100) // n::HUGEINT)::BIGINT
      |                AS DOUBLE) / 100.0)) /
      |         (SUM(n)::DOUBLE - count(*)::DOUBLE) AS msw
      |  FROM g
      |)
      |SELECT a.grp AS grp_a, b.grp AS grp_b, a.n AS n_a, b.n AS n_b,
      |       round(a.sx::DOUBLE / a.n::DOUBLE - b.sx::DOUBLE / b.n::DOUBLE, 6)
      |         AS mean_diff,
      |       round(abs(a.sx::DOUBLE / a.n::DOUBLE - b.sx::DOUBLE / b.n::DOUBLE) /
      |             sqrt(msw / 2.0 * (1.0 / a.n::DOUBLE + 1.0 / b.n::DOUBLE)), 6)
      |         AS q_stat
      |FROM g a JOIN g b ON a.grp < b.grp CROSS JOIN tot
      |ORDER BY grp_a, grp_b
      """.stripMargin.trim))

  private val cramersV = QueryDef(
    "stat_cramers_v",
    "Cramér's V effect size for the event-type × weekday contingency — " +
      "the magnitude companion stat_chi2_independence's test statistic " +
      "lacks (χ² grows with N, so at 100 TB EVERYTHING is " +
      "'significant'; V ∈ [0,1] is what a pipeline thresholds on). " +
      "Same exact-count contingency machinery and order-fixed cell " +
      "fold; V = sqrt(χ²/(N·min(r−1, c−1))) computed from the " +
      "round-6 PRESENTED χ² (parity by construction) in one fixed " +
      "shape, round 6.",
    (s, dir) => {
      val obs = Tables.events(s, dir)
        .select(col("event_type").as("t"), date_format(col("ts"), "EEEE").as("d"))
        .groupBy(col("t"), col("d")).agg(count(lit(1)).as("o"))
      val rt = obs.groupBy(col("t")).agg(sum(col("o")).as("rt"))
      val ct = obs.groupBy(col("d")).agg(sum(col("o")).as("ct"))
      val nn = obs.agg(sum(col("o")).as("nn"),
        countDistinct(col("t")).as("ntypes"), countDistinct(col("d")).as("ndays"))
      val num = (col("o") * col("nn") - col("rt") * col("ct")).cast("double")
      val cells = obs.join(broadcast(rt), Seq("t")).join(broadcast(ct), Seq("d"))
        .crossJoin(broadcast(nn))
        .withColumn("v", (num * num) /
          (col("nn").cast("double") * col("rt").cast("double") * col("ct").cast("double")))
      cells
        .agg(collect_list(struct(col("t"), col("d"), col("v"))).as("arr"),
          first(col("nn")).as("n_events"),
          least(first(col("ntypes")) - 1, first(col("ndays")) - 1).as("min_dim"))
        .select(col("n_events"), col("min_dim"),
          round(aggregate(sort_array(col("arr")), lit(0.0),
            (acc, x) => acc + x.getField("v")), 6).as("chi2"))
        .select(col("n_events"), col("min_dim"), col("chi2"),
          round(sqrt(col("chi2") /
            (col("n_events").cast("double") * col("min_dim").cast("double"))), 6)
            .as("cramers_v"))
    },
    Some("""
      |WITH obs AS (
      |  SELECT event_type AS t, dayname(ts::TIMESTAMP) AS d, count(*) AS o
      |  FROM events GROUP BY 1, 2
      |), rt AS (SELECT t, SUM(o)::BIGINT AS rt FROM obs GROUP BY 1),
      |ct AS (SELECT d, SUM(o)::BIGINT AS ct FROM obs GROUP BY 1),
      |nn AS (SELECT SUM(o)::BIGINT AS nn, count(DISTINCT t) AS ntypes,
      |              count(DISTINCT d) AS ndays FROM obs),
      |cells AS (
      |  SELECT obs.t, obs.d,
      |         (((obs.o * nn.nn - rt.rt * ct.ct)::DOUBLE) * ((obs.o * nn.nn - rt.rt * ct.ct)::DOUBLE)) /
      |         (nn.nn::DOUBLE * rt.rt::DOUBLE * ct.ct::DOUBLE) AS v
      |  FROM obs JOIN rt USING (t) JOIN ct USING (d) CROSS JOIN nn
      |), c2 AS (
      |  SELECT any_value(nn.nn)::BIGINT AS n_events,
      |         least(any_value(nn.ntypes) - 1, any_value(nn.ndays) - 1)::BIGINT AS min_dim,
      |         round(list_reduce(list(v ORDER BY t, d), (a, b) -> a + b), 6) AS chi2
      |  FROM cells CROSS JOIN nn
      |)
      |SELECT n_events, min_dim, chi2,
      |       round(sqrt(chi2 / (n_events::DOUBLE * min_dim::DOUBLE)), 6) AS cramers_v
      |FROM c2
      """.stripMargin.trim))

  private val ljungBox = QueryDef(
    "stat_ljung_box",
    "Ljung–Box portmanteau test per event type — IS the daily value " +
      "series white noise across lags 1–3 jointly? The formal " +
      "follow-up to stat_acf_daily's per-lag readout (and the residual " +
      "diagnostic run after ev_holt_winters-class fits): " +
      "Q = n(n+2) Σ ρ_k²/(n−k), over the SAME lag-k autocorrelations " +
      "as the acf gate (exact BIGINT sufficient statistics on the " +
      "data-adaptively decimated series, Pearson closed form, round " +
      "6). Each ρ_k²/(n−k) term rounds at 6 into a DECIMAL(38,6) sum; " +
      "n is the calendar-bounded day count, so Q's magnitude is " +
      "O(n·m) — safely inside every rounding grid at any SF. Output " +
      "O(|types|) rows.",
    (s, dir) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val daily = dailyCents(s, dir)
      val mx = daily.agg(max(col("yc")).as("mx"))
      val d = daily.crossJoin(broadcast(mx))
        .withColumn("y", expr(s"yc div ($acfScaleSql)"))
        .withColumn("y1", lag(col("y"), 1).over(w))
        .withColumn("y2", lag(col("y"), 2).over(w))
        .withColumn("y3", lag(col("y"), 3).over(w))
      val pairs = d
        .select(col("event_type"), col("y"),
          expr("stack(3, 1, y1, 2, y2, 3, y3) as (lag_k, x)"))
        .filter(col("x").isNotNull)
      val st = pairs.groupBy(col("event_type"), col("lag_k")).agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("x")).cast("double").as("sx"), sum(col("y")).cast("double").as("sy"),
        sum(col("x") * col("x")).cast("double").as("sxx"),
        sum(col("y") * col("y")).cast("double").as("syy"),
        sum(col("x") * col("y")).cast("double").as("sxy"))
      val rho = st
        .filter((col("n") * col("sxx") - col("sx") * col("sx")) > 0 &&
          (col("n") * col("syy") - col("sy") * col("sy")) > 0)
        .select(col("event_type"), col("lag_k"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("rho"))
      val nd = daily.groupBy(col("event_type")).agg(count(lit(1)).as("n_days"))
      rho.join(nd, Seq("event_type"))
        .select(col("event_type"), col("n_days"),
          round(col("rho") * col("rho") /
            (col("n_days") - col("lag_k")).cast("double"), 6).cast(dec6).as("term"))
        .groupBy(col("event_type"), col("n_days"))
        .agg(count(lit(1)).as("n_lags"), sum(col("term")).as("s"))
        .select(col("event_type"), col("n_days"), col("n_lags"),
          round(col("n_days").cast("double") *
            (col("n_days").cast("double") + lit(2.0)) *
            col("s").cast("double"), 6).as("q_stat"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      |WITH daily AS (
      |$dailyCentsSql
      |), m AS (SELECT max(yc) AS mx FROM daily),
      |d AS (
      |  SELECT event_type, day, yc // ($acfScaleSql) AS y FROM daily CROSS JOIN m
      |), l AS (
      |  SELECT event_type, y,
      |         lag(y, 1) OVER w AS y1, lag(y, 2) OVER w AS y2, lag(y, 3) OVER w AS y3
      |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)
      |), p AS (
      |  SELECT event_type, 1 AS lag_k, y1 AS x, y FROM l WHERE y1 IS NOT NULL
      |  UNION ALL
      |  SELECT event_type, 2 AS lag_k, y2 AS x, y FROM l WHERE y2 IS NOT NULL
      |  UNION ALL
      |  SELECT event_type, 3 AS lag_k, y3 AS x, y FROM l WHERE y3 IS NOT NULL
      |), st AS (
      |  SELECT event_type, lag_k,
      |         count(*)::DOUBLE AS n,
      |         SUM(x)::DOUBLE AS sx, SUM(y)::DOUBLE AS sy,
      |         SUM(x * x)::DOUBLE AS sxx, SUM(y * y)::DOUBLE AS syy,
      |         SUM(x * y)::DOUBLE AS sxy
      |  FROM p GROUP BY 1, 2
      |), rho AS (
      |  SELECT event_type, lag_k,
      |         round((n * sxy - sx * sy) /
      |               sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS rho
      |  FROM st
      |  WHERE (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
      |), nd AS (
      |  SELECT event_type, count(*) AS n_days FROM daily GROUP BY 1
      |), terms AS (
      |  SELECT rho.event_type, nd.n_days,
      |         CAST(round(rho * rho / (n_days - lag_k)::DOUBLE, 6)
      |              AS DECIMAL(38,6)) AS term
      |  FROM rho JOIN nd ON nd.event_type = rho.event_type
      |), q AS (
      |  SELECT event_type, n_days, count(*)::BIGINT AS n_lags,
      |         CAST(SUM(term) AS DECIMAL(38,6)) AS s
      |  FROM terms GROUP BY 1, 2
      |)
      |SELECT event_type, n_days, n_lags,
      |       round(n_days::DOUBLE * (n_days::DOUBLE + 2.0) * s::DOUBLE, 6) AS q_stat
      |FROM q ORDER BY event_type
      """.stripMargin.trim))

  private val normProfile = QueryDef(
    "vec_norm_profile",
    "Per-label L2-norm profile of the embedding corpus (n, mean, min, " +
      "max of round-6 vector norms) — the norm-collapse / norm-" +
      "explosion monitor beside vec_centroid_drift's direction check: " +
      "MIPS transforms, matryoshka truncation, and int8 quantization " +
      "ranges all assume a known norm distribution, and an encoder " +
      "regression shows up here first. Norms come from the codegen'd " +
      "L2Norm Catalyst expression (fixed left-to-right accumulation — " +
      "the same determinism contract as the cosine flagship), round at " +
      "6, and aggregate exactly: DECIMAL(38,6) mean, integer-exact " +
      "min/max on the rounded grid. One scan, one |labels|-row rollup.",
    (s, dir) => {
      import graft.functions.VectorFunctions.l2Norm
      Tables.embeddings(s, dir)
        .select(col("label"),
          round(l2Norm(col("embedding")), 6).as("nrm"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          round(sum(col("nrm").cast(dec6)).cast("double") /
            count(lit(1)).cast("double"), 6).as("mean_norm"),
          min(col("nrm")).as("min_norm"), max(col("nrm")).as("max_norm"))
        .orderBy(col("label"))
    },
    Some("""
      |WITH n AS (
      |  SELECT label,
      |         round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS nrm
      |  FROM embeddings
      |)
      |SELECT label, count(*) AS n_vecs,
      |       round(CAST(SUM(CAST(nrm AS DECIMAL(38,6))) AS DOUBLE) /
      |             count(*)::DOUBLE, 6) AS mean_norm,
      |       min(nrm) AS min_norm, max(nrm) AS max_norm
      |FROM n GROUP BY label ORDER BY label
      """.stripMargin.trim))

  private val abWelch = QueryDef(
    "stat_ab_welch",
    "A/B experiment readout — Welch's z for the difference in mean " +
      "event value between two deterministic assignment buckets " +
      "(user_id % 2; hash-stable assignment is itself the point: " +
      "re-running the experiment query must re-derive the same split). " +
      "n/Σv/Σv² per arm from exact decimal sums in ONE aggregate pass; " +
      "mean, Welch variance and z evaluated in double with a fixed " +
      "shape. The p-value needs erf (libm, whose cross-engine rounding " +
      "is unspecified) — the z statistic is the deterministic part.",
    (s, dir) => {
      val g = Tables.events(s, dir)
        .select((col("user_id") % 2).as("grp"), col("value"))
      val st = g.groupBy(col("grp")).agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(dec6)).cast(dec2).cast("double").as("sv"),
        sum((col("value") * col("value")).cast(dec6))
          .cast(DecimalType(38, 4)).cast("double").as("sv2"))
      val m = st.select(col("grp"), col("n"),
        (col("sv") / col("n")).as("mean"),
        ((col("sv2") - col("sv") * col("sv") / col("n")) / (col("n") - 1)).as("vr"))
      val a = m.filter(col("grp") === 0)
        .select(col("n").as("n_a"), col("mean").as("mean_raw_a"), col("vr").as("var_a"))
      val b = m.filter(col("grp") === 1)
        .select(col("n").as("n_b"), col("mean").as("mean_raw_b"), col("vr").as("var_b"))
      a.crossJoin(b).select(
        col("n_a"), col("n_b"),
        round(col("mean_raw_a"), 6).as("mean_a"),
        round(col("mean_raw_b"), 6).as("mean_b"),
        round((col("mean_raw_b") - col("mean_raw_a")) /
          sqrt(col("var_a") / col("n_a") + col("var_b") / col("n_b")), 6).as("z_score"))
    },
    Some("""
      |WITH g AS (
      |  SELECT user_id % 2 AS grp, value FROM events
      |), s AS (
      |  SELECT grp, count(*) AS n,
      |         CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DECIMAL(38,2)) AS DOUBLE) AS sv,
      |         CAST(CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DECIMAL(38,4)) AS DOUBLE) AS sv2
      |  FROM g GROUP BY 1
      |), m AS (
      |  SELECT grp, n, sv / n AS mean,
      |         (sv2 - sv * sv / n) / (n - 1) AS vr
      |  FROM s
      |)
      |SELECT a.n AS n_a, b.n AS n_b,
      |       round(a.mean, 6) AS mean_a, round(b.mean, 6) AS mean_b,
      |       round((b.mean - a.mean) / sqrt(a.vr / a.n + b.vr / b.n), 6) AS z_score
      |FROM m a JOIN m b ON a.grp = 0 AND b.grp = 1
      """.stripMargin.trim))

  private val powerMde = QueryDef(
    "stat_power_mde",
    "Experiment power analysis — the minimal detectable effect the " +
      "stat_ab_welch readout can actually resolve: MDE = " +
      "(z_{α/2} + z_β)·SE with the 5%-α / 80%-power convention " +
      "(1.959964 + 0.841621 — the textbook constants embedded as " +
      "IDENTICAL double literals in both engines, the ml_ranking_ndcg " +
      "discount trick — no inverse-normal in either plan), " +
      "SE = √(s_a²/n_a + s_b²/n_b) from the SAME exact decimal arm " +
      "sufficient statistics as the z gate. Reading z without MDE is " +
      "how teams ship underpowered experiments: this is the number " +
      "that says what the split CAN detect. One aggregate pass; " +
      "relative MDE divides by the control mean.",
    (s, dir) => {
      val g = Tables.events(s, dir)
        .select((col("user_id") % 2).as("grp"), col("value"))
      val st = g.groupBy(col("grp")).agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(dec6)).cast(dec2).cast("double").as("sv"),
        sum((col("value") * col("value")).cast(dec6))
          .cast(DecimalType(38, 4)).cast("double").as("sv2"))
      val m = st.select(col("grp"), col("n"),
        (col("sv") / col("n")).as("mean"),
        ((col("sv2") - col("sv") * col("sv") / col("n")) / (col("n") - 1)).as("vr"))
      val a = m.filter(col("grp") === 0)
        .select(col("n").as("n_a"), col("mean").as("mean_raw_a"), col("vr").as("var_a"))
      val b = m.filter(col("grp") === 1)
        .select(col("n").as("n_b"), col("vr").as("var_b"))
      val se = sqrt(col("var_a") / col("n_a") + col("var_b") / col("n_b"))
      a.crossJoin(b).select(
        col("n_a"), col("n_b"),
        round(se, 6).as("se"),
        round(lit(1.959964) + lit(0.841621), 6).as("z_sum"),
        round((lit(1.959964) + lit(0.841621)) * se, 6).as("mde"),
        round((lit(1.959964) + lit(0.841621)) * se / col("mean_raw_a"), 6)
          .as("mde_rel_control"))
    },
    Some("""
      |WITH g AS (
      |  SELECT user_id % 2 AS grp, value FROM events
      |), s AS (
      |  SELECT grp, count(*) AS n,
      |         CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DECIMAL(38,2)) AS DOUBLE) AS sv,
      |         CAST(CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DECIMAL(38,4)) AS DOUBLE) AS sv2
      |  FROM g GROUP BY 1
      |), m AS (
      |  SELECT grp, n, sv / n AS mean,
      |         (sv2 - sv * sv / n) / (n - 1) AS vr
      |  FROM s
      |)
      |SELECT a.n AS n_a, b.n AS n_b,
      |       round(sqrt(a.vr / a.n + b.vr / b.n), 6) AS se,
      |       CAST(round(1.959964 + 0.841621, 6) AS DOUBLE) AS z_sum,
      |       round((1.959964 + 0.841621) * sqrt(a.vr / a.n + b.vr / b.n), 6) AS mde,
      |       round((1.959964 + 0.841621) * sqrt(a.vr / a.n + b.vr / b.n) / a.mean, 6)
      |         AS mde_rel_control
      |FROM m a JOIN m b ON a.grp = 0 AND b.grp = 1
      """.stripMargin.trim))

  private val cohensD = QueryDef(
    "stat_cohens_d",
    "Cohen's d effect size for the A/B split — the STANDARDIZED " +
      "companion to stat_ab_welch's significance and stat_power_mde's " +
      "detectability (at 100 TB every difference is 'significant'; d " +
      "is the thresholdable magnitude, the stat_cramers_v argument " +
      "applied to means): d = (mean_b − mean_a)/s_pooled with the " +
      "pooled SD from the SAME exact decimal arm sufficient " +
      "statistics, s_pooled² = ((n_a−1)s_a² + (n_b−1)s_b²)/(n_a+n_b−2) " +
      "where each (n−1)s² is the raw numerator sv2 − sv²/n evaluated " +
      "in ONE fixed shape (never recomputed via s²·(n−1) — the " +
      "stat_bartlett discipline). One aggregate pass; 2 rows after.",
    (s, dir) => {
      val g = Tables.events(s, dir)
        .select((col("user_id") % 2).as("grp"), col("value"))
      val st = g.groupBy(col("grp")).agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(dec6)).cast(dec2).cast("double").as("sv"),
        sum((col("value") * col("value")).cast(dec6))
          .cast(DecimalType(38, 4)).cast("double").as("sv2"))
      val m = st.select(col("grp"), col("n"),
        (col("sv") / col("n")).as("mean"),
        (col("sv2") - col("sv") * col("sv") / col("n")).as("num"))
      val a = m.filter(col("grp") === 0)
        .select(col("n").as("n_a"), col("mean").as("mean_raw_a"), col("num").as("num_a"))
      val b = m.filter(col("grp") === 1)
        .select(col("n").as("n_b"), col("mean").as("mean_raw_b"), col("num").as("num_b"))
      val sp = sqrt((col("num_a") + col("num_b")) /
        (col("n_a") + col("n_b") - lit(2)).cast("double"))
      a.crossJoin(b).select(
        col("n_a"), col("n_b"),
        round(sp, 6).as("s_pooled"),
        round((col("mean_raw_b") - col("mean_raw_a")) / sp, 6).as("cohens_d"))
    },
    Some("""
      |WITH g AS (
      |  SELECT user_id % 2 AS grp, value FROM events
      |), s AS (
      |  SELECT grp, count(*) AS n,
      |         CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DECIMAL(38,2)) AS DOUBLE) AS sv,
      |         CAST(CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DECIMAL(38,4)) AS DOUBLE) AS sv2
      |  FROM g GROUP BY 1
      |), m AS (
      |  SELECT grp, n, sv / n AS mean, sv2 - sv * sv / n AS num
      |  FROM s
      |)
      |SELECT a.n AS n_a, b.n AS n_b,
      |       round(sqrt((a.num + b.num) / CAST(a.n + b.n - 2 AS DOUBLE)), 6) AS s_pooled,
      |       round((b.mean - a.mean) / sqrt((a.num + b.num) / CAST(a.n + b.n - 2 AS DOUBLE)), 6) AS cohens_d
      |FROM m a JOIN m b ON a.grp = 0 AND b.grp = 1
      """.stripMargin.trim))

  private val reciprocity = QueryDef(
    "graph_reciprocity",
    "Edge reciprocity of the DIRECTED weighted trade graph — do " +
      "nation pairs trade both ways? r = |{(u,v): (v,u) also an " +
      "edge}| / |edges| (self-loops excluded from both sides — they " +
      "are trivially reciprocal), the directed-graph health metric " +
      "beside graph_degree_assortativity; a left-semi self-join on " +
      "the swapped key over the memoized store (entity-domain-sized, " +
      "one shuffle), reciprocity as the exact truncated integer " +
      "r·10⁶ = (n_recip·10⁶) div n_edges.",
    (s, dir) => {
      val e = nationTradeWeighted(s, dir)
        .filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst"))
      val recip = e.join(
        e.select(col("dst").as("src"), col("src").as("dst")),
        Seq("src", "dst"), "left_semi")
      val tot = e.agg(count(lit(1)).as("n_edges"))
      recip.agg(count(lit(1)).as("n_reciprocal"))
        .crossJoin(broadcast(tot))
        .select(col("n_edges"), col("n_reciprocal"),
          expr("CAST(n_reciprocal * 1000000 div n_edges AS BIGINT)")
            .as("reciprocity_millionths"))
    },
    Some(s"""
      |WITH edges AS MATERIALIZED (
      |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  GROUP BY 1, 2
      |), e AS MATERIALIZED (
      |  SELECT src, dst FROM edges WHERE src <> dst
      |), r AS (
      |  SELECT count(*)::BIGINT AS n_reciprocal FROM e
      |  WHERE EXISTS (SELECT 1 FROM e e2 WHERE e2.src = e.dst AND e2.dst = e.src)
      |), t AS (
      |  SELECT count(*)::BIGINT AS n_edges FROM e
      |)
      |SELECT n_edges, n_reciprocal,
      |       CAST((n_reciprocal * 1000000) // n_edges AS BIGINT) AS reciprocity_millionths
      |FROM r, t
      """.stripMargin.trim))

  private val peakHour = QueryDef(
    "ev_peak_hour_profile",
    "Hour-of-day load profile per event type — the capacity-planning " +
      "readout beside dq_volume_control's day-level alarm: exact " +
      "BIGINT counts per (type, hour) bucket (hour as the UTC " +
      "date_format/strftime STRING both engines render identically — " +
      "the day-grid discipline applied to hours), each hour's share " +
      "of its type as the exact truncated integer (n·10⁶) div " +
      "n_type, and the type's PEAK hour via an argmax window on the " +
      "≤24-row per-type relation (count desc, hour asc tiebreak). " +
      "One rollup shuffle; the profile is 24·|types| rows at any SF.",
    (s, dir) => {
      val hourly = Tables.events(s, dir)
        .select(col("event_type"), date_format(col("ts"), "HH").as("hour"))
        .groupBy(col("event_type"), col("hour")).agg(count(lit(1)).as("n"))
      val byType = Window.partitionBy(col("event_type"))
      val rk = Window.partitionBy(col("event_type"))
        .orderBy(col("n").desc, col("hour"))
      hourly
        .withColumn("n_type", sum(col("n")).over(byType))
        .withColumn("share_millionths",
          expr("CAST(n * 1000000 div n_type AS BIGINT)"))
        .withColumn("peak_hour", first(col("hour")).over(
          rk.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("is_peak", (col("hour") === col("peak_hour")).cast("long"))
        .select(col("event_type"), col("hour"), col("n"),
          col("share_millionths"), col("peak_hour"), col("is_peak"))
        .orderBy(col("event_type"), col("hour"))
    },
    Some("""
      |WITH hourly AS (
      |  SELECT event_type, strftime(ts::TIMESTAMP, '%H') AS hour, count(*)::BIGINT AS n
      |  FROM events GROUP BY 1, 2
      |), t AS (
      |  SELECT event_type, hour, n,
      |         SUM(n) OVER (PARTITION BY event_type) AS n_type
      |  FROM hourly
      |), pk AS (
      |  SELECT event_type, hour AS peak_hour FROM (
      |    SELECT event_type, hour,
      |           row_number() OVER (PARTITION BY event_type
      |                              ORDER BY n DESC, hour) AS rn
      |    FROM hourly
      |  ) WHERE rn = 1
      |)
      |SELECT t.event_type, t.hour, t.n,
      |       CAST((t.n * 1000000) // t.n_type AS BIGINT) AS share_millionths,
      |       pk.peak_hour,
      |       CASE WHEN t.hour = pk.peak_hour THEN 1 ELSE 0 END::BIGINT AS is_peak
      |FROM t JOIN pk USING (event_type)
      |ORDER BY t.event_type, t.hour
      """.stripMargin.trim))

  private val MarkovIters = 3

  private val markovStationary = QueryDef(
    "ev_markov_stationary",
    s"Stationary distribution of the ev_markov_transitions chain by " +
      s"$MarkovIters integer micro-unit power iterations — where does " +
      "user attention settle if the observed dynamics run forever? " +
      "The chain is restricted to its SQUARE support (states with " +
      "outgoing transitions; next-states outside it would leak mass " +
      "asymmetrically) and row sums renormalize on that support. " +
      "π₀ splits 10⁶ exactly (div + remainder-to-lowest-ranked " +
      "states); each step is π_{t+1}(j) = Σ_i (π_t(i)·n_ij) div " +
      "rowsum_i — the PageRank truncating-division contract, exact " +
      "BIGINT/DECIMAL(38,0) on both engines, so the ITERATION is " +
      "hash-gated, not just the final readout. |types|²-bounded work " +
      "over the memoized transition-count store shared with " +
      "ev_markov_transitions (the window pass is paid once per " +
      "session, not per consumer); the oracle unrolls the iterations " +
      "as MATERIALIZED CTEs from raw events.",
    (s, dir) => {
      val c0 = markovCounts(s, dir)
      val states = c0.select(col("prev_type").as("state")).distinct()
      val cSq = c0.join(states.select(col("state").as("next_type")), Seq("next_type"))
      val rowsum = cSq.groupBy(col("prev_type")).agg(sum(col("n")).as("rs"))
      val cc = cSq.join(rowsum, Seq("prev_type")).localCheckpoint()
      val sCount = states.count()
      val ranked = states
        .withColumn("rk", row_number().over(Window.orderBy(col("state"))))
      var pi = ranked.select(col("state"),
        (lit(1000000L / sCount) +
          when(col("rk") <= (1000000L % sCount), 1L).otherwise(0L)).as("pi"))
        .localCheckpoint()
      for (_ <- 1 to MarkovIters) {
        val stepped = pi.join(cc, pi("state") === cc("prev_type"))
          .select(col("next_type").as("state"),
            expr("CAST(CAST(pi AS DECIMAL(38,0)) * n div rs AS BIGINT)").as("term"))
          .groupBy(col("state")).agg(sum(col("term")).as("pi"))
        pi = ranked.select(col("state"))
          .join(stepped, Seq("state"), "left")
          .select(col("state"), coalesce(col("pi"), lit(0L)).as("pi"))
          .localCheckpoint()
      }
      pi.select(col("state"), col("pi").as("pi_micro")).orderBy(col("state"))
    },
    Some {
      val iters = (1 to MarkovIters).map { t =>
        val p = t - 1
        s"""p$t AS MATERIALIZED (
           |  SELECT s.state, COALESCE(m.pi, 0)::BIGINT AS pi
           |  FROM states s LEFT JOIN (
           |    SELECT c.next_type AS state,
           |           SUM(CAST((p.pi::HUGEINT * c.n) // c.rs AS BIGINT))::BIGINT AS pi
           |    FROM p$p p JOIN cc c ON p.state = c.prev_type
           |    GROUP BY 1
           |  ) m ON s.state = m.state
           |)""".stripMargin
      }.mkString(",\n")
      s"""
      |WITH o AS (
      |  SELECT user_id, event_type,
      |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM events
      |), c0 AS MATERIALIZED (
      |  SELECT prev_type, event_type AS next_type, count(*)::BIGINT AS n
      |  FROM o WHERE prev_type IS NOT NULL GROUP BY 1, 2
      |), states AS MATERIALIZED (
      |  SELECT DISTINCT prev_type AS state FROM c0
      |), csq AS MATERIALIZED (
      |  SELECT c.prev_type, c.next_type, c.n FROM c0 c
      |  JOIN states s ON c.next_type = s.state
      |), cc AS MATERIALIZED (
      |  SELECT c.prev_type, c.next_type, c.n, r.rs
      |  FROM csq c JOIN (
      |    SELECT prev_type, SUM(n)::BIGINT AS rs FROM csq GROUP BY 1
      |  ) r USING (prev_type)
      |), nst AS MATERIALIZED (SELECT count(*)::BIGINT AS s FROM states),
      |p0 AS MATERIALIZED (
      |  SELECT state,
      |         (1000000 // s) + CASE WHEN row_number() OVER (ORDER BY state) <= 1000000 % s
      |                               THEN 1 ELSE 0 END AS pi
      |  FROM states CROSS JOIN nst
      |),
      |$iters
      |SELECT state, pi AS pi_micro FROM p$MarkovIters ORDER BY state
      """.stripMargin.trim
    })

  private val RichClubKs = Seq(2, 4, 8, 16)

  /** Support for the rich-club edge store — numerically identical to
    * KcoreSupport, but that val is declared further down the file and
    * object init order would hand the EAGERLY-built oracle string a 0
    * (caught by the gate: the oracle emitted `n_co >= 0` while the
    * lazily-run Spark side read the initialized 2).
    */
  private val RichClubSupport = 2

  private val richClub = QueryDef(
    "graph_rich_club",
    "Rich-club coefficient of the support-2 co-purchase graph (Zhou & " +
      "Mondragón 2004): φ(k) = 2E_k/(N_k(N_k−1)) over the subgraph of " +
      "nodes with degree > k, for k ∈ {2,4,8,16} — do the " +
      "best-connected products preferentially co-purchase with each " +
      "OTHER (the hub-interconnection question beside " +
      "graph_degree_assortativity's global correlation)? Degrees from " +
      "one rollup over the memoized edge store; edges join the degree " +
      "relation on each endpoint key (node-sized, never broadcast); " +
      "all four k-levels reduce in ONE conditional aggregate each " +
      "side. φ is the exact truncated integer (2E_k·10⁶) div " +
      "(N_k(N_k−1)) — NULL below two qualifying nodes.",
    (s, dir) => {
      val edges = coPurchaseEdges(s, dir, RichClubSupport)
        .select(col("src"), col("dst"))
      val deg = edges.select(col("src").as("v"))
        .union(edges.select(col("dst").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      val ej = edges
        .join(deg.select(col("v").as("src"), col("deg").as("dsrc")), Seq("src"))
        .join(deg.select(col("v").as("dst"), col("deg").as("ddst")), Seq("dst"))
      val eCols = RichClubKs.map(k => sum(when(col("dsrc") > k && col("ddst") > k, 1L)
        .otherwise(0L)).as(s"e$k"))
      val eAgg = ej.agg(eCols.head, eCols.tail: _*)
      val nCols = RichClubKs.map(k => sum(when(col("deg") > k, 1L).otherwise(0L))
        .as(s"n$k"))
      val nAgg = deg.agg(nCols.head, nCols.tail: _*)
      val stackExpr = RichClubKs.map(k => s"${k}L, n$k, e$k").mkString(", ")
      eAgg.crossJoin(nAgg)
        .select(expr(s"stack(${RichClubKs.length}, $stackExpr) as (k, n_nodes, n_edges)"))
        .select(col("k"), col("n_nodes"), col("n_edges"),
          when(col("n_nodes") >= 2,
            expr("CAST(CAST(2 AS DECIMAL(38,0)) * n_edges * 1000000 div " +
              "CAST(n_nodes * (n_nodes - 1) AS DECIMAL(38,0)) AS BIGINT)"))
            .as("phi_millionths"))
        .orderBy(col("k"))
    },
    Some {
      val eCols = RichClubKs.map(k =>
        s"SUM(CASE WHEN dsrc > $k AND ddst > $k THEN 1 ELSE 0 END)::BIGINT AS e$k")
        .mkString(", ")
      val nCols = RichClubKs.map(k =>
        s"SUM(CASE WHEN deg > $k THEN 1 ELSE 0 END)::BIGINT AS n$k").mkString(", ")
      val legs = RichClubKs.map(k =>
        s"SELECT $k::BIGINT AS k, n$k AS n_nodes, e$k AS n_edges FROM ea, na")
        .mkString("\n  UNION ALL\n  ")
      s"""
      |WITH ${coPurchaseSql(RichClubSupport)}, deg AS MATERIALIZED (
      |  SELECT v, count(*)::BIGINT AS deg FROM (
      |    SELECT src AS v FROM e0 UNION ALL SELECT dst AS v FROM e0
      |  ) GROUP BY 1
      |), ej AS MATERIALIZED (
      |  SELECT ds.deg AS dsrc, dd.deg AS ddst
      |  FROM e0 JOIN deg ds ON e0.src = ds.v JOIN deg dd ON e0.dst = dd.v
      |), ea AS (SELECT $eCols FROM ej),
      |na AS (SELECT $nCols FROM deg),
      |st AS (
      |  $legs
      |)
      |SELECT k, n_nodes, n_edges,
      |       CASE WHEN n_nodes >= 2
      |            THEN CAST((2::HUGEINT * n_edges * 1000000) //
      |                      (n_nodes::HUGEINT * (n_nodes - 1)) AS BIGINT)
      |            ELSE NULL END AS phi_millionths
      |FROM st ORDER BY k
      """.stripMargin.trim
    })

  private val benford = QueryDef(
    "dq_benford_prices",
    "Benford first-digit profile of l_extendedprice — the fraud/" +
      "synthetic-data smell test from the data-quality toolbox (TPC-H " +
      "prices are uniform-ish, NOT Benford — the profile exposing that " +
      "is exactly the point of the probe). First digit via exact " +
      "integer/string ops on the floored price; counts exact; one " +
      "share division per digit. Single aggregate pass + a 9-row " +
      "window.",
    (s, dir) => {
      val d = Tables.lineitem(s, dir).select(
        substring(floor(col("l_extendedprice")).cast("long").cast("string"), 1, 1)
          .cast("long").as("digit"))
      d.groupBy(col("digit")).agg(count(lit(1)).as("n"))
        .withColumn("p_observed", round(col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy()).cast("double"), 6))
        .orderBy(col("digit"))
    },
    Some("""
      |WITH d AS (
      |  SELECT CAST(substring(CAST(CAST(FLOOR(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
      |  FROM lineitem
      |), c AS (
      |  SELECT digit, count(*) AS n FROM d GROUP BY 1
      |)
      |SELECT digit, n,
      |       round(n::DOUBLE / (SUM(n) OVER ())::DOUBLE, 6) AS p_observed
      |FROM c ORDER BY digit
      """.stripMargin.trim))

  private val ksTest = QueryDef(
    "stat_ks_two_sample",
    "Two-sample Kolmogorov–Smirnov statistic (click vs purchase value " +
      "distributions) computed EXACTLY: D = max |F₁−F₂| is the integer " +
      "argmax of |c₁·n₂ − c₂·n₁| over the pooled cents-value grid — " +
      "ECDF steps as cumulative integer window sums, no float until " +
      "the single final division. The unpartitioned cumulative window " +
      "runs over the DISTINCT VALUE GRID (≤ 56k cents values by the " +
      "fixture's value range), not the row count — value-domain-" +
      "bounded, so the single-partition window is safe at any row " +
      "scale; the row-sized work is one groupBy(vc) shuffle.",
    (s, dir) => {
      val st = Tables.events(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select((col("value").cast(DecimalType(12, 2)) * 100).cast("long").as("vc"),
          when(col("event_type") === "click", 1L).otherwise(0L).as("is_a"))
      val g = st.groupBy(col("vc"))
        .agg(sum(col("is_a")).as("a_n"), sum(lit(1L) - col("is_a")).as("b_n"))
      val cum = Window.orderBy(col("vc"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy()
      g.select(col("vc"),
          sum(col("a_n")).over(cum).as("ca"), sum(col("b_n")).over(cum).as("cb"),
          sum(col("a_n")).over(tot).as("na"), sum(col("b_n")).over(tot).as("nb"))
        .select(col("vc"), col("na"), col("nb"),
          abs(col("ca") * col("nb") - col("cb") * col("na")).as("num"))
        .orderBy(col("num").desc, col("vc")).limit(1)
        .select(col("na").as("n_a"), col("nb").as("n_b"),
          round(col("num").cast("double") /
            (col("na").cast("double") * col("nb").cast("double")), 6).as("ks_d"),
          (col("vc").cast("double") / lit(100.0)).as("at_value"))
    },
    Some("""
      |WITH s AS (
      |  SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS vc,
      |         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |), g AS (
      |  SELECT vc, SUM(is_a) AS a_n, SUM(1 - is_a) AS b_n FROM s GROUP BY vc
      |), c AS (
      |  SELECT vc,
      |         SUM(a_n) OVER (ORDER BY vc ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
      |         SUM(b_n) OVER (ORDER BY vc ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
      |         SUM(a_n) OVER () AS na, SUM(b_n) OVER () AS nb
      |  FROM g
      |), d AS (
      |  SELECT vc, na, nb, abs(ca * nb - cb * na) AS num
      |  FROM c ORDER BY num DESC, vc LIMIT 1
      |)
      |SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
      |       round(num::DOUBLE / (na::DOUBLE * nb::DOUBLE), 6) AS ks_d,
      |       vc::DOUBLE / 100.0 AS at_value
      |FROM d
      """.stripMargin.trim))

  private val acf = QueryDef(
    "stat_acf_daily",
    "Autocorrelation function of the daily event-value series at lags " +
      "1–3 per event type (the seasonality/memory probe run before any " +
      "forecasting model). Day-ordered row lag over the exact-cents " +
      "daily rollup, values deterministically decimated by a " +
      "DATA-ADAPTIVE power of 10 (integer CASE on the exact global max " +
      "— no libm; keeps 4 significant digits, so tiny fixtures retain " +
      "variance and Σx², Σxy stay inside 2⁵³ at ANY scale); all three " +
      "lags come from ONE window pass (same shuffle) stacked into " +
      "(lag_k, x) pairs, then Pearson r per (type, lag) from exact " +
      "BIGINT sufficient statistics with the fixed closed-form shape " +
      "shared with stat_daily_corr. O(|types|·3) output at any scale.",
    (s, dir) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val daily = dailyCents(s, dir)
      val mx = daily.agg(max(col("yc")).as("mx"))
      val d = daily.crossJoin(broadcast(mx))
        .withColumn("y", expr(s"yc div ($acfScaleSql)"))
        .withColumn("y1", lag(col("y"), 1).over(w))
        .withColumn("y2", lag(col("y"), 2).over(w))
        .withColumn("y3", lag(col("y"), 3).over(w))
      val pairs = d
        .select(col("event_type"), col("y"),
          expr("stack(3, 1, y1, 2, y2, 3, y3) as (lag_k, x)"))
        .filter(col("x").isNotNull)
      val st = pairs.groupBy(col("event_type"), col("lag_k")).agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("x")).cast("double").as("sx"), sum(col("y")).cast("double").as("sy"),
        sum(col("x") * col("x")).cast("double").as("sxx"),
        sum(col("y") * col("y")).cast("double").as("syy"),
        sum(col("x") * col("y")).cast("double").as("sxy"))
      // degenerate groups (zero variance in either leg — possible only
      // on pathological fixtures) are excluded, not divided by zero
      st.filter((col("n") * col("sxx") - col("sx") * col("sx")) > 0 &&
          (col("n") * col("syy") - col("sy") * col("sy")) > 0)
        .select(col("event_type"), col("lag_k"), col("n").cast("long").as("n_pairs"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("acf"))
        .orderBy(col("event_type"), col("lag_k"))
    },
    Some(s"""
      |WITH daily AS (
      |$dailyCentsSql
      |), m AS (
      |  SELECT max(yc) AS mx FROM daily
      |), d AS (
      |  SELECT event_type, day, yc // ($acfScaleSql) AS y FROM daily CROSS JOIN m
      |), l AS (
      |  SELECT event_type, y,
      |         lag(y, 1) OVER w AS y1, lag(y, 2) OVER w AS y2, lag(y, 3) OVER w AS y3
      |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)
      |), p AS (
      |  SELECT event_type, 1 AS lag_k, y1 AS x, y FROM l WHERE y1 IS NOT NULL
      |  UNION ALL
      |  SELECT event_type, 2 AS lag_k, y2 AS x, y FROM l WHERE y2 IS NOT NULL
      |  UNION ALL
      |  SELECT event_type, 3 AS lag_k, y3 AS x, y FROM l WHERE y3 IS NOT NULL
      |), s AS (
      |  SELECT event_type, lag_k, count(*)::DOUBLE AS n,
      |         SUM(x)::DOUBLE AS sx, SUM(y)::DOUBLE AS sy,
      |         SUM(x*x)::DOUBLE AS sxx, SUM(y*y)::DOUBLE AS syy, SUM(x*y)::DOUBLE AS sxy
      |  FROM p GROUP BY 1, 2
      |)
      |SELECT event_type, lag_k, CAST(n AS BIGINT) AS n_pairs,
      |       round((n * sxy - sx * sy) /
      |             sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS acf
      |FROM s
      |WHERE (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
      |ORDER BY event_type, lag_k
      """.stripMargin.trim))

  /** Data-adaptive decimation scale for stat_acf_daily, as ONE SQL CASE
    * expression valid in both engines (integer comparisons on the exact
    * global max, no libm log10): the power of 10 that leaves the series
    * max with 4 significant digits, so y stays in [0, 10⁴) and Σy²
    * over the fixed ~30-day grid never approaches 2⁵³ at ANY scale
    * factor, while tiny fixtures keep nonzero variance. Generated once
    * and embedded verbatim in both the Spark expr and the oracle —
    * lockstep by construction.
    */
  private lazy val acfScaleSql: String = {
    val whens = (18 to 4 by -1).map { k =>
      s"WHEN mx >= ${math.BigInt(10).pow(k)} THEN ${math.BigInt(10).pow(k - 4)}"
    }.mkString(" ")
    s"CASE $whens ELSE 1 END"
  }

  private val periodDetect = QueryDef(
    "ev_period_detect",
    "Dominant-periodicity detection per event type — the automated " +
      "read of stat_acf_daily's curve a forecasting router needs " +
      "('is this series daily-cyclic? weekly?'): the SAME exact-cents " +
      "daily rollup, data-adaptive power-of-10 decimation, and " +
      "Pearson-from-BIGINT-sufficient-statistics channel as the ACF " +
      "gate, widened to lags 1–14 in ONE window pass (14 row lags " +
      "stacked to (lag, x) pairs — same single shuffle), then per " +
      "type the argmax lag by (round-6 acf DESC, lag ASC) through a " +
      "rank window on the |types|·14-row relation. A best lag of 7 " +
      "reads as weekly seasonality; degenerate (zero-variance) lags " +
      "are excluded before the division, exactly as in stat_acf_daily.",
    (s, dir) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val daily = dailyCents(s, dir)
      val mx = daily.agg(max(col("yc")).as("mx"))
      var d = daily.crossJoin(broadcast(mx))
        .withColumn("y", expr(s"yc div ($acfScaleSql)"))
      (1 to 14).foreach(k => d = d.withColumn(s"y$k", lag(col("y"), k).over(w)))
      val stackArgs = (1 to 14).map(k => s"$k, y$k").mkString(", ")
      val pairs = d
        .select(col("event_type"), col("y"),
          expr(s"stack(14, $stackArgs) as (lag_k, x)"))
        .filter(col("x").isNotNull)
      val st = pairs.groupBy(col("event_type"), col("lag_k")).agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("x")).cast("double").as("sx"), sum(col("y")).cast("double").as("sy"),
        sum(col("x") * col("x")).cast("double").as("sxx"),
        sum(col("y") * col("y")).cast("double").as("syy"),
        sum(col("x") * col("y")).cast("double").as("sxy"))
      val acfRel = st.filter((col("n") * col("sxx") - col("sx") * col("sx")) > 0 &&
          (col("n") * col("syy") - col("sy") * col("sy")) > 0)
        .select(col("event_type"), col("lag_k"),
          col("n").cast("long").as("n_pairs"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("acf"))
      val rk = Window.partitionBy(col("event_type"))
        .orderBy(col("acf").desc, col("lag_k"))
      acfRel.withColumn("rn", row_number().over(rk))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("lag_k").as("best_lag"),
          col("n_pairs"), col("acf").as("best_acf"))
        .orderBy(col("event_type"))
    },
    Some {
      val unions = (1 to 14).map(k =>
        s"SELECT event_type, $k AS lag_k, y$k AS x, y FROM l WHERE y$k IS NOT NULL")
        .mkString("\n  UNION ALL\n  ")
      val lags = (1 to 14).map(k => s"lag(y, $k) OVER w AS y$k").mkString(", ")
      s"""
      |WITH daily AS (
      |$dailyCentsSql
      |), m AS (
      |  SELECT max(yc) AS mx FROM daily
      |), d AS (
      |  SELECT event_type, day, yc // ($acfScaleSql) AS y FROM daily CROSS JOIN m
      |), l AS (
      |  SELECT event_type, y, $lags
      |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)
      |), p AS (
      |  $unions
      |), s AS (
      |  SELECT event_type, lag_k, count(*)::DOUBLE AS n,
      |         SUM(x)::DOUBLE AS sx, SUM(y)::DOUBLE AS sy,
      |         SUM(x*x)::DOUBLE AS sxx, SUM(y*y)::DOUBLE AS syy, SUM(x*y)::DOUBLE AS sxy
      |  FROM p GROUP BY 1, 2
      |), a AS (
      |  SELECT event_type, lag_k, CAST(n AS BIGINT) AS n_pairs,
      |         round((n * sxy - sx * sy) /
      |               sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS acf
      |  FROM s
      |  WHERE (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
      |), r AS (
      |  SELECT event_type, lag_k, n_pairs, acf,
      |         row_number() OVER (PARTITION BY event_type
      |                            ORDER BY acf DESC, lag_k) AS rn
      |  FROM a
      |)
      |SELECT event_type, lag_k AS best_lag, n_pairs, acf AS best_acf
      |FROM r WHERE rn = 1 ORDER BY event_type
      """.stripMargin.trim
    })

  private val pettitt = QueryDef(
    "stat_pettitt",
    "Pettitt changepoint test on the daily view-value series — the " +
      "nonparametric mate to ev_cusum_changepoint (CUSUM reads mean " +
      "shifts in raw units; Pettitt is the rank test whose null " +
      "distribution is distribution-free): with doubled midranks " +
      "2r over the series' value grid, U_t = Σ_{i≤t} 2r_i − t(n+1) " +
      "is an EXACT integer for every split day t (the tie-aware rank " +
      "form of Σ_{i≤t}Σ_{j>t} sign(x_j−x_i)), K = max|U_t| over " +
      "t < n, changepoint = the earliest argmax day. NO doubles " +
      "anywhere — even the significance surrogate is the exact " +
      "truncated integer 6K²·10⁶ div (n³+n²) (the exponent of the " +
      "classic p ≈ 2e^(−6K²/(n³+n²)) in millionths, monotone in p, " +
      "so thresholding it IS thresholding p without a libm exp in " +
      "either engine; DECIMAL(38,0)/HUGEINT keeps 6K²·10⁶ exact at " +
      "century-long calendars). One value-grid window + one " +
      "day-ordered cumulative window, both calendar-bounded.",
    (s, dir) => {
      val d1 = dailyCents(s, dir).filter(col("event_type") === "view")
        .select(col("day"), col("yc"))
      val grid = d1.groupBy(col("yc")).agg(count(lit(1)).as("t"))
      val below = Window.orderBy(col("yc"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val ranked = grid.select(col("yc"),
        (lit(2L) * coalesce(sum(col("t")).over(below), lit(0L)) + col("t") + 1L)
          .as("r2"))
      val wd = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val n1 = d1.agg(count(lit(1)).as("n"))
      val cum = d1.join(ranked, Seq("yc"))
        .crossJoin(broadcast(n1))
        .select(col("day"), col("n"),
          (sum(col("r2")).over(wd) -
            row_number().over(Window.orderBy(col("day"))) * (col("n") + 1L))
            .as("u"),
          row_number().over(Window.orderBy(col("day"))).as("tt"))
        .filter(col("tt") < col("n"))
      val k = cum.agg(max(abs(col("u"))).as("kk"), max(col("n")).as("n"))
      val cp = cum.crossJoin(broadcast(k.select(col("kk"))))
        .filter(abs(col("u")) === col("kk"))
        .agg(min(col("day")).as("cp_day"))
      k.crossJoin(broadcast(cp))
        .select(col("n").as("n_days"), col("cp_day"), col("kk").as("k_stat"),
          expr("CAST(6 AS DECIMAL(38,0)) * kk * kk * 1000000 div " +
            "CAST(n*n*n + n*n AS DECIMAL(38,0))").cast("long")
            .as("sig_exponent_millionths"))
    },
    Some(s"""
      |WITH daily AS (
      |$dailyCentsSql
      |), d1 AS (
      |  SELECT day, yc FROM daily WHERE event_type = 'view'
      |), grid AS (
      |  SELECT yc, count(*) AS t FROM d1 GROUP BY 1
      |), ranked AS (
      |  SELECT yc,
      |         2 * COALESCE(SUM(t) OVER (ORDER BY yc
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1 AS r2
      |  FROM grid
      |), n1 AS (
      |  SELECT count(*)::BIGINT AS n FROM d1
      |), cum AS (
      |  SELECT day, n,
      |         SUM(r2) OVER (ORDER BY day
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           - (row_number() OVER (ORDER BY day)) * (n + 1) AS u,
      |         row_number() OVER (ORDER BY day) AS tt
      |  FROM d1 JOIN ranked USING (yc) CROSS JOIN n1
      |), cut AS (
      |  SELECT * FROM cum WHERE tt < n
      |), k AS (
      |  SELECT max(abs(u))::BIGINT AS kk, max(n)::BIGINT AS n FROM cut
      |), cp AS (
      |  SELECT min(day) AS cp_day FROM cut, k WHERE abs(u) = kk
      |)
      |SELECT n AS n_days, cp_day, kk AS k_stat,
      |       CAST((6::HUGEINT * kk * kk * 1000000) // (n::HUGEINT*n*n + n*n) AS BIGINT)
      |         AS sig_exponent_millionths
      |FROM k, cp
      """.stripMargin.trim))

  /** One BFS relaxation round as oracle CTEs (mirrors Bfs.hopDistance). */
  private def bfsIter(k: Int, prev: Int): String = s"""
    |, r$k AS (
    |  SELECT e.dst AS id, min(d.d + 1) AS dr
    |  FROM edges e JOIN d$prev d ON e.src = d.id GROUP BY 1
    |), d$k AS (
    |  SELECT p.id, least(p.d, COALESCE(r.dr, 99)) AS d
    |  FROM d$prev p LEFT JOIN r$k r ON p.id = r.id
    |)""".stripMargin

  private def anfRegRound(t: Int): String = s"""
    |, h$t AS MATERIALIZED (
    |  SELECT id, bucket, max(reg) AS reg FROM (
    |    SELECT id, bucket, reg FROM h${t - 1}
    |    UNION ALL
    |    SELECT e.src::BIGINT AS id, h.bucket, h.reg
    |    FROM h${t - 1} h JOIN edges e ON h.id = e.dst
    |  ) GROUP BY 1, 2
    |)""".stripMargin

  /** Per-round estimate CTEs. The linear-counting branch reads the SAME
    * pre-tabulated literal array as `Sketches.hllEstimateCorrected`
    * (`lc` CTE below) — no libm ln in the gated channel (ADVICE r18).
    */
  private def anfEstRound(t: Int): String = s"""
    |, agg$t AS (
    |  SELECT id, sum(1::BIGINT << CAST(40 - reg AS INTEGER)) AS s_present,
    |         count(*) AS nb
    |  FROM h$t GROUP BY 1
    |), raw$t AS (
    |  SELECT id, nb,
    |         (0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 512.0::DOUBLE))
    |           * 262144.0::DOUBLE * 1099511627776.0::DOUBLE
    |           / (s_present + (512 - nb) * 1099511627776)::DOUBLE AS raw
    |  FROM agg$t
    |), est$t AS MATERIALIZED (
    |  SELECT $t::BIGINT AS t,
    |         CAST(sum(CAST(round(
    |           CASE WHEN raw <= 1280.0 AND nb < 512
    |                THEN arr[nb]
    |                ELSE raw END, 6)
    |           AS DECIMAL(38,6))) AS DOUBLE) AS nf_est
    |  FROM raw$t CROSS JOIN lc
    |)""".stripMargin

  /** The shared linear-counting literal CTE (append once per oracle). */
  private def anfLcCte: String =
    s"\n|, lc AS (SELECT ${graft.operators.Sketches.lcLookupSqlArray(9)} AS arr)"
      .stripMargin

  private def anfReachRound(t: Int): String = s"""
    |, r$t AS MATERIALIZED (
    |  SELECT DISTINCT v, u FROM (
    |    SELECT v, u FROM r${t - 1}
    |    UNION ALL
    |    SELECT p.v, e.dst::BIGINT AS u FROM r${t - 1} p JOIN edges e ON p.u = e.src
    |  )
    |), x$t AS (SELECT $t::BIGINT AS t, count(*)::BIGINT AS nf_exact FROM r$t)""".stripMargin

  private val hyperAnf = QueryDef(
    "graph_hyperanf_nf",
    "HyperANF neighborhood function + effective diameter (Boldi, Rosa " +
      "& Vigna 2011) — the distance-distribution machinery for graphs " +
      "where all-pairs reachability is unaffordable: one portable-md5 " +
      "HLL counter per node (the sketch_hll_distinct registers), " +
      "advanced per round by register max-merge over out-edges — one " +
      "edge join + one (id, bucket) groupBy(max) per round over " +
      "nodes×512 sparse rows, where the exact t-ball needs O(n²) pairs " +
      "re-distincted every round. The merge is associative/idempotent, " +
      "so a round-t counter IS the HLL of the exact t-ball " +
      "(HyperAnfSpec asserts register equality); N(t) = Σ_v estimate " +
      "(per-node estimates rounded at 6 then DECIMAL-summed — the " +
      "order-independent float-sum channel), the exact all-pairs N(t) " +
      "rides beside it as the yardstick, and reaches_90pct marks the " +
      "effective-diameter threshold t (smallest t with N(t) ≥ 0.9 of " +
      "the final round). The oracle replays every round's registers " +
      "bit-for-bit AND the exact reach sets in unrolled CTEs.",
    (s, dir) => {
      val T = 3
      val nation = Tables.nation(s, dir)
        .select(col("n_nationkey").cast("long").as("id"))
      val edges = nationTradeSelective(s, dir)
        .select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
      // per-round localCheckpoint (r21): without the barrier, round t's
      // plan embeds rounds 0..t−1 and the nfEst/nfExact unions consume
      // every prefix — the trade-store read and each round's
      // join+groupBy re-executed O(T²) times (194 KB formatted plan;
      // plans/r21/). Same fix as every other iterative loop here.
      val regRounds = (1 to T).scanLeft(
        graft.operators.HyperAnf.initRegisters(nation, "id").localCheckpoint()) { (r, _) =>
        graft.operators.HyperAnf.advance(r, edges).localCheckpoint()
      }
      val nfEst = regRounds.zipWithIndex.map { case (r, t) =>
        graft.operators.Sketches.hllEstimateCorrected(r, "id")
          .agg(sum(round(col("hll_estimate"), 6).cast("decimal(38,6)"))
            .cast("double").as("nf_est"))
          .select(lit(t.toLong).as("t"), col("nf_est"))
      }.reduce(_ unionByName _)
      val pairs0 = nation.select(col("id").as("v"), col("id").as("u"))
      // unqualified names (u/src unique across the two sides) — df("col")
      // refs trip the ambiguous-self-join check on iterated reuse of the
      // same edges plan
      val reachRounds = (1 to T).scanLeft(pairs0.localCheckpoint()) { (pr, _) =>
        pr.unionByName(pr.join(edges, col("u") === col("src"))
          .select(col("v"), col("dst").as("u"))).distinct().localCheckpoint()
      }
      val nfExact = reachRounds.zipWithIndex.map { case (r, t) =>
        r.agg(count(lit(1)).as("nf_exact"))
          .select(lit(t.toLong).as("t"), col("nf_exact"))
      }.reduce(_ unionByName _)
      val fin = nfEst.filter(col("t") === T)
        .select(col("nf_est").as("nf_final"))
      nfEst.join(nfExact, Seq("t")).crossJoin(broadcast(fin))
        .select(col("t"), round(col("nf_est"), 4).as("nf_est"),
          col("nf_exact"),
          round((col("nf_est") - col("nf_exact").cast("double")) /
            col("nf_exact").cast("double"), 6).as("rel_err"),
          when(col("nf_est") >= lit(0.9) * col("nf_final"), lit(1L))
            .otherwise(lit(0L)).as("reaches_90pct"))
        .orderBy(col("t"))
    },
    Some(("""
      |WITH edges AS (
      |  SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  WHERE o.o_orderpriority = '1-URGENT' AND l.l_quantity > 45
      |), v AS (SELECT n_nationkey::BIGINT AS id FROM nation),
      |hh AS (
      |  SELECT id, ('0x' || substring(md5(id::VARCHAR), 1, 12))::BIGINT AS h FROM v
      |), h0 AS MATERIALIZED (
      |  SELECT id, h & 511 AS bucket,
      |         CASE WHEN (h >> 9) = 0 THEN 40::BIGINT
      |              ELSE bit_count(((h >> 9) & -(h >> 9)) - 1) + 1 END AS reg
      |  FROM hh
      |), r0 AS MATERIALIZED (SELECT id AS v, id AS u FROM v),
      |x0 AS (SELECT 0::BIGINT AS t, count(*)::BIGINT AS nf_exact FROM r0)
      """.stripMargin.trim
      + anfRegRound(1) + anfRegRound(2) + anfRegRound(3) + anfLcCte
      + anfEstRound(0) + anfEstRound(1) + anfEstRound(2) + anfEstRound(3)
      + anfReachRound(1) + anfReachRound(2) + anfReachRound(3) + """
      |, est AS (SELECT * FROM est0 UNION ALL SELECT * FROM est1
      |          UNION ALL SELECT * FROM est2 UNION ALL SELECT * FROM est3)
      |, ex AS (SELECT * FROM x0 UNION ALL SELECT * FROM x1
      |         UNION ALL SELECT * FROM x2 UNION ALL SELECT * FROM x3)
      |SELECT e.t, round(e.nf_est, 4) AS nf_est, x.nf_exact,
      |       round((e.nf_est - x.nf_exact::DOUBLE) / x.nf_exact::DOUBLE, 6)
      |         AS rel_err,
      |       CASE WHEN e.nf_est >= 0.9 * (SELECT nf_est FROM est3)
      |            THEN 1::BIGINT ELSE 0::BIGINT END AS reaches_90pct
      |FROM est e JOIN ex x USING (t)
      |ORDER BY t
      """.stripMargin)))

  private val hyperAnfDocs = QueryDef(
    "graph_hyperanf_docs",
    "HyperANF at CORPUS cardinality (r18 verdict #5) — the register " +
      "machinery pointed at a document-sized graph: nodes are the " +
      "documents table, edges the Jaccard ≥ 0.3 near-dup pair graph " +
      "(both directions — the dedup_clusters edge set), so the " +
      "register relation runs at nodes×512 sparse rows over the " +
      "corpus itself, which is the operator's whole point vs exact " +
      "reachability (per-round state nodes×m, never O(n²) pairs). " +
      "Per-node counters live deep in the small-range regime (near-dup " +
      "balls are tiny against m=512), so every estimate rides the " +
      "linear-counting branch — through the pre-tabulated lc literal " +
      "lookup, the same literals the oracle reads (no libm ln in the " +
      "channel; ADVICE r18). Two max-merge rounds (near-dup clusters " +
      "are shallow), N(t) = per-node estimates rounded at 6 and " +
      "DECIMAL-summed, exact all-pairs reach beside it as the " +
      "yardstick (affordable ONLY because balls are cluster-bounded — " +
      "Σ ball sizes, not n²), reaches_90pct marking the effective-" +
      "diameter threshold. The oracle replays shingles → capped " +
      "inverted index → edge set → every round's registers " +
      "bit-for-bit → lc-lookup estimates → exact reach closures in " +
      "unrolled CTEs.",
    (s, dir) => {
      val T = 2
      val d = Tables.documentsSpread(s, dir)
      val nodes = d.select(col("doc_id").cast("long").as("id"))
      // the Jaccard-0.3 pair graph comes from the shared memoized store
      // (DedupQueries.jaccardPairs03 — the coPurchaseEdges pattern):
      // before r21 this query re-derived the shingle→inverted-index→join
      // pipeline from documents, and because BOTH round families below
      // consume `edges` at every round without a materialization
      // barrier, the pair build executed SIX times inside one query
      // (plan-audited: 424 KB formatted plan; see plans/r21/). Rounds
      // are now localCheckpointed — the standard iterative-graph
      // barrier every other loop in this file already uses — so each
      // round's state is computed exactly once (guide §1.2/§2.4).
      val edges = DedupQueries.jaccardPairs03(s, dir)
        .select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
        .unionByName(DedupQueries.jaccardPairs03(s, dir)
          .select(col("id_b").cast("long").as("src"), col("id_a").cast("long").as("dst")))
        .localCheckpoint()
      val regRounds = (1 to T).scanLeft(
        graft.operators.HyperAnf.initRegisters(nodes, "id").localCheckpoint()) { (r, _) =>
        graft.operators.HyperAnf.advance(r, edges).localCheckpoint()
      }
      val nfEst = regRounds.zipWithIndex.map { case (r, t) =>
        graft.operators.Sketches.hllEstimateCorrected(r, "id")
          .agg(sum(round(col("hll_estimate"), 6).cast("decimal(38,6)"))
            .cast("double").as("nf_est"))
          .select(lit(t.toLong).as("t"), col("nf_est"))
      }.reduce(_ unionByName _)
      val pairs0 = nodes.select(col("id").as("v"), col("id").as("u"))
      val reachRounds = (1 to T).scanLeft(pairs0.localCheckpoint()) { (pr, _) =>
        pr.unionByName(pr.join(edges, col("u") === col("src"))
          .select(col("v"), col("dst").as("u"))).distinct().localCheckpoint()
      }
      val nfExact = reachRounds.zipWithIndex.map { case (r, t) =>
        r.agg(count(lit(1)).as("nf_exact"))
          .select(lit(t.toLong).as("t"), col("nf_exact"))
      }.reduce(_ unionByName _)
      val fin = nfEst.filter(col("t") === T)
        .select(col("nf_est").as("nf_final"))
      nfEst.join(nfExact, Seq("t")).crossJoin(broadcast(fin))
        .select(col("t"), round(col("nf_est"), 4).as("nf_est"),
          col("nf_exact"),
          round((col("nf_est") - col("nf_exact").cast("double")) /
            col("nf_exact").cast("double"), 6).as("rel_err"),
          when(col("nf_est") >= lit(0.9) * col("nf_final"), lit(1L))
            .otherwise(lit(0L)).as("reaches_90pct"))
        .orderBy(col("t"))
    },
    Some((s"""
      |${DedupQueries.duckShingles}, ${DedupQueries.duckCappedIndexMaterialized}, jpairs AS (
      |  SELECT x.doc_id AS id_a, y.doc_id AS id_b, x.n_sh AS na, y.n_sh AS nb, count(*) AS common
      |  FROM ex x JOIN ex y ON x.s = y.s AND x.doc_id < y.doc_id
      |  GROUP BY 1, 2, 3, 4
      |), edges0 AS (
      |  SELECT id_a, id_b FROM jpairs
      |  WHERE round(common::DOUBLE / (na + nb - common)::DOUBLE, 6) >= 0.3
      |), edges AS MATERIALIZED (
      |  SELECT id_a::BIGINT AS src, id_b::BIGINT AS dst FROM edges0
      |  UNION SELECT id_b::BIGINT, id_a::BIGINT FROM edges0
      |), v AS MATERIALIZED (SELECT doc_id::BIGINT AS id FROM documents),
      |hh AS (
      |  SELECT id, ('0x' || substring(md5(id::VARCHAR), 1, 12))::BIGINT AS h FROM v
      |), h0 AS MATERIALIZED (
      |  SELECT id, h & 511 AS bucket,
      |         CASE WHEN (h >> 9) = 0 THEN 40::BIGINT
      |              ELSE bit_count(((h >> 9) & -(h >> 9)) - 1) + 1 END AS reg
      |  FROM hh
      |), r0 AS MATERIALIZED (SELECT id AS v, id AS u FROM v),
      |x0 AS (SELECT 0::BIGINT AS t, count(*)::BIGINT AS nf_exact FROM r0)
      """.stripMargin.trim
      + anfRegRound(1) + anfRegRound(2) + anfLcCte
      + anfEstRound(0) + anfEstRound(1) + anfEstRound(2)
      + anfReachRound(1) + anfReachRound(2) + """
      |, est AS (SELECT * FROM est0 UNION ALL SELECT * FROM est1
      |          UNION ALL SELECT * FROM est2)
      |, ex2 AS (SELECT * FROM x0 UNION ALL SELECT * FROM x1
      |          UNION ALL SELECT * FROM x2)
      |SELECT e.t, round(e.nf_est, 4) AS nf_est, x.nf_exact,
      |       round((e.nf_est - x.nf_exact::DOUBLE) / x.nf_exact::DOUBLE, 6)
      |         AS rel_err,
      |       CASE WHEN e.nf_est >= 0.9 * (SELECT nf_est FROM est2)
      |            THEN 1::BIGINT ELSE 0::BIGINT END AS reaches_90pct
      |FROM est e JOIN ex2 x USING (t)
      |ORDER BY t
      """.stripMargin)))

  private val bfs = QueryDef(
    "graph_bfs_nations",
    "Single-source BFS (hop-count shortest path, 3 relaxation rounds) " +
      "over the urgent-high-quantity trade graph: distance from nation " +
      "0 to every nation, 99 = unreached within 3 hops. Min-plus " +
      "integer relaxation is order/partitioning-independent, so the " +
      "ITERATIVE algorithm is hash-gated with rounds unrolled as oracle " +
      "CTEs (the reachability sibling of graph_pagerank_nations). One " +
      "groupBy(dst) shuffle per round over the cached deduplicated edge " +
      "relation, read from the memoized per-(fixture, JVM) trade-graph " +
      "store's selective table (ONE shared fact join instead of four).",
    (s, dir) => {
      val nation = Tables.nation(s, dir)
      val edges = nationTradeSelective(s, dir)
      val dist = graft.operators.Bfs.hopDistance(
        nation.select(col("n_nationkey").as("id")), edges, sources = Seq(0L), rounds = 3)
      dist.join(broadcast(nation), col("id") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("dist"))
        .orderBy(col("dist"), col("nation"))
    },
    Some("""
      |WITH edges AS (
      |  SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  WHERE o.o_orderpriority = '1-URGENT' AND l.l_quantity > 45
      |), v AS (SELECT n_nationkey AS id FROM nation),
      |d0 AS (SELECT id, CAST(CASE WHEN id = 0 THEN 0 ELSE 99 END AS BIGINT) AS d FROM v)
      """.stripMargin.trim +
      bfsIter(1, 0) + bfsIter(2, 1) + bfsIter(3, 2) + """
      |SELECT n.n_name AS nation, d3.d AS dist
      |FROM d3 JOIN nation n ON n.n_nationkey = d3.id
      |ORDER BY dist, nation
      """.stripMargin))

  private val chi2 = QueryDef(
    "stat_chi2_independence",
    "Chi-square test of independence: event type × day-of-week " +
      "contingency table, χ² = Σ (O·N − r·c)² / (N·r·c) over exact " +
      "BIGINT cell counts (exact while N < ~9·10⁷ events ≈ sf30; " +
      "coarser cells are the documented fallback beyond). Each cell's " +
      "double value has one fixed shape; the 35-cell SUM is made " +
      "order-deterministic by folding a (type, day)-SORTED array " +
      "(Spark aggregate HOF ≡ DuckDB list_reduce over list(... ORDER " +
      "BY)) — the cross-engine answer to float-sum reassociation that " +
      "decimal accumulation can't give for non-decimal terms. Day " +
      "names, not engine dow numbering (Spark and DuckDB disagree on " +
      "week start). One count shuffle; everything after is |cells|.",
    (s, dir) => {
      val obs = Tables.events(s, dir)
        .select(col("event_type").as("t"), date_format(col("ts"), "EEEE").as("d"))
        .groupBy(col("t"), col("d")).agg(count(lit(1)).as("o"))
      val rt = obs.groupBy(col("t")).agg(sum(col("o")).as("rt"))
      val ct = obs.groupBy(col("d")).agg(sum(col("o")).as("ct"))
      val nn = obs.agg(sum(col("o")).as("nn"),
        countDistinct(col("t")).as("ntypes"), countDistinct(col("d")).as("ndays"))
      val num = (col("o") * col("nn") - col("rt") * col("ct")).cast("double")
      val cells = obs.join(broadcast(rt), Seq("t")).join(broadcast(ct), Seq("d"))
        .crossJoin(broadcast(nn))
        .withColumn("v", (num * num) /
          (col("nn").cast("double") * col("rt").cast("double") * col("ct").cast("double")))
      cells
        .agg(collect_list(struct(col("t"), col("d"), col("v"))).as("arr"),
          first(col("nn")).as("n_events"),
          ((first(col("ntypes")) - 1) * (first(col("ndays")) - 1)).as("df"))
        .select(col("n_events"), col("df"),
          round(aggregate(sort_array(col("arr")), lit(0.0),
            (acc, x) => acc + x.getField("v")), 6).as("chi2"))
    },
    Some("""
      |WITH obs AS (
      |  SELECT event_type AS t, dayname(ts::TIMESTAMP) AS d, count(*) AS o
      |  FROM events GROUP BY 1, 2
      |), rt AS (SELECT t, SUM(o)::BIGINT AS rt FROM obs GROUP BY 1),
      |ct AS (SELECT d, SUM(o)::BIGINT AS ct FROM obs GROUP BY 1),
      |nn AS (SELECT SUM(o)::BIGINT AS nn, count(DISTINCT t) AS ntypes,
      |              count(DISTINCT d) AS ndays FROM obs),
      |cells AS (
      |  SELECT obs.t, obs.d,
      |         (((obs.o * nn.nn - rt.rt * ct.ct)::DOUBLE) * ((obs.o * nn.nn - rt.rt * ct.ct)::DOUBLE)) /
      |         (nn.nn::DOUBLE * rt.rt::DOUBLE * ct.ct::DOUBLE) AS v
      |  FROM obs JOIN rt USING (t) JOIN ct USING (d) CROSS JOIN nn
      |)
      |SELECT any_value(nn.nn) AS n_events,
      |       (any_value(nn.ntypes) - 1) * (any_value(nn.ndays) - 1) AS df,
      |       round(list_reduce(list(v ORDER BY t, d), (a, b) -> a + b), 6) AS chi2
      |FROM cells CROSS JOIN nn
      """.stripMargin.trim))

  private val gini = QueryDef(
    "stat_gini_customer_value",
    "Inequality profile of customer lifetime value: Gini coefficient " +
      "(rank formula G = 2·Σ rank·x / (n·Σx) − (n+1)/n) and top-decile " +
      "revenue share over exact per-customer cents. The global rank " +
      "comes from DistributedRank — range-partitioned sort + " +
      "per-partition offsets — NOT a single-partition window (the " +
      "100 TB anti-pattern this query exists to avoid); ties are " +
      "total-ordered by (cents, custkey), under which Σ rank·x is " +
      "tie-permutation-invariant. Σ rank·x accumulates in DECIMAL(38,0) " +
      "(exact at any scale; both engines then round ONCE to double), " +
      "and the decile cut is the integer threshold rank > (9n) div 10.",
    (s, dir) => {
      val spend = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg((sum(col("o_totalprice").cast(Queries.Money.price)).cast(dec2) * 100)
          .cast("long").as("cents"))
      val ranked = graft.operators.DistributedRank.byKey(
        spend, Seq(col("cents"), col("o_custkey")))
      val n = ranked.agg(count(lit(1)).as("n"))
      ranked.crossJoin(broadcast(n))
        .agg(
          first(col("n")).as("n_customers"),
          sum(col("cents").cast(DecimalType(38, 0))).as("s0"),
          sum(col("rank").cast(DecimalType(19, 0)) * col("cents").cast(DecimalType(19, 0)))
            .as("s1"),
          sum(when(col("rank") > expr("(9 * n) div 10"),
            col("cents").cast(DecimalType(38, 0))).otherwise(lit(0).cast(DecimalType(38, 0))))
            .as("stop"))
        .select(col("n_customers"),
          round((lit(2.0) * col("s1").cast("double")) /
              (col("n_customers").cast("double") * col("s0").cast("double")) -
            (col("n_customers").cast("double") + lit(1.0)) / col("n_customers").cast("double"),
            6).as("gini"),
          round(col("stop").cast("double") / col("s0").cast("double"), 6)
            .as("top10pct_share"))
    },
    Some("""
      |WITH spend AS (
      |  SELECT o_custkey,
      |         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) * 100 AS BIGINT) AS cents
      |  FROM orders GROUP BY 1
      |), ranked AS (
      |  SELECT o_custkey, cents,
      |         row_number() OVER (ORDER BY cents, o_custkey) AS rank,
      |         count(*) OVER () AS n
      |  FROM spend
      |), s AS (
      |  SELECT any_value(n) AS n_customers,
      |         SUM(cents::HUGEINT) AS s0,
      |         SUM(rank::HUGEINT * cents::HUGEINT) AS s1,
      |         SUM(CASE WHEN rank > (9 * n) // 10 THEN cents::HUGEINT
      |                  ELSE 0::HUGEINT END) AS stop
      |  FROM ranked
      |)
      |SELECT n_customers,
      |       round((2.0::DOUBLE * s1::DOUBLE) /
      |               (n_customers::DOUBLE * s0::DOUBLE) -
      |             (n_customers::DOUBLE + 1.0::DOUBLE) / n_customers::DOUBLE, 6) AS gini,
      |       round(stop::DOUBLE / s0::DOUBLE, 6) AS top10pct_share
      |FROM s
      """.stripMargin.trim))

  private val triangles = QueryDef(
    "graph_triangle_count",
    "Triangle count over the undirected trade graph (the clustering/" +
      "community-structure census next to PageRank's centrality and " +
      "BFS's reachability): edges canonicalized to src < dst, " +
      "triangles = the ordered 3-cycle join a<b<c — each triangle " +
      "counted exactly once, which IS the scalable node-iterator " +
      "algorithm (the orientation bounds join fan-out by max " +
      "out-degree, not degree²). Exact integer counts; the edge " +
      "relation derives from the memoized per-(fixture, JVM) " +
      "trade-graph store — distinct unordered pairs of the stored " +
      "directed pairs, exactly the distinct unordered fact pairs — " +
      "so the heavy 4-way fact join is paid ONCE across the whole " +
      "nation-graph family, not per query.",
    (s, dir) => {
      val edges = nationTradeUndirected(s, dir)
      val e1 = edges.select(col("src").as("a"), col("dst").as("b"))
      val e2 = edges.select(col("src").as("b"), col("dst").as("c"))
      val e3 = edges.select(col("src").as("a2"), col("dst").as("c2"))
      val tri = e1.join(e2, Seq("b"))
        .join(e3, col("a") === col("a2") && col("c") === col("c2"))
      val nE = edges.agg(count(lit(1)).as("n_edges"))
      val nT = tri.agg(count(lit(1)).as("n_triangles"))
      nE.crossJoin(nT)
    },
    Some("""
      |WITH raw AS MATERIALIZED (
      |  -- MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, so the
      |  -- four self-references would each re-run the lineitem-sized 4-way
      |  -- join — measured >78 GB of concurrent spill at sf10 before the
      |  -- fix; materialized, the join runs once into a <=|V|^2-row table
      |  SELECT DISTINCT
      |         least(c.c_nationkey, s.s_nationkey) AS src,
      |         greatest(c.c_nationkey, s.s_nationkey) AS dst
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  WHERE c.c_nationkey <> s.s_nationkey
      |), tri AS (
      |  SELECT count(*) AS n_triangles
      |  FROM raw e1 JOIN raw e2 ON e1.dst = e2.src
      |  JOIN raw e3 ON e3.src = e1.src AND e3.dst = e2.dst
      |)
      |SELECT (SELECT count(*) FROM raw) AS n_edges, n_triangles FROM tri
      """.stripMargin.trim))

  private val clusteringCoeff = QueryDef(
    "graph_clustering_coefficient",
    "Local clustering coefficient per nation + global transitivity " +
      "over the undirected trade graph — the micro-level companion to " +
      "graph_triangle_count's census: HOW CLIQUISH is each node's " +
      "neighborhood (C_v = 2T_v / d_v(d_v−1)), and the graph overall " +
      "(3·triangles / wedges). Per-node triangle counts come from the " +
      "same oriented a<b<c 3-cycle join (each triangle feeds all three " +
      "corners once); degrees and wedges are exact BIGINTs; every " +
      "ratio is EXACT truncated integer division in millionths " +
      "(·10⁶ div — the decade-proof channel, no round(double) " +
      "anywhere). Edges derive from the memoized trade-graph store " +
      "(the fact join is paid once across the family); deg < 2 nodes " +
      "read C_v = 0 by convention (stated, not hidden).",
    (s, dir) => {
      val nation = Tables.nation(s, dir)
      val edges = nationTradeUndirected(s, dir)
      val e1 = edges.select(col("src").as("a"), col("dst").as("b"))
      val e2 = edges.select(col("src").as("b"), col("dst").as("c"))
      val e3 = edges.select(col("src").as("a2"), col("dst").as("c2"))
      val tri = e1.join(e2, Seq("b"))
        .join(e3, col("a") === col("a2") && col("c") === col("c2"))
        .select(col("a"), col("b"), col("c"))
      val triPerNode = tri.select(col("a").as("v"))
        .unionAll(tri.select(col("b").as("v")))
        .unionAll(tri.select(col("c").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("tri"))
      val deg = edges.select(col("src").as("v"))
        .unionAll(edges.select(col("dst").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      val glob = deg.agg(sum(expr("deg * (deg - 1) div 2")).as("wedges"))
        .crossJoin(tri.agg(count(lit(1)).as("t_total")))
        .select(
          (when(col("wedges") > 0,
            expr("CAST((3 * t_total * 1000000) div wedges AS BIGINT)"))
            .otherwise(lit(0L)).cast("double") / lit(1000000.0))
            .as("transitivity"))
      nation
        .join(deg, col("n_nationkey") === deg("v"), "left")
        .join(triPerNode, col("n_nationkey") === triPerNode("v"), "left")
        .crossJoin(broadcast(glob))
        .select(col("n_name").as("nation"),
          coalesce(col("deg"), lit(0L)).as("degree"),
          coalesce(col("tri"), lit(0L)).as("n_triangles"),
          (when(coalesce(col("deg"), lit(0L)) >= 2,
            expr("CAST((2 * coalesce(tri, 0L) * 1000000) div (deg * (deg - 1)) AS BIGINT)"))
            .otherwise(lit(0L)).cast("double") / lit(1000000.0))
            .as("local_cc"),
          col("transitivity"))
        .orderBy(col("local_cc").desc, col("nation"))
    },
    Some("""
      |WITH raw AS MATERIALIZED (
      |  SELECT DISTINCT
      |         least(c.c_nationkey, s.s_nationkey) AS src,
      |         greatest(c.c_nationkey, s.s_nationkey) AS dst
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  WHERE c.c_nationkey <> s.s_nationkey
      |), tri AS MATERIALIZED (
      |  SELECT e1.src AS a, e2.src AS b, e2.dst AS c
      |  FROM raw e1 JOIN raw e2 ON e1.dst = e2.src
      |  JOIN raw e3 ON e3.src = e1.src AND e3.dst = e2.dst
      |), pern AS (
      |  SELECT v, count(*) AS tri FROM (
      |    SELECT a AS v FROM tri UNION ALL SELECT b FROM tri
      |    UNION ALL SELECT c FROM tri
      |  ) GROUP BY 1
      |), deg AS (
      |  SELECT v, count(*) AS deg FROM (
      |    SELECT src AS v FROM raw UNION ALL SELECT dst FROM raw
      |  ) GROUP BY 1
      |), gl AS (
      |  SELECT CASE WHEN (SELECT SUM(deg * (deg - 1) // 2) FROM deg) > 0
      |              THEN ((3 * (SELECT count(*) FROM tri) * 1000000) //
      |                    (SELECT SUM(deg * (deg - 1) // 2) FROM deg))::BIGINT
      |              ELSE 0 END::DOUBLE / 1000000.0 AS transitivity
      |)
      |SELECT n.n_name AS nation,
      |       COALESCE(d.deg, 0)::BIGINT AS degree,
      |       COALESCE(p.tri, 0)::BIGINT AS n_triangles,
      |       CASE WHEN COALESCE(d.deg, 0) >= 2
      |            THEN ((2 * COALESCE(p.tri, 0) * 1000000) // (d.deg * (d.deg - 1)))::BIGINT
      |            ELSE 0 END::DOUBLE / 1000000.0 AS local_cc,
      |       gl.transitivity
      |FROM nation n
      |LEFT JOIN deg d ON d.v = n.n_nationkey
      |LEFT JOIN pern p ON p.v = n.n_nationkey, gl
      |ORDER BY local_cc DESC, nation
      """.stripMargin.trim))

  private val dowSeason = QueryDef(
    "stat_dow_seasonality",
    "Day-of-week seasonal index per event type: mean daily value by " +
      "weekday ÷ overall mean daily value — the seasonal-decomposition " +
      "readout beside stat_acf_daily's memory probe. Indices come from " +
      "exact integer sufficient statistics (cents sums, day counts) " +
      "with ONE fixed double shape (sd·n)/(nd·s); weekday NAMES, not " +
      "engine dow numbers (Spark and DuckDB disagree on week start). " +
      "Output is |types|·7 rows from two tiny aggregations over the " +
      "daily rollup.",
    (s, dir) => {
      val daily = dailyCents(s, dir)
        .withColumn("dow", date_format(to_date(col("day")), "EEEE"))
      val byDow = daily.groupBy(col("event_type"), col("dow"))
        .agg(sum(col("yc")).as("sd"), count(lit(1)).as("nd"))
      val overall = daily.groupBy(col("event_type"))
        .agg(sum(col("yc")).as("s"), count(lit(1)).as("n"))
      byDow.join(broadcast(overall), Seq("event_type"))
        .select(col("event_type"), col("dow"), col("nd").as("n_days"),
          round((col("sd").cast("double") * col("n").cast("double")) /
            (col("nd").cast("double") * col("s").cast("double")), 6).as("seasonal_idx"))
        .orderBy(col("event_type"), col("dow"))
    },
    Some(s"""
      |WITH daily AS (
      |$dailyCentsSql
      |), d AS (
      |  SELECT event_type, yc, dayname(day::DATE) AS dow FROM daily
      |), bydow AS (
      |  SELECT event_type, dow, SUM(yc)::BIGINT AS sd, count(*) AS nd
      |  FROM d GROUP BY 1, 2
      |), overall AS (
      |  SELECT event_type, SUM(yc)::BIGINT AS s, count(*) AS n
      |  FROM d GROUP BY 1
      |)
      |SELECT b.event_type, b.dow, b.nd AS n_days,
      |       round((b.sd::DOUBLE * o.n::DOUBLE) / (b.nd::DOUBLE * o.s::DOUBLE), 6)
      |         AS seasonal_idx
      |FROM bydow b JOIN overall o USING (event_type)
      |ORDER BY event_type, dow
      """.stripMargin.trim))

  private val cusum = QueryDef(
    "ev_cusum_changepoint",
    "CUSUM changepoint detection on per-type daily value: the clamped " +
      "recursion S_t = max(0, S_{t−1} + d_t) is NOT folded sequentially " +
      "— it is re-expressed as prefix-sum minus running-min " +
      "(S_t = P_t − min(0, min_{j≤t} P_j)), two ordinary window " +
      "functions over the day order, so a 10⁶-key deployment is one " +
      "keyed shuffle with no per-key iteration. Deviations are scaled " +
      "by n (d′ = n·x − Σx) to stay in exact BIGINTs — no mean " +
      "division inside the recursion; the only float op is the final " +
      "normalization. Changepoint = earliest day attaining the max.",
    (s, dir) => {
      val daily = dailyCents(s, dir)
      val wt = Window.partitionBy(col("event_type"))
      val wd = wt.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val scored = daily
        .withColumn("n", count(lit(1)).over(wt))
        .withColumn("sx", sum(col("yc")).over(wt))
        .withColumn("d", col("n") * col("yc") - col("sx"))
        .withColumn("p", sum(col("d")).over(wd))
        .withColumn("s", col("p") - least(lit(0L), min(col("p")).over(wd)))
      scored
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("event_type")).orderBy(col("s").desc, col("day"))))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("day").as("change_day"),
          col("s").as("cusum_stat"),
          round(col("s").cast("double") / col("n").cast("double"), 6)
            .as("norm_stat"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      |WITH daily AS (
      |$dailyCentsSql
      |), scored AS (
      |  SELECT event_type, day,
      |         count(*) OVER (PARTITION BY event_type) AS n,
      |         yc * count(*) OVER (PARTITION BY event_type) -
      |           SUM(yc) OVER (PARTITION BY event_type) AS d
      |  FROM daily
      |), pre AS (
      |  SELECT event_type, day, n,
      |         SUM(d) OVER (PARTITION BY event_type ORDER BY day
      |                      ROWS UNBOUNDED PRECEDING) AS p
      |  FROM scored
      |), cu AS (
      |  SELECT event_type, day, n,
      |         p - least(0, min(p) OVER (PARTITION BY event_type ORDER BY day
      |                                   ROWS UNBOUNDED PRECEDING)) AS s
      |  FROM pre
      |), top AS (
      |  SELECT event_type, day, n, s,
      |         row_number() OVER (PARTITION BY event_type ORDER BY s DESC, day) AS rn
      |  FROM cu
      |)
      |SELECT event_type, day AS change_day, s::BIGINT AS cusum_stat,
      |       round(s::DOUBLE / n::DOUBLE, 6) AS norm_stat
      |FROM top WHERE rn = 1 ORDER BY event_type
      """.stripMargin.trim))

  private val theilSen = QueryDef(
    "stat_theilsen",
    "Theil–Sen robust trend per event type — the median of all pairwise " +
      "slopes, the breakdown-resistant counterpart to ev_trend_ols's " +
      "least squares. Pair slopes are single IEEE divisions of exact " +
      "BIGINT deltas (bit-equal cross-engine); the median ELEMENT is " +
      "rank (m+1) div 2 of the sorted double multiset — monotone " +
      "rounding means the sorted multiset, hence the selected VALUE, is " +
      "engine-independent even if distinct fractions collide in double. " +
      "The O(days²) pair join is per-key and value-domain-bounded (the " +
      "day calendar), not row-bounded: event volume grows the daily " +
      "rollup's input, never the pair count.",
    (s, dir) => {
      val daily = dailyCents(s, dir)
        .withColumn("x",
          datediff(to_date(col("day")),
            min(to_date(col("day"))).over(Window.partitionBy(col("event_type"))))
            .cast("long"))
        .select(col("event_type"), col("x"), col("yc"))
      val a = daily.select(col("event_type"), col("x").as("xa"), col("yc").as("ya"))
      val b = daily.select(col("event_type"), col("x").as("xb"), col("yc").as("yb"))
      a.join(b, Seq("event_type"))
        .filter(col("xa") < col("xb"))
        .select(col("event_type"),
          ((col("yb") - col("ya")).cast("double") /
            (col("xb") - col("xa")).cast("double")).as("slope"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_pairs"),
          round(element_at(array_sort(collect_list(col("slope"))),
            ((count(lit(1)) + 1) / 2).cast("int")) / lit(100.0), 6)
            .as("ts_slope_per_day"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      |WITH daily AS (
      |$dailyCentsSql
      |), idx AS (
      |  SELECT event_type, yc,
      |         date_diff('day', min(day::DATE) OVER (PARTITION BY event_type), day::DATE) AS x
      |  FROM daily
      |), pairs AS (
      |  SELECT a.event_type,
      |         (b.yc - a.yc)::DOUBLE / (b.x - a.x)::DOUBLE AS slope
      |  FROM idx a JOIN idx b
      |    ON a.event_type = b.event_type AND a.x < b.x
      |)
      |SELECT event_type, count(*) AS n_pairs,
      |       round(list_sort(list(slope))[CAST((count(*) + 1) // 2 AS INT)] / 100.0, 6)
      |         AS ts_slope_per_day
      |FROM pairs GROUP BY 1 ORDER BY event_type
      """.stripMargin.trim))

  private val mannKendall = QueryDef(
    "stat_mann_kendall",
    "Mann–Kendall trend test per event type — the SIGNIFICANCE " +
      "companion to stat_theilsen's slope (Theil–Sen says how steep, " +
      "Mann–Kendall says whether the monotone trend is real): " +
      "S = Σ_{i<j} sign(y_j − y_i) over the same day-indexed pair " +
      "join (O(days²) per key, value-domain-bounded by the calendar — " +
      "event volume grows the daily rollup's input, never the pair " +
      "count). S is an exact BIGINT; the tie-corrected variance stays " +
      "exact as 18·Var(S) = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) over the " +
      "per-value tie groups; the continuity-corrected " +
      "Z = (S∓1)/√(var18/18) is the ONLY double op, one fixed shape, " +
      "rounded at 6 (σ-scaled, far below the rounding trap). S = 0 " +
      "reads Z = 0 by the standard definition.",
    (s, dir) => {
      val daily = dailyCents(s, dir)
        .withColumn("x",
          datediff(to_date(col("day")),
            min(to_date(col("day"))).over(Window.partitionBy(col("event_type"))))
            .cast("long"))
        .select(col("event_type"), col("x"), col("yc"))
      val a = daily.select(col("event_type"), col("x").as("xa"), col("yc").as("ya"))
      val b = daily.select(col("event_type"), col("x").as("xb"), col("yc").as("yb"))
      val sRel = a.join(b, Seq("event_type"))
        .filter(col("xa") < col("xb"))
        .groupBy(col("event_type"))
        .agg(sum(when(col("yb") > col("ya"), 1L)
          .when(col("yb") < col("ya"), -1L).otherwise(0L)).as("s_stat"))
      val nRel = daily.groupBy(col("event_type")).agg(count(lit(1)).as("n_days"))
      val ties = daily.groupBy(col("event_type"), col("yc"))
        .agg(count(lit(1)).as("t"))
        .groupBy(col("event_type"))
        .agg(sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5)).as("tie_term"))
      nRel.join(sRel, Seq("event_type")).join(ties, Seq("event_type"))
        .select(col("event_type"), col("n_days"), col("s_stat"),
          (col("n_days") * (col("n_days") - 1) * (lit(2L) * col("n_days") + 5) -
            col("tie_term")).as("var18"))
        .select(col("event_type"), col("n_days"), col("s_stat"),
          when(col("s_stat") === 0, lit(0.0))
            .otherwise(round(
              (col("s_stat").cast("double") -
                when(col("s_stat") > 0, lit(1.0)).otherwise(lit(-1.0))) /
                sqrt(col("var18").cast("double") / lit(18.0)), 6)).as("z_mk"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      |WITH daily AS (
      |$dailyCentsSql
      |), idx AS (
      |  SELECT event_type, yc,
      |         date_diff('day', min(day::DATE) OVER (PARTITION BY event_type), day::DATE) AS x
      |  FROM daily
      |), srel AS (
      |  SELECT a.event_type,
      |         SUM(CASE WHEN b.yc > a.yc THEN 1
      |                  WHEN b.yc < a.yc THEN -1 ELSE 0 END)::BIGINT AS s_stat
      |  FROM idx a JOIN idx b
      |    ON a.event_type = b.event_type AND a.x < b.x
      |  GROUP BY 1
      |), nrel AS (
      |  SELECT event_type, count(*)::BIGINT AS n_days FROM idx GROUP BY 1
      |), ties AS (
      |  SELECT event_type,
      |         SUM(t * (t - 1) * (2 * t + 5))::BIGINT AS tie_term
      |  FROM (SELECT event_type, yc, count(*)::BIGINT AS t FROM idx GROUP BY 1, 2)
      |  GROUP BY 1
      |), v AS (
      |  SELECT n.event_type, n.n_days, s.s_stat,
      |         (n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - t.tie_term)::BIGINT AS var18
      |  FROM nrel n JOIN srel s USING (event_type) JOIN ties t USING (event_type)
      |)
      |SELECT event_type, n_days, s_stat,
      |       CASE WHEN s_stat = 0 THEN 0.0
      |            ELSE round((s_stat::DOUBLE - CASE WHEN s_stat > 0 THEN 1.0 ELSE -1.0 END) /
      |                       sqrt(var18::DOUBLE / 18.0), 6) END AS z_mk
      |FROM v ORDER BY event_type
      """.stripMargin.trim))

  private val mannWhitney = QueryDef(
    "stat_mannwhitney_u",
    "Mann–Whitney U (Wilcoxon rank-sum) for click vs purchase value — " +
      "the nonparametric counterpart to stat_ab_welch, computed " +
      "EXACTLY: doubled midranks 2·r(v) = 2·below(v) + ties(v) + 1 are " +
      "integers, so 2R_A and 2U_A = 2R_A − n_A(n_A+1) accumulate in " +
      "BIGINT with zero float ops until the final z normalization " +
      "(no tie-variance correction; stated, not hidden). Like the KS " +
      "gate, the cumulative window runs over the DISTINCT VALUE GRID " +
      "(value-domain-bounded), never the row count — the row-sized " +
      "work is one groupBy(vc) shuffle.",
    (s, dir) => {
      val st = Tables.events(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select((col("value").cast(DecimalType(12, 2)) * 100).cast("long").as("vc"),
          when(col("event_type") === "click", 1L).otherwise(0L).as("is_a"))
      val g = st.groupBy(col("vc"))
        .agg(sum(col("is_a")).as("a_n"), sum(lit(1L) - col("is_a")).as("b_n"))
      val below = Window.orderBy(col("vc"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val tot = Window.partitionBy()
      g.select(col("a_n"), col("b_n"),
          coalesce(sum(col("a_n") + col("b_n")).over(below), lit(0L)).as("blw"),
          sum(col("a_n")).over(tot).as("na"), sum(col("b_n")).over(tot).as("nb"))
        .agg(first(col("na")).as("n_a"), first(col("nb")).as("n_b"),
          sum(col("a_n") * (lit(2L) * col("blw") + col("a_n") + col("b_n") + 1L))
            .as("two_r_a"))
        .select(col("n_a"), col("n_b"),
          (col("two_r_a") - col("n_a") * (col("n_a") + 1L)).as("two_u_a"))
        .select(col("n_a"), col("n_b"), col("two_u_a"),
          round((col("two_u_a") - col("n_a") * col("n_b")).cast("double") /
            (lit(2.0) * sqrt(col("n_a").cast("double") * col("n_b").cast("double") *
              (col("n_a") + col("n_b") + 1L).cast("double") / lit(12.0))), 6)
            .as("z_approx"))
    },
    Some("""
      |WITH s AS (
      |  SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS vc,
      |         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |), g AS (
      |  SELECT vc, SUM(is_a) AS a_n, SUM(1 - is_a) AS b_n FROM s GROUP BY vc
      |), c AS (
      |  SELECT a_n, b_n,
      |         COALESCE(SUM(a_n + b_n) OVER (ORDER BY vc
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS blw,
      |         SUM(a_n) OVER () AS na, SUM(b_n) OVER () AS nb
      |  FROM g
      |), r AS (
      |  SELECT any_value(na)::BIGINT AS n_a, any_value(nb)::BIGINT AS n_b,
      |         SUM(a_n * (2 * blw + a_n + b_n + 1))::BIGINT AS two_r_a
      |  FROM c
      |), u AS (
      |  SELECT n_a, n_b, two_r_a - n_a * (n_a + 1) AS two_u_a FROM r
      |)
      |SELECT n_a, n_b, two_u_a,
      |       round((two_u_a - n_a * n_b)::DOUBLE /
      |             (2.0 * sqrt(n_a::DOUBLE * n_b::DOUBLE * (n_a + n_b + 1)::DOUBLE / 12.0)), 6)
      |         AS z_approx
      |FROM u
      """.stripMargin.trim))

  private val kruskal = QueryDef(
    "stat_kruskal_wallis",
    "Kruskal–Wallis H — the nonparametric one-way ANOVA: does event " +
      "VALUE differ in location across ALL event types at once? " +
      "Completes the battery: stat_anova_f assumes normality, " +
      "stat_levene_bf checks its variance assumption, " +
      "stat_mannwhitney_u compares two arms — this is the k-arm " +
      "rank test. Doubled midranks 2r = 2·below + t + 1 are exact " +
      "BIGINTs over the DISTINCT VALUE GRID (value-domain-bounded, " +
      "the mannwhitney discipline; the row-sized work is one " +
      "groupBy(vc, type) shuffle). Per-group (2R_g)²/n_g terms are " +
      "doubles of EXACT integers (2R_g < 2⁵³ decades past sf10) " +
      "summed by an ORDERED fold over the k-row group list (array " +
      "fold ≡ list_reduce, the ev_holt_forecast channel — k terms of " +
      "~1e21 magnitude admit no rounding grid, so order is fixed " +
      "instead); H and the tie-corrected H' (ties via exact " +
      "HUGEINT/DECIMAL Σ(t³−t)) evaluate in one fixed double shape.",
    (s, dir) => {
      val st = Tables.events(s, dir)
        .select((col("value").cast(DecimalType(12, 2)) * 100).cast("long").as("vc"),
          col("event_type"))
      val cell = st.groupBy(col("vc"), col("event_type")).agg(count(lit(1)).as("c"))
      val grid = st.groupBy(col("vc")).agg(count(lit(1)).as("t"))
      val below = Window.orderBy(col("vc"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val ranked = grid.select(col("vc"), col("t"),
        (lit(2L) * coalesce(sum(col("t")).over(below), lit(0L)) + col("t") + 1L)
          .as("r2"))
      val byGroup = cell.join(ranked, Seq("vc"))
        .groupBy(col("event_type"))
        .agg(sum(col("c")).as("ng"), sum(col("c") * col("r2")).as("r2g"))
      val ties = grid.agg(
        sum(expr("CAST(t AS DECIMAL(38,0)) * t * t - t")).as("tie3"))
      val agged = byGroup.agg(
        count(lit(1)).as("k"),
        sum(col("ng")).as("n"),
        aggregate(
          transform(array_sort(collect_list(struct(col("event_type"),
            (col("r2g").cast("double") * col("r2g").cast("double") /
              col("ng").cast("double")).as("term")))),
            x => x.getField("term")),
          lit(0.0), (acc, x) => acc + x).as("a4"))
        .crossJoin(ties)
      // doubled-rank algebra: with A = Σ_g (2R_g)²/n_g, Σ_g R_g²/n_g = A/4,
      // so H = 12·(A/4)/(N(N+1)) − 3(N+1) = 3A/(N(N+1)) − 3(N+1)
      val nD = col("n").cast("double")
      val h = lit(3.0) * col("a4") / (nD * (nD + lit(1.0))) -
        lit(3.0) * (nD + lit(1.0))
      val corr = lit(1.0) - col("tie3").cast("double") /
        (nD * nD * nD - nD)
      agged.select(col("k"), col("n"),
        round(h, 4).as("h_stat"),
        round(h / corr, 4).as("h_tie_corrected"))
    },
    Some("""
      |WITH s AS (
      |  SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS vc, event_type
      |  FROM events
      |), cell AS (
      |  SELECT vc, event_type, count(*) AS c FROM s GROUP BY 1, 2
      |), grid AS (
      |  SELECT vc, count(*) AS t FROM s GROUP BY 1
      |), ranked AS (
      |  SELECT vc, t,
      |         2 * COALESCE(SUM(t) OVER (ORDER BY vc
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1 AS r2
      |  FROM grid
      |), bygroup AS (
      |  SELECT cell.event_type, SUM(c)::BIGINT AS ng,
      |         SUM(c * r2)::BIGINT AS r2g
      |  FROM cell JOIN ranked USING (vc) GROUP BY 1
      |), ties AS (
      |  SELECT SUM(t::HUGEINT * t * t - t) AS tie3 FROM grid
      |), agged AS (
      |  SELECT count(*)::BIGINT AS k, SUM(ng)::BIGINT AS n,
      |         list_reduce(
      |           [0.0::DOUBLE] || list(r2g::DOUBLE * r2g::DOUBLE / ng::DOUBLE
      |                                 ORDER BY event_type),
      |           (acc, x) -> acc + x) AS a4
      |  FROM bygroup
      |), f AS (
      |  SELECT k, n, a4, tie3,
      |         3.0 * a4 / (n::DOUBLE * (n::DOUBLE + 1.0)) -
      |           3.0 * (n::DOUBLE + 1.0) AS h,
      |         1.0 - tie3::DOUBLE /
      |           (n::DOUBLE * n::DOUBLE * n::DOUBLE - n::DOUBLE) AS corr
      |  FROM agged, ties
      |)
      |SELECT k, n, round(h, 4) AS h_stat, round(h / corr, 4) AS h_tie_corrected
      |FROM f
      """.stripMargin.trim))

  private val friedman = QueryDef(
    "stat_friedman",
    "Friedman test — the nonparametric repeated-measures ANOVA the " +
      "rank battery still lacked: do the event TYPES differ in daily " +
      "value when each DAY is its own block (kruskal pools all days " +
      "into one ranking, so a day-level shift inflates it; Friedman " +
      "ranks WITHIN each day, removing the block effect)? Blocks = " +
      "complete calendar days (every event type present — the " +
      "complete-block design the test requires, derived from the " +
      "data); treatments = event types; doubled within-block midranks " +
      "2r = 2·below + t + 1 are exact BIGINTs from one per-day window " +
      "over the (day, value) grid. The tie-corrected statistic " +
      "(Conover): with S2 = Σ_j (2R_j − n(k+1))², A4 = Σ_ij (2r)², " +
      "C4 = nk(k+1)², χ²_F = (k−1)·S2/(A4 − C4) — every term an " +
      "exact integer, ONE double division at the end (nullif on the " +
      "all-tied degenerate corpus); Kendall's W = χ²_F/(n(k−1)) is " +
      "the [0,1] effect size beside it. Work = the daily rollup + " +
      "one day-keyed window on the calendar-bounded grid; the test " +
      "itself is k rows.",
    (s, dir) => {
      val daily = dailyCents(s, dir)
      val ktot = daily.agg(countDistinct(col("event_type")).as("ktot"))
      val complete = daily.groupBy(col("day")).agg(count(lit(1)).as("nt"))
        .crossJoin(broadcast(ktot))
        .filter(col("nt") === col("ktot"))
        .select(col("day"))
      val cells = daily.join(broadcast(complete), Seq("day"))
      val grid = cells.groupBy(col("day"), col("yc")).agg(count(lit(1)).as("t"))
      val below = Window.partitionBy(col("day")).orderBy(col("yc"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val ranked = grid.select(col("day"), col("yc"),
        (lit(2L) * coalesce(sum(col("t")).over(below), lit(0L)) + col("t") + 1L)
          .as("r2"))
      val rcells = cells.join(ranked, Seq("day", "yc"))
      val byType = rcells.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("r2")).as("r2j"),
          sum(col("r2") * col("r2")).as("a4j"))
      // S2 folds the k-row type list (exact DECIMAL(38,0) squares)
      val folded = byType.agg(
        count(lit(1)).as("k"), max(col("n")).as("n"),
        sum(col("a4j")).as("a4"),
        sort_array(collect_list(struct(col("event_type"), col("r2j")))).as("arr"))
      // deviations are calendar-bounded (≤ n·2k), so squares stay exact
      // BIGINTs on both engines — no decimal channel needed
      val stat = folded.select(col("k"), col("n"), col("a4"), col("arr"),
        aggregate(col("arr"), lit(0L), (acc, x) =>
          acc + (x.getField("r2j") - col("n") * (col("k") + lit(1L))) *
            (x.getField("r2j") - col("n") * (col("k") + lit(1L)))).as("s2"))
      val denom = (col("a4") - col("n") * col("k") *
        (col("k") + 1L) * (col("k") + 1L)).cast("double")
      val chi2 = ((col("k").cast("double") - lit(1.0)) * col("s2").cast("double")) /
        nullif(denom, lit(0.0))
      stat.select(col("k"), col("n").as("n_days"),
        round(chi2, 6).as("chi2_friedman"),
        round(chi2 / (col("n").cast("double") *
          (col("k").cast("double") - lit(1.0))), 6).as("kendalls_w"))
    },
    Some(s"""
      |WITH daily AS (
      |$dailyCentsSql
      |), ktot AS (
      |  SELECT count(DISTINCT event_type)::BIGINT AS ktot FROM daily
      |), complete AS (
      |  SELECT day FROM (SELECT day, count(*) AS nt FROM daily GROUP BY 1), ktot
      |  WHERE nt = ktot
      |), cells AS (
      |  SELECT d.day, d.event_type, d.yc FROM daily d JOIN complete USING (day)
      |), grid AS (
      |  SELECT day, yc, count(*) AS t FROM cells GROUP BY 1, 2
      |), ranked AS (
      |  SELECT day, yc,
      |         2 * COALESCE(SUM(t) OVER (PARTITION BY day ORDER BY yc
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1 AS r2
      |  FROM grid
      |), rcells AS (
      |  SELECT c.event_type, r.r2 FROM cells c JOIN ranked r USING (day, yc)
      |), bytype AS (
      |  SELECT event_type, count(*)::BIGINT AS n, SUM(r2)::BIGINT AS r2j,
      |         SUM(r2 * r2)::BIGINT AS a4j
      |  FROM rcells GROUP BY 1
      |), folded AS (
      |  SELECT count(*)::BIGINT AS k, max(n)::BIGINT AS n, SUM(a4j)::BIGINT AS a4,
      |         list(r2j ORDER BY event_type) AS arr
      |  FROM bytype
      |), stat AS (
      |  SELECT k, n, a4,
      |         list_reduce(list_prepend(0::BIGINT, list_transform(arr, x ->
      |           (x - n * (k + 1)) * (x - n * (k + 1)))),
      |           (a, b) -> a + b) AS s2
      |  FROM folded
      |), f AS (
      |  SELECT k, n,
      |         ((k::DOUBLE - 1.0) * s2::DOUBLE) /
      |           nullif((a4 - n * k * (k + 1) * (k + 1))::DOUBLE, 0.0) AS chi2
      |  FROM stat
      |)
      |SELECT k, n AS n_days, round(chi2, 6) AS chi2_friedman,
      |       round(chi2 / (n::DOUBLE * (k::DOUBLE - 1.0)), 6) AS kendalls_w
      |FROM f
      """.stripMargin.trim))

  private val holt = QueryDef(
    "ev_holt_forecast",
    "Holt's linear exponential smoothing (α = β = 0.5) of per-type " +
      "daily value with a 7-day-ahead forecast — the time-series " +
      "smoothing axis beyond ev_ewma_daily's level-only EWMA. The " +
      "coupled (level, trend) recursion has no window-function form, " +
      "so it runs as a sequential double fold over the day-sorted " +
      "array (Spark aggregate HOF ≡ DuckDB list_reduce with the init " +
      "state prepended) — the established cross-engine channel when " +
      "exact accumulation can't apply; one fixed expression shape " +
      "makes every intermediate double bit-equal. The oracle's " +
      "2-component state is a DOUBLE LIST, not a struct: DuckDB 1.0's " +
      "list_reduce with a struct_pack accumulator evaluates later " +
      "fields against PARTIALLY-UPDATED state once the chain exceeds " +
      "one step (probed; the list accumulator folds correctly). Init " +
      "l = x₂, b = x₂ − x₁; per-key arrays are calendar-bounded, and " +
      "10⁶ keys fold independently after one keyed shuffle.",
    (s, dir) => {
      val arr = dailyCents(s, dir)
        .groupBy(col("event_type"))
        .agg(transform(array_sort(collect_list(struct(col("day"), col("yc")))),
          e => e.getField("yc").cast("double")).as("xs"))
      val folded = arr.select(col("event_type"),
        size(col("xs")).cast("long").as("n_days"),
        aggregate(
          slice(col("xs"), lit(3), greatest(size(col("xs")) - 2, lit(0))),
          struct(element_at(col("xs"), 2).as("l"),
            (element_at(col("xs"), 2) - element_at(col("xs"), 1)).as("b")),
          (acc, x) => struct(
            (lit(0.5) * x + lit(0.5) * (acc.getField("l") + acc.getField("b"))).as("l"),
            (lit(0.5) * ((lit(0.5) * x + lit(0.5) * (acc.getField("l") + acc.getField("b"))) -
              acc.getField("l")) + lit(0.5) * acc.getField("b")).as("b"))).as("st"))
      folded.select(col("event_type"), col("n_days"),
          round(col("st").getField("l") / lit(100.0), 6).as("level"),
          round(col("st").getField("b") / lit(100.0), 6).as("trend"),
          round((col("st").getField("l") + lit(7.0) * col("st").getField("b")) / lit(100.0), 6)
            .as("forecast_7d"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      |WITH daily AS (
      |$dailyCentsSql
      |), arr AS (
      |  SELECT event_type, list(yc::DOUBLE ORDER BY day) AS xs FROM daily GROUP BY 1
      |), folded AS (
      |  SELECT event_type, len(xs)::BIGINT AS n_days,
      |         list_reduce(
      |           list_prepend([xs[2], xs[2] - xs[1]],
      |             list_transform(xs[3:], x -> [x, 0.0::DOUBLE])),
      |           (a, e) -> [0.5 * e[1] + 0.5 * (a[1] + a[2]),
      |                      0.5 * ((0.5 * e[1] + 0.5 * (a[1] + a[2])) - a[1]) + 0.5 * a[2]]) AS st
      |  FROM arr
      |)
      |SELECT event_type, n_days,
      |       round(st[1] / 100.0, 6) AS level,
      |       round(st[2] / 100.0, 6) AS trend,
      |       round((st[1] + 7.0 * st[2]) / 100.0, 6) AS forecast_7d
      |FROM folded ORDER BY event_type
      """.stripMargin.trim))

  private val holtWinters = QueryDef(
    "ev_holt_winters",
    "Holt–Winters ADDITIVE seasonal smoothing (α = β = γ = 0.5, period " +
      "7) of per-type daily value with a full next-week forecast — the " +
      "seasonality-aware member of the smoothing family (ev_ewma_daily " +
      "= level; ev_holt_forecast = level+trend; this = level+trend+" +
      "day-of-week profile, the shape retail/ops series actually " +
      "have). The 9-component (l, b, s₀..s₆) recursion folds " +
      "sequentially over the day-sorted array exactly like the Holt " +
      "gate — Spark aggregate HOF ≡ DuckDB list_reduce on a LIST " +
      "accumulator (the struct-accumulator mis-evaluation workaround " +
      "documented there), each (x, day-index) element pre-zipped so " +
      "the seasonal slot j = (t−1) mod 7 is data, not fold state. " +
      "Init: l₀ = first-week mean (one fixed left-fold), b₀ = 0, " +
      "sⱼ = xⱼ − l₀; l₀ is projected ONCE as its own column so both " +
      "engines evaluate the init expression a single time. Per-key " +
      "arrays are calendar-bounded; 10⁶ keys fold independently after " +
      "one keyed shuffle. Output: 7 forecast rows per type (level + " +
      "h·trend + the h-th day's seasonal), cents exact until the " +
      "final /100 display division.",
    (s, dir) => {
      val arr = dailyCents(s, dir)
        .groupBy(col("event_type"))
        .agg(transform(array_sort(collect_list(struct(col("day"), col("yc")))),
          e => e.getField("yc").cast("double")).as("xs"))
        .filter(size(col("xs")) >= 8)
      val l0 = (1 to 7).map(i => element_at(col("xs"), i))
        .reduce(_ + _) / lit(7.0)
      val withInit = arr.withColumn("l0", l0)
      val initAcc = concat(
        array(col("l0"), lit(0.0)),
        transform(sequence(lit(1), lit(7)),
          i => element_at(col("xs"), i) - col("l0")))
      val elems = transform(sequence(lit(8), size(col("xs"))),
        i => struct(element_at(col("xs"), i).as("x"),
          pmod(i - 1, lit(7)).as("j")))
      def lNew(acc: org.apache.spark.sql.Column, e: org.apache.spark.sql.Column) =
        lit(0.5) * (e.getField("x") - element_at(acc, e.getField("j") + 3)) +
          lit(0.5) * (element_at(acc, 1) + element_at(acc, 2))
      val folded = withInit.select(col("event_type"),
        size(col("xs")).cast("long").as("n_days"),
        aggregate(elems, initAcc, (acc, e) => concat(
          array(
            lNew(acc, e),
            lit(0.5) * (lNew(acc, e) - element_at(acc, 1)) +
              lit(0.5) * element_at(acc, 2)),
          transform(sequence(lit(0), lit(6)), k =>
            when(k === e.getField("j"),
              lit(0.5) * (e.getField("x") - lNew(acc, e)) +
                lit(0.5) * element_at(acc, e.getField("j") + 3))
              .otherwise(element_at(acc, k + 3))))).as("st"))
      folded.select(col("event_type"), col("n_days"),
          explode(sequence(lit(1), lit(7))).as("h"), col("st"))
        .select(col("event_type"), col("n_days"), col("h").cast("long").as("h"),
          round(element_at(col("st"), 1) / lit(100.0), 6).as("level"),
          round(element_at(col("st"), 2) / lit(100.0), 6).as("trend"),
          round((element_at(col("st"), 1) +
            col("h").cast("double") * element_at(col("st"), 2) +
            element_at(col("st"),
              pmod(col("n_days") + col("h") - 1, lit(7)).cast("int") + 3)) /
            lit(100.0), 6).as("forecast"))
        .orderBy(col("event_type"), col("h"))
    },
    Some {
      val l0Sql = "(((((((xs[1] + xs[2]) + xs[3]) + xs[4]) + xs[5]) + xs[6]) + xs[7]) / 7.0)"
      val lNewSql =
        "(0.5 * (e[1] - a[CAST(e[2] AS INT) + 3]) + 0.5 * (a[1] + a[2]))"
      s"""
      |WITH daily AS (
      |$dailyCentsSql
      |), arr AS (
      |  SELECT event_type, list(yc::DOUBLE ORDER BY day) AS xs FROM daily GROUP BY 1
      |), arr8 AS (
      |  SELECT event_type, xs, $l0Sql AS l0 FROM arr WHERE len(xs) >= 8
      |), folded AS (
      |  SELECT event_type, len(xs)::BIGINT AS n_days,
      |         list_reduce(
      |           list_prepend(
      |             [l0, 0.0::DOUBLE] ||
      |               list_transform(xs[1:7], x -> x - l0),
      |             list_transform(range(8, len(xs) + 1),
      |               i -> [xs[i], CAST((i - 1) % 7 AS DOUBLE)])),
      |           (a, e) -> [$lNewSql,
      |                      0.5 * ($lNewSql - a[1]) + 0.5 * a[2]] ||
      |                     list_transform([0, 1, 2, 3, 4, 5, 6],
      |                       k -> CASE WHEN k = CAST(e[2] AS INT)
      |                                 THEN 0.5 * (e[1] - $lNewSql) + 0.5 * a[CAST(e[2] AS INT) + 3]
      |                                 ELSE a[k + 3] END)) AS st
      |  FROM arr8
      |)
      |SELECT event_type, n_days, CAST(h AS BIGINT) AS h,
      |       round(st[1] / 100.0, 6) AS level,
      |       round(st[2] / 100.0, 6) AS trend,
      |       round((st[1] + CAST(h AS DOUBLE) * st[2] +
      |              st[CAST((n_days + h - 1) % 7 AS INT) + 3]) / 100.0, 6) AS forecast
      |FROM folded CROSS JOIN unnest([1, 2, 3, 4, 5, 6, 7]) AS t(h)
      |ORDER BY event_type, h
      """.stripMargin.trim
    })

  private val kaplanMeier = QueryDef(
    "stat_survival_km",
    "Kaplan–Meier survival curve for time-to-conversion (first view → " +
      "first purchase, right-censored at the study end for users who " +
      "never convert) — the censoring-aware answer to 'how long until " +
      "users buy'. Per-user first-event times and the (death, censor, " +
      "at-risk) grid are exact integers; at-risk counts come from one " +
      "cumulative window over the DURATION GRID (value-domain-bounded " +
      "like the KS/U gates). Ŝ(t) = Π (nᵢ−dᵢ)/nᵢ is a per-row prefix " +
      "product of exact-fraction doubles, folded in a fixed order on " +
      "both engines (grid² ≈ 30² scalar ops — the fold cost is " +
      "calendar-bounded, never row-bounded).",
    (s, dir) => {
      val ev = Tables.events(s, dir).withColumn("day", to_date(col("ts")))
      val perUser = ev.groupBy(col("user_id")).agg(
        min(when(col("event_type") === "view", col("day"))).as("fv"),
        min(when(col("event_type") === "purchase", col("day"))).as("fp"))
      val endRow = ev.agg(max(col("day")).as("study_end"))
      val cohort = perUser
        .filter(col("fv").isNotNull && (col("fp").isNull || col("fp") >= col("fv")))
        .crossJoin(broadcast(endRow))
        .select(
          when(col("fp").isNotNull, datediff(col("fp"), col("fv")))
            .otherwise(datediff(col("study_end"), col("fv"))).cast("long").as("t"),
          when(col("fp").isNotNull, 1L).otherwise(0L).as("e"))
      val grid = cohort.groupBy(col("t"))
        .agg(sum(col("e")).as("d"), sum(lit(1L) - col("e")).as("c"))
      val cum = Window.orderBy(col("t")).rowsBetween(Window.unboundedPreceding, -1)
      val tot = Window.partitionBy()
      val g2 = grid.select(col("t"), col("d"), col("c"),
        (sum(col("d") + col("c")).over(tot) -
          coalesce(sum(col("d") + col("c")).over(cum), lit(0L))).as("n"))
      val withArr = g2
        .agg(array_sort(collect_list(struct(col("t"), col("d"), col("c"), col("n"))))
          .as("arr"))
        .select(col("arr"), posexplode(col("arr")))
      withArr
        .select(col("col").getField("t").as("t_days"),
          col("col").getField("n").as("n_at_risk"),
          col("col").getField("d").as("d_events"),
          col("col").getField("c").as("c_censored"),
          round(aggregate(slice(col("arr"), lit(1), col("pos") + 1), lit(1.0),
            (acc, x) => acc * ((x.getField("n") - x.getField("d")).cast("double") /
              x.getField("n").cast("double"))), 6).as("survival"))
        .orderBy(col("t_days"))
    },
    Some("""
      |WITH ev AS (
      |  SELECT user_id, event_type, ts::TIMESTAMP::DATE AS day FROM events
      |), pu AS (
      |  SELECT user_id,
      |         min(CASE WHEN event_type = 'view' THEN day END) AS fv,
      |         min(CASE WHEN event_type = 'purchase' THEN day END) AS fp
      |  FROM ev GROUP BY 1
      |), se AS (SELECT max(day) AS study_end FROM ev),
      |cohort AS (
      |  SELECT CASE WHEN fp IS NOT NULL THEN date_diff('day', fv, fp)
      |              ELSE date_diff('day', fv, study_end) END::BIGINT AS t,
      |         CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END AS e
      |  FROM pu, se WHERE fv IS NOT NULL AND (fp IS NULL OR fp >= fv)
      |), grid AS (
      |  SELECT t, SUM(e)::BIGINT AS d, SUM(1 - e)::BIGINT AS c FROM cohort GROUP BY 1
      |), g2 AS (
      |  SELECT t, d, c,
      |         (SUM(d + c) OVER () -
      |           COALESCE(SUM(d + c) OVER (ORDER BY t
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))::BIGINT AS n
      |  FROM grid
      |), a AS (
      |  SELECT list(struct_pack(t := t, d := d, c := c, n := n) ORDER BY t) AS arr FROM g2
      |), idx AS (
      |  SELECT arr, unnest(range(1, len(arr) + 1)) AS i FROM a
      |)
      |SELECT arr[i].t AS t_days, arr[i].n AS n_at_risk,
      |       arr[i].d AS d_events, arr[i].c AS c_censored,
      |       round(list_reduce(
      |         list_transform(arr[1:i], x -> (x.n - x.d)::DOUBLE / x.n::DOUBLE),
      |         (p, q) -> p * q), 6) AS survival
      |FROM idx ORDER BY t_days
      """.stripMargin.trim))

  private val assortativity = QueryDef(
    "graph_degree_assortativity",
    "Degree assortativity of the part CO-PURCHASE graph (the do-hubs-" +
      "connect-to-hubs metric beside PageRank's centrality, BFS's " +
      "reachability and the triangle census): undirected deduplicated " +
      "edges = part pairs sharing an order (generated WITHIN baskets " +
      "— Σ basket², never |parts|²; the nation graph saturates to " +
      "complete (zero degree variance, an undefined metric) by sf0.1, " +
      "while this graph's node set scales with the catalog). Pearson " +
      "r of (deg(u), deg(v)) over BOTH orientations of every edge — " +
      "the standard symmetric form. Degrees and all five sufficient " +
      "statistics are exact BIGINTs; one closed-form double formula " +
      "with the dailyCorr shape; nullif returns NULL, not an error, " +
      "on a regular graph. Degree joins key on the node id.",
    (s, dir) => {
      // the support-1 co-purchase memo IS this query's edge relation
      // ((src, dst, n_co ≥ 1) projected to the pair): the basket
      // self-join is paid once per (fixture, JVM) and shared with
      // ml_item_cooccurrence
      val edges = coPurchaseEdges(s, dir, 1).select(col("src"), col("dst"))
      val deg = edges.select(col("src").as("v")).unionAll(edges.select(col("dst").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      val both = edges.select(col("src").as("u"), col("dst").as("w"))
        .unionAll(edges.select(col("dst").as("u"), col("src").as("w")))
      val xy = both
        .join(deg.select(col("v").as("u"), col("deg").as("x")), Seq("u"))
        .join(deg.select(col("v").as("w"), col("deg").as("y")), Seq("w"))
      val st = xy.agg(count(lit(1)).as("m"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      st.select(expr("m div 2").as("n_edges"),
        round((col("m").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          nullif(sqrt((col("m").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")) *
            (col("m").cast("double") * col("syy").cast("double") -
              col("sy").cast("double") * col("sy").cast("double"))), lit(0.0)), 6)
          .as("assortativity"))
    },
    Some("""
      |WITH basket AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem
      |), edges AS (
      |  SELECT DISTINCT a.item AS src, b.item AS dst
      |  FROM basket a JOIN basket b ON a.ok = b.ok AND a.item < b.item
      |), deg AS (
      |  SELECT v, count(*) AS deg FROM (
      |    SELECT src AS v FROM edges UNION ALL SELECT dst AS v FROM edges
      |  ) GROUP BY 1
      |), xy AS (
      |  SELECT du.deg AS x, dw.deg AS y
      |  FROM (SELECT src AS u, dst AS w FROM edges
      |        UNION ALL SELECT dst AS u, src AS w FROM edges) e
      |  JOIN deg du ON e.u = du.v
      |  JOIN deg dw ON e.w = dw.v
      |), st AS (
      |  SELECT count(*) AS m, SUM(x)::BIGINT AS sx, SUM(y)::BIGINT AS sy,
      |         SUM(x*x)::BIGINT AS sxx, SUM(y*y)::BIGINT AS syy,
      |         SUM(x*y)::BIGINT AS sxy
      |  FROM xy
      |)
      |SELECT (m // 2)::BIGINT AS n_edges,
      |       round((m::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
      |             nullif(sqrt((m::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) *
      |                  (m::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 0.0), 6)
      |         AS assortativity
      |FROM st
      """.stripMargin.trim))

  private val kendall = QueryDef(
    "stat_kendall_tau",
    "Kendall's τ-b between daily volume and revenue per return flag — " +
      "the rank-based association measure beside Pearson (stat_daily_" +
      "corr) and Theil–Sen's robust slope. Every pair of days is " +
      "classified concordant / discordant / x-tie-only / y-tie-only " +
      "by exact integer sign tests (no ranks materialized, no floats); " +
      "τ-b = (C−D)/√((C+D+T_y)(C+D+T_x)) from those counts with one " +
      "sqrt+division. The O(days²) pair join is calendar-bounded per " +
      "key, exactly like stat_theilsen.",
    (s, dir) => {
      val daily = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_shipdate").cast("date").as("day"))
        .agg(sum(col("l_quantity").cast(DecimalType(12, 0))).cast("long").as("x"),
          (sum(col("l_extendedprice").cast(Queries.Money.price)).cast(dec2) * 100)
            .cast("long").as("y"))
        // consumed by BOTH self-join sides — one lineitem aggregation,
        // not two (guide §1.2); days-sized, bounded by the calendar
        .localCheckpoint()
      val a = daily.select(col("l_returnflag"), col("day").as("da"),
        col("x").as("xa"), col("y").as("ya"))
      val b = daily.select(col("l_returnflag"), col("day").as("db"),
        col("x").as("xb"), col("y").as("yb"))
      // broadcast(b): the join key has 3 distinct values, so the
      // shuffled plan landed the whole O(days²) pair expansion on ≤3 of
      // the shuffle partitions (guide §2.5 — key-cardinality skew); the
      // broadcast join expands pairs at the a-side's parallelism, and
      // the build side is days-sized at any corpus scale
      val pairs = a.join(broadcast(b), Seq("l_returnflag")).filter(col("da") < col("db"))
        .select(col("l_returnflag"),
          (col("xb") - col("xa")).as("dx"), (col("yb") - col("ya")).as("dy"))
      pairs.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("dx") * col("dy") > 0, 1L).otherwise(0L)).as("c"),
          sum(when(col("dx") * col("dy") < 0, 1L).otherwise(0L)).as("d"),
          sum(when(col("dx") === 0 && col("dy") =!= 0, 1L).otherwise(0L)).as("tx"),
          sum(when(col("dy") === 0 && col("dx") =!= 0, 1L).otherwise(0L)).as("ty"))
        .select(col("l_returnflag"), col("n_pairs"),
          col("c").as("concordant"), col("d").as("discordant"),
          round((col("c") - col("d")).cast("double") /
            nullif(sqrt((col("c") + col("d") + col("ty")).cast("double") *
              (col("c") + col("d") + col("tx")).cast("double")), lit(0.0)), 6)
            .as("tau_b"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      |WITH daily AS (
      |  SELECT l_returnflag, l_shipdate::DATE AS day,
      |         CAST(SUM(CAST(l_quantity AS DECIMAL(12,0))) AS BIGINT) AS x,
      |         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) * 100 AS BIGINT) AS y
      |  FROM lineitem GROUP BY 1, 2
      |), pairs AS (
      |  SELECT a.l_returnflag, b.x - a.x AS dx, b.y - a.y AS dy
      |  FROM daily a JOIN daily b
      |    ON a.l_returnflag = b.l_returnflag AND a.day < b.day
      |), cls AS (
      |  SELECT l_returnflag, count(*) AS n_pairs,
      |         SUM(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END)::BIGINT AS c,
      |         SUM(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END)::BIGINT AS d,
      |         SUM(CASE WHEN dx = 0 AND dy <> 0 THEN 1 ELSE 0 END)::BIGINT AS tx,
      |         SUM(CASE WHEN dy = 0 AND dx <> 0 THEN 1 ELSE 0 END)::BIGINT AS ty
      |  FROM pairs GROUP BY 1
      |)
      |SELECT l_returnflag, n_pairs, c AS concordant, d AS discordant,
      |       round((c - d)::DOUBLE /
      |             nullif(sqrt((c + d + ty)::DOUBLE * (c + d + tx)::DOUBLE), 0.0), 6)
      |         AS tau_b
      |FROM cls ORDER BY l_returnflag
      """.stripMargin.trim))

  /** Poisson(1) inverse-CDF cutpoints on the 48-bit hash grid:
    * `floor(P(X ≤ k) · 2⁴⁸)` for k = 0..8 (λ=1; draws are capped at 9,
    * beyond the 1-in-10⁶ tail). The bootstrap weight is the first k
    * whose cutpoint exceeds the row's 48-bit hash — pure integer
    * comparisons, zero float ops in the draw.
    */
  private[graft] val poissonCuts: Seq[Long] = Seq(
    103548857136060L, 207097714272121L, 258872142840152L, 276130285696162L,
    280444821410164L, 281307728552965L, 281451546410098L, 281472091818260L,
    281474659994280L)

  private val poissonBootstrap = QueryDef(
    "stat_poisson_bootstrap",
    "Poisson bootstrap confidence interval for mean order value — the " +
      "bootstrap that actually runs at 100 TB (Chamandy et al. 2012, " +
      "'Estimating uncertainty for massive data streams'): instead of " +
      "resampling n rows with replacement (which needs global " +
      "coordination), every (row, replicate) pair draws an independent " +
      "Poisson(1) weight, here deterministically from the portable " +
      "48-bit hash of (replicate, orderkey) via integer inverse-CDF " +
      "cutpoints — the draw is exact integer comparisons, " +
      "reproducible across engines, executors and retries. B=100 " +
      "replicates: the explode inflates scan-side compute only — the " +
      "per-replicate sufficient statistics combine map-side, so the " +
      "shuffle carries B rows per partition, not B×n. The hash is " +
      "computed ONCE per row (md5 is the per-pair dominant cost — " +
      "measured 5× on the whole query): the digest's two 48-bit " +
      "halves (h1, h2) seed an affine per-replicate stream u_r = " +
      "(h1 + r·h2) mod 2⁴⁸ — exact BIGINT arithmetic in both engines " +
      "(r·h2 ≤ 100·2⁴⁸ < 2⁶³, no overflow), row-independent by the " +
      "hash, replicate-decorrelated by the multiplier. CI = 2.5th/" +
      "97.5th percentile replicate means (ranks 3 and 98 of 100, " +
      "ties → replicate id); replicate means are single divisions of " +
      "exact BIGINT sums.",
    (s, dir) => {
      val B = 100
      val o = Tables.orders(s, dir).select(col("o_orderkey"),
        (col("o_totalprice").cast(Queries.Money.price) * 100)
          .cast("long").as("cents"))
      val digest = md5(concat(lit("boot:"), col("o_orderkey").cast("string")))
      val h1 = conv(substring(digest, 1, 12), 16, 10).cast("long")
      val h2 = conv(substring(digest, 13, 12), 16, 10).cast("long")
      // first k whose cutpoint exceeds u48, else 9
      val wExpr = poissonCuts.zipWithIndex.reverse
        .foldLeft(lit(9L)) { case (els, (c, k)) =>
          when(col("u48") < lit(c), lit(k.toLong)).otherwise(els)
        }
      val means = o
        .withColumn("h1", h1).withColumn("h2", h2)
        .select(col("o_orderkey"), col("cents"), col("h1"), col("h2"),
          explode(sequence(lit(1), lit(B))).as("r"))
        .withColumn("u48",
          (col("h1") + col("r") * col("h2")) % lit(281474976710656L))
        .withColumn("w", wExpr)
        .groupBy(col("r"))
        .agg(sum(col("w") * col("cents")).as("swc"), sum(col("w")).as("sw"))
        .select(col("r"),
          round(col("swc").cast("double") / col("sw").cast("double"), 6)
            .as("bmean"))
      val ranked = means.withColumn("rn",
        row_number().over(Window.orderBy(col("bmean"), col("r"))))
      val ci = ranked.agg(count(lit(1)).as("n_boot"),
        max(when(col("rn") === 3, col("bmean"))).as("ci_lo"),
        max(when(col("rn") === 98, col("bmean"))).as("ci_hi"))
      val est = o.agg(
        round(sum(col("cents")).cast("double") / count(lit(1)).cast("double"), 6)
          .as("est_mean"))
      ci.crossJoin(broadcast(est))
        .select(col("n_boot"), col("est_mean"), col("ci_lo"), col("ci_hi"))
    },
    Some {
      val caseW = poissonCuts.zipWithIndex
        .map { case (c, k) => s"WHEN u48 < $c THEN $k" }
        .mkString("CASE ", " ", " ELSE 9 END")
      s"""
      |WITH o AS (
      |  SELECT o_orderkey,
      |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |  FROM orders
      |), seeded AS (
      |  SELECT o_orderkey, cents,
      |         ('0x' || substring(md5('boot:' || o_orderkey), 1, 12))::BIGINT AS h1,
      |         ('0x' || substring(md5('boot:' || o_orderkey), 13, 12))::BIGINT AS h2
      |  FROM o
      |), h AS (
      |  SELECT r, cents, (h1 + r * h2) % 281474976710656 AS u48
      |  FROM (SELECT o_orderkey, cents, h1, h2, unnest(range(1, 101)) AS r FROM seeded)
      |), wt AS (
      |  SELECT r, cents, $caseW AS w FROM h
      |), means AS (
      |  SELECT r,
      |         round(CAST(SUM(w * cents) AS DOUBLE) / CAST(SUM(w) AS DOUBLE), 6) AS bmean
      |  FROM wt GROUP BY r
      |), ranked AS (
      |  SELECT r, bmean, row_number() OVER (ORDER BY bmean, r) AS rn FROM means
      |), ci AS (
      |  SELECT count(*) AS n_boot,
      |         MAX(CASE WHEN rn = 3 THEN bmean END) AS ci_lo,
      |         MAX(CASE WHEN rn = 98 THEN bmean END) AS ci_hi
      |  FROM ranked
      |), est AS (
      |  SELECT round(CAST(SUM(cents)::BIGINT AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS est_mean
      |  FROM o
      |)
      |SELECT n_boot, est_mean, ci_lo, ci_hi FROM ci CROSS JOIN est
      """.stripMargin.trim
    })

  private val bootstrapAccCi = QueryDef(
    "ml_bootstrap_acc_ci",
    "Bootstrap confidence interval on CLASSIFIER ACCURACY — the error " +
      "bar every eval table should carry before anyone compares two " +
      "models on a point estimate (ml_mcnemar asks if a difference is " +
      "significant; this asks how uncertain each number is by " +
      "itself): the per-source majority detector's per-test-doc " +
      "correctness resamples through the same deterministic Poisson " +
      "bootstrap as stat_poisson_bootstrap (B=100 md5-affine weight " +
      "streams, Poisson(1) inverse-CDF cutpoints, ONE md5 per row), " +
      "and the 2.5th/97.5th percentile replicate accuracies (ranks " +
      "3/98, ties → replicate id) become the CI beside the point " +
      "estimate. Replicate accuracies are single divisions of exact " +
      "BIGINT weighted sums; map-side combine ships B rows per " +
      "partition regardless of test-set size.",
    (s, dir) => {
      val B = 100
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), (col("lang") === "en").as("is_en"))
      val train = docs.filter(col("doc_id") % 3 =!= 0)
      val maj = train.groupBy(col("source"))
        .agg((lit(2L) * sum(when(col("is_en"), 1L).otherwise(0L)) >
          count(lit(1))).as("pred"))
      val test = docs.filter(col("doc_id") % 3 === 0)
        .join(broadcast(maj), Seq("source"))
        .select(col("doc_id"),
          when(col("pred") === col("is_en"), 1L).otherwise(0L).as("ok"))
      val digest = md5(concat(lit("bacc:"), col("doc_id").cast("string")))
      val h1 = conv(substring(digest, 1, 12), 16, 10).cast("long")
      val h2 = conv(substring(digest, 13, 12), 16, 10).cast("long")
      val wExpr = poissonCuts.zipWithIndex.reverse
        .foldLeft(lit(9L)) { case (els, (c, k)) =>
          when(col("u48") < lit(c), lit(k.toLong)).otherwise(els)
        }
      val reps = test
        .withColumn("h1", h1).withColumn("h2", h2)
        .select(col("ok"), col("h1"), col("h2"),
          explode(sequence(lit(1), lit(B))).as("r"))
        .withColumn("u48",
          (col("h1") + col("r") * col("h2")) % lit(281474976710656L))
        .withColumn("w", wExpr)
        .groupBy(col("r"))
        .agg(sum(col("w") * col("ok")).as("swo"), sum(col("w")).as("sw"))
        .select(col("r"),
          round(col("swo").cast("double") / col("sw").cast("double"), 6).as("bacc"))
      val ranked = reps.withColumn("rn",
        row_number().over(Window.orderBy(col("bacc"), col("r"))))
      val ci = ranked.agg(count(lit(1)).as("n_boot"),
        max(when(col("rn") === 3, col("bacc"))).as("ci_lo"),
        max(when(col("rn") === 98, col("bacc"))).as("ci_hi"))
      val pt = test.agg(count(lit(1)).as("n_test"),
        round(sum(col("ok")).cast("double") / count(lit(1)).cast("double"), 6)
          .as("acc_point"))
      pt.crossJoin(broadcast(ci))
        .select(col("n_test"), col("n_boot"), col("acc_point"),
          col("ci_lo"), col("ci_hi"))
    },
    Some {
      val caseW = poissonCuts.zipWithIndex
        .map { case (c, k) => s"WHEN u48 < $c THEN $k" }
        .mkString("CASE ", " ", " ELSE 9 END")
      s"""
      |WITH docs AS (
      |  SELECT doc_id, source, lang = 'en' AS is_en FROM documents
      |), maj AS (
      |  SELECT source,
      |         2 * SUM(CASE WHEN is_en THEN 1 ELSE 0 END) > count(*) AS pred
      |  FROM docs WHERE doc_id % 3 != 0 GROUP BY 1
      |), te AS (
      |  SELECT d.doc_id,
      |         CASE WHEN m.pred = d.is_en THEN 1 ELSE 0 END AS ok
      |  FROM docs d JOIN maj m USING (source) WHERE d.doc_id % 3 = 0
      |), seeded AS (
      |  SELECT doc_id, ok,
      |         ('0x' || substring(md5('bacc:' || doc_id), 1, 12))::BIGINT AS h1,
      |         ('0x' || substring(md5('bacc:' || doc_id), 13, 12))::BIGINT AS h2
      |  FROM te
      |), h AS (
      |  SELECT r, ok, (h1 + r * h2) % 281474976710656 AS u48
      |  FROM (SELECT doc_id, ok, h1, h2, unnest(range(1, 101)) AS r FROM seeded)
      |), wt AS (
      |  SELECT r, ok, $caseW AS w FROM h
      |), reps AS (
      |  SELECT r,
      |         round(CAST(SUM(w * ok) AS DOUBLE) / CAST(SUM(w) AS DOUBLE), 6) AS bacc
      |  FROM wt GROUP BY r
      |), ranked AS (
      |  SELECT r, bacc, row_number() OVER (ORDER BY bacc, r) AS rn FROM reps
      |), ci AS (
      |  SELECT count(*)::BIGINT AS n_boot,
      |         MAX(CASE WHEN rn = 3 THEN bacc END) AS ci_lo,
      |         MAX(CASE WHEN rn = 98 THEN bacc END) AS ci_hi
      |  FROM ranked
      |), pt AS (
      |  SELECT count(*)::BIGINT AS n_test,
      |         round(CAST(SUM(ok)::BIGINT AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
      |           AS acc_point
      |  FROM te
      |)
      |SELECT n_test, n_boot, acc_point, ci_lo, ci_hi FROM pt CROSS JOIN ci
      """.stripMargin.trim
    })

  /** Peel rounds both engines run: the Spark loop breaks early once the
    * edge count stops changing (each further round is a no-op on a
    * fixpoint), the oracle unrolls exactly this many CTE steps — so the
    * two results are STRUCTURALLY equal whether or not the graph
    * converges within the bound.
    */
  /** Supported co-purchase graph shared by `graph_kcore`,
    * `graph_label_propagation` and `graph_sssp_weighted` (single-builder
    * rule — a parity fix to one can never strand the others): undirected
    * part pairs sharing ≥ `support` orders, carrying the co-purchase
    * multiplicity `n_co`. One distinct basket projection, one
    * within-order self-join (bounded by Σ basket² per order, the
    * market-basket shape every co-occurrence query here uses), one
    * count rollup. The result is MEMOIZED as a per-(fixture, support,
    * JVM) parquet table (the TmpStores contract that bought modularity
    * 3.3× on the LPA labels): six registered queries consume this
    * relation (k-core, LPA, link prediction, SSSP, modularity,
    * Louvain refine) and before the memo each re-paid the same
    * lineitem-sized self-join. The build is deterministic (distinct +
    * count of a deterministic scan), so the memo is invisible to the
    * hash gate; readers get a flat materialized lineage for free, so
    * iterative consumers no longer need an initial localCheckpoint.
    * At 100 TB this is the materialize-the-graph-once pattern a
    * pipeline would use anyway — the edge table is the artifact, not
    * the query.
    */
  private[graft] def coPurchaseEdges(s: SparkSession, dir: String, support: Int) = {
    val table = TmpStores.memoizedTable("graft_copurchase", s"$dir#$support") { root =>
      val basket = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("item"))
        .distinct()
      val path = s"$root/edges"
      basket.select(col("ok"), col("item").as("a"))
        .join(basket.select(col("ok"), col("item").as("b")), Seq("ok"))
        .filter(col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_co"))
        .filter(col("n_co") >= support)
        .select(col("a").as("src"), col("b").as("dst"), col("n_co"))
        .write.parquet(path)
      path
    }
    s.read.parquet(table)
  }

  /** SQL twin of [[coPurchaseEdges]]: `basket` + `e0(src, dst, n_co)`
    * CTEs (e0 MATERIALIZED — inlined, each self-reference would re-run
    * the lineitem-sized join; the triangle-count lesson).
    */
  private def coPurchaseSql(support: Int): String =
    s"""basket AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem
       |), e0 AS MATERIALIZED (
       |  SELECT src, dst, n_co FROM (
       |    SELECT a.item AS src, b.item AS dst, count(*) AS n_co
       |    FROM basket a JOIN basket b ON a.ok = b.ok AND a.item < b.item
       |    GROUP BY 1, 2
       |  ) WHERE n_co >= $support
       |)""".stripMargin

  private val KcorePeels = 16
  private val KcoreK = 3
  private val KcoreSupport = 2

  private val kcore = QueryDef(
    "graph_kcore",
    s"k-core decomposition (k=$KcoreK, Seidman 1983) of the REPEATED " +
      s"co-purchase graph (part pairs sharing ≥ $KcoreSupport orders " +
      "— the support threshold is what makes the graph heterogeneous " +
      "enough to have a core structure at all; the raw co-purchase " +
      "graph is near-regular with min degree 38–49, where any k is " +
      "either a no-op or a total collapse — the percolation-threshold " +
      "behavior of k-cores, probed on the fixtures and stated here " +
      "rather than hidden): iteratively peel nodes of degree < k " +
      "until fixpoint; what remains is the maximal subgraph of " +
      "minimum degree k, the community-core / influence primitive " +
      "beside PageRank, BFS, triangles and assortativity. At the " +
      "driver-gate SF the peel runs 11 cascade rounds to a 935-node " +
      s"core. Spark runs ≤ $KcorePeels rounds (degree rollup + two " +
      "membership semi-joins per round, the edge set " +
      "localCheckpointed so lineage stays flat and later rounds work " +
      "the SHRUNKEN relation), breaking early at fixpoint; the " +
      s"oracle unrolls the same $KcorePeels rounds as MATERIALIZED " +
      "CTEs (inlined, each e_i would re-run exponentially — the " +
      "triangle-count lesson), result-identical because peeling is " +
      "monotone and idempotent past convergence. Exact integers " +
      "end-to-end; no floats in any comparison.",
    (s, dir) => {
      def degrees(e: org.apache.spark.sql.DataFrame) =
        e.select(col("src").as("v")).unionAll(e.select(col("dst").as("v")))
          .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      var edges = coPurchaseEdges(s, dir, KcoreSupport)
        .select(col("src"), col("dst"))
        .localCheckpoint()
      var n = edges.count()
      var done = n == 0L
      var round = 0
      while (!done && round < KcorePeels) {
        round += 1
        val keep = degrees(edges).filter(col("deg") >= KcoreK).select(col("v"))
        edges = edges
          .join(keep.select(col("v").as("src")), Seq("src"), "left_semi")
          .join(keep.select(col("v").as("dst")), Seq("dst"), "left_semi")
          .select(col("src"), col("dst"))
          .localCheckpoint()
        val n2 = edges.count()
        done = n2 == n
        n = n2
      }
      degrees(edges)
        .select(col("v").as("part_id"), col("deg").as("core_deg"))
        .orderBy(col("part_id"))
    },
    Some {
      val steps = (1 to KcorePeels).map { i =>
        val p = i - 1
        s"""|d$i AS MATERIALIZED (
            |  SELECT v, count(*) AS deg FROM (
            |    SELECT src AS v FROM e$p UNION ALL SELECT dst FROM e$p
            |  ) GROUP BY 1
            |), k$i AS MATERIALIZED (
            |  SELECT v FROM d$i WHERE deg >= $KcoreK
            |),
            |e$i AS MATERIALIZED (
            |  SELECT src, dst FROM e$p
            |  WHERE src IN (SELECT v FROM k$i) AND dst IN (SELECT v FROM k$i)
            |)""".stripMargin
      }.mkString(",\n")
      s"""
      |WITH ${coPurchaseSql(KcoreSupport)},
      |$steps
      |SELECT v AS part_id, count(*) AS core_deg FROM (
      |  SELECT src AS v FROM e$KcorePeels UNION ALL SELECT dst FROM e$KcorePeels
      |) GROUP BY 1 ORDER BY part_id
      """.stripMargin.trim
    })

  /** The undirected LPA adjacency, cached pre-partitioned: the
    * adjacency is the BIG static relation every round joins on `nbr`,
    * so it is hash-partitioned by that key and CACHED — InMemoryRelation
    * preserves the repartition's outputPartitioning (localCheckpoint's
    * LogicalRDD does NOT, measured: every round re-exchanged the edge
    * relation), so each round's join re-shuffles only the node-sized
    * label relation, never the edge relation (locked by PlanShapeSpec).
    * The resident partitioned adjacency is the same pay-the-shuffle-once
    * pattern as Nsw's resident graph store.
    */
  private[graft] def lpaAdjacency(edges: DataFrame): DataFrame =
    edges.select(col("src").as("v"), col("dst").as("nbr"))
      .unionAll(edges.select(col("dst").as("v"), col("src").as("nbr")))
      .repartition(col("nbr"))
      .cache()

  /** One synchronous LPA round — factored so PlanShapeSpec asserts the
    * production per-round plan: the checkpointed adjacency (already
    * hash-partitioned on `nbr`) joins WITHOUT re-shuffling; the only
    * exchanges are the node-sized label relation onto `nbr`, the
    * (v, lbl) count rollup (map-side-combining), and the argmax window
    * on `v`.
    */
  private[graft] def lpaRound(adj: DataFrame, labels: DataFrame, i: Int): DataFrame = {
    val tie = graft.operators.TextAnalysis.md5Long48(
      concat(col("lbl").cast("string"), lit(s"#$i")))
    val w = Window.partitionBy(col("v"))
      .orderBy(col("cnt").desc, tie, col("lbl"))
    adj
      .join(labels.select(col("v").as("nbr"), col("lbl")), Seq("nbr"))
      .groupBy(col("v"), col("lbl")).agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("v"), col("lbl"))
  }

  /** The full LPA run shared by graph_label_propagation and
    * graph_modularity: cached pre-partitioned adjacency, [[LpaRounds]]
    * synchronous rounds, final (v, lbl) memoized as a parquet table per
    * (fixture, JVM) — the iteration is deterministic, so whichever of
    * the two consumers runs first pays the rounds and the other reads
    * the table (the TmpStores contract: fixtures must not be
    * regenerated under the same path mid-session).
    */
  private[graft] def lpaFinalLabels(s: SparkSession, dir: String): DataFrame = {
    val table = TmpStores.memoizedTable("graft_lpa_labels", dir) { root =>
      val edges = coPurchaseEdges(s, dir, LpaSupport)
        .select(col("src"), col("dst"))
      val adj = lpaAdjacency(edges)
      var labels = adj.select(col("v")).distinct()
        .withColumn("lbl", col("v")).localCheckpoint()
      for (i <- 1 to LpaRounds)
        labels = lpaRound(adj, labels, i).localCheckpoint()
      // rounds are done (eager checkpoints): release the resident adjacency
      adj.unpersist()
      val path = s"$root/labels"
      labels.write.parquet(path)
      path
    }
    s.read.parquet(table)
  }

  /** The LPA WITH-chain (co-purchase edges e0 → adj → l0 → l1..lR) as
    * oracle SQL — shared verbatim by the LPA and modularity oracles.
    */
  private lazy val lpaStepsSql: String = {
    val steps = (1 to LpaRounds).map { i =>
      val p = i - 1
      s"""|l$i AS MATERIALIZED (
          |  SELECT v, lbl FROM (
          |    SELECT v, lbl,
          |           row_number() OVER (PARTITION BY v ORDER BY cnt DESC,
          |             ('0x' || substring(md5(CAST(lbl AS VARCHAR) || '#$i'), 1, 12))::BIGINT,
          |             lbl) AS rn
          |    FROM (
          |      SELECT a.v, l.lbl, count(*) AS cnt
          |      FROM adj a JOIN l$p l ON l.v = a.nbr
          |      GROUP BY 1, 2
          |    )
          |  ) WHERE rn = 1
          |)""".stripMargin
    }.mkString(",\n")
    s"""|${coPurchaseSql(LpaSupport)},
        |adj AS MATERIALIZED (
        |  SELECT src AS v, dst AS nbr FROM e0
        |  UNION ALL SELECT dst, src FROM e0
        |), l0 AS MATERIALIZED (
        |  SELECT DISTINCT v, v AS lbl FROM adj
        |),
        |$steps""".stripMargin
  }

  /** Fixed synchronous rounds for label propagation. No early exit on
    * either engine: synchronous LPA can 2-cycle on near-bipartite
    * structure and never reach a fixpoint, so "run exactly R rounds" is
    * the only definition both engines can state identically (GraphFrames'
    * LPA makes the same maxIter-only choice for the same reason).
    */
  private val LpaRounds = 8
  private val LpaSupport = 2

  private val labelPropagation = QueryDef(
    "graph_label_propagation",
    s"Community detection via synchronous label propagation (Raghavan " +
      s"et al. 2007) on the shared supported co-purchase graph " +
      s"(support ≥ $LpaSupport): every node starts as its own label; " +
      s"each of exactly $LpaRounds synchronous rounds relabels every " +
      "node to its neighbors' plurality label, ties broken by a " +
      "round-salted md5-48 of the label (then label asc) — the " +
      "deterministic stand-in for the randomized tie-break of the " +
      "paper. Plain min-label ties are NOT a faithful substitute: the " +
      "smallest label systematically wins every tie and floods " +
      "(measured on the gate fixture: 206 communities with a " +
      "205-node giant vs 361 communities, giant 61, under the salted " +
      "hash — the latter matches randomized LPA's modular structure " +
      "while staying hash-comparable cross-engine). No early exit: " +
      "synchronous LPA can oscillate on near-bipartite regions, so a " +
      "fixed round count is the only portable definition — the same " +
      "maxIter-only contract GraphFrames ships. Each round is " +
      "one edge-keyed join (labels onto the static checkpointed " +
      "adjacency) + one (node, label) count rollup + a per-node argmax " +
      "window partitioned by the rollup's own key — no extra exchange; " +
      "O(R) passes over an edge relation that never grows, the same " +
      "scale shape as the k-core peel. Exact integers end-to-end. The " +
      s"oracle unrolls the same $LpaRounds rounds as MATERIALIZED " +
      "CTEs. Output: per-community size + part-id extrema.",
    (s, dir) => {
      val labels = lpaFinalLabels(s, dir)
      labels.groupBy(col("lbl"))
        .agg(count(lit(1)).as("n_nodes"),
          min(col("v")).as("min_part"), max(col("v")).as("max_part"))
        .select(col("lbl").as("community"), col("n_nodes"),
          col("min_part"), col("max_part"))
        .orderBy(col("n_nodes").desc, col("community"))
    },
    Some {
      s"""
      |WITH $lpaStepsSql
      |SELECT lbl AS community, count(*) AS n_nodes,
      |       min(v) AS min_part, max(v) AS max_part
      |FROM l$LpaRounds GROUP BY 1
      |ORDER BY n_nodes DESC, community
      """.stripMargin.trim
    })

  private val modularity = QueryDef(
    "graph_modularity",
    "Newman modularity of the LPA partition — the community-QUALITY " +
      "readout graph_label_propagation's size table doesn't give: " +
      "Q = Σ_i (e_ii/m − (a_i/2m)²), how much denser inside the found " +
      "communities than a degree-preserving random graph (Q ≈ 0 means " +
      "the 'communities' are noise; the metric a pipeline checks " +
      "BEFORE acting on a clustering). Runs the SAME deterministic " +
      s"$LpaRounds-round salted-tie LPA (shared code + shared oracle " +
      "CTE chain), then EXACT integer arithmetic end-to-end: " +
      "Q·4m² = Σ(4m·e_ii − a_i²) accumulates in DECIMAL(38,0) " +
      "(HUGEINT), and Q is one ·10⁶ FLOOR integer division, made " +
      "engine-portable by an offset shift: Spark `div` truncates " +
      "toward zero while DuckDB `//` floors, which DIVERGE on a " +
      "negative numerator, so both engines add 10⁶·4m² (one whole " +
      "unit of Q, and Q ≥ −1 always) before dividing and subtract " +
      "10⁶ after — the numerator is then provably positive, where " +
      "truncation IS floor and the (possibly negative) Q is " +
      "bit-stable with no rounding anywhere (the dq_k_anonymity " +
      "offset-shift discipline). Cost beyond the LPA " +
      "run: two label joins onto the edge relation + O(|communities|) " +
      "rollups.",
    (s, dir) => {
      val labels = lpaFinalLabels(s, dir)
      val e0 = coPurchaseEdges(s, dir, LpaSupport)
        .select(col("src"), col("dst")).localCheckpoint()
      val em = e0
        .join(labels.select(col("v").as("src"), col("lbl").as("ca")), Seq("src"))
        .join(labels.select(col("v").as("dst"), col("lbl").as("cb")), Seq("dst"))
      val m = e0.agg(count(lit(1)).as("m"))
      val eii = em.filter(col("ca") === col("cb"))
        .groupBy(col("ca").as("c")).agg(count(lit(1)).as("e_in"))
      val degs = e0.select(col("src").as("v"))
        .unionAll(e0.select(col("dst").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      val ai = degs.join(labels, Seq("v"))
        .groupBy(col("lbl").as("c")).agg(sum(col("deg")).as("a"))
      val parts = ai.join(eii, Seq("c"), "left")
        .select(col("c"), coalesce(col("e_in"), lit(0L)).as("e_in"), col("a"))
        .crossJoin(broadcast(m))
      parts
        .agg(count(lit(1)).as("n_communities"),
          first(col("m")).as("m_edges"),
          sum(expr("CAST(4 AS DECIMAL(38,0)) * m * e_in - CAST(a AS DECIMAL(38,0)) * a"))
            .as("q_scaled"))
        .select(col("n_communities"), col("m_edges"),
          // offset shift: + 10⁶·4m² before the div, − 10⁶ after, so the
          // numerator is positive and truncate-toward-zero ≡ floor —
          // Spark div and DuckDB // agree for any sign of Q
          ((expr("CAST((CAST(q_scaled AS DECIMAL(38,0)) * 1000000 + " +
            "CAST(4 AS DECIMAL(38,0)) * m_edges * m_edges * 1000000) div " +
            "(CAST(4 AS DECIMAL(38,0)) * m_edges * m_edges) AS BIGINT)")
            .cast("double") - lit(1000000.0)) / lit(1000000.0)).as("modularity"))
    },
    Some {
      s"""
      |WITH $lpaStepsSql,
      |lab AS MATERIALIZED (SELECT v, lbl FROM l$LpaRounds),
      |em AS (
      |  SELECT la.lbl AS ca, lb.lbl AS cb
      |  FROM e0 JOIN lab la ON la.v = e0.src JOIN lab lb ON lb.v = e0.dst
      |), mm AS (SELECT count(*)::BIGINT AS m FROM e0),
      |eii AS (
      |  SELECT ca AS c, count(*)::BIGINT AS e_in FROM em WHERE ca = cb GROUP BY 1
      |), degs AS (
      |  SELECT v, count(*)::BIGINT AS deg FROM (
      |    SELECT src AS v FROM e0 UNION ALL SELECT dst FROM e0
      |  ) GROUP BY 1
      |), ai AS (
      |  SELECT lab.lbl AS c, SUM(degs.deg)::BIGINT AS a
      |  FROM degs JOIN lab ON lab.v = degs.v GROUP BY 1
      |), parts AS (
      |  SELECT ai.c, COALESCE(eii.e_in, 0)::BIGINT AS e_in, ai.a, mm.m
      |  FROM ai LEFT JOIN eii ON eii.c = ai.c CROSS JOIN mm
      |), q AS (
      |  SELECT count(*)::BIGINT AS n_communities, any_value(m)::BIGINT AS m_edges,
      |         SUM(4::HUGEINT * m * e_in - a::HUGEINT * a) AS q_scaled
      |  FROM parts
      |)
      |SELECT n_communities, m_edges,
      |       (((q_scaled * 1000000 + 4::HUGEINT * m_edges * m_edges * 1000000)
      |           // (4::HUGEINT * m_edges * m_edges))::BIGINT::DOUBLE - 1000000.0)
      |         / 1000000.0 AS modularity
      |FROM q
      """.stripMargin.trim
    })

  /** Greedy node-move passes for the Louvain refinement. */
  private val LouvainPasses = 4

  /** One Louvain pass as oracle CTEs: community degree sums a_p, per-node
    * neighbor-community edge counts kvc_p, the exact-integer gain
    * ΔQ·4m² = 4m(k_vB − k_vA) − 2d_v(a_B − a_A + d_v) for every
    * (node, neighbor community) candidate, the single best positive-gain
    * move (gain desc, node asc, target asc — a total order on exact
    * integers), the label update, and the running q chain.
    */
  private def lvPass(p: Int): String = s""",
    |a$p AS MATERIALIZED (
    |  SELECT l.lbl AS c, SUM(d.deg)::BIGINT AS a
    |  FROM deg d JOIN lp$p l ON l.v = d.v GROUP BY 1
    |), kvc$p AS MATERIALIZED (
    |  SELECT adj.v, l.lbl AS c, count(*)::BIGINT AS k
    |  FROM adj JOIN lp$p l ON l.v = adj.nbr GROUP BY 1, 2
    |), best$p AS MATERIALIZED (
    |  SELECT v, from_c, to_c, gain FROM (
    |    SELECT s.v, s.lbl AS from_c, k.c AS to_c,
    |           4::BIGINT * mm.m * (k.k - COALESCE(ka.k, 0)) -
    |           2::BIGINT * d.deg * (ab.a - aa.a + d.deg) AS gain
    |    FROM kvc$p k
    |    JOIN lp$p s ON s.v = k.v AND k.c <> s.lbl
    |    LEFT JOIN kvc$p ka ON ka.v = k.v AND ka.c = s.lbl
    |    JOIN deg d ON d.v = k.v
    |    JOIN a$p ab ON ab.c = k.c
    |    JOIN a$p aa ON aa.c = s.lbl
    |    CROSS JOIN mm
    |  ) WHERE gain > 0 ORDER BY gain DESC, v, to_c LIMIT 1
    |), lp${p + 1} AS MATERIALIZED (
    |  SELECT l.v, CASE WHEN l.v = (SELECT v FROM best$p)
    |              THEN (SELECT to_c FROM best$p) ELSE l.lbl END AS lbl
    |  FROM lp$p l
    |), q${p + 1} AS (
    |  SELECT (SELECT q FROM q$p) + COALESCE((SELECT gain FROM best$p), 0)::HUGEINT AS q
    |)""".stripMargin

  private val louvainRefine = QueryDef(
    "graph_louvain_refine",
    "One level of Louvain refinement (Blondel et al. 2008 phase 1, " +
      s"greedy variant) over the LPA partition: $LouvainPasses " +
      "single-best node-move passes, each relocating THE highest-gain " +
      "node to a neighboring community — applied only when the exact " +
      "integer gain ΔQ·4m² = 4m(k_vB − k_vA) − 2d_v(a_B − a_A + d_v) " +
      "is strictly positive, so modularity PROVABLY increases every " +
      "pass (the property synchronous all-node moves cannot give: " +
      "simultaneous moves interact through shared community degrees " +
      "and can decrease Q). Same graph, labels and Q·4m² integer " +
      "channel as graph_modularity (shared LPA memo + co-purchase " +
      "memo); candidate generation is one edges⋈labels rollup per " +
      "pass — the (node, neighbor-community) relation, never |V|·|C|. " +
      "The argmax is a total order on exact BIGINTs (gain desc, node, " +
      "target), the single-row move is bounded driver state by " +
      "construction, and the running modularity after each move is " +
      "the same offset-shifted floor division as graph_modularity. " +
      "The oracle unrolls the identical passes as MATERIALIZED CTEs. " +
      "Output: one row per APPLIED move (pass, node, from, to, " +
      "gain·4m², Q after).",
    (s, dir) => {
      import s.implicits._
      val e0 = coPurchaseEdges(s, dir, LpaSupport)
        .select(col("src"), col("dst"))
      val adj = e0.select(col("src").as("v"), col("dst").as("nbr"))
        .unionAll(e0.select(col("dst").as("v"), col("src").as("nbr")))
        .localCheckpoint()
      val deg = adj.groupBy(col("v")).agg(count(lit(1)).as("deg"))
        .localCheckpoint()
      val mEdges = e0.count()
      var labels = lpaFinalLabels(s, dir).localCheckpoint()
      // q0·4m² exactly as graph_modularity computes it (one bounded
      // aggregation; DECIMAL(38,0) ≡ HUGEINT)
      val q0 = {
        val eii = e0
          .join(labels.select(col("v").as("src"), col("lbl").as("ca")), Seq("src"))
          .join(labels.select(col("v").as("dst"), col("lbl").as("cb")), Seq("dst"))
          .filter(col("ca") === col("cb"))
          .groupBy(col("ca").as("c")).agg(count(lit(1)).as("e_in"))
        val ai = deg.join(labels, Seq("v"))
          .groupBy(col("lbl").as("c")).agg(sum(col("deg")).as("a"))
        val row = ai.join(eii, Seq("c"), "left")
          .select(coalesce(col("e_in"), lit(0L)).as("e_in"), col("a"))
          .agg(sum(expr(s"CAST(4 AS DECIMAL(38,0)) * ${mEdges}L * e_in - " +
            "CAST(a AS DECIMAL(38,0)) * a")).as("q"))
          .collect()(0)
        BigInt(row.getDecimal(0).toBigInteger)
      }
      val dd = BigInt(4) * BigInt(mEdges) * BigInt(mEdges)
      // offset-shifted floor division (the graph_modularity discipline):
      // positive numerator, where BigInt / ≡ DuckDB // ≡ floor
      def qMicro(q: BigInt): Double =
        ((q * 1000000 + dd * 1000000) / dd - 1000000).toDouble / 1000000.0
      var qc = q0
      val moves = scala.collection.mutable.ListBuffer
        .empty[(Long, Long, Long, Long, Long, Double)]
      var done = false
      for (p <- 1 to LouvainPasses if !done) {
        val ac = labels.join(deg, Seq("v"))
          .groupBy(col("lbl")).agg(sum(col("deg")).as("a"))
        val kvc = adj
          .join(labels.select(col("v").as("nbr"), col("lbl").as("c")), Seq("nbr"))
          .groupBy(col("v"), col("c")).agg(count(lit(1)).as("k"))
        val cand = kvc
          .join(labels.select(col("v"), col("lbl").as("from_c")), Seq("v"))
          .filter(col("c") =!= col("from_c"))
          .join(kvc.select(col("v"), col("c").as("from_c"), col("k").as("k_in")),
            Seq("v", "from_c"), "left")
          .join(deg, Seq("v"))
          .join(ac.select(col("lbl").as("c"), col("a").as("a_to")), Seq("c"))
          .join(ac.select(col("lbl").as("from_c"), col("a").as("a_from")), Seq("from_c"))
          .select(col("v"), col("from_c"), col("c").as("to_c"),
            (lit(4L * mEdges) * (col("k") - coalesce(col("k_in"), lit(0L))) -
              lit(2L) * col("deg") * (col("a_to") - col("a_from") + col("deg")))
              .as("gain"))
        // the single best move: a ONE-row collect, bounded by construction
        val best = cand.filter(col("gain") > 0)
          .orderBy(col("gain").desc, col("v"), col("to_c")).limit(1).collect()
        if (best.isEmpty) done = true
        else {
          val b = best(0)
          val (mv, fc, tc, g) =
            (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
          qc += g
          moves += ((p.toLong, mv, fc, tc, g, qMicro(qc)))
          labels = labels.select(col("v"),
            when(col("v") === mv, lit(tc)).otherwise(col("lbl")).as("lbl"))
            .localCheckpoint()
        }
      }
      moves.toSeq
        .toDF("pass", "moved_node", "from_community", "to_community",
          "gain_scaled", "q_after")
        .orderBy(col("pass"))
    },
    Some {
      val rows = (1 to LouvainPasses).map { p =>
        s"""|  SELECT CAST($p AS BIGINT) AS pass, v AS moved_node,
            |         from_c AS from_community, to_c AS to_community,
            |         gain AS gain_scaled, (SELECT q FROM q$p) AS qq
            |  FROM best${p - 1}""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""
      |WITH $lpaStepsSql,
      |lp0 AS MATERIALIZED (SELECT v, lbl FROM l$LpaRounds),
      |deg AS MATERIALIZED (
      |  SELECT v, count(*)::BIGINT AS deg FROM (
      |    SELECT src AS v FROM e0 UNION ALL SELECT dst FROM e0
      |  ) GROUP BY 1
      |), mm AS (SELECT count(*)::BIGINT AS m FROM e0),
      |q0 AS (
      |  SELECT SUM(4::HUGEINT * m * e_in - a::HUGEINT * a) AS q FROM (
      |    SELECT ai.a, COALESCE(eii.e_in, 0)::BIGINT AS e_in, mm.m FROM (
      |      SELECT l.lbl AS c, SUM(d.deg)::BIGINT AS a
      |      FROM deg d JOIN lp0 l ON l.v = d.v GROUP BY 1
      |    ) ai LEFT JOIN (
      |      SELECT la.lbl AS c, count(*)::BIGINT AS e_in
      |      FROM e0 JOIN lp0 la ON la.v = e0.src JOIN lp0 lb ON lb.v = e0.dst
      |      WHERE la.lbl = lb.lbl GROUP BY 1
      |    ) eii ON eii.c = ai.c CROSS JOIN mm
      |  )
      |)
      """.stripMargin.trim +
      (0 until LouvainPasses).map(lvPass).mkString + s"""
      |SELECT pass, moved_node, from_community, to_community, gain_scaled,
      |       ((qq * 1000000 + 4::HUGEINT * mm.m * mm.m * 1000000)
      |          // (4::HUGEINT * mm.m * mm.m) - 1000000)::BIGINT::DOUBLE
      |         / 1000000.0 AS q_after
      |FROM (
      |$rows
      |) CROSS JOIN mm
      |ORDER BY pass
      """.stripMargin
    })

  /** The weighted undirected SSSP adjacency, cached pre-partitioned —
    * same static-adjacency discipline as [[lpaAdjacency]]: partition
    * the big edge relation by its per-sweep join key `u` ONCE into the
    * cache; every relaxation then moves only the sparse distance
    * relation (exchanged onto `u`, or broadcast outright when the
    * planner sees it is frontier-sized).
    */
  private[graft] def ssspAdjacency(edges: DataFrame): DataFrame =
    edges.select(col("src").as("u"), col("dst").as("v"), col("w"))
      .unionAll(edges.select(col("dst").as("u"), col("src").as("v"), col("w")))
      .repartition(col("u"))
      .cache()

  /** One Bellman-Ford relaxation sweep — factored so PlanShapeSpec
    * asserts the production per-sweep plan: the cached adjacency
    * (hash-partitioned on `u`) never re-shuffles and is never the
    * broadcast build side; only the sparse distance relation moves
    * (broadcast or exchanged onto `u` for the join, exchanged onto `v`
    * for the min rollup).
    */
  private[graft] def ssspRelax(adj: DataFrame, dist: DataFrame): DataFrame = {
    val relax = adj
      .join(dist.select(col("v").as("u"), col("dist")), Seq("u"))
      .select(col("v"), (col("dist") + col("w")).as("dist"))
    dist.unionAll(relax)
      .groupBy(col("v")).agg(min(col("dist")).as("dist"))
  }

  /** Fixed relaxation sweeps for bounded Bellman-Ford: distances are
    * exact over paths of ≤ this many edges; converged iff the weighted
    * diameter fits the bound. Both engines run exactly this many sweeps
    * (relaxation is monotone and idempotent past convergence, so the
    * results are structurally equal whether or not the graph converges
    * within the bound — the k-core argument).
    */
  private val SsspSweeps = 12
  private val SsspSupport = 2

  private val ssspWeighted = QueryDef(
    "graph_sssp_weighted",
    s"Single-source shortest paths (bounded Bellman-Ford, $SsspSweeps " +
      s"sweeps) on the shared supported co-purchase graph: edge weight " +
      "= 1 + 100 div n_co (strong co-purchase ties are short — the " +
      "inverse-affinity distance recommender graphs use), source = the " +
      "maximum-degree node (ties → min id) — the hub choice that lands " +
      "in the giant component; the min-id source sat in a 2-node " +
      "component at sf0.1 and produced a 2-row profile. Each sweep is " +
      "one edge-keyed join of the frontier-so-far onto the static " +
      "checkpointed adjacency + a min rollup on the node key; the " +
      "distance relation " +
      "stays SPARSE (only reached nodes carry rows — at 100 TB an " +
      "unreachable-majority graph costs nothing). Exact integer " +
      "weights and distances end-to-end; the oracle unrolls the same " +
      s"$SsspSweeps sweeps as MATERIALIZED CTEs. Output: the distance " +
      "DISTRIBUTION (per-distance node count + part-id extrema) — " +
      "bounded by the distinct distance values (≤ sweeps × max weight) " +
      "whatever the component size, and never empty (the source's " +
      "dist-0 row always exists; a node-id sample would return zero " +
      "rows whenever the source lands in a small component, as it " +
      "does on this fragmented support-thresholded graph at sf0.1).",
    (s, dir) => {
      val edges = coPurchaseEdges(s, dir, SsspSupport)
        .select(col("src"), col("dst"),
          expr("1 + (100 div n_co)").cast("long").as("w"))
        .localCheckpoint()
      val adj = ssspAdjacency(edges)
      var dist = adj.groupBy(col("u")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("u")).limit(1)
        .select(col("u").as("v"), lit(0L).as("dist"))
        .localCheckpoint()
      for (_ <- 1 to SsspSweeps)
        dist = ssspRelax(adj, dist).localCheckpoint()
      // sweeps are done (eager checkpoints): release the resident adjacency
      adj.unpersist()
      dist.groupBy(col("dist"))
        .agg(count(lit(1)).as("n_nodes"),
          min(col("v")).as("min_part"), max(col("v")).as("max_part"))
        .orderBy(col("dist"))
    },
    Some {
      val steps = (1 to SsspSweeps).map { i =>
        val p = i - 1
        s"""|d$i AS MATERIALIZED (
            |  SELECT v, CAST(min(dist) AS BIGINT) AS dist FROM (
            |    SELECT v, dist FROM d$p
            |    UNION ALL
            |    SELECT a.v, d.dist + a.w FROM adj a JOIN d$p d ON d.v = a.u
            |  ) GROUP BY 1
            |)""".stripMargin
      }.mkString(",\n")
      s"""
      |WITH ${coPurchaseSql(SsspSupport)},
      |ew AS MATERIALIZED (
      |  SELECT src, dst, CAST(1 + (100 // n_co) AS BIGINT) AS w FROM e0
      |), adj AS MATERIALIZED (
      |  SELECT src AS u, dst AS v, w FROM ew
      |  UNION ALL SELECT dst, src, w FROM ew
      |), d0 AS MATERIALIZED (
      |  SELECT u AS v, CAST(0 AS BIGINT) AS dist FROM (
      |    SELECT u, count(*) AS c FROM adj GROUP BY 1
      |    ORDER BY c DESC, u LIMIT 1
      |  )
      |),
      |$steps
      |SELECT dist, count(*) AS n_nodes,
      |       min(v) AS min_part, max(v) AS max_part
      |FROM d$SsspSweeps GROUP BY 1 ORDER BY dist
      """.stripMargin.trim
    })

  private val PprIters = 3
  private val PprSeeds = 3
  private val PprMass = 1000000000000L
  private val PprDamp = 85

  private val pprParts = QueryDef(
    "graph_ppr_parts",
    s"Personalized PageRank (random walk with restart, $PprIters " +
      s"deterministic integer power iterations, damping $PprDamp%) from " +
      s"the top-$PprSeeds weighted-degree hubs of the shared supported " +
      "co-purchase graph — the 'customers who bought these also " +
      "bought' recommendation primitive, complementing global " +
      "graph_pagerank_nations exactly as a query-time recommender " +
      "complements a popularity chart. All teleport mass restarts at " +
      "the seed set, so rank stays EXACTLY 0 outside the seeds' " +
      "reachable neighborhood and the rank relation is effectively " +
      "sparse at 100 TB. Same micro-unit determinism contract as " +
      "PageRank.weighted: BIGINT mass, two-step truncating division, " +
      "order-independent integer sums — bit-identical under any " +
      "partitioning, so the iterative algorithm itself sits under the " +
      "hash gate (oracle unrolls the same iterations). Output: " +
      "top-25 related parts with seed flags.",
    (s, dir) => {
      val edges = coPurchaseEdges(s, dir, LpaSupport)
      val ew = edges.select(col("src"), col("dst"), col("n_co").as("w"))
        .unionAll(edges.select(col("dst").as("src"), col("src").as("dst"),
          col("n_co").as("w")))
        .localCheckpoint()
      val verts = ew.select(col("src").as("id")).distinct()
      val seeds = ew.groupBy(col("src"))
        .agg(sum(col("w").cast("long")).as("totw"))
        .orderBy(col("totw").desc, col("src")).limit(PprSeeds)
        .select(col("src").as("id")).localCheckpoint()
      val ranks = PageRank.personalized(verts, ew, seeds,
        iterations = PprIters, massMicro = PprMass, dampingPct = PprDamp)
      ranks.join(seeds.select(col("id").as("sid")),
          ranks("id") === col("sid"), "left")
        .select(col("id").as("part_id"), col("rank_micro"),
          when(col("sid").isNotNull, 1L).otherwise(0L).as("is_seed"))
        .orderBy(col("rank_micro").desc, col("part_id")).limit(25)
    },
    Some {
      val share = PprMass / PprSeeds
      val teleport = (PprMass * (100 - PprDamp) / 100) / PprSeeds
      val iters = (1 to PprIters).map { i =>
        val p = i - 1
        s"""|r$i AS MATERIALIZED (
            |  SELECT v.id,
            |         (CASE WHEN v.id IN (SELECT sid FROM seeds) THEN CAST($teleport AS BIGINT)
            |               ELSE CAST(0 AS BIGINT) END
            |          + COALESCE(c.inmass, 0))::BIGINT AS r
            |  FROM v LEFT JOIN (
            |    SELECT e.dst,
            |           SUM((((r.r * $PprDamp) // 100) * e.w) // e.totw)::BIGINT AS inmass
            |    FROM ewd e JOIN r$p r ON r.id = e.src
            |    GROUP BY 1
            |  ) c ON c.dst = v.id
            |)""".stripMargin
      }.mkString(",\n")
      s"""
      |WITH ${coPurchaseSql(LpaSupport)},
      |ew AS MATERIALIZED (
      |  SELECT src, dst, n_co AS w FROM e0
      |  UNION ALL SELECT dst, src, n_co FROM e0
      |), deg AS MATERIALIZED (
      |  SELECT src, SUM(w)::BIGINT AS totw FROM ew GROUP BY 1
      |), ewd AS MATERIALIZED (
      |  SELECT ew.src, ew.dst, ew.w, deg.totw FROM ew JOIN deg USING (src)
      |), v AS MATERIALIZED (
      |  SELECT DISTINCT src AS id FROM ew
      |), seeds AS MATERIALIZED (
      |  SELECT src AS sid FROM deg ORDER BY totw DESC, src LIMIT $PprSeeds
      |), r0 AS MATERIALIZED (
      |  SELECT id, CASE WHEN id IN (SELECT sid FROM seeds)
      |                  THEN CAST($share AS BIGINT)
      |                  ELSE CAST(0 AS BIGINT) END AS r
      |  FROM v
      |),
      |$iters
      |SELECT id AS part_id, r AS rank_micro,
      |       CASE WHEN id IN (SELECT sid FROM seeds) THEN CAST(1 AS BIGINT)
      |            ELSE CAST(0 AS BIGINT) END AS is_seed
      |FROM r$PprIters
      |ORDER BY rank_micro DESC, part_id LIMIT 25
      """.stripMargin.trim
    })

  /** Top order statistics used by the Hill estimator (k largest plus
    * the k+1-st as the threshold).
    */
  private val HillK = 100

  private val hillTail = QueryDef(
    "stat_hill_tail",
    s"Heavy-tail index of the order-value distribution via the Hill " +
      s"estimator (Hill 1975) on the top $HillK order statistics: " +
      s"γ̂ = mean ln(x_(i)/x_(k+1)) over the k largest values, " +
      "α̂ = 1/γ̂ — the tail-exponent diagnostic (Zipf/Pareto health " +
      "check) that complements stat_gini's whole-distribution " +
      "concentration and dq_benford_prices' digit law. The ONLY " +
      "corpus-sized step is one TakeOrderedAndProject of the top " +
      "k+1 (cents desc, orderkey) — order statistics, not a sort; " +
      "the estimator itself is k-row arithmetic. Values are exact " +
      "cents; each ln ratio rounds at 6 and the mean accumulates in " +
      "DECIMAL(38,6). Output: the top-10 tail sample with γ̂/α̂ " +
      "broadcast alongside.",
    (s, dir) => {
      val cents = Tables.orders(s, dir).select(col("o_orderkey"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100)
          .cast("long").as("cents"))
      val top = cents.orderBy(col("cents").desc, col("o_orderkey"))
        .limit(HillK + 1)
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("cents").desc, col("o_orderkey"))).cast("long"))
        .localCheckpoint()
      val thr = top.filter(col("rnk") === (HillK + 1))
        .select(col("cents").as("c_thr"))
      val tail = top.filter(col("rnk") <= HillK).crossJoin(broadcast(thr))
      val gamma = tail.agg(
        round(sum(round(log(col("cents").cast("double") /
          col("c_thr").cast("double")), 6).cast(dec6)).cast("double") /
          lit(HillK.toDouble), 6).as("gamma"))
      tail.filter(col("rnk") <= 10).crossJoin(broadcast(gamma))
        .withColumn("alpha", round(lit(1.0) / col("gamma"), 6))
        .select(col("rnk"), col("o_orderkey"), col("cents"),
          col("gamma"), col("alpha"))
        .orderBy(col("rnk"))
    },
    Some(s"""
      |WITH cents AS (
      |  SELECT o_orderkey,
      |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |  FROM orders
      |), top AS MATERIALIZED (
      |  SELECT o_orderkey, cents,
      |         CAST(row_number() OVER (ORDER BY cents DESC, o_orderkey) AS BIGINT) AS rnk
      |  FROM cents ORDER BY cents DESC, o_orderkey LIMIT ${HillK + 1}
      |), thr AS (
      |  SELECT cents AS c_thr FROM top WHERE rnk = ${HillK + 1}
      |), tail AS (
      |  SELECT rnk, o_orderkey, cents, c_thr
      |  FROM top CROSS JOIN thr WHERE rnk <= $HillK
      |), gamma AS (
      |  SELECT round(CAST(SUM(CAST(round(ln(CAST(cents AS DOUBLE) /
      |                  CAST(c_thr AS DOUBLE)), 6) AS DECIMAL(38,6))) AS DOUBLE) /
      |               ${HillK}.0, 6) AS gamma
      |  FROM tail
      |)
      |SELECT rnk, o_orderkey, cents, gamma.gamma,
      |       round(1.0 / gamma.gamma, 6) AS alpha
      |FROM tail CROSS JOIN gamma
      |WHERE rnk <= 10
      |ORDER BY rnk
      """.stripMargin.trim))

  private val linkPrediction = QueryDef(
    "graph_link_prediction",
    "Link prediction over the shared supported co-purchase graph: for " +
      "every NON-adjacent part pair with ≥ 1 common neighbor, the two " +
      "classic neighborhood scores — Jaccard cn/(deg_a + deg_b − cn) " +
      "and Adamic–Adar Σ 1/ln(deg(n)) over common neighbors (Liben-" +
      "Nowell & Kleinberg 2003) — ranked top-25 by AA. This is the " +
      "'parts that SHOULD be co-merchandised but aren't yet' " +
      "recommender, the inverse of graph_ppr_parts' walk from " +
      "existing hubs. Candidate generation is the wedge join (two " +
      "adjacency copies joined on the shared center, v < w): fan-out " +
      "bounded by Σ deg² like the triangle census, never all-pairs; " +
      "existing edges leave via one left-anti join on the canonical " +
      "pair. Common-neighbor degrees are ≥ 2 by construction, so " +
      "1/ln(deg) is always finite; per-wedge AA terms round at 6 and " +
      "sum in DECIMAL(38,6); counts and degrees exact BIGINTs.",
    (s, dir) => {
      val edges = coPurchaseEdges(s, dir, LpaSupport)
        .select(col("src"), col("dst")).localCheckpoint()
      val adjc = edges.select(col("src").as("n"), col("dst").as("v"))
        .unionAll(edges.select(col("dst").as("n"), col("src").as("v")))
      val deg = adjc.groupBy(col("n")).agg(count(lit(1)).as("deg"))
      val wedge = adjc.select(col("n"), col("v").as("u"))
        .join(adjc.select(col("n"), col("v").as("w")), Seq("n"))
        .filter(col("u") < col("w"))
      val cand = wedge.join(deg, Seq("n"))
        .groupBy(col("u"), col("w"))
        .agg(count(lit(1)).as("cn"),
          round(sum(round(lit(1.0) / log(col("deg").cast("double")), 6)
            .cast(dec6)).cast("double"), 6).as("aa"))
      val nonEdge = cand.join(edges,
        cand("u") === edges("src") && cand("w") === edges("dst"), "left_anti")
      nonEdge
        .join(deg.select(col("n").as("u"), col("deg").as("deg_a")), Seq("u"))
        .join(deg.select(col("n").as("w"), col("deg").as("deg_b")), Seq("w"))
        .select(col("u").as("part_a"), col("w").as("part_b"), col("cn"),
          col("deg_a"), col("deg_b"),
          round(col("cn").cast("double") /
            (col("deg_a") + col("deg_b") - col("cn")).cast("double"), 6)
            .as("jaccard"),
          col("aa"))
        .orderBy(col("aa").desc, col("part_a"), col("part_b")).limit(25)
    },
    Some(s"""
      |WITH ${coPurchaseSql(LpaSupport)},
      |adjc AS MATERIALIZED (
      |  SELECT src AS n, dst AS v FROM e0
      |  UNION ALL SELECT dst, src FROM e0
      |), deg AS MATERIALIZED (
      |  SELECT n, count(*) AS deg FROM adjc GROUP BY 1
      |), wedge AS MATERIALIZED (
      |  SELECT a.n, a.v AS u, b.v AS w
      |  FROM adjc a JOIN adjc b ON a.n = b.n AND a.v < b.v
      |), cand AS MATERIALIZED (
      |  SELECT u, w, count(*) AS cn,
      |         round(CAST(SUM(CAST(round(1.0 / ln(CAST(d.deg AS DOUBLE)), 6)
      |                            AS DECIMAL(38,6))) AS DOUBLE), 6) AS aa
      |  FROM wedge JOIN deg d ON d.n = wedge.n
      |  GROUP BY 1, 2
      |), nonedge AS (
      |  SELECT c.u, c.w, c.cn, c.aa
      |  FROM cand c LEFT JOIN e0 ON e0.src = c.u AND e0.dst = c.w
      |  WHERE e0.src IS NULL
      |)
      |SELECT ne.u AS part_a, ne.w AS part_b, ne.cn,
      |       da.deg AS deg_a, db.deg AS deg_b,
      |       round(CAST(ne.cn AS DOUBLE) /
      |             CAST(da.deg + db.deg - ne.cn AS DOUBLE), 6) AS jaccard,
      |       ne.aa
      |FROM nonedge ne
      |JOIN deg da ON da.n = ne.u
      |JOIN deg db ON db.n = ne.w
      |ORDER BY aa DESC, part_a, part_b LIMIT 25
      """.stripMargin.trim))

  private val spearmanDaily = QueryDef(
    "stat_spearman_daily",
    "Spearman rank correlation between daily view value and daily " +
      "purchase value — the monotone-association member of the " +
      "correlation family (Pearson = stat_daily_corr measures " +
      "linearity on the same grid; Kendall = stat_kendall_tau pays " +
      "O(grid²) for pair concordance; Spearman is Pearson on ranks at " +
      "aggregate cost). Tied values take textbook AVERAGE ranks, kept " +
      "EXACT as integer doubled-ranks 2r = 2·|{<v}| + |{=v}| + 1 " +
      "(integer, so no half-rank float enters the sufficient " +
      "statistics): all five Σ terms are exact BIGINTs over the " +
      "calendar-bounded daily grid, and one closed-form double " +
      "formula at the end — the stat-family contract. Window counts " +
      "run on the days-sized relation, never the event relation.",
    (s, dir) => {
      val daily = dailyCents(s, dir)
      val pair = daily.filter(col("event_type") === "view")
        .select(col("day"), col("yc").as("x"))
        .join(daily.filter(col("event_type") === "purchase")
          .select(col("day"), col("yc").as("y")), Seq("day"))
      def r2(c: org.apache.spark.sql.Column, name: String) = {
        val wLess = Window.orderBy(c).rangeBetween(Window.unboundedPreceding, -1)
        val wEq = Window.partitionBy(c)
        (coalesce(count(lit(1)).over(wLess), lit(0L)) * 2 +
          count(lit(1)).over(wEq) + 1).as(name)
      }
      val ranked = pair.select(col("day"), r2(col("x"), "rx"), r2(col("y"), "ry"))
      val stats = ranked.agg(
        count(lit(1)).as("n"),
        sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
        sum(col("rx") * col("ry")).as("sxy"),
        sum(col("rx") * col("rx")).as("sxx"),
        sum(col("ry") * col("ry")).as("syy"))
      stats.select(col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))),
          6).as("spearman_rho"))
    },
    Some(s"""
      |WITH daily AS (
      |$dailyCentsSql
      |), pair AS (
      |  SELECT v.day, v.yc AS x, p.yc AS y
      |  FROM (SELECT day, yc FROM daily WHERE event_type = 'view') v
      |  JOIN (SELECT day, yc FROM daily WHERE event_type = 'purchase') p
      |    ON v.day = p.day
      |), ranked AS (
      |  SELECT day,
      |         (2 * COALESCE(count(*) OVER (ORDER BY x RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |          + count(*) OVER (PARTITION BY x) + 1)::BIGINT AS rx,
      |         (2 * COALESCE(count(*) OVER (ORDER BY y RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |          + count(*) OVER (PARTITION BY y) + 1)::BIGINT AS ry
      |  FROM pair
      |), stats AS (
      |  SELECT count(*)::BIGINT AS n,
      |         SUM(rx)::BIGINT AS sx, SUM(ry)::BIGINT AS sy,
      |         SUM(rx * ry)::BIGINT AS sxy,
      |         SUM(rx * rx)::BIGINT AS sxx,
      |         SUM(ry * ry)::BIGINT AS syy
      |  FROM ranked
      |)
      |SELECT n,
      |       round(CAST(n * sxy - sx * sy AS DOUBLE) /
      |             (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
      |              sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS spearman_rho
      |FROM stats
      """.stripMargin.trim))

  private val HitsMass = 100000000L

  /** One full HITS iteration as DuckDB CTEs — the SQL twin of the
    * [[graft.operators.Hits]] loop body: integer weighted sum per side,
    * then the `raw div (max div mass + 1)` L∞ quantization. MATERIALIZED
    * throughout (every CTE is referenced twice — the triangle-count
    * inlining lesson).
    */
  private def hitsIter(t: Int): String = s""",
    |araw$t AS MATERIALIZED (
    |  SELECT e.dst AS vid, SUM(h.s * e.w)::BIGINT AS raw
    |  FROM edges e JOIN h${t - 1} h ON h.id = e.src GROUP BY 1
    |), aq$t AS MATERIALIZED (
    |  SELECT MAX(raw) // $HitsMass + 1 AS q FROM araw$t
    |), a$t AS MATERIALIZED (
    |  SELECT v.id, COALESCE(r.raw // q, 0)::BIGINT AS s
    |  FROM v CROSS JOIN aq$t LEFT JOIN araw$t r ON r.vid = v.id
    |), hraw$t AS MATERIALIZED (
    |  SELECT e.src AS vid, SUM(a.s * e.w)::BIGINT AS raw
    |  FROM edges e JOIN a$t a ON a.id = e.dst GROUP BY 1
    |), hq$t AS MATERIALIZED (
    |  SELECT MAX(raw) // $HitsMass + 1 AS q FROM hraw$t
    |), h$t AS MATERIALIZED (
    |  SELECT v.id, COALESCE(r.raw // q, 0)::BIGINT AS s
    |  FROM v CROSS JOIN hq$t LEFT JOIN hraw$t r ON r.vid = v.id
    |)""".stripMargin

  private val hitsNations = QueryDef(
    "graph_hits_nations",
    "HITS hubs and authorities (Kleinberg 1999) over the directed " +
      "customer-nation → supplier-nation trade graph (edge weight = " +
      "lineitem count), 2 full iterations — the directed-centrality " +
      "complement of graph_pagerank_nations: a hub nation BUYS from " +
      "well-supplied nations, an authority nation SUPPLIES the big " +
      "buyers, and on an asymmetric trade matrix the two rankings " +
      "genuinely differ. Deterministic integer micro-unit arithmetic " +
      "end to end (Hits scaladoc): each half-step is an exact integer " +
      "weighted sum plus the L∞ quantization `raw div (max div mass + " +
      "1)` — order-independent and truncating identically on both " +
      "engines, so the iterative algorithm itself sits under the hash " +
      "gate. Two shuffles per iteration over a cached 625-row-max edge " +
      "relation read from the memoized per-(fixture, JVM) trade-graph " +
      "store (ONE fact join shared by all six nation-graph queries — " +
      "this query's 14.4 s round-14 cost was mostly the repeated " +
      "build); normalization scalars are one-row broadcasts.",
    (s, dir) => {
      val nation = Tables.nation(s, dir)
      val edges = nationTradeWeighted(s, dir)
      val scores = graft.operators.Hits.run(
        nation.select(col("n_nationkey").as("id")), edges,
        iterations = 2, massMicro = HitsMass)
      scores.join(broadcast(nation), col("id") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("auth_micro"), col("hub_micro"))
        .orderBy(col("auth_micro").desc, col("nation"))
    },
    Some(s"""
      |WITH edges AS MATERIALIZED (
      |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  GROUP BY 1, 2
      |), v AS (SELECT n_nationkey AS id FROM nation),
      |h0 AS (SELECT id, CAST($HitsMass AS BIGINT) AS s FROM v)
      """.stripMargin.trim
      + hitsIter(1) + hitsIter(2) + """
      |SELECT n.n_name AS nation, a2.s AS auth_micro, h2.s AS hub_micro
      |FROM v JOIN nation n ON n.n_nationkey = v.id
      |JOIN a2 ON a2.id = v.id
      |JOIN h2 ON h2.id = v.id
      |ORDER BY auth_micro DESC, nation
      """.stripMargin))

  private val anovaF = QueryDef(
    "stat_anova_f",
    "One-way ANOVA F statistic — does mean order value differ across " +
      "the five order priorities? The k-group generalization of " +
      "stat_ab_welch's two-arm readout. Order values are " +
      "deterministically decimated to integer hundreds of dollars " +
      "(floor then div — truncation is rounding-mode-free and part of " +
      "the query's definition, the stat_daily_corr discipline), so " +
      "every per-group sufficient statistic (n, Σx, Σx²) is an exact " +
      "order-independent BIGINT sum that stays far inside 2⁵³ decades " +
      "past sf10. The cross-group reduction Σ_g (Σx_g)²/n_g is EXACT " +
      "truncated integer division in hundredths ((Σx)²·100 div n " +
      "through DECIMAL(38,0) — at sf10 the term reaches ~7e12, where " +
      "the double ulp is coarser than a round-6 grid and the engines' " +
      "rounding paths split: the 38-query sf10 gate caught exactly " +
      "that, ssb off by 0.02); SSB/SSW/F evaluate in double with one " +
      "fixed parenthesization on both engines. One scan-side " +
      "aggregation shuffle; everything after is O(k)=5 rows.",
    (s, dir) => {
      val x = Tables.orders(s, dir)
        .select(col("o_orderpriority").as("grp"),
          expr("floor(o_totalprice) div 100").as("x"))
      val g = x.groupBy(col("grp")).agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sx2"))
      val tot = g.agg(
        count(lit(1)).as("k"),
        sum(col("n")).as("n_total"),
        sum(col("sx")).as("s_all"),
        sum(col("sx2")).as("t2_all"),
        (sum(expr("CAST((CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0)) * 100) " +
          "div CAST(n AS DECIMAL(38,0)) AS BIGINT)")).cast("double") / lit(100.0))
          .as("a_groups"))
      tot.select(col("k"), col("n_total"),
          round(col("a_groups") -
            col("s_all").cast("double") * col("s_all").cast("double") /
              col("n_total").cast("double"), 2).as("ssb"),
          round(col("t2_all").cast("double") - col("a_groups"), 2).as("ssw"),
          round(((col("a_groups") -
            col("s_all").cast("double") * col("s_all").cast("double") /
              col("n_total").cast("double")) / (col("k").cast("double") - 1)) /
            ((col("t2_all").cast("double") - col("a_groups")) /
              (col("n_total").cast("double") - col("k").cast("double"))), 6)
            .as("f_stat"))
    },
    Some("""
      |WITH x AS (
      |  SELECT o_orderpriority AS grp,
      |         CAST(FLOOR(o_totalprice) AS BIGINT) // 100 AS x
      |  FROM orders
      |), g AS (
      |  SELECT grp, count(*) AS n, SUM(x)::BIGINT AS sx,
      |         SUM(x * x)::BIGINT AS sx2
      |  FROM x GROUP BY 1
      |), tot AS (
      |  SELECT count(*)::BIGINT AS k, SUM(n)::BIGINT AS n_total,
      |         SUM(sx)::BIGINT AS s_all, SUM(sx2)::BIGINT AS t2_all,
      |         CAST(SUM((sx::HUGEINT * sx::HUGEINT * 100) // n::HUGEINT)::BIGINT
      |              AS DOUBLE) / 100.0 AS a_groups
      |  FROM g
      |)
      |SELECT k, n_total,
      |       round(a_groups - s_all::DOUBLE * s_all::DOUBLE / n_total::DOUBLE, 2) AS ssb,
      |       round(t2_all::DOUBLE - a_groups, 2) AS ssw,
      |       round(((a_groups - s_all::DOUBLE * s_all::DOUBLE / n_total::DOUBLE) / (k::DOUBLE - 1)) /
      |             ((t2_all::DOUBLE - a_groups) / (n_total::DOUBLE - k::DOUBLE)), 6) AS f_stat
      |FROM tot
      """.stripMargin.trim))

  /** One all-pairs min-plus relaxation round as a DuckDB CTE — the SQL
    * twin of the [[graft.operators.Bfs.allPairsHopDistance]] loop body
    * over the sparse reached-pairs relation.
    */
  private def apIter(t: Int): String = s""",
    |p$t AS MATERIALIZED (
    |  SELECT s, v2, MIN(d)::BIGINT AS d FROM (
    |    SELECT p.s, e.dst AS v2, p.d + 1 AS d
    |    FROM edges e JOIN p${t - 1} p ON p.v2 = e.src
    |    UNION ALL SELECT s, v2, d FROM p${t - 1}
    |  ) GROUP BY 1, 2
    |)""".stripMargin

  private val closeness = QueryDef(
    "graph_closeness_nations",
    "Harmonic closeness centrality (Boldi & Vigna 2014 — the " +
      "disconnection-robust closeness: C(s) = Σ 1/d(s,v), unreached " +
      "pairs contribute 0 instead of poisoning a mean) over the same " +
      "selective urgent-high-quantity trade graph as graph_bfs_nations, " +
      "4 relaxation rounds: WHO can reach the network cheaply, the " +
      "outbound-reach complement of HITS/PageRank's inbound views. " +
      "All-pairs distances come from ONE simultaneous multi-source " +
      "min-plus loop over a sparse (source, vertex, d) relation " +
      "(Bfs.allPairsHopDistance — integer min, order-independent, so " +
      "the iteration is hash-gated with rounds unrolled as oracle " +
      "CTEs). All-pairs is held to ENTITY-DOMAIN graphs by contract " +
      "(|V| = 25 nations; the operator scaladoc states the |V|·reach " +
      "bound). Edges read from the memoized trade-graph store's " +
      "selective table (ONE shared fact join instead of four). " +
      "Per-pair 1/d rounds at 6 and sums in DECIMAL(38,6).",
    (s, dir) => {
      val nation = Tables.nation(s, dir)
      val edges = nationTradeSelective(s, dir)
      val ap = graft.operators.Bfs.allPairsHopDistance(
        nation.select(col("n_nationkey").as("id")), edges, rounds = 4)
      val per = ap.groupBy(col("s")).agg(
        (count(lit(1)) - 1).as("n_reached"),
        round(sum(when(col("dist") > 0,
            round(lit(1.0) / col("dist").cast("double"), 6))
          .otherwise(lit(0.0)).cast(dec6)).cast("double"), 6).as("harmonic"))
      per.join(broadcast(nation), col("s") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("n_reached"), col("harmonic"))
        .orderBy(col("harmonic").desc, col("nation"))
    },
    Some("""
      |WITH edges AS MATERIALIZED (
      |  SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  WHERE o.o_orderpriority = '1-URGENT' AND l.l_quantity > 45
      |), v AS (SELECT n_nationkey AS id FROM nation),
      |p0 AS (SELECT id AS s, id AS v2, CAST(0 AS BIGINT) AS d FROM v)
      """.stripMargin.trim
      + apIter(1) + apIter(2) + apIter(3) + apIter(4) + """
      |SELECT n.n_name AS nation, (count(*) - 1)::BIGINT AS n_reached,
      |       round(CAST(SUM(CAST(CASE WHEN d > 0
      |                 THEN round(1.0 / CAST(d AS DOUBLE), 6)
      |                 ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE), 6) AS harmonic
      |FROM p4 JOIN nation n ON n.n_nationkey = p4.s
      |GROUP BY 1
      |ORDER BY harmonic DESC, nation
      """.stripMargin))

  private val leveneBf = QueryDef(
    "stat_levene_bf",
    "Brown–Forsythe test (Levene's test with the median center — the " +
      "robust variance-homogeneity check that should ACCOMPANY " +
      "stat_anova_f, since ANOVA assumes what this tests): does the " +
      "SPREAD of order value differ across the five priorities? Same " +
      "deterministic decimation as stat_anova_f (integer hundreds of " +
      "dollars), group centers are exact LOWER medians (the value at " +
      "sorted position (n+1) div 2 — an actual element, no float " +
      "interpolation, deterministic under ties; the interpolated " +
      "median's half-sum is the documented deviation), deviations " +
      "|x − med| are exact integers, and the F machinery on them is " +
      "the stat_anova_f reduction verbatim (including its exact " +
      "(Σz)²·100 div n cross-group term — the round-6 form this " +
      "replaced sat within one double-ulp of the grid at sf10). " +
      "Cost of exactness: one " +
      "per-group sort for the median rank (partitioned by group — " +
      "parallel across groups) plus the aggregation shuffle.",
    (s, dir) => {
      val x = Tables.orders(s, dir)
        .select(col("o_orderpriority").as("grp"),
          expr("floor(o_totalprice) div 100").as("x"))
      val cnt = x.groupBy(col("grp")).agg(count(lit(1)).as("cnt"))
      val med = x.withColumn("rn", row_number().over(
          Window.partitionBy(col("grp")).orderBy(col("x"))))
        .join(broadcast(cnt), Seq("grp"))
        .filter(col("rn") === expr("(cnt + 1) div 2"))
        .select(col("grp"), col("x").as("med"))
      val z = x.join(broadcast(med), Seq("grp"))
        .select(col("grp"), abs(col("x") - col("med")).as("z"))
      val g = z.groupBy(col("grp")).agg(
        count(lit(1)).as("n"), sum(col("z")).as("sz"),
        sum(col("z") * col("z")).as("sz2"))
      val tot = g.agg(
        count(lit(1)).as("k"), sum(col("n")).as("n_total"),
        sum(col("sz")).as("s_all"), sum(col("sz2")).as("t2_all"),
        (sum(expr("CAST((CAST(sz AS DECIMAL(38,0)) * CAST(sz AS DECIMAL(38,0)) * 100) " +
          "div CAST(n AS DECIMAL(38,0)) AS BIGINT)")).cast("double") / lit(100.0))
          .as("a_groups"))
      tot.select(col("k"), col("n_total"),
        round(((col("a_groups") -
          col("s_all").cast("double") * col("s_all").cast("double") /
            col("n_total").cast("double")) / (col("k").cast("double") - 1)) /
          ((col("t2_all").cast("double") - col("a_groups")) /
            (col("n_total").cast("double") - col("k").cast("double"))), 6)
          .as("f_stat"))
    },
    Some("""
      |WITH x AS (
      |  SELECT o_orderpriority AS grp,
      |         CAST(FLOOR(o_totalprice) AS BIGINT) // 100 AS x
      |  FROM orders
      |), c AS (
      |  SELECT grp, count(*) AS cnt FROM x GROUP BY 1
      |), r AS (
      |  SELECT grp, x, row_number() OVER (PARTITION BY grp ORDER BY x) AS rn
      |  FROM x
      |), med AS (
      |  SELECT r.grp, r.x AS med
      |  FROM r JOIN c ON c.grp = r.grp AND r.rn = (c.cnt + 1) // 2
      |), z AS (
      |  SELECT x.grp, abs(x.x - m.med) AS z
      |  FROM x JOIN med m ON m.grp = x.grp
      |), g AS (
      |  SELECT grp, count(*) AS n, SUM(z)::BIGINT AS sz,
      |         SUM(z * z)::BIGINT AS sz2
      |  FROM z GROUP BY 1
      |), tot AS (
      |  SELECT count(*)::BIGINT AS k, SUM(n)::BIGINT AS n_total,
      |         SUM(sz)::BIGINT AS s_all, SUM(sz2)::BIGINT AS t2_all,
      |         CAST(SUM((sz::HUGEINT * sz::HUGEINT * 100) // n::HUGEINT)::BIGINT
      |              AS DOUBLE) / 100.0 AS a_groups
      |  FROM g
      |)
      |SELECT k, n_total,
      |       round(((a_groups - s_all::DOUBLE * s_all::DOUBLE / n_total::DOUBLE) / (k::DOUBLE - 1)) /
      |             ((t2_all::DOUBLE - a_groups) / (n_total::DOUBLE - k::DOUBLE)), 6) AS f_stat
      |FROM tot
      """.stripMargin.trim))

  /** Shared decomposition core for ev_stl_decompose and
    * ev_seasonality_strength: the full-window day grid with exact-cents
    * observation, centered 7-day trend, unrounded detrended value,
    * weekday name, and the round-6 per-weekday seasonal mean — the Spark
    * relation and its SQL twin (CTE chain through `t2` + `seas`).
    */
  private def stlJoined(s: SparkSession, dir: String) = {
    val d1 = dailyCents(s, dir).filter(col("event_type") === "view")
      .select(col("day"), col("yc"))
    val w7 = Window.orderBy(col("day")).rowsBetween(-3, 3)
    val t = d1
      .withColumn("s7", sum(col("yc")).over(w7))
      .withColumn("c7", count(lit(1)).over(w7))
      .filter(col("c7") === 7)
      .withColumn("trend", col("s7") / lit(700.0))
      .withColumn("detr", col("yc") / lit(100.0) - col("trend"))
      .withColumn("dow", date_format(to_date(col("day")), "EEEE"))
    val seas = t.groupBy(col("dow")).agg(
      round(sum(round(col("detr"), 6).cast(dec6)).cast("double") /
        count(lit(1)).cast("double"), 6).as("seasonal"))
    t.join(broadcast(seas), Seq("dow"))
  }

  private val stlSql: String = s"""WITH daily AS (
    |$dailyCentsSql
    |), d1 AS (
    |  SELECT day, yc FROM daily WHERE event_type = 'view'
    |), t AS (
    |  SELECT day, yc,
    |         SUM(yc) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7,
    |         count(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS c7
    |  FROM d1
    |), t2 AS (
    |  SELECT day, yc, s7 / 700.0 AS trend,
    |         yc / 100.0 - s7 / 700.0 AS detr,
    |         dayname(day::DATE) AS dow
    |  FROM t WHERE c7 = 7
    |), seas AS (
    |  SELECT dow,
    |         round(CAST(SUM(CAST(round(detr, 6) AS DECIMAL(38,6))) AS DOUBLE) /
    |               count(*)::DOUBLE, 6) AS seasonal
    |  FROM t2 GROUP BY 1
    |)""".stripMargin

  private val stlDecompose = QueryDef(
    "ev_stl_decompose",
    "Classical seasonal decomposition of the daily view-value series " +
      "(the moving-average STL ancestor: trend = centered 7-day mean, " +
      "seasonal = per-weekday mean of the detrended series, residual = " +
      "what's left) — the decomposition REPORT beside the forecasting " +
      "channels (ev_holt_forecast predicts, this explains). " +
      "Determinism: the trend window is an exact INTEGER cents sum " +
      "over 7 days with one /700.0 at the end; detrended values are " +
      "integer-derived doubles with one fixed shape; weekday means " +
      "round each term at 6 into DECIMAL(38,6) (order-independent); " +
      "weekday NAMES, not engine dow numbering (the chi2 lesson). " +
      "Edge days without a full 7-day window are excluded (no " +
      "partial-window trend — the textbook treatment). All windows " +
      "run on the calendar-bounded day grid, never the event relation.",
    (s, dir) => {
      stlJoined(s, dir)
        .select(col("day"), col("dow"),
          round(col("yc") / lit(100.0), 2).as("y"),
          round(col("trend"), 6).as("trend"),
          col("seasonal"),
          round(col("detr") - col("seasonal"), 6).as("residual"))
        .orderBy(col("day"))
    },
    Some(s"""
      |$stlSql
      |SELECT t2.day, t2.dow,
      |       round(yc / 100.0, 2) AS y,
      |       round(trend, 6) AS trend,
      |       seas.seasonal,
      |       round(detr - seas.seasonal, 6) AS residual
      |FROM t2 JOIN seas ON seas.dow = t2.dow
      |ORDER BY t2.day
      """.stripMargin.trim))

  /** Raw→central moment formulas and the JB statistic as SQL text shared
    * VERBATIM between Spark expr() and DuckDB over exact BIGINT raw-sum
    * columns (n, s1..s4) and the derived mean/m2/m3/m4 — only IEEE
    * +,−,×,÷ and the correctly-rounded sqrt, no libm transcendental.
    */
  private val JbMean = "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))"
  private val JbM2 = "(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - mean * mean)"
  private val JbM3 = "(CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) - " +
    "3.0 * mean * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) + 2.0 * mean * mean * mean)"
  private val JbM4 = "(CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) - " +
    "4.0 * mean * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)) + " +
    "6.0 * mean * mean * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) - " +
    "3.0 * mean * mean * mean * mean)"
  private val JbSkew = "(m3 / (m2 * sqrt(m2)))"
  private val JbKurt = "(m4 / (m2 * m2))"
  private val JbStat = "((CAST(n AS DOUBLE) / 6.0) * " +
    "(skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0))"

  private val jarqueBera = QueryDef(
    "stat_jarque_bera",
    "Jarque–Bera normality test of the order-value distribution from " +
      "exact raw moments: n, Σx, Σx², Σx³, Σx⁴ as order-independent " +
      "BIGINT sums over values deterministically decimated to integer " +
      "THOUSANDS of dollars times two (div 2000 — sized so Σx⁴ stays " +
      "inside int64 past sf100: x ≤ ~300 ⇒ x⁴ ≤ 8.1·10⁹, ×1.5·10⁸ " +
      "rows ≈ 1.2·10¹⁸ < 2⁶³; the decimation is part of the query's " +
      "definition). Central moments, skewness, excess-kurtosis " +
      "distance and JB itself evaluate in SQL strings shared VERBATIM " +
      "between Spark expr() and DuckDB — IEEE +,−,×,÷ and the " +
      "correctly-rounded sqrt only, no transcendental. ONE map-side-" +
      "combining aggregate is the only data-sized work. Completes the " +
      "distribution-shape family: Benford (digits), KS (two-sample), " +
      "Hill (tail), Gini (concentration), JB (normality).",
    (s, dir) => {
      val x = Tables.orders(s, dir)
        .select(expr("floor(o_totalprice) div 2000").as("x"))
      val st = x.agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2"),
        sum(col("x") * col("x") * col("x")).as("s3"),
        sum(col("x") * col("x") * col("x") * col("x")).as("s4"))
      st.withColumn("mean", expr(JbMean))
        .withColumn("m2", expr(JbM2))
        .withColumn("m3", expr(JbM3))
        .withColumn("m4", expr(JbM4))
        .withColumn("skew", expr(JbSkew))
        .withColumn("kurt", expr(JbKurt))
        .select(col("n"),
          round(col("skew"), 6).as("skewness"),
          round(col("kurt"), 6).as("kurtosis"),
          expr(s"round($JbStat, 6)").as("jb_stat"))
    },
    Some(s"""
      |WITH x AS (
      |  SELECT CAST(FLOOR(o_totalprice) AS BIGINT) // 2000 AS x FROM orders
      |), st AS (
      |  SELECT count(*)::BIGINT AS n,
      |         SUM(x)::BIGINT AS s1, SUM(x * x)::BIGINT AS s2,
      |         SUM(x * x * x)::BIGINT AS s3,
      |         SUM(x * x * x * x)::BIGINT AS s4
      |  FROM x
      |), d1 AS (SELECT *, $JbMean AS mean FROM st),
      |d2 AS (SELECT *, $JbM2 AS m2, $JbM3 AS m3, $JbM4 AS m4 FROM d1),
      |d3 AS (SELECT *, $JbSkew AS skew, $JbKurt AS kurt FROM d2)
      |SELECT n,
      |       round(skew, 6) AS skewness,
      |       round(kurt, 6) AS kurtosis,
      |       round($JbStat, 6) AS jb_stat
      |FROM d3
      """.stripMargin.trim))

  private val eccentricity = QueryDef(
    "graph_eccentricity_nations",
    "Eccentricity / radius / diameter of the selective trade graph " +
      "(within the same 4-round reach as graph_closeness_nations — " +
      "k-capped eccentricity over REACHED pairs, the defined quantity " +
      "at any scale): per nation the farthest reachable peer, plus the " +
      "graph-level radius (min ecc) and diameter (max ecc) over " +
      "non-isolated sources — the network-topology summary beside " +
      "closeness's per-node view. Same sparse all-pairs min-plus " +
      "relation (one loop, hash-gated integer arithmetic), same " +
      "entity-domain contract; the scalar radius/diameter is a " +
      "one-row broadcast, never a data-sized reduction. Edges read " +
      "from the memoized trade-graph store's selective table.",
    (s, dir) => {
      val nation = Tables.nation(s, dir)
      val edges = nationTradeSelective(s, dir)
      val ap = graft.operators.Bfs.allPairsHopDistance(
        nation.select(col("n_nationkey").as("id")), edges, rounds = 4)
      val per = ap.groupBy(col("s")).agg(
        (count(lit(1)) - 1).as("n_reached"), max(col("dist")).as("ecc"))
      val scal = per.filter(col("n_reached") > 0).agg(
        min(col("ecc")).as("radius"), max(col("ecc")).as("diameter"))
      per.join(broadcast(nation), col("s") === col("n_nationkey"))
        .crossJoin(broadcast(scal))
        .select(col("n_name").as("nation"), col("n_reached"), col("ecc"),
          col("radius"), col("diameter"))
        .orderBy(col("ecc"), col("nation"))
    },
    Some("""
      |WITH edges AS MATERIALIZED (
      |  SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  WHERE o.o_orderpriority = '1-URGENT' AND l.l_quantity > 45
      |), v AS (SELECT n_nationkey AS id FROM nation),
      |p0 AS (SELECT id AS s, id AS v2, CAST(0 AS BIGINT) AS d FROM v)
      """.stripMargin.trim
      + apIter(1) + apIter(2) + apIter(3) + apIter(4) + """
      |, per AS MATERIALIZED (
      |  SELECT s, (count(*) - 1)::BIGINT AS n_reached, MAX(d)::BIGINT AS ecc
      |  FROM p4 GROUP BY 1
      |), scal AS (
      |  SELECT MIN(ecc)::BIGINT AS radius, MAX(ecc)::BIGINT AS diameter
      |  FROM per WHERE n_reached > 0
      |)
      |SELECT n.n_name AS nation, per.n_reached, per.ecc,
      |       scal.radius, scal.diameter
      |FROM per JOIN nation n ON n.n_nationkey = per.s, scal
      |ORDER BY ecc, nation
      """.stripMargin))

  /** One Brandes σ layer (shortest-path counts at depth `l`) as a
    * DuckDB CTE — the SQL twin of the
    * [[graft.operators.Betweenness.sourceDependencies]] forward loop:
    * layer l's σ sums layer-(l-1) predecessors' σ along edges landing
    * exactly at distance l (the shortest-path DAG edges).
    */
  private def sigIter(l: Int): String = s""",
    |s$l AS MATERIALIZED (
    |  SELECT q.s, e.dst AS v2, SUM(q.sig)::BIGINT AS sig
    |  FROM edges e JOIN s${l - 1} q ON q.v2 = e.src
    |  JOIN p4 p ON p.s = q.s AND p.v2 = e.dst AND p.d = $l
    |  GROUP BY 1, 2
    |)""".stripMargin

  /** One Brandes δ layer (backward dependency accumulation) as a
    * DuckDB CTE: each term σ_sv/σ_sw · (1 + δ_sw) evaluates in double
    * with the one fixed parenthesization, rounds at 6, and sums in
    * DECIMAL(38,6) — the Spark loop body verbatim.
    */
  private def dltIter(l: Int): String = s""",
    |d$l AS MATERIALIZED (
    |  SELECT s, v2, sig,
    |         CAST(COALESCE(SUM(term), CAST(0.0 AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS dlt
    |  FROM (
    |    SELECT q.s, q.v2, q.sig,
    |           CAST(round(q.sig::DOUBLE / w.sig::DOUBLE * (1.0 + w.dlt::DOUBLE), 6)
    |                AS DECIMAL(38,6)) AS term
    |    FROM s$l q
    |    LEFT JOIN edges e ON e.src = q.v2
    |    LEFT JOIN d${l + 1} w ON w.s = q.s AND w.v2 = e.dst
    |  ) GROUP BY 1, 2, 3
    |)""".stripMargin

  private val betweenness = QueryDef(
    "graph_betweenness_approx",
    "Approximate betweenness centrality by k-source Brandes (Brandes " +
      "2001; Brandes & Pich 2007 source sampling) over the same " +
      "selective urgent-high-quantity trade graph as closeness/" +
      "eccentricity — WHO BROKERS the network's shortest paths, the " +
      "one classic centrality PageRank/HITS/closeness don't measure. " +
      "Exact betweenness is O(|V|·|E|) (every vertex a source — never " +
      "100 TB-shaped); the estimator runs Brandes from 12 md5-sampled " +
      "sources and scales by n/k, unbiased and O(k·|E|·rounds). " +
      "Forward: source-restricted min-plus distances + exact BIGINT " +
      "path counts per BFS layer; backward: per-layer dependency " +
      "terms sigma_v/sigma_w*(1+delta_w) round at 6 into DECIMAL(38,6) " +
      "sums (order-independent — the established iterative-parity " +
      "channel), all within the 4-hop horizon (the same k-capped " +
      "contract as closeness). The oracle unrolls the identical " +
      "forward and backward layers as MATERIALIZED CTEs. Edges read " +
      "from the memoized trade-graph store's selective table.",
    (s, dir) => {
      val nation = Tables.nation(s, dir)
      val edges = nationTradeSelective(s, dir)
      val v = nation.select(col("n_nationkey").as("id"))
      val srcs = v.orderBy(md5(col("id").cast("string")), col("id")).limit(12)
      val dep = graft.operators.Betweenness.sourceDependencies(srcs, edges, rounds = 4)
      val counts = v.agg(count(lit(1)).as("nv"))
        .crossJoin(srcs.agg(count(lit(1)).as("ns")))
      nation.join(dep, col("n_nationkey") === col("id"), "left")
        .crossJoin(broadcast(counts))
        .select(col("n_name").as("nation"),
          round(coalesce(col("dep").cast("double"), lit(0.0)) *
            (col("nv").cast("double") / col("ns").cast("double")), 6)
            .as("betweenness"))
        .orderBy(col("betweenness").desc, col("nation"))
    },
    Some("""
      |WITH edges AS MATERIALIZED (
      |  SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  WHERE o.o_orderpriority = '1-URGENT' AND l.l_quantity > 45
      |), v AS (SELECT n_nationkey AS id FROM nation),
      |src AS MATERIALIZED (SELECT id FROM v ORDER BY md5(id::VARCHAR), id LIMIT 12),
      |p0 AS (SELECT id AS s, id AS v2, CAST(0 AS BIGINT) AS d FROM src)
      """.stripMargin.trim
      + apIter(1) + apIter(2) + apIter(3) + apIter(4) + """
      |, s0 AS (SELECT id AS s, id AS v2, CAST(1 AS BIGINT) AS sig FROM src)
      """.stripMargin
      + sigIter(1) + sigIter(2) + sigIter(3) + sigIter(4) + """
      |, d4 AS (SELECT s, v2, sig, CAST(0.0 AS DECIMAL(38,6)) AS dlt FROM s4)
      """.stripMargin
      + dltIter(3) + dltIter(2) + dltIter(1) + """
      |, alld AS (
      |  SELECT v2, dlt FROM d1 UNION ALL SELECT v2, dlt FROM d2
      |  UNION ALL SELECT v2, dlt FROM d3
      |), tot AS (
      |  SELECT v2, CAST(SUM(dlt) AS DECIMAL(38,6)) AS dep FROM alld GROUP BY 1
      |)
      |SELECT n.n_name AS nation,
      |       round(COALESCE(t.dep::DOUBLE, 0.0) *
      |             ((SELECT count(*) FROM v)::DOUBLE / (SELECT count(*) FROM src)::DOUBLE), 6)
      |         AS betweenness
      |FROM nation n LEFT JOIN tot t ON t.v2 = n.n_nationkey
      |ORDER BY betweenness DESC, nation
      """.stripMargin))

  private val seasonalityStrength = QueryDef(
    "ev_seasonality_strength",
    "Trend and seasonality strength of the daily view-value series " +
      "(Hyndman & Athanasopoulos FPP: F_T = max(0, 1 − Var(R)/" +
      "Var(T+R)), F_S = max(0, 1 − Var(R)/Var(S+R)) ∈ [0,1]) — the " +
      "ONE-NUMBER readout of ev_stl_decompose's component table, the " +
      "series-screening statistic a forecasting pipeline uses to " +
      "route models. Shares the decomposition core verbatim " +
      "(stlJoined/stlSql); each variance input rounds at 6 into " +
      "DECIMAL(38,6) sums (order-independent) and Var = Σv²/n − " +
      "(Σv/n)² evaluates in one fixed shape; greatest(0, ·) clamps " +
      "identically on both engines.",
    (s, dir) => {
      val parts = stlJoined(s, dir)
        .withColumn("r", round(col("detr") - col("seasonal"), 6))
        .withColumn("sr", round(col("detr"), 6))
        .withColumn("tr", round(col("yc") / lit(100.0) - col("seasonal"), 6))
      def vr(v: String): org.apache.spark.sql.Column =
        (sum(round(col(v) * col(v), 6).cast(dec6)).cast("double") /
          count(lit(1)).cast("double")) -
          (sum(col(v).cast(dec6)).cast("double") / count(lit(1)).cast("double")) *
          (sum(col(v).cast(dec6)).cast("double") / count(lit(1)).cast("double"))
      parts.agg(count(lit(1)).as("n_days"),
          vr("r").as("var_r"), vr("tr").as("var_tr"), vr("sr").as("var_sr"))
        .select(col("n_days"),
          round(greatest(lit(0.0), lit(1.0) - col("var_r") / col("var_tr")), 6)
            .as("f_trend"),
          round(greatest(lit(0.0), lit(1.0) - col("var_r") / col("var_sr")), 6)
            .as("f_seasonal"))
    },
    Some(s"""
      |$stlSql, parts AS (
      |  SELECT round(detr - seas.seasonal, 6) AS r,
      |         round(detr, 6) AS sr,
      |         round(yc / 100.0 - seas.seasonal, 6) AS tr
      |  FROM t2 JOIN seas ON seas.dow = t2.dow
      |), st AS (
      |  SELECT count(*)::BIGINT AS n_days,
      |         (CAST(SUM(CAST(round(r * r, 6) AS DECIMAL(38,6))) AS DOUBLE) / count(*)::DOUBLE) -
      |         (CAST(SUM(CAST(r AS DECIMAL(38,6))) AS DOUBLE) / count(*)::DOUBLE) *
      |         (CAST(SUM(CAST(r AS DECIMAL(38,6))) AS DOUBLE) / count(*)::DOUBLE) AS var_r,
      |         (CAST(SUM(CAST(round(tr * tr, 6) AS DECIMAL(38,6))) AS DOUBLE) / count(*)::DOUBLE) -
      |         (CAST(SUM(CAST(tr AS DECIMAL(38,6))) AS DOUBLE) / count(*)::DOUBLE) *
      |         (CAST(SUM(CAST(tr AS DECIMAL(38,6))) AS DOUBLE) / count(*)::DOUBLE) AS var_tr,
      |         (CAST(SUM(CAST(round(sr * sr, 6) AS DECIMAL(38,6))) AS DOUBLE) / count(*)::DOUBLE) -
      |         (CAST(SUM(CAST(sr AS DECIMAL(38,6))) AS DOUBLE) / count(*)::DOUBLE) *
      |         (CAST(SUM(CAST(sr AS DECIMAL(38,6))) AS DOUBLE) / count(*)::DOUBLE) AS var_sr
      |  FROM parts
      |)
      |SELECT n_days,
      |       round(greatest(0.0, 1.0 - var_r / var_tr), 6) AS f_trend,
      |       round(greatest(0.0, 1.0 - var_r / var_sr), 6) AS f_seasonal
      |FROM st
      """.stripMargin.trim))

  private val grubbs = QueryDef(
    "stat_grubbs_outlier",
    "Grubbs outlier statistics for the order-value distribution: " +
      "G_max = (max − mean)/s and G_min = (mean − min)/s from ONE " +
      "map-side-combining aggregate over the stat_anova_f decimation " +
      "(integer hundreds of dollars) — n, Σx, Σx² exact BIGINTs plus " +
      "integer min/max, the sample s via the correctly-rounded sqrt " +
      "in a fixed shape. The single-point-outlier screen beside " +
      "ev_value_outliers' per-type z-scores and ev_anomaly_mad's " +
      "robust variant; no transcendental, no second pass.",
    (s, dir) => {
      val x = Tables.orders(s, dir)
        .select(expr("floor(o_totalprice) div 100").as("x"))
      val st = x.agg(
        count(lit(1)).as("n"), sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"))
      st.withColumn("mean", expr("CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)"))
        .withColumn("sd", expr(
          "sqrt((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - mean * mean) * " +
            "CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0))"))
        .select(col("n"), col("x_min"), col("x_max"),
          round(col("mean"), 6).as("mean_x"),
          expr("round((CAST(x_max AS DOUBLE) - mean) / sd, 6)").as("g_max"),
          expr("round((mean - CAST(x_min AS DOUBLE)) / sd, 6)").as("g_min"))
    },
    Some("""
      |WITH x AS (
      |  SELECT CAST(FLOOR(o_totalprice) AS BIGINT) // 100 AS x FROM orders
      |), st AS (
      |  SELECT count(*)::BIGINT AS n, SUM(x)::BIGINT AS s1,
      |         SUM(x * x)::BIGINT AS s2,
      |         MIN(x)::BIGINT AS x_min, MAX(x)::BIGINT AS x_max
      |  FROM x
      |), d1 AS (
      |  SELECT *, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean FROM st
      |), d2 AS (
      |  SELECT *, sqrt((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - mean * mean) * CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0)) AS sd
      |  FROM d1
      |)
      |SELECT n, x_min, x_max,
      |       round(mean, 6) AS mean_x,
      |       round((CAST(x_max AS DOUBLE) - mean) / sd, 6) AS g_max,
      |       round((mean - CAST(x_min AS DOUBLE)) / sd, 6) AS g_min
      |FROM d2
      """.stripMargin.trim))

  private val runsTest = QueryDef(
    "stat_runs_test",
    "Wald–Wolfowitz runs test for randomness of the daily view-value " +
      "direction sequence: day-over-day moves become +/− signs (exact " +
      "integer cents comparison; zero-change days drop, the standard " +
      "treatment), R counts maximal same-sign runs via one lag " +
      "comparison on the day grid, and z = (R − E[R])/σ comes from " +
      "the closed form E[R] = 1 + 2n₁n₂/N, σ² = 2n₁n₂(2n₁n₂−N)/" +
      "(N²(N−1)) — all counts exact BIGINTs, one fixed-shape double " +
      "formula shared between engines. A trending series fails low " +
      "(few long runs), an oscillating one fails high — the " +
      "randomness diagnostic beside stat_acf_daily's lag structure. " +
      "Windows run on the calendar-bounded day grid only.",
    (s, dir) => {
      val d1 = dailyCents(s, dir).filter(col("event_type") === "view")
        .select(col("day"), col("yc"))
      val wd = Window.orderBy(col("day"))
      val signs = d1
        .withColumn("prev", lag(col("yc"), 1).over(wd))
        .filter(col("prev").isNotNull && col("yc") =!= col("prev"))
        .withColumn("sgn", when(col("yc") > col("prev"), 1L).otherwise(-1L))
      val runsRel = signs
        .withColumn("psgn", lag(col("sgn"), 1).over(Window.orderBy(col("day"))))
        .withColumn("brk", when(col("psgn").isNull || col("sgn") =!= col("psgn"),
          1L).otherwise(0L))
      val st = runsRel.agg(
        sum(when(col("sgn") === 1, 1L).otherwise(0L)).as("n_up"),
        sum(when(col("sgn") === -1, 1L).otherwise(0L)).as("n_down"),
        sum(col("brk")).as("runs"))
      st.withColumn("z", expr(
        "round((CAST(runs AS DOUBLE) - (1.0 + 2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE) / CAST(n_up + n_down AS DOUBLE))) / " +
          "sqrt(2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE) * (2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE) - CAST(n_up + n_down AS DOUBLE)) / " +
          "(CAST(n_up + n_down AS DOUBLE) * CAST(n_up + n_down AS DOUBLE) * (CAST(n_up + n_down AS DOUBLE) - 1.0))), 6)"))
        .select(col("n_up"), col("n_down"), col("runs"), col("z"))
    },
    Some(s"""
      |WITH daily AS (
      |$dailyCentsSql
      |), d1 AS (
      |  SELECT day, yc FROM daily WHERE event_type = 'view'
      |), lagged AS (
      |  SELECT day, yc, lag(yc, 1) OVER (ORDER BY day) AS prev FROM d1
      |), signs AS (
      |  SELECT day, CASE WHEN yc > prev THEN 1 ELSE -1 END AS sgn
      |  FROM lagged WHERE prev IS NOT NULL AND yc != prev
      |), runsrel AS (
      |  SELECT sgn, lag(sgn, 1) OVER (ORDER BY day) AS psgn FROM signs
      |), st AS (
      |  SELECT SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_up,
      |         SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END)::BIGINT AS n_down,
      |         SUM(CASE WHEN psgn IS NULL OR sgn != psgn THEN 1 ELSE 0 END)::BIGINT AS runs
      |  FROM runsrel
      |)
      |SELECT n_up, n_down, runs,
      |       round((CAST(runs AS DOUBLE) - (1.0 + 2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE) / CAST(n_up + n_down AS DOUBLE))) / sqrt(2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE) * (2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE) - CAST(n_up + n_down AS DOUBLE)) / (CAST(n_up + n_down AS DOUBLE) * CAST(n_up + n_down AS DOUBLE) * (CAST(n_up + n_down AS DOUBLE) - 1.0))), 6) AS z
      |FROM st
      """.stripMargin.trim))

  private val welchAnova = QueryDef(
    "stat_welch_anova",
    "Welch's heteroscedastic one-way ANOVA over the five order " +
      "priorities — the F test to USE when stat_levene_bf rejects " +
      "equal variances (classic ANOVA's pooled-variance denominator " +
      "is exactly what Welch drops): group weights w_i = n_i/s_i², " +
      "F_w = [Σw_i(x̄_i−x̄_w)²/(k−1)] / [1 + 2(k−2)/(k²−1)·Σ(1−w_i/W)²" +
      "/(n_i−1)] with the Welch–Satterthwaite df₂. Same decimation as " +
      "stat_anova_f (floor div 100 — part of the definition), so the " +
      "per-group sufficient statistics (n, Σx, Σx²) are exact " +
      "BIGINTs from ONE map-side-combining rollup; every per-group " +
      "double (mean, variance, weight) has one fixed shape, and the " +
      "k=5 cross-group sums fold a grp-SORTED struct array (Spark " +
      "aggregate HOF ≡ DuckDB list_reduce over list(ORDER BY) — the " +
      "stat_chi2_independence order-determinism channel). The weight " +
      "denominator is nullif(s_i², 0): a zero-variance group reads " +
      "NULL on both engines instead of Infinity-vs-engine-dependent. " +
      "One aggregation shuffle; everything after is k rows.",
    (s, dir) => {
      val g = Tables.orders(s, dir)
        .select(col("o_orderpriority").as("grp"),
          expr("floor(o_totalprice) div 100").as("x"))
        .groupBy(col("grp")).agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sx2"))
      def nD(x: org.apache.spark.sql.Column) = x.getField("n").cast("double")
      def xbar(x: org.apache.spark.sql.Column) = x.getField("sx").cast("double") / nD(x)
      def vv(x: org.apache.spark.sql.Column) = (x.getField("sx2").cast("double") -
        x.getField("sx").cast("double") * x.getField("sx").cast("double") / nD(x)) /
        (nD(x) - lit(1.0))
      // nullif on the variance: a zero-variance (degenerate) group must
      // read NULL on BOTH engines — Spark's double n/0 is Infinity while
      // DuckDB's division-by-zero behavior is a session setting, so a
      // constant group would break parity instead of nulling the test
      def w(x: org.apache.spark.sql.Column) = nD(x) / nullif(vv(x), lit(0.0))
      val base = g.agg(
        count(lit(1)).as("k"), sum(col("n")).as("n_total"),
        sort_array(collect_list(struct(col("grp"), col("n"), col("sx"), col("sx2"))))
          .as("arr"))
      val folded = base.select(col("k"), col("n_total"), col("arr"),
        aggregate(col("arr"), lit(0.0), (acc, x) => acc + w(x)).as("sw"),
        aggregate(col("arr"), lit(0.0), (acc, x) => acc + w(x) * xbar(x)).as("swx"))
      val withXw = folded.select(col("k"), col("n_total"), col("arr"), col("sw"),
        (col("swx") / col("sw")).as("xw"))
      val sums = withXw.select(col("k"), col("n_total"),
        aggregate(col("arr"), lit(0.0), (acc, x) =>
          acc + w(x) * (xbar(x) - col("xw")) * (xbar(x) - col("xw"))).as("sa"),
        aggregate(col("arr"), lit(0.0), (acc, x) =>
          acc + (lit(1.0) - w(x) / col("sw")) * (lit(1.0) - w(x) / col("sw")) /
            (nD(x) - lit(1.0))).as("sb"))
      sums.select(col("k"), col("n_total"),
        round((col("sa") / (col("k").cast("double") - lit(1.0))) /
          (lit(1.0) + lit(2.0) * (col("k").cast("double") - lit(2.0)) /
            (col("k").cast("double") * col("k").cast("double") - lit(1.0)) *
            col("sb")), 6).as("f_welch"),
        round((col("k").cast("double") * col("k").cast("double") - lit(1.0)) /
          (lit(3.0) * col("sb")), 6).as("df2"))
    },
    Some("""
      |WITH x AS (
      |  SELECT o_orderpriority AS grp,
      |         CAST(FLOOR(o_totalprice) AS BIGINT) // 100 AS x
      |  FROM orders
      |), g AS (
      |  SELECT grp, count(*)::BIGINT AS n, SUM(x)::BIGINT AS sx,
      |         SUM(x * x)::BIGINT AS sx2
      |  FROM x GROUP BY 1
      |), base AS (
      |  SELECT count(*)::BIGINT AS k, SUM(n)::BIGINT AS n_total,
      |         list(struct_pack(n := n, sx := sx, sx2 := sx2) ORDER BY grp) AS arr
      |  FROM g
      |), folded AS (
      |  SELECT k, n_total, arr,
      |         list_reduce(list_prepend(0.0, list_transform(arr, x ->
      |           x.n::DOUBLE / nullif((x.sx2::DOUBLE - x.sx::DOUBLE * x.sx::DOUBLE / x.n::DOUBLE) / (x.n::DOUBLE - 1.0), 0.0))),
      |           (a, b) -> a + b) AS sw,
      |         list_reduce(list_prepend(0.0, list_transform(arr, x ->
      |           x.n::DOUBLE / nullif((x.sx2::DOUBLE - x.sx::DOUBLE * x.sx::DOUBLE / x.n::DOUBLE) / (x.n::DOUBLE - 1.0), 0.0)
      |             * (x.sx::DOUBLE / x.n::DOUBLE))),
      |           (a, b) -> a + b) AS swx
      |  FROM base
      |), withxw AS (
      |  SELECT k, n_total, arr, sw, swx / sw AS xw FROM folded
      |), sums AS (
      |  SELECT k, n_total,
      |         list_reduce(list_prepend(0.0, list_transform(arr, x ->
      |           x.n::DOUBLE / nullif((x.sx2::DOUBLE - x.sx::DOUBLE * x.sx::DOUBLE / x.n::DOUBLE) / (x.n::DOUBLE - 1.0), 0.0)
      |             * ((x.sx::DOUBLE / x.n::DOUBLE) - xw) * ((x.sx::DOUBLE / x.n::DOUBLE) - xw))),
      |           (a, b) -> a + b) AS sa,
      |         list_reduce(list_prepend(0.0, list_transform(arr, x ->
      |           (1.0 - (x.n::DOUBLE / nullif((x.sx2::DOUBLE - x.sx::DOUBLE * x.sx::DOUBLE / x.n::DOUBLE) / (x.n::DOUBLE - 1.0), 0.0)) / sw)
      |           * (1.0 - (x.n::DOUBLE / nullif((x.sx2::DOUBLE - x.sx::DOUBLE * x.sx::DOUBLE / x.n::DOUBLE) / (x.n::DOUBLE - 1.0), 0.0)) / sw)
      |           / (x.n::DOUBLE - 1.0))),
      |           (a, b) -> a + b) AS sb
      |  FROM withxw
      |)
      |SELECT k, n_total,
      |       round((sa / (k::DOUBLE - 1.0)) /
      |             (1.0 + 2.0 * (k::DOUBLE - 2.0) / (k::DOUBLE * k::DOUBLE - 1.0) * sb), 6)
      |         AS f_welch,
      |       round((k::DOUBLE * k::DOUBLE - 1.0) / (3.0 * sb), 6) AS df2
      |FROM sums
      """.stripMargin.trim))

  private val bartlett = QueryDef(
    "stat_bartlett",
    "Bartlett's test of equal variances over the five order " +
      "priorities — the classic (normality-assuming, more powerful) " +
      "companion to stat_levene_bf's robust check: the two together " +
      "are how a pipeline decides between stat_anova_f and " +
      "stat_welch_anova. Same decimation and per-group exact BIGINT " +
      "(n, Σx, Σx²) as the rest of the priority battery; each " +
      "variance s_i² and the pooled s_p² evaluate in ONE fixed " +
      "double shape (the (n−1)-weighted numerator sx2 − sx²/n is " +
      "reused verbatim, never recomputed via s_i²·(n−1)); every " +
      "ln(·) rounds at 6 before entering the k=5 statistic (the " +
      "established zipf/jsd ln channel), cross-group sums fold " +
      "grp-SORTED lists on both engines, and a zero-variance group " +
      "nullif-guards to NULL rather than -Infinity. M = (N−k)ln s_p² " +
      "− Σ(n_i−1)ln s_i², C = 1 + (Σ1/(n_i−1) − 1/(N−k))/(3(k−1)), " +
      "χ² = M/C. One aggregation shuffle; k rows after.",
    (s, dir) => {
      val g = Tables.orders(s, dir)
        .select(col("o_orderpriority").as("grp"),
          expr("floor(o_totalprice) div 100").as("x"))
        .groupBy(col("grp")).agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sx2"))
      def nD(x: org.apache.spark.sql.Column) = x.getField("n").cast("double")
      def num(x: org.apache.spark.sql.Column) = x.getField("sx2").cast("double") -
        x.getField("sx").cast("double") * x.getField("sx").cast("double") / nD(x)
      def s2(x: org.apache.spark.sql.Column) = num(x) / (nD(x) - lit(1.0))
      def lnS2(x: org.apache.spark.sql.Column) =
        round(log(nullif(s2(x), lit(0.0))), 6)
      val base = g.agg(
        count(lit(1)).as("k"), sum(col("n")).as("n_total"),
        sort_array(collect_list(struct(col("grp"), col("n"), col("sx"), col("sx2"))))
          .as("arr"))
      val folded = base.select(col("k"), col("n_total"),
        aggregate(col("arr"), lit(0.0), (acc, x) => acc + num(x)).as("pooled_num"),
        aggregate(col("arr"), lit(0.0), (acc, x) =>
          acc + (nD(x) - lit(1.0)) * lnS2(x)).as("sum_ln"),
        aggregate(col("arr"), lit(0.0), (acc, x) =>
          acc + lit(1.0) / (nD(x) - lit(1.0))).as("sum_inv"))
      val kD = col("k").cast("double")
      val nkD = col("n_total").cast("double") - kD
      val lp = round(log(nullif(col("pooled_num") / nkD, lit(0.0))), 6)
      val m = nkD * lp - col("sum_ln")
      val c = lit(1.0) + (col("sum_inv") - lit(1.0) / nkD) /
        (lit(3.0) * (kD - lit(1.0)))
      folded.select(col("k"), col("n_total"),
        round(m / c, 6).as("chi2_bartlett"))
    },
    Some("""
      |WITH x AS (
      |  SELECT o_orderpriority AS grp,
      |         CAST(FLOOR(o_totalprice) AS BIGINT) // 100 AS x
      |  FROM orders
      |), g AS (
      |  SELECT grp, count(*)::BIGINT AS n, SUM(x)::BIGINT AS sx,
      |         SUM(x * x)::BIGINT AS sx2
      |  FROM x GROUP BY 1
      |), base AS (
      |  SELECT count(*)::BIGINT AS k, SUM(n)::BIGINT AS n_total,
      |         list(struct_pack(n := n, sx := sx, sx2 := sx2) ORDER BY grp) AS arr
      |  FROM g
      |), folded AS (
      |  SELECT k, n_total,
      |         list_reduce(list_prepend(0.0, list_transform(arr, x ->
      |           x.sx2::DOUBLE - x.sx::DOUBLE * x.sx::DOUBLE / x.n::DOUBLE)),
      |           (a, b) -> a + b) AS pooled_num,
      |         list_reduce(list_prepend(0.0, list_transform(arr, x ->
      |           (x.n::DOUBLE - 1.0) *
      |           round(ln(nullif((x.sx2::DOUBLE - x.sx::DOUBLE * x.sx::DOUBLE / x.n::DOUBLE) / (x.n::DOUBLE - 1.0), 0.0)), 6))),
      |           (a, b) -> a + b) AS sum_ln,
      |         list_reduce(list_prepend(0.0, list_transform(arr, x ->
      |           1.0 / (x.n::DOUBLE - 1.0))),
      |           (a, b) -> a + b) AS sum_inv
      |  FROM base
      |), f AS (
      |  SELECT k, n_total,
      |         (n_total::DOUBLE - k::DOUBLE) *
      |           round(ln(nullif(pooled_num / (n_total::DOUBLE - k::DOUBLE), 0.0)), 6)
      |           - sum_ln AS m,
      |         1.0 + (sum_inv - 1.0 / (n_total::DOUBLE - k::DOUBLE)) /
      |           (3.0 * (k::DOUBLE - 1.0)) AS c
      |  FROM folded
      |)
      |SELECT k, n_total, round(m / c, 6) AS chi2_bartlett
      |FROM f
      """.stripMargin.trim))

  private val cochranArmitage = QueryDef(
    "stat_cochran_armitage",
    "Cochran–Armitage trend test: does the fulfilled-order proportion " +
      "TREND monotonically across the five ordered priorities? The " +
      "ordered-groups companion to stat_chi2_independence (which only " +
      "detects SOME association) and stat_anova_f (which compares " +
      "means, not proportions) — the dose-response statistic an " +
      "experiment pipeline runs on ordinal arms. Scores t = the " +
      "priority's leading digit (1-URGENT → 1 … 5-LOW → 5, identical " +
      "substring semantics in both engines). Every sufficient " +
      "statistic is an exact BIGINT from ONE map-side-combining " +
      "rollup: k, N, R, Σt·r, Σt·n, Σt²·n — all ≤ 25·N, inside 2⁵³ " +
      "decades past sf100, so no fold channel is needed; " +
      "Z = (Σtr − p̄·Σtn) / √(p̄(1−p̄)(Σt²n − (Σtn)²/N)) evaluates in " +
      "double with ONE fixed parenthesization on both engines and " +
      "rounds at 6 (|Z| is σ-scaled — far below the 1e7 rounding " +
      "trap). A constant-status corpus reads NULL via nullif, not an " +
      "error. Cost: one aggregation shuffle over the orders scan; " +
      "everything after is k=5 rows.",
    (s, dir) => {
      val g = Tables.orders(s, dir)
        .select(expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("t"),
          when(col("o_orderstatus") === "F", lit(1L)).otherwise(lit(0L)).as("pos"))
        .groupBy(col("t")).agg(count(lit(1)).as("n"), sum(col("pos")).as("r"))
      g.agg(count(lit(1)).as("k"), sum(col("n")).as("n_total"),
          sum(col("r")).as("n_pos"),
          sum(col("t") * col("r")).as("str"),
          sum(col("t") * col("n")).as("stn"),
          sum(col("t") * col("t") * col("n")).as("snt2"))
        .select(col("k"), col("n_total"), col("n_pos"),
          round((col("str").cast("double") -
              col("n_pos").cast("double") / col("n_total").cast("double") *
                col("stn").cast("double")) /
            nullif(sqrt(col("n_pos").cast("double") / col("n_total").cast("double") *
              (lit(1.0) - col("n_pos").cast("double") / col("n_total").cast("double")) *
              (col("snt2").cast("double") -
                col("stn").cast("double") * col("stn").cast("double") /
                  col("n_total").cast("double"))), lit(0.0)), 6).as("z_trend"))
    },
    Some("""
      |WITH g AS (
      |  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS t,
      |         count(*)::BIGINT AS n,
      |         SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS r
      |  FROM orders GROUP BY 1
      |), s AS (
      |  SELECT count(*)::BIGINT AS k, SUM(n)::BIGINT AS n_total,
      |         SUM(r)::BIGINT AS n_pos,
      |         SUM(t * r)::BIGINT AS str, SUM(t * n)::BIGINT AS stn,
      |         SUM(t * t * n)::BIGINT AS snt2
      |  FROM g
      |)
      |SELECT k, n_total, n_pos,
      |       round((str::DOUBLE - n_pos::DOUBLE / n_total::DOUBLE * stn::DOUBLE) /
      |             nullif(sqrt(n_pos::DOUBLE / n_total::DOUBLE *
      |                  (1.0 - n_pos::DOUBLE / n_total::DOUBLE) *
      |                  (snt2::DOUBLE - stn::DOUBLE * stn::DOUBLE / n_total::DOUBLE)), 0.0), 6)
      |         AS z_trend
      |FROM s
      """.stripMargin.trim))

  private val wilcoxonSigned = QueryDef(
    "stat_wilcoxon_signed",
    "Wilcoxon signed-rank test — the PAIRED two-sample member the " +
      "rank battery lacked (stat_mannwhitney_u is unpaired, " +
      "stat_friedman needs k≥3 treatments): are daily purchase and " +
      "click value totals drawn from the same distribution, pairing " +
      "BY DAY so day-level volume shifts cancel? d = exact-cents " +
      "difference per day, zeros dropped (the textbook convention), " +
      "doubled midranks 2r = 2·|{<|d|}| + ties + 1 over the distinct " +
      "|d| grid (exact BIGINTs — the mannwhitney channel), " +
      "2W⁺ = Σ_{d>0} 2r, E[2W⁺] = n(n+1)/2 exact, and the " +
      "tie-corrected 12·Var(2W⁺) = 2n(n+1)(2n+1) − Σ(t³−t) exact; " +
      "z = (2W⁺ − E)/√(V12/12) is the ONE double op. Calendar-bounded " +
      "everywhere: n = paired days.",
    (s, dir) => {
      val daily = dailyCents(s, dir)
      val a = daily.filter(col("event_type") === "purchase")
        .select(col("day"), col("yc").as("ya"))
      val b = daily.filter(col("event_type") === "click")
        .select(col("day"), col("yc").as("yb"))
      val d = a.join(b, "day")
        .select((col("ya") - col("yb")).as("d"))
        .filter(col("d") =!= 0)
      val grid = d.groupBy(abs(col("d")).as("ad"))
        .agg(count(lit(1)).as("t"),
          sum(when(col("d") > 0, 1L).otherwise(0L)).as("npos"))
      val w = Window.orderBy(col("ad"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val ranked = grid.withColumn("below",
        coalesce(sum(col("t")).over(w), lit(0L)))
        .withColumn("r2", lit(2) * col("below") + col("t") + 1)
      ranked.agg(
          sum(col("t")).as("n_pairs"),
          sum(col("npos") * col("r2")).as("w2_plus"),
          sum(col("t") * col("t") * col("t") - col("t")).as("tiesum"))
        .select(col("n_pairs"), col("w2_plus"),
          expr("n_pairs * (n_pairs + 1) div 2").as("e2w"),
          (lit(2) * col("n_pairs") * (col("n_pairs") + 1) *
            (lit(2) * col("n_pairs") + 1) - col("tiesum")).as("v12"),
          round((col("w2_plus") - expr("n_pairs * (n_pairs + 1) div 2"))
              .cast("double") /
            sqrt((lit(2) * col("n_pairs") * (col("n_pairs") + 1) *
              (lit(2) * col("n_pairs") + 1) - col("tiesum")).cast("double") / 12.0),
            6).as("z_score"))
    },
    Some(s"""
      |WITH daily AS (
      |$dailyCentsSql
      |), d AS (
      |  SELECT a.yc - b.yc AS d
      |  FROM (SELECT day, yc FROM daily WHERE event_type = 'purchase') a
      |  JOIN (SELECT day, yc FROM daily WHERE event_type = 'click') b USING (day)
      |  WHERE a.yc - b.yc <> 0
      |), grid AS (
      |  SELECT abs(d) AS ad, count(*) AS t,
      |         SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END)::BIGINT AS npos
      |  FROM d GROUP BY 1
      |), ranked AS (
      |  SELECT t, npos,
      |         2 * COALESCE(SUM(t) OVER (ORDER BY ad
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1 AS r2
      |  FROM grid
      |), st AS (
      |  SELECT SUM(t)::BIGINT AS n_pairs,
      |         SUM(npos * r2)::BIGINT AS w2_plus,
      |         SUM(t * t * t - t)::BIGINT AS tiesum
      |  FROM ranked
      |)
      |SELECT n_pairs, w2_plus,
      |       n_pairs * (n_pairs + 1) // 2 AS e2w,
      |       2 * n_pairs * (n_pairs + 1) * (2 * n_pairs + 1) - tiesum AS v12,
      |       round((w2_plus - n_pairs * (n_pairs + 1) // 2)::DOUBLE /
      |             sqrt((2 * n_pairs * (n_pairs + 1) * (2 * n_pairs + 1) - tiesum)::DOUBLE / 12.0),
      |             6) AS z_score
      |FROM st
      """.stripMargin.trim))

  /** Durbin–Levinson φ formulas on the ROUND-6 acf columns r1..r3 — ONE
    * SQL string family evaluated verbatim by both engines (inputs are
    * the hash-gated round-6 autocorrelations, so the doubles walking
    * these trees are bit-identical). nullif guards the lag-1-degenerate
    * (|r1| = 1) and singular-denominator cases.
    */
  private val pacf2Sql =
    "(r2 - r1 * r1) / nullif(1.0 - r1 * r1, 0.0)"
  private val phi21Sql =
    "r1 * (1.0 - r2) / nullif(1.0 - r1 * r1, 0.0)"
  private lazy val pacf3Sql =
    s"(r3 - ($phi21Sql) * r2 - ($pacf2Sql) * r1) / " +
      s"nullif(1.0 - ($phi21Sql) * r1 - ($pacf2Sql) * r2, 0.0)"

  private val pacfDaily = QueryDef(
    "stat_pacf_daily",
    "Partial autocorrelation (lags 1–3) of the daily value series per " +
      "event type — the AR-order probe that completes the " +
      "stat_acf_daily / stat_ljung_box / ev_period_detect series " +
      "toolkit (ACF of an AR(1) decays forever; PACF cuts off at the " +
      "true order, which is what picks p in an AR(p) fit): " +
      "Durbin–Levinson on the SAME round-6 autocorrelations the ACF " +
      "gate hashes — φ11 = ρ1, φ22 = (ρ2 − ρ1²)/(1 − ρ1²), φ33 from " +
      "the level-2 coefficients — each φ from ONE SQL string " +
      "evaluated verbatim by both engines on the rounded inputs, so " +
      "the doubles are bit-identical; nullif guards singular " +
      "denominators. Cost = the ACF rollup + an O(|types|) pivot.",
    (s, dir) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val daily = dailyCents(s, dir)
      val mx = daily.agg(max(col("yc")).as("mx"))
      val d = daily.crossJoin(broadcast(mx))
        .withColumn("y", expr(s"yc div ($acfScaleSql)"))
        .withColumn("y1", lag(col("y"), 1).over(w))
        .withColumn("y2", lag(col("y"), 2).over(w))
        .withColumn("y3", lag(col("y"), 3).over(w))
      val pairs = d
        .select(col("event_type"), col("y"),
          expr("stack(3, 1, y1, 2, y2, 3, y3) as (lag_k, x)"))
        .filter(col("x").isNotNull)
      val st = pairs.groupBy(col("event_type"), col("lag_k")).agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("x")).cast("double").as("sx"), sum(col("y")).cast("double").as("sy"),
        sum(col("x") * col("x")).cast("double").as("sxx"),
        sum(col("y") * col("y")).cast("double").as("syy"),
        sum(col("x") * col("y")).cast("double").as("sxy"))
      val acf = st.filter((col("n") * col("sxx") - col("sx") * col("sx")) > 0 &&
          (col("n") * col("syy") - col("sy") * col("sy")) > 0)
        .select(col("event_type"), col("lag_k"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("acf"))
      acf.groupBy(col("event_type"))
        .agg(max(when(col("lag_k") === 1, col("acf"))).as("r1"),
          max(when(col("lag_k") === 2, col("acf"))).as("r2"),
          max(when(col("lag_k") === 3, col("acf"))).as("r3"))
        .filter(col("r1").isNotNull && col("r2").isNotNull && col("r3").isNotNull)
        .select(col("event_type"), col("r1").as("acf_1"), col("r2").as("acf_2"),
          col("r3").as("acf_3"),
          col("r1").as("pacf_1"),
          expr(s"round($pacf2Sql, 6)").as("pacf_2"),
          expr(s"round($pacf3Sql, 6)").as("pacf_3"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      |WITH daily AS (
      |$dailyCentsSql
      |), m AS (
      |  SELECT max(yc) AS mx FROM daily
      |), d AS (
      |  SELECT event_type, day, yc // ($acfScaleSql) AS y FROM daily CROSS JOIN m
      |), l AS (
      |  SELECT event_type, y,
      |         lag(y, 1) OVER w AS y1, lag(y, 2) OVER w AS y2, lag(y, 3) OVER w AS y3
      |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)
      |), p AS (
      |  SELECT event_type, 1 AS lag_k, y1 AS x, y FROM l WHERE y1 IS NOT NULL
      |  UNION ALL
      |  SELECT event_type, 2 AS lag_k, y2 AS x, y FROM l WHERE y2 IS NOT NULL
      |  UNION ALL
      |  SELECT event_type, 3 AS lag_k, y3 AS x, y FROM l WHERE y3 IS NOT NULL
      |), s AS (
      |  SELECT event_type, lag_k, count(*)::DOUBLE AS n,
      |         SUM(x)::DOUBLE AS sx, SUM(y)::DOUBLE AS sy,
      |         SUM(x*x)::DOUBLE AS sxx, SUM(y*y)::DOUBLE AS syy, SUM(x*y)::DOUBLE AS sxy
      |  FROM p GROUP BY 1, 2
      |), acf AS (
      |  SELECT event_type, lag_k,
      |         round((n * sxy - sx * sy) /
      |               sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS acf
      |  FROM s
      |  WHERE (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
      |), piv AS (
      |  SELECT event_type,
      |         MAX(CASE WHEN lag_k = 1 THEN acf END) AS r1,
      |         MAX(CASE WHEN lag_k = 2 THEN acf END) AS r2,
      |         MAX(CASE WHEN lag_k = 3 THEN acf END) AS r3
      |  FROM acf GROUP BY 1
      |)
      |SELECT event_type, r1 AS acf_1, r2 AS acf_2, r3 AS acf_3,
      |       r1 AS pacf_1,
      |       round($pacf2Sql, 6) AS pacf_2,
      |       round($pacf3Sql, 6) AS pacf_3
      |FROM piv
      |WHERE r1 IS NOT NULL AND r2 IS NOT NULL AND r3 IS NOT NULL
      |ORDER BY event_type
      """.stripMargin.trim))

  private val wilsonCi = QueryDef(
    "stat_wilson_ci",
    "Wilson score interval for a proportion — the CI that stays " +
      "honest at small n and extreme p̂ where the naive normal " +
      "interval escapes [0,1] (the reason production dashboards use " +
      "Wilson): per event type, p̂ = share of high-value events " +
      "(value ≥ 100, an exact compare on the 2-decimal grid), 95% " +
      "bounds from the closed form with z = 1.959964 embedded as the " +
      "IDENTICAL double literal in both engines (the stat_power_mde " +
      "channel — no inverse-normal anywhere); counts are exact " +
      "BIGINTs from ONE rollup, the bound formula is one fixed " +
      "shape, round 6.",
    (s, dir) => {
      val st = Tables.events(s, dir).groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        sum(when(col("value") >= 100.0, 1L).otherwise(0L)).as("k"))
      val z = lit(1.959964)
      val nD = col("n").cast("double"); val p = col("k").cast("double") / nD
      val denom = lit(1.0) + z * z / nD
      val center = (p + z * z / (lit(2.0) * nD)) / denom
      val half = z * sqrt(p * (lit(1.0) - p) / nD +
        z * z / (lit(4.0) * nD * nD)) / denom
      st.select(col("event_type"), col("n"), col("k"),
          round(p, 6).as("p_hat"),
          round(center - half, 6).as("wilson_lo"),
          round(center + half, 6).as("wilson_hi"))
        .orderBy(col("event_type"))
    },
    Some("""
      |WITH s AS (
      |  SELECT event_type, count(*)::BIGINT AS n,
      |         SUM(CASE WHEN value >= 100.0 THEN 1 ELSE 0 END)::BIGINT AS k
      |  FROM events GROUP BY 1
      |)
      |SELECT event_type, n, k,
      |       round(k::DOUBLE / n::DOUBLE, 6) AS p_hat,
      |       round((k::DOUBLE / n::DOUBLE + 1.959964 * 1.959964 / (2.0 * n::DOUBLE)) /
      |               (1.0 + 1.959964 * 1.959964 / n::DOUBLE) -
      |             1.959964 * sqrt(k::DOUBLE / n::DOUBLE * (1.0 - k::DOUBLE / n::DOUBLE) / n::DOUBLE +
      |                 1.959964 * 1.959964 / (4.0 * n::DOUBLE * n::DOUBLE)) /
      |               (1.0 + 1.959964 * 1.959964 / n::DOUBLE), 6) AS wilson_lo,
      |       round((k::DOUBLE / n::DOUBLE + 1.959964 * 1.959964 / (2.0 * n::DOUBLE)) /
      |               (1.0 + 1.959964 * 1.959964 / n::DOUBLE) +
      |             1.959964 * sqrt(k::DOUBLE / n::DOUBLE * (1.0 - k::DOUBLE / n::DOUBLE) / n::DOUBLE +
      |                 1.959964 * 1.959964 / (4.0 * n::DOUBLE * n::DOUBLE)) /
      |               (1.0 + 1.959964 * 1.959964 / n::DOUBLE), 6) AS wilson_hi
      |FROM s ORDER BY event_type
      """.stripMargin.trim))

  private val trimmedMean = QueryDef(
    "stat_trimmed_mean",
    "10%-trimmed and winsorized means of customer order value — the " +
      "robust location estimates between the mean (outlier-fragile) " +
      "and the median (throws away 98% of the data), the standard " +
      "monitoring statistic for heavy-tailed revenue series " +
      "(stat_hill_tail measures the tail; this summarizes the body). " +
      "Global order statistics via DistributedRank (range-partitioned " +
      "sort + offsets — never a single-partition window), k = n div " +
      "10 cut from each side; trimmed mean averages ranks (k, n−k], " +
      "winsorized clamps to the order statistics at ranks k+1 and " +
      "n−k (k·lo + middle + k·hi — exact BIGINT cents throughout, " +
      "one double division each, round 6).",
    (s, dir) => {
      val cents = Tables.orders(s, dir)
        .select(col("o_orderkey"),
          (col("o_totalprice").cast(Queries.Money.price).cast(dec2) * 100)
            .cast("long").as("cents"))
      val ranked = graft.operators.DistributedRank.byKey(
        cents, Seq(col("cents"), col("o_orderkey")))
      val n = ranked.agg(count(lit(1)).as("n"))
      val withN = ranked.crossJoin(broadcast(n))
        .withColumn("k", expr("n div 10"))
      withN.agg(
          first(col("n")).as("n_orders"),
          first(col("k")).as("k_cut"),
          sum(when(col("rank") > col("k") && col("rank") <= col("n") - col("k"),
            col("cents").cast(DecimalType(38, 0))).otherwise(lit(0).cast(DecimalType(38, 0))))
            .as("mid_sum"),
          max(when(col("rank") === col("k") + 1, col("cents"))).as("lo"),
          max(when(col("rank") === col("n") - col("k"), col("cents"))).as("hi"))
        .select(col("n_orders"), col("k_cut"),
          round(col("lo").cast("double") / 100.0, 2).as("winsor_lo"),
          round(col("hi").cast("double") / 100.0, 2).as("winsor_hi"),
          round(col("mid_sum").cast("double") /
            (col("n_orders") - lit(2) * col("k_cut")).cast("double") / 100.0, 6)
            .as("trimmed_mean"),
          round((col("mid_sum").cast("double") +
              col("k_cut").cast("double") * (col("lo") + col("hi")).cast("double")) /
            col("n_orders").cast("double") / 100.0, 6).as("winsorized_mean"))
    },
    Some("""
      |WITH cents AS (
      |  SELECT o_orderkey,
      |         CAST(CAST(o_totalprice AS DECIMAL(38,2)) * 100 AS BIGINT) AS cents
      |  FROM orders
      |), ranked AS (
      |  SELECT cents,
      |         row_number() OVER (ORDER BY cents, o_orderkey) AS rank,
      |         count(*) OVER () AS n
      |  FROM cents
      |), s AS (
      |  SELECT any_value(n)::BIGINT AS n_orders,
      |         any_value(n // 10)::BIGINT AS k_cut,
      |         SUM(CASE WHEN rank > n // 10 AND rank <= n - n // 10
      |                  THEN cents::HUGEINT ELSE 0::HUGEINT END) AS mid_sum,
      |         MAX(CASE WHEN rank = n // 10 + 1 THEN cents END) AS lo,
      |         MAX(CASE WHEN rank = n - n // 10 THEN cents END) AS hi
      |  FROM ranked
      |)
      |SELECT n_orders, k_cut,
      |       round(lo::DOUBLE / 100.0, 2) AS winsor_lo,
      |       round(hi::DOUBLE / 100.0, 2) AS winsor_hi,
      |       round(mid_sum::DOUBLE / (n_orders - 2 * k_cut)::DOUBLE / 100.0, 6) AS trimmed_mean,
      |       round((mid_sum::DOUBLE + k_cut::DOUBLE * (lo + hi)::DOUBLE) /
      |             n_orders::DOUBLE / 100.0, 6) AS winsorized_mean
      |FROM s
      """.stripMargin.trim))

  private val katz = QueryDef(
    "graph_katz_centrality",
    "Katz centrality over the directed trade graph — the walk-counting " +
      "centrality between degree (walks of length 1) and PageRank " +
      "(normalized random walks): x ← β + α·Aᵀx counts ALL incoming " +
      "walks damped by length, so a nation is central when many " +
      "nations trade into it THROUGH other central nations, without " +
      "PageRank's out-degree normalization (a hub's endorsement is " +
      "not diluted by its fan-out). 3 power iterations in exact " +
      "integer micro-units from x₀ = 10⁶: each step " +
      "x' = 10⁶ + Σ_in (x div 4) (α = 1/4 as truncating integer " +
      "division — the PageRank bit-stability contract, so the " +
      "ITERATION is hash-gated); one edge-keyed join + dst rollup per " +
      "step over the memoized entity-domain store. Oracle unrolls the " +
      "3 steps as MATERIALIZED CTEs.",
    (s, dir) => {
      val e = nationTradeWeighted(s, dir)
        .filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst")).distinct()
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()
      var x = nodes.withColumn("katz", lit(1000000L))
      for (_ <- 1 to 3) {
        val contrib = e.join(x, col("src") === col("node"))
          .groupBy(col("dst")).agg(sum(expr("katz div 4")).as("c"))
          .withColumnRenamed("dst", "cn")
        x = nodes.join(contrib, col("node") === col("cn"), "left")
          .select(col("node"),
            (lit(1000000L) + coalesce(col("c"), lit(0L))).as("katz"))
      }
      x.select(col("node"), col("katz").as("katz_micros"))
        .orderBy(col("katz_micros").desc, col("node"))
    },
    Some("""
      |WITH edges AS MATERIALIZED (
      |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  GROUP BY 1, 2
      |), e AS MATERIALIZED (
      |  SELECT DISTINCT src, dst FROM edges WHERE src <> dst
      |), nodes AS MATERIALIZED (
      |  SELECT DISTINCT node FROM (
      |    SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
      |), x0 AS MATERIALIZED (
      |  SELECT node, 1000000::BIGINT AS katz FROM nodes
      |), x1 AS MATERIALIZED (
      |  SELECT n.node,
      |         1000000 + COALESCE(SUM(x.katz // 4), 0)::BIGINT AS katz
      |  FROM nodes n
      |  LEFT JOIN e ON e.dst = n.node
      |  LEFT JOIN x0 x ON x.node = e.src
      |  GROUP BY 1
      |), x2 AS MATERIALIZED (
      |  SELECT n.node,
      |         1000000 + COALESCE(SUM(x.katz // 4), 0)::BIGINT AS katz
      |  FROM nodes n
      |  LEFT JOIN e ON e.dst = n.node
      |  LEFT JOIN x1 x ON x.node = e.src
      |  GROUP BY 1
      |), x3 AS (
      |  SELECT n.node,
      |         1000000 + COALESCE(SUM(x.katz // 4), 0)::BIGINT AS katz
      |  FROM nodes n
      |  LEFT JOIN e ON e.dst = n.node
      |  LEFT JOIN x2 x ON x.node = e.src
      |  GROUP BY 1
      |)
      |SELECT node, katz AS katz_micros
      |FROM x3 ORDER BY katz_micros DESC, node
      """.stripMargin.trim))

  private val pageTrend = QueryDef(
    "stat_page_trend",
    "Page's L test for ORDERED alternatives — the directional member " +
      "completing the within-block rank family (stat_friedman asks " +
      "'do the k treatments differ at all'; Page asks 'do they " +
      "increase in a HYPOTHESIZED order', which is what a dose/" +
      "version/stage comparison actually wants, and it has far more " +
      "power against monotone trends): blocks = complete days, " +
      "treatments = the event types in their deterministic " +
      "alphabetical order (the stated hypothesis ordering), " +
      "L = Σ_j j·R_j from doubled within-day midranks — 2r = " +
      "2·|{<}| + ties + 1 via one integer-RANGE window over the " +
      "(day, cents) grid, exact BIGINT throughout. E[2L] = " +
      "b·k(k+1)²/2 exact; 36·Var(2L) = b·k²(k+1)(k²−1) exact " +
      "(no-tie variance — the stat_mannwhitney stated-convention " +
      "precedent; cents ties across types within a day are " +
      "essentially impossible); z is the ONE double op.",
    (s, dir) => {
      val daily = dailyCents(s, dir)
      val kTypes = daily.select(col("event_type")).distinct()
        .agg(count(lit(1)).as("k"))
      val complete = daily
        .withColumn("nty", count(lit(1)).over(Window.partitionBy(col("day"))))
        .crossJoin(broadcast(kTypes))
        .filter(col("nty") === col("k"))
      val wd = Window.partitionBy(col("day")).orderBy(col("yc"))
      val ranked = complete
        .withColumn("lt", coalesce(count(lit(1)).over(
          wd.rangeBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("ties", count(lit(1)).over(
          Window.partitionBy(col("day"), col("yc"))))
        .withColumn("r2", lit(2) * col("lt") + col("ties") + 1)
      val wj = Window.orderBy(col("event_type"))
      val byType = ranked.groupBy(col("event_type"))
        .agg(sum(col("r2")).as("r2sum"), count(lit(1)).as("b"))
        .withColumn("j", row_number().over(wj))
      byType.agg(
          first(col("b")).as("b_days"),
          count(lit(1)).as("k_types"),
          sum(col("j") * col("r2sum")).as("l2"))
        .select(col("b_days"), col("k_types"), col("l2"),
          expr("b_days * k_types * (k_types + 1) * (k_types + 1) div 2").as("e2l"),
          expr("b_days * k_types * k_types * (k_types + 1) * " +
            "(k_types * k_types - 1)").as("v36"),
          round(expr("CAST(l2 - b_days * k_types * (k_types + 1) * (k_types + 1) div 2 AS DOUBLE)") /
            sqrt(expr("CAST(b_days * k_types * k_types * (k_types + 1) * " +
              "(k_types * k_types - 1) AS DOUBLE)") / 36.0), 6).as("z_score"))
    },
    Some(s"""
      |WITH daily AS (
      |$dailyCentsSql
      |), k AS (
      |  SELECT count(DISTINCT event_type)::BIGINT AS k FROM daily
      |), complete AS (
      |  SELECT d.* FROM daily d CROSS JOIN k
      |  QUALIFY count(*) OVER (PARTITION BY day) = k.k
      |), ranked AS (
      |  SELECT event_type, day,
      |         2 * COALESCE(count(*) OVER (PARTITION BY day ORDER BY yc
      |             RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) +
      |         count(*) OVER (PARTITION BY day, yc) + 1 AS r2
      |  FROM complete
      |), bytype AS (
      |  SELECT event_type, SUM(r2)::BIGINT AS r2sum, count(*)::BIGINT AS b,
      |         row_number() OVER (ORDER BY event_type) AS j
      |  FROM ranked GROUP BY 1
      |), st AS (
      |  SELECT any_value(b)::BIGINT AS b_days, count(*)::BIGINT AS k_types,
      |         SUM(j * r2sum)::BIGINT AS l2
      |  FROM bytype
      |)
      |SELECT b_days, k_types, l2,
      |       b_days * k_types * (k_types + 1) * (k_types + 1) // 2 AS e2l,
      |       b_days * k_types * k_types * (k_types + 1) * (k_types * k_types - 1) AS v36,
      |       round(CAST(l2 - b_days * k_types * (k_types + 1) * (k_types + 1) // 2 AS DOUBLE) /
      |             sqrt(CAST(b_days * k_types * k_types * (k_types + 1) *
      |                  (k_types * k_types - 1) AS DOUBLE) / 36.0), 6) AS z_score
      |FROM st
      """.stripMargin.trim))

  /** One random-walk step as a DuckDB CTE: walks at w{t-1} advance to
    * w{t} by the deterministic weighted pick (md5(walk:t) mod out-
    * weight landing in an edge's cumulative-weight interval).
    */
  private def duckWalkStep(t: Int): String =
    s"""w$t AS (
       |  SELECT w.walk_id, e.dst AS cur, w.path || '>' || e.dst::VARCHAR AS path
       |  FROM w${t - 1} w JOIN ei e ON e.src = w.cur
       |   AND (('0x' || substring(md5(w.walk_id::VARCHAR || ':$t'), 1, 12))::BIGINT % e.totw) >= e.lo
       |   AND (('0x' || substring(md5(w.walk_id::VARCHAR || ':$t'), 1, 12))::BIGINT % e.totw) < e.hi
       |)""".stripMargin.trim

  private val randomWalks = QueryDef(
    "graph_random_walks",
    "Weighted random-walk corpus sampling over the nation trade graph " +
      "— the walk-generation stage of DeepWalk / node2vec (p=q=1) " +
      "that turns a graph into skip-gram training sequences for " +
      "embedding training: one 8-step walk per nation, each step a " +
      "WEIGHTED pick among the current node's out-edges, made " +
      "deterministic (and oracle-replayable) by drawing r = " +
      "md5(walk_id:step) mod Σw(cur) and stepping along the edge " +
      "whose cumulative-weight interval [lo, hi) contains r — the " +
      "inverse-CDF pick that replaces an RNG with a portable hash. " +
      "Each step is ONE src-keyed join of the walk frontier against " +
      "the interval-annotated edge store (intervals precomputed once " +
      "via a per-src window): at production scale (millions of walks " +
      "× a partitioned edge table) the frontier is data-parallel and " +
      "the per-step shuffle is the whole cost — T bounded, never " +
      "corpus-sized driver state. Walks reaching a sink vanish from " +
      "every later frontier on BOTH engines (inner-join semantics), " +
      "so the gate covers the termination path too.",
    (s, dir) => {
      import graft.operators.RandomWalks
      val nation = Tables.nation(s, dir)
      val ei = RandomWalks.withIntervals(nationTradeWeighted(s, dir))
      val starts = nation.select(
        col("n_nationkey").cast("long").as("walk_id"),
        col("n_nationkey").cast("long").as("cur"),
        col("n_nationkey").cast("string").as("path"))
      RandomWalks.walk(starts, ei, steps = 8)
        .join(broadcast(nation), col("walk_id") === col("n_nationkey"))
        .select(col("n_name").as("start_nation"), col("path"),
          size(array_distinct(split(col("path"), ">"))).cast("long")
            .as("n_distinct_nodes"))
        .orderBy(col("start_nation"))
    },
    Some(("""
      |WITH edges AS MATERIALIZED (
      |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  GROUP BY 1, 2
      |), ei AS (
      |  SELECT src, dst, w,
      |         SUM(w) OVER (PARTITION BY src ORDER BY dst
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi,
      |         SUM(w) OVER (PARTITION BY src ORDER BY dst
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - w AS lo,
      |         SUM(w) OVER (PARTITION BY src) AS totw
      |  FROM edges
      |), w0 AS (
      |  SELECT n_nationkey::BIGINT AS walk_id, n_nationkey::BIGINT AS cur,
      |         n_nationkey::VARCHAR AS path
      |  FROM nation
      |), """.stripMargin.trim + "\n" +
      (1 to 8).map(duckWalkStep).mkString(",\n") + "\n" + """
      |SELECT n.n_name AS start_nation, w8.path,
      |       len(list_distinct(string_split(w8.path, '>')))::BIGINT AS n_distinct_nodes
      |FROM w8 JOIN nation n ON n.n_nationkey = w8.walk_id
      |ORDER BY start_nation
      """.stripMargin.trim)))

  private val walkSkipgrams = QueryDef(
    "graph_walk_skipgrams",
    "Skip-gram pair extraction from the random-walk corpus — the " +
      "stage that turns graph_random_walks' sequences into the " +
      "(center, context) training pairs a DeepWalk/node2vec embedding " +
      "actually trains on: window ±2 over each walk's node sequence, " +
      "pairs materialized INSIDE the array via one HOF projection " +
      "(flatten ∘ transform — zero shuffle until the final count " +
      "rollup), then (center, context) co-occurrence counts. At " +
      "production scale this is the map-side-combining aggregation " +
      "over |walks|·T·window pairs — the output is |nodes|²-bounded " +
      "regardless of walk volume, the same boundedness argument as " +
      "the Markov transition store. The oracle replays the walks " +
      "(the full md5 inverse-CDF chain) AND the pair window in SQL, " +
      "so the gate covers sequence → skip-gram end-to-end.",
    (s, dir) => {
      import graft.operators.RandomWalks
      val nation = Tables.nation(s, dir)
      val ei = RandomWalks.withIntervals(nationTradeWeighted(s, dir))
      val starts = nation.select(
        col("n_nationkey").cast("long").as("walk_id"),
        col("n_nationkey").cast("long").as("cur"),
        col("n_nationkey").cast("string").as("path"))
      RandomWalks.walk(starts, ei, steps = 8)
        .select(split(col("path"), ">").as("nodes"))
        .select(explode(expr(
          "flatten(transform(sequence(0, size(nodes) - 1), i -> " +
            "transform(filter(sequence(greatest(0, i - 2), least(size(nodes) - 1, i + 2)), " +
            "j -> j != i), j -> struct(nodes[i] AS center, nodes[j] AS context))))"))
          .as("p"))
        .select(col("p.center").cast("long").as("center"),
          col("p.context").cast("long").as("context"))
        .groupBy(col("center"), col("context"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("center"), col("context"))
    },
    Some(("""
      |WITH edges AS MATERIALIZED (
      |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  GROUP BY 1, 2
      |), ei AS (
      |  SELECT src, dst, w,
      |         SUM(w) OVER (PARTITION BY src ORDER BY dst
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi,
      |         SUM(w) OVER (PARTITION BY src ORDER BY dst
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - w AS lo,
      |         SUM(w) OVER (PARTITION BY src) AS totw
      |  FROM edges
      |), w0 AS (
      |  SELECT n_nationkey::BIGINT AS walk_id, n_nationkey::BIGINT AS cur,
      |         n_nationkey::VARCHAR AS path
      |  FROM nation
      |), """.stripMargin.trim + "\n" +
      (1 to 8).map(duckWalkStep).mkString(",\n") + "\n" + """
      |, pairs AS (
      |  SELECT u.center AS center, u.context AS context FROM (
      |    SELECT unnest(flatten(list_transform(range(len(nodes)), i ->
      |      list_transform(list_filter(range(greatest(0, i - 2), least(len(nodes), i + 3)),
      |        j -> j != i), j -> {'center': nodes[i + 1], 'context': nodes[j + 1]})))) AS u
      |    FROM (SELECT string_split(path, '>') AS nodes FROM w8)
      |  )
      |)
      |SELECT center::BIGINT AS center, context::BIGINT AS context,
      |       count(*)::BIGINT AS n_pairs
      |FROM pairs GROUP BY 1, 2 ORDER BY center, context
      """.stripMargin.trim)))

  private val fdrBh = QueryDef(
    "stat_fdr_bh",
    "Benjamini–Hochberg FDR control over a FAMILY of hypothesis tests " +
      "— the multiple-testing step every per-segment test battery " +
      "(stat_ks_two_sample, stat_ab_welch, …) needs before anyone acts " +
      "on 'nation X looks different': 25 simultaneous two-sample KS " +
      "tests (each nation's customer acctbal distribution vs all other " +
      "nations), asymptotic p = min(1, 2·exp(−2·n_e·D²)) with n_e = " +
      "n_a·n_b/N, then BH at α=0.10 — rank p ascending, reject ranks ≤ " +
      "k* = max{r : p_(r) ≤ r·α/m}. Every D is the integer argmax " +
      "|ca·nb − cb·na| over the pooled cents grid, computed for ALL 25 " +
      "nations from ONE dense (nation × grid) cumulative window — the " +
      "window rows are |nations| × |distinct cents values|, value-" +
      "domain × segment-count bounded, never row-count bounded; the " +
      "row-sized work is one (nation, cents) groupBy. D rounds at 6 " +
      "BEFORE the p-value so both engines exponentiate bit-identical " +
      "arguments; p and the BH thresholds round at 6 before every " +
      "comparison (the fixed-shape double channel). At 100 TB the " +
      "family is segments, not rows — the BH pass itself is O(m log m) " +
      "on m=25 rows.",
    (s, dir) => {
      val alpha = 0.10
      val c = Tables.customer(s, dir).select(col("c_nationkey"),
        (col("c_acctbal").cast(DecimalType(12, 2)) * 100).cast("long").as("vc"))
      val g1 = c.groupBy(col("c_nationkey"), col("vc")).agg(count(lit(1)).as("cnt"))
      val wg = Window.orderBy(col("vc"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val gridC = g1.groupBy(col("vc")).agg(sum(col("cnt")).as("tcnt"))
        .select(col("vc"), sum(col("tcnt")).over(wg).as("cg"))
      val nat = g1.groupBy(col("c_nationkey")).agg(sum(col("cnt")).as("na"))
      val tot = c.agg(count(lit(1)).as("n_total"))
      val wn = Window.partitionBy(col("c_nationkey")).orderBy(col("vc"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dense = gridC.crossJoin(broadcast(nat))
        .join(g1, Seq("c_nationkey", "vc"), "left")
        .select(col("c_nationkey"), col("vc"), col("cg"), col("na"),
          coalesce(col("cnt"), lit(0L)).as("cnt"))
      val dmax = dense
        .select(col("c_nationkey"), col("na"), col("cg"),
          sum(col("cnt")).over(wn).as("ca"))
        .crossJoin(broadcast(tot))
        .select(col("c_nationkey"), col("na"), col("n_total"),
          abs(col("ca") * (col("n_total") - col("na")) -
            (col("cg") - col("ca")) * col("na")).as("num"))
        .groupBy(col("c_nationkey"), col("na"), col("n_total"))
        .agg(max(col("num")).as("nummax"))
      val wr = Window.orderBy(col("p6"), col("c_nationkey"))
      val wAll = Window.partitionBy()
      val ranked = dmax
        .withColumn("nb", col("n_total") - col("na"))
        .withColumn("d6", round(col("nummax").cast("double") /
          (col("na").cast("double") * col("nb").cast("double")), 6))
        .withColumn("ne", col("na").cast("double") * col("nb").cast("double") /
          col("n_total").cast("double"))
        .withColumn("p6", round(least(
          lit(2.0) * exp(lit(-2.0) * col("ne") * col("d6") * col("d6")),
          lit(1.0)), 6))
        .withColumn("bh_rank", row_number().over(wr).cast("long"))
        .withColumn("m_tests", count(lit(1)).over(wAll))
        .withColumn("thr6", round(col("bh_rank").cast("double") * lit(alpha) /
          col("m_tests").cast("double"), 6))
        .withColumn("okr", when(col("p6") <= col("thr6"), col("bh_rank")).otherwise(lit(0L)))
        .withColumn("kstar", max(col("okr")).over(wAll))
      ranked
        .join(Tables.nation(s, dir).select(col("n_nationkey"), col("n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("na").as("n_cust"),
          col("d6").as("ks_d"), col("p6").as("p_value"),
          col("bh_rank"), col("thr6").as("bh_threshold"),
          (col("bh_rank") <= col("kstar")).cast("long").as("significant"))
        .orderBy(col("bh_rank"))
    },
    Some("""
      |WITH c AS (
      |  SELECT c_nationkey, CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS vc
      |  FROM customer
      |), g1 AS (
      |  SELECT c_nationkey, vc, count(*) AS cnt FROM c GROUP BY 1, 2
      |), grid AS (
      |  SELECT vc,
      |         SUM(tcnt) OVER (ORDER BY vc ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cg
      |  FROM (SELECT vc, SUM(cnt) AS tcnt FROM g1 GROUP BY 1)
      |), nat AS (
      |  SELECT c_nationkey, SUM(cnt) AS na FROM g1 GROUP BY 1
      |), tot AS (
      |  SELECT count(*) AS n_total FROM c
      |), dense AS (
      |  SELECT n.c_nationkey, g.vc, g.cg, n.na, COALESCE(g1.cnt, 0) AS cnt
      |  FROM grid g CROSS JOIN nat n
      |  LEFT JOIN g1 ON g1.c_nationkey = n.c_nationkey AND g1.vc = g.vc
      |), cum AS (
      |  SELECT c_nationkey, na, cg,
      |         SUM(cnt) OVER (PARTITION BY c_nationkey ORDER BY vc
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca
      |  FROM dense
      |), dmax AS (
      |  SELECT c_nationkey, na, n_total, max(abs(ca * (n_total - na) - (cg - ca) * na)) AS nummax
      |  FROM cum CROSS JOIN tot
      |  GROUP BY 1, 2, 3
      |), st AS (
      |  SELECT c_nationkey, na, n_total - na AS nb,
      |         round(nummax::DOUBLE / (na::DOUBLE * (n_total - na)::DOUBLE), 6) AS d6,
      |         na::DOUBLE * (n_total - na)::DOUBLE / n_total::DOUBLE AS ne
      |  FROM dmax
      |), pv AS (
      |  SELECT c_nationkey, na,
      |         d6, round(least(2.0::DOUBLE * exp(-2.0::DOUBLE * ne * d6 * d6), 1.0::DOUBLE), 6) AS p6
      |  FROM st
      |), rk AS (
      |  SELECT c_nationkey, na, d6, p6,
      |         row_number() OVER (ORDER BY p6, c_nationkey) AS bh_rank,
      |         count(*) OVER () AS m_tests
      |  FROM pv
      |), th AS (
      |  SELECT *, round(bh_rank::DOUBLE * 0.1::DOUBLE / m_tests::DOUBLE, 6) AS thr6 FROM rk
      |), ks AS (
      |  SELECT *, max(CASE WHEN p6 <= thr6 THEN bh_rank ELSE 0 END) OVER () AS kstar FROM th
      |)
      |SELECT n.n_name, ks.na::BIGINT AS n_cust, ks.d6 AS ks_d, ks.p6 AS p_value,
      |       ks.bh_rank::BIGINT AS bh_rank, ks.thr6 AS bh_threshold,
      |       (CASE WHEN ks.bh_rank <= ks.kstar THEN 1 ELSE 0 END)::BIGINT AS significant
      |FROM ks JOIN nation n ON n.n_nationkey = ks.c_nationkey
      |ORDER BY bh_rank
      """.stripMargin.trim))

  val defs: Seq[QueryDef] =
    Seq(trendOls, dailyCorr, markov, ewma, pagerank, centroidMatrix, fdrBh,
      abWelch, benford, ksTest, acf, bfs, chi2, gini, triangles, dowSeason,
      cusum, theilSen, mannWhitney, holt, kaplanMeier, assortativity, kendall,
      poissonBootstrap, kcore, labelPropagation, ssspWeighted, hillTail,
      pprParts, spearmanDaily, holtWinters, linkPrediction, hitsNations,
      anovaF, closeness, leveneBf, stlDecompose, jarqueBera, eccentricity,
      seasonalityStrength, grubbs, runsTest, betweenness, clusteringCoeff,
      kruskal, centroidDrift, ljungBox, normProfile, modularity, tukeyHsd,
      cramersV, louvainRefine, cochranArmitage, welchAnova, mannKendall,
      friedman, bartlett, periodDetect, pettitt, powerMde, markovStationary,
      richClub, cohensD, reciprocity, peakHour,
      wilcoxonSigned, pacfDaily, wilsonCi, trimmedMean, katz, pageTrend,
      randomWalks, walkSkipgrams, bootstrapAccCi, forecastMase, hyperAnf,
      hyperAnfDocs)
}
