package graft.queries

import graft.Tables
import graft.operators.PageRank
import org.apache.spark.sql.SparkSession
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

  private val markov = QueryDef(
    "ev_markov_transitions",
    "First-order Markov transition matrix over per-user event sequences " +
      "(the behavioral-model estimation query): lag window ordered by " +
      "(ts, event_id) — the unique id makes timestamp ties " +
      "deterministic — then transition counts and row-normalized " +
      "probabilities (one exact integer division pair per cell). One " +
      "user-keyed window shuffle over the scan; the |types|² matrix " +
      "aggregation is a rounding error at any scale.",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, dir)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .select(col("prev_type"), col("event_type").as("next_type"))
      pairs.groupBy(col("prev_type"), col("next_type")).agg(count(lit(1)).as("n"))
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
      "hash gate. Edges+degrees cached once; one groupBy(dst) shuffle " +
      "per iteration.",
    (s, dir) => {
      val nation = Tables.nation(s, dir)
      val edges = Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        .agg(count(lit(1)).as("w"))
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
      |SELECT n.n_name AS nation, r3.r AS rank_micro
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
      |SELECT na AS n_a, nb AS n_b,
      |       round(num::DOUBLE / (na::DOUBLE * nb::DOUBLE), 6) AS ks_d,
      |       vc::DOUBLE / 100.0 AS at_value
      |FROM d
      """.stripMargin.trim))

  val defs: Seq[QueryDef] =
    Seq(trendOls, dailyCorr, markov, ewma, pagerank, centroidMatrix,
      abWelch, benford, ksTest)
}
