package graft.queries

import graft.Tables
import graft.queries.Queries.{Money, xsum}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operator coverage over the TPC-H-ish fixtures: multi-way
  * joins (broadcast for dims, shuffle for facts), window ranking,
  * rollup, set operations, semi/anti joins (SURVEY §2.4/§2.7).
  *
  * Scale notes: dimension tables (`region`, `nation`, `supplier`,
  * `customer` at these SFs) are explicitly `broadcast()`; the
  * fact-to-fact `orders ⋈ lineitem` join shuffles on the order key —
  * the partitioning a 100 TB layout would bucket both tables on. AQE
  * handles skew/coalescing at runtime.
  */
object RelationalQueries {

  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(38, 6))).cast(DecimalType(38, 2)).cast("double")

  private val q3 = QueryDef(
    "q3_shipping_priority",
    "TPC-H Q3-style: 3-way join (broadcast customer dim → shuffle " +
      "orders⋈lineitem), group, top-10 by revenue.",
    (s, dir) => {
      val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") < lit("1996-06-30").cast("timestamp"))
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > lit("1996-06-30").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(xsum(Money.discPrice).as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some("""
      |SELECT l_orderkey,
      |       CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) * 100) AS DOUBLE) / 100.0 AS revenue,
      |       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |       o_orderpriority
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1996-06-30 00:00:00'
      |  AND l_shipdate  > TIMESTAMP '1996-06-30 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10
      """.stripMargin.trim))

  private val q5 = QueryDef(
    "q5_local_supplier_volume",
    "TPC-H Q5-style 6-way join: region→nation→customer→orders→lineitem→" +
      "supplier with the local-supplier condition (s_nationkey = " +
      "c_nationkey). All dims broadcast; one fact shuffle.",
    (s, dir) => {
      val region = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      val nation = Tables.nation(s, dir)
      val cust = Tables.customer(s, dir)
      val ord = Tables.orders(s, dir).filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val li = Tables.lineitem(s, dir)
      val supp = Tables.supplier(s, dir)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust.select("c_custkey", "c_nationkey")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp.select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(xsum(Money.discPrice).as("revenue"),
          count(lit(1)).as("n_lineitems"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""
      |SELECT n_name,
      |       CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) * 100) AS DOUBLE) / 100.0 AS revenue,
      |       COUNT(*) AS n_lineitems
      |FROM region, nation, customer, orders, lineitem, supplier
      |WHERE r_name = 'ASIA' AND n_regionkey = r_regionkey
      |  AND s_nationkey = n_nationkey AND c_nationkey = s_nationkey
      |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name ORDER BY revenue DESC, n_name
      """.stripMargin.trim))

  private val windowTop = QueryDef(
    "window_top_orders_per_segment",
    "Window ranking: top-3 orders by total price within each market " +
      "segment (row_number over partitioned sort — the grouped-top-k " +
      "pattern; at scale this is a single shuffle on the partition key).",
    (s, dir) => {
      val cust = Tables.customer(s, dir)
      val ord = Tables.orders(s, dir)
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      ord.join(broadcast(cust.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .withColumn("rank_in_segment", row_number().over(w))
        .filter(col("rank_in_segment") <= 3)
        .select(col("c_mktsegment"), col("rank_in_segment"),
          col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("c_mktsegment"), col("rank_in_segment"))
    },
    Some("""
      |SELECT c_mktsegment, rank_in_segment, o_orderkey, o_totalprice
      |FROM (
      |  SELECT c_mktsegment, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY c_mktsegment
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rank_in_segment
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |)
      |WHERE rank_in_segment <= 3
      |ORDER BY c_mktsegment, rank_in_segment
      """.stripMargin.trim))

  private val rollupQ = QueryDef(
    "rollup_returnflag_status",
    "ROLLUP aggregation: quantity/price totals at (flag, status), " +
      "(flag), and grand-total levels; null grouping keys surfaced as " +
      "'ALL' (map-side partial aggregation covers every level in one " +
      "shuffle).",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("sum_qty"), col("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""
      |SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
      |       coalesce(l_linestatus, 'ALL') AS l_linestatus,
      |       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
      |       COUNT(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag, l_linestatus
      """.stripMargin.trim))

  private val setOps = QueryDef(
    "setops_customer_years",
    "Set operations on yearly active-customer sets: 1996 ∩ 1997, " +
      "1996 ∖ 1997, 1996 ∪ 1997 cardinalities in one row (intersect / " +
      "except / union distinct).",
    (s, dir) => {
      val ord = Tables.orders(s, dir)
      def active(year: Int) = ord.filter(
        col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
        col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
        .select(col("o_custkey")).distinct()
      val a = active(1996); val b = active(1997)
      val both = a.intersect(b).agg(count(lit(1)).as("n_both"))
      val only96 = a.except(b).agg(count(lit(1)).as("n_only_1996"))
      val either = a.union(b).distinct().agg(count(lit(1)).as("n_either"))
      both.crossJoin(only96).crossJoin(either)
    },
    Some("""
      |WITH a AS (SELECT DISTINCT o_custkey FROM orders
      |           WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |             AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'),
      |     b AS (SELECT DISTINCT o_custkey FROM orders
      |           WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |             AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
      |SELECT (SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS n_both,
      |       (SELECT count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)) AS n_only_1996,
      |       (SELECT count(*) FROM (SELECT * FROM a UNION SELECT * FROM b)) AS n_either
      """.stripMargin.trim))

  private val semiAnti = QueryDef(
    "semi_anti_customer_orders",
    "Semi/anti joins: per market segment, customers with ≥1 order vs " +
      "customers with none (left_semi / left_anti against orders).",
    (s, dir) => {
      val cust = Tables.customer(s, dir)
      val ordKeys = Tables.orders(s, dir).select(col("o_custkey"))
      val withOrders = cust.join(ordKeys, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_with_orders"))
      val withoutOrders = cust.join(ordKeys, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_without_orders"))
      withOrders.join(withoutOrders, Seq("c_mktsegment"), "full_outer")
        .select(col("c_mktsegment"),
          coalesce(col("n_with_orders"), lit(0L)).as("n_with_orders"),
          coalesce(col("n_without_orders"), lit(0L)).as("n_without_orders"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""
      |WITH w AS (
      |  SELECT c_mktsegment, count(*) AS n_with_orders FROM customer
      |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  GROUP BY c_mktsegment
      |), wo AS (
      |  SELECT c_mktsegment, count(*) AS n_without_orders FROM customer
      |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  GROUP BY c_mktsegment
      |)
      |SELECT coalesce(w.c_mktsegment, wo.c_mktsegment) AS c_mktsegment,
      |       coalesce(n_with_orders, 0) AS n_with_orders,
      |       coalesce(n_without_orders, 0) AS n_without_orders
      |FROM w FULL OUTER JOIN wo ON w.c_mktsegment = wo.c_mktsegment
      |ORDER BY c_mktsegment
      """.stripMargin.trim))

  private val q12 = QueryDef(
    "q12_priority_by_shipmode",
    "TPC-H Q12-style conditional aggregation: CASE WHEN inside sums, IN-" +
      "list + range predicates pushed to the scan, one fact shuffle.",
    (s, dir) => {
      val ord = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir).filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_linenumber").isin(1, 2, 3))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linenumber"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("low_line_count"))
        .orderBy(col("l_linenumber"))
    },
    Some("""
      |SELECT l_linenumber,
      |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_linenumber IN (1, 2, 3)
      |GROUP BY l_linenumber ORDER BY l_linenumber
      """.stripMargin.trim))

  private val q14 = QueryDef(
    "q14_promo_share",
    "TPC-H Q14-style: LIKE predicate inside conditional aggregation, " +
      "broadcast part dim, single-division ratio (deterministic double).",
    (s, dir) => {
      val part = Tables.part(s, dir)
      val li = Tables.lineitem(s, dir).filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-07-01").cast("timestamp"))
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .agg(
          (round(
            coalesce(xsum(when(col("p_type").like("%a%"), Money.discPrice)), lit(0.0))
              * 100.0 /
              xsum(Money.discPrice), 6))
            .as("promo_share_pct"),
          count(lit(1)).as("n_rows"))
    },
    Some("""
      |SELECT round(
      |         COALESCE(CAST(FLOOR(SUM(CASE WHEN p_type LIKE '%a%'
      |                       THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) END) * 100) AS DOUBLE) / 100.0, 0.0)
      |         * 100.0 /
      |         CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) * 100) AS DOUBLE) / 100.0, 6) AS promo_share_pct,
      |       COUNT(*) AS n_rows
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
      """.stripMargin.trim))

  private val scalarSub = QueryDef(
    "scalar_subquery_above_avg",
    "Scalar subquery: customers per segment with account balance above " +
      "the global average (subquery broadcast as a scalar; one dim scan " +
      "+ one reuse).",
    (s, dir) => {
      val cust = Tables.customer(s, dir)
      cust.createOrReplaceTempView("customer_v")
      s.sql("""
        SELECT c_mktsegment, count(*) AS n_above
        FROM customer_v
        WHERE CAST(c_acctbal AS DECIMAL(38,6)) > (SELECT avg(CAST(c_acctbal AS DECIMAL(38,6))) FROM customer_v)
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    },
    Some("""
      |SELECT c_mktsegment, count(*) AS n_above
      |FROM customer
      |WHERE CAST(c_acctbal AS DECIMAL(38,6)) > (SELECT avg(CAST(c_acctbal AS DECIMAL(38,6))) FROM customer)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment
      """.stripMargin.trim))

  private val cubeQ = QueryDef(
    "cube_returnflag_status",
    "CUBE aggregation (SURVEY §2.7): all four grouping sets of (flag, " +
      "status) — (both), (flag), (status), () — in one shuffle with " +
      "map-side partials; oracle spells the equivalent GROUPING SETS.",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.cube(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("sum_qty"), col("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""
      |SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
      |       coalesce(l_linestatus, 'ALL') AS l_linestatus,
      |       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
      |       COUNT(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus), ())
      |ORDER BY l_returnflag, l_linestatus
      """.stripMargin.trim))

  private val distinctCounts = QueryDef(
    "distinct_customers_by_priority",
    "Exact distinct aggregation (SURVEY §2.5): per order priority, " +
      "count(DISTINCT custkey) next to the plain row count — Spark " +
      "expands the distinct into a two-phase aggregate (partial " +
      "per-key dedup before the shuffle). The approximate variant " +
      "(approx_count_distinct/HLL, the 100 TB path when exactness is " +
      "negotiable) is spec-covered with tolerance in TextDedupSpec.",
    (s, dir) => {
      val ord = Tables.orders(s, dir)
      ord.groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("n_distinct_custs"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      |SELECT o_orderpriority,
      |       COUNT(DISTINCT o_custkey) AS n_distinct_custs,
      |       COUNT(*) AS n_orders
      |FROM orders
      |GROUP BY o_orderpriority ORDER BY o_orderpriority
      """.stripMargin.trim))

  private val ntileQ = QueryDef(
    "ntile_balance_quartiles",
    "NTILE bucketing (SURVEY §2.7): account-balance quartiles WITHIN " +
      "each market segment (partitioned, so no global sort — each " +
      "segment ranks independently), unique-key tiebreak, quartile " +
      "summary stats.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, dir)
        .withColumn("quartile", ntile(4).over(w).cast("long")) // DuckDB ntile is BIGINT
        .groupBy(col("c_mktsegment"), col("quartile"))
        .agg(count(lit(1)).as("n"),
          dsum(col("c_acctbal")).as("bal_sum"))
        .orderBy(col("c_mktsegment"), col("quartile"))
    },
    Some("""
      |WITH q AS (
      |  SELECT c_mktsegment, c_acctbal,
      |         ntile(4) OVER (PARTITION BY c_mktsegment
      |                        ORDER BY c_acctbal, c_custkey) AS quartile
      |  FROM customer
      |)
      |SELECT c_mktsegment, quartile, count(*) AS n,
      |       CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DECIMAL(38,2)) AS DOUBLE) AS bal_sum
      |FROM q GROUP BY 1, 2 ORDER BY c_mktsegment, quartile
      """.stripMargin.trim))

  private val upsertQ = QueryDef(
    "upsert_orders_latest_wins",
    "Latest-wins upsert (batch MERGE emulation, SURVEY §2.1): a " +
      "deterministic update slice (every 97th order, +10.0 price, " +
      "version 1) merged over the base table (version 0) — one keyed " +
      "shuffle + WindowGroupLimit rank, rerun-identical. Verified by " +
      "post-merge aggregate: row count unchanged, updated-row count, " +
      "exact price sum reflecting the deltas.",
    (s, dir) => {
      val ord = Tables.orders(s, dir)
      val base = ord.withColumn("_v", lit(0L))
      val upd = ord.filter(col("o_orderkey") % 97 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 10.0)
        .withColumn("_v", lit(1L))
      graft.operators.Upsert.latestWins(base, upd, Seq("o_orderkey"), "_v")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("_v")).as("n_updated"),
          dsum(col("o_totalprice")).as("price_sum"))
    },
    Some("""
      |WITH base AS (
      |  SELECT o_orderkey, o_totalprice, 0 AS v FROM orders
      |), upd AS (
      |  SELECT o_orderkey, o_totalprice + 10.0 AS o_totalprice, 1 AS v
      |  FROM orders WHERE o_orderkey % 97 = 0
      |), merged AS (
      |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY v DESC) AS rn
      |  FROM (SELECT * FROM base UNION ALL SELECT * FROM upd)
      |)
      |SELECT count(*) AS n_rows,
      |       CAST(SUM(v) AS BIGINT) AS n_updated,
      |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DECIMAL(38,2)) AS DOUBLE) AS price_sum
      |FROM merged WHERE rn = 1
      """.stripMargin.trim))

  private val q13 = QueryDef(
    "q13_customer_distribution",
    "TPC-H Q13-style: customers LEFT OUTER orders (zero-order " +
      "customers kept — the outer-join coverage a semi/anti pair " +
      "misses), per-customer order count, then the distribution " +
      "histogram. Two keyed aggregations, both map-side partial.",
    (s, dir) => {
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""
      |SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey
      |)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC
      """.stripMargin.trim))

  private val saltedJoinQ = QueryDef(
    "skew_salted_join_revenue",
    "Skew-mitigated fact join: lineitem⋈orders through Skew.saltedJoin " +
      "— the fact side salted into 8 sub-keys per order key, the other " +
      "side replicated 8× — then revenue per order priority. The salt " +
      "must be RESULT-INVISIBLE: the oracle is the plain unsalted join, " +
      "so a green hash proves salting changes the task layout, never " +
      "the semantics.",
    (s, dir) => {
      import graft.operators.Skew
      // the salt driver must be row-unique-ish, NOT the join key itself
      // (salting on the key gives every row of a hot key the same salt —
      // zero spreading); (orderkey, linenumber) is the lineitem PK,
      // packed NUMERICALLY (linenumber ∈ 1..7 < 8) — the previous
      // concat_ws built a fresh string per fact row just to feed
      // xxhash64, pure allocation overhead on the 100 TB side
      // (guide §2.3: narrower types). Salt values change with the
      // driver, but the salt is result-invisible by construction.
      val li = Tables.lineitem(s, dir)
        .withColumn("l_row_key",
          col("l_orderkey").cast("long") * lit(8L) + col("l_linenumber").cast("long"))
      val j = Skew.saltedJoin(
        li,
        Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority")),
        bigKey = "l_orderkey", smallKey = "o_orderkey",
        bigDisambig = "l_row_key", saltFactor = 8)
      j.groupBy(col("o_orderpriority"))
        .agg(xsum(Money.discPrice).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      |SELECT o_orderpriority,
      |       CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) * 100) AS DOUBLE) / 100.0 AS revenue,
      |       COUNT(*) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority
      """.stripMargin.trim))

  private val recursiveRollup = QueryDef(
    "sql_recursive_rollup",
    "Recursive CTE (WITH RECURSIVE — Spark 4.x's iterative CTE " +
      "execution, mirrored by DuckDB's): a synthetic customer " +
      "hierarchy (parent = custkey div 10, roots are the single-digit " +
      "keys — deterministic from the fixture, contiguous keys make " +
      "every ancestor exist) is traversed to the root, then rolled up " +
      "per root: descendant count, max depth, exact balance cents. " +
      "Each recursion step is one join of the table against the " +
      "current frontier, so the whole traversal is O(depth) = " +
      "O(log₁₀ |customer|) shuffles regardless of data volume — the " +
      "org-chart / BOM-explosion query shape at warehouse scale. " +
      "Everything is exact integer arithmetic; `div` truncation equals " +
      "DuckDB `//` flooring on the positive key domain.",
    (s, dir) => {
      // the default 1M-row recursion guardrail trips at sf10's 15M-row
      // tree; the traversal is depth-bounded (≤ log₁₀ keys levels), so
      // raising the ROW limit is the intended knob for a big table.
      // Every customer key enters the frontier exactly once, so the
      // recursion's total row volume ≈ |customer| — derive the limit
      // from the actual table size (4× margin) instead of a fixed
      // constant, and RESTORE the session's prior value afterwards:
      // the raised limit must only be in effect at EXECUTION time, so
      // the result is materialized eagerly (localCheckpoint) inside
      // the try, leaving the runaway-recursion guard intact for every
      // later query on the shared session. The checkpointed output is
      // |roots| ≤ 10 rows — re-reads hit the blocks, never re-recurse.
      Tables.customer(s, dir)
        .select(col("c_custkey"),
          (col("c_acctbal").cast(DecimalType(12, 2)) * 100).cast("long").as("cents"))
        .createOrReplaceTempView("graft_hier_customer")
      val key = "spark.sql.cteRecursionRowLimit"
      val prev = s.conf.get(key)
      val derived = math.min(
        math.max(4L * Tables.customer(s, dir).count(), prev.toLong),
        Int.MaxValue.toLong)
      s.conf.set(key, derived.toString)
      try {
        s.sql("""
          WITH RECURSIVE tree(custkey, root, depth, cents) AS (
            SELECT c_custkey, c_custkey, 0, cents
            FROM graft_hier_customer WHERE c_custkey < 10
            UNION ALL
            SELECT c.c_custkey, t.root, t.depth + 1, c.cents
            FROM graft_hier_customer c JOIN tree t
              ON c.c_custkey div 10 = t.custkey
            WHERE c.c_custkey >= 10
          )
          SELECT root, count(*) AS n_nodes, CAST(max(depth) AS BIGINT) AS max_depth,
                 sum(cents) AS total_cents
          FROM tree GROUP BY root ORDER BY root""").localCheckpoint()
      } finally s.conf.set(key, prev)
    },
    Some("""
      |WITH RECURSIVE cust AS (
      |  SELECT c_custkey, CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |  FROM customer
      |), tree(custkey, root, depth, cents) AS (
      |  SELECT c_custkey, c_custkey, 0, cents FROM cust WHERE c_custkey < 10
      |  UNION ALL
      |  SELECT c.c_custkey, t.root, t.depth + 1, c.cents
      |  FROM cust c JOIN tree t ON c.c_custkey // 10 = t.custkey
      |  WHERE c.c_custkey >= 10
      |)
      |SELECT root, count(*) AS n_nodes, CAST(max(depth) AS BIGINT) AS max_depth,
      |       SUM(cents)::BIGINT AS total_cents
      |FROM tree GROUP BY root ORDER BY root
      """.stripMargin.trim))

  private val lateralTopk = QueryDef(
    "sql_lateral_topk",
    "LATERAL correlated subquery (the SQL:1999 table-valued-correlation " +
      "surface, supported by Spark 3.2+'s lateral join and DuckDB " +
      "alike): per nation, the top-2 customers by exact balance cents " +
      "with a custkey tiebreak, written as `nation, LATERAL (SELECT … " +
      "ORDER BY … LIMIT 2)`. Catalyst decorrelates the per-row " +
      "subquery into a ranked join rather than |nation| separate " +
      "scans — the plan-level point of gating this surface. Balances " +
      "stay integer cents end-to-end.",
    (s, dir) => {
      Tables.nation(s, dir).createOrReplaceTempView("graft_lat_nation")
      Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey"),
          (col("c_acctbal").cast(DecimalType(12, 2)) * 100).cast("long").as("cents"))
        .createOrReplaceTempView("graft_lat_customer")
      s.sql("""
        SELECT n_name AS nation, t.c_custkey, t.cents
        FROM graft_lat_nation,
        LATERAL (
          SELECT c_custkey, cents FROM graft_lat_customer
          WHERE c_nationkey = n_nationkey
          ORDER BY cents DESC, c_custkey LIMIT 2
        ) t
        ORDER BY nation, cents DESC, c_custkey""")
    },
    Some("""
      |WITH cust AS (
      |  SELECT c_custkey, c_nationkey,
      |         CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |  FROM customer
      |)
      |SELECT n_name AS nation, t.c_custkey, t.cents
      |FROM nation,
      |LATERAL (
      |  SELECT c_custkey, cents FROM cust
      |  WHERE c_nationkey = n_nationkey
      |  ORDER BY cents DESC, c_custkey LIMIT 2
      |) t
      |ORDER BY nation, cents DESC, c_custkey
      """.stripMargin.trim))

  private val groupingSetsQ = QueryDef(
    "sql_grouping_sets",
    "GROUPING SETS with explicit GROUPING() flags — the third member " +
      "of the multi-level aggregation family beside ROLLUP (prefix " +
      "hierarchy) and CUBE (full lattice): ((flag), (status), ()) " +
      "computes two INDEPENDENT one-dimension summaries plus the grand " +
      "total in ONE pass, the shape a reporting layer asks for when " +
      "the dimensions are alternatives, not a hierarchy. GROUPING() " +
      "flags disambiguate a real NULL key from a superaggregate row " +
      "(the correctness trap coalesce-only presentations hide); " +
      "Spark's Dataset.groupingSets API plans the same single-shuffle " +
      "expand as rollup/cube.",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).cast("long").as("g_flag"),
          grouping(col("l_linestatus")).cast("long").as("g_status"),
          dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("g_flag"), col("g_status"), col("sum_qty"), col("n"))
        .orderBy(col("g_flag"), col("g_status"),
          col("l_returnflag"), col("l_linestatus"))
    },
    Some("""
      |SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
      |       coalesce(l_linestatus, 'ALL') AS l_linestatus,
      |       GROUPING(l_returnflag)::BIGINT AS g_flag,
      |       GROUPING(l_linestatus)::BIGINT AS g_status,
      |       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
      |       COUNT(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY g_flag, g_status, l_returnflag, l_linestatus
      """.stripMargin.trim))

  val defs: Seq[QueryDef] =
    Seq(q3, q5, windowTop, rollupQ, cubeQ, distinctCounts, setOps, semiAnti,
      q12, q13, q14, scalarSub, ntileQ, upsertQ, saltedJoinQ, recursiveRollup,
      lateralTopk, groupingSetsQ)
}
