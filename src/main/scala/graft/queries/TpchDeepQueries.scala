package graft.queries

import graft.Tables
import graft.queries.Queries.{Money, xsum}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The decorrelation-heavy half of the TPC-H-style surface: correlated
  * EXISTS / NOT EXISTS, correlated scalar aggregates, group-HAVING
  * semi joins — the query shapes where the OPTIMIZER (not the operator
  * set) determines whether the plan survives 100 TB.
  *
  * Shapes and what Catalyst must do with them:
  *   - q4:  correlated EXISTS with a cross-table inequality → left-semi
  *     join (RewritePredicateSubquery); one fact-fact shuffle.
  *   - q7:  nation-pair volume: all dims broadcast, ONE orders⋈lineitem
  *     shuffle; the pair predicate prunes on broadcast dims, never on
  *     the fact.
  *   - q10: returned-item revenue ranking: selective flag+date filter
  *     pushed to the scan before the join, top-k via
  *     TakeOrderedAndProject (no global sort).
  *   - q17: correlated scalar aggregate decorrelated BY HAND into a
  *     pre-aggregate + re-join on the SAME semi-joined scan — at scale
  *     the per-part average must come from one shuffle, not a
  *     re-executed subquery per row. All comparisons in exact integer
  *     arithmetic (quantities are integral) — zero float-parity risk.
  *   - q18: group-HAVING membership: aggregate lineitem once, the
  *     having-filtered aggregate IS the (tiny) build side for the join
  *     back — AQE turns it into a broadcast at runtime.
  *   - q21: semi + anti correlation on the same fact table
  *     (multi-supplier orders where exactly one supplier returned) →
  *     two left-semi/anti joins against re-scans of lineitem, both on
  *     the SAME l_orderkey partitioning.
  *   - q22: uncorrelated scalar subquery (one broadcast scalar) + NOT
  *     EXISTS anti join on orders.
  *
  * Fixture adaptations (no partsupp / commitdate / shipmode columns in
  * the driver schema — SURVEY §6): q4's "late" = shipped >60 days after
  * order date; q21's "failed" = l_returnflag = 'R'.
  */
object TpchDeepQueries {

  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(38, 6))).cast(DecimalType(38, 2)).cast("double")

  private val q4 = QueryDef(
    "q4_late_order_priority",
    "TPC-H Q4-style: correlated EXISTS (lineitem shipped >60 days after " +
      "the order date) → Catalyst RewritePredicateSubquery left-semi " +
      "join; count by priority.",
    (s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
      s.sql("""
        SELECT o_orderpriority, count(*) AS n_late_orders
        FROM orders_v o
        WHERE EXISTS (
          SELECT 1 FROM lineitem_v l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    },
    Some("""
      |SELECT o_orderpriority, count(*) AS n_late_orders
      |FROM orders o
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem l
      |  WHERE l.l_orderkey = o.o_orderkey
      |    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority
      """.stripMargin.trim))

  private val q7 = QueryDef(
    "q7_nation_volume",
    "TPC-H Q7-style: supplier-nation × customer-nation shipping volume " +
      "for one nation pair, by ship year. Dims broadcast; the pair " +
      "predicate lands on broadcast rows, the fact shuffles once.",
    (s, dir) => {
      val nation = Tables.nation(s, dir)
      val supp = Tables.supplier(s, dir)
        .join(broadcast(nation.select(col("n_nationkey"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("supp_nation"))
      val cust = Tables.customer(s, dir)
        .join(broadcast(nation.select(col("n_nationkey"), col("n_name").as("cust_nation"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("cust_nation"))
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .filter(
          (col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
          (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(xsum(Money.discPrice).as("revenue"), count(lit(1)).as("n_rows"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },
    Some("""
      |SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      |       CAST(year(l_shipdate) AS INT) AS l_year,
      |       CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) * 100) AS DOUBLE) / 100.0 AS revenue,
      |       count(*) AS n_rows
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |JOIN nation cn ON c_nationkey = cn.n_nationkey
      |WHERE (sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
      |   OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3')
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
      """.stripMargin.trim))

  private val q10 = QueryDef(
    "q10_returned_revenue",
    "TPC-H Q10-style returned-item report: flag+date filters pushed to " +
      "the scans, one fact shuffle, top-20 customers via " +
      "TakeOrderedAndProject on the exact-decimal revenue.",
    (s, dir) => {
      val li = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      val ord = Tables.orders(s, dir).filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(xsum(Money.discPrice).as("revenue"), count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""
      |SELECT c_custkey, c_name, n_name,
      |       CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) * 100) AS DOUBLE) / 100.0 AS revenue,
      |       count(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      |GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey LIMIT 20
      """.stripMargin.trim))

  private val q17 = QueryDef(
    "q17_small_qty_revenue",
    "TPC-H Q17-style correlated scalar aggregate (quantity below 20% of " +
      "the part's average), decorrelated into pre-aggregate + re-join on " +
      "one semi-joined scan. The threshold compare is exact integer " +
      "arithmetic (5·qty·cnt < Σqty) — no float boundary risk.",
    (s, dir) => {
      val brandParts = Tables.part(s, dir)
        .filter(col("p_brand") === "Brand#23").select("p_partkey")
      // Restrict lineitem to the brand's parts ONCE; both the per-part
      // average and the probe side reuse this scan (ReusedExchange).
      val li = Tables.lineitem(s, dir)
        .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"), "left_semi")
        .select(col("l_partkey"), col("l_quantity").cast("bigint").as("qty"),
          col("l_extendedprice"))
      val perPart = li.groupBy(col("l_partkey").as("pp_partkey"))
        .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("n_li"))
      li.join(broadcast(perPart), col("l_partkey") === col("pp_partkey"))
        .filter(col("qty") * lit(5L) * col("n_li") < col("sum_qty"))
        .agg(
          (floor(dsum(col("l_extendedprice")) / 7.0 * 100.0).cast("double") / 100.0)
            .as("avg_yearly"),
          count(lit(1)).as("n_rows"))
    },
    Some("""
      |WITH li AS (
      |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty, l_extendedprice
      |  FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23')
      |), pp AS (
      |  SELECT l_partkey AS pp_partkey, SUM(qty) AS sum_qty, COUNT(*) AS n_li
      |  FROM li GROUP BY 1
      |)
      |SELECT CAST(FLOOR(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DECIMAL(38,2)) AS DOUBLE) / 7.0 * 100.0) AS DOUBLE) / 100.0 AS avg_yearly,
      |       COUNT(*) AS n_rows
      |FROM li JOIN pp ON l_partkey = pp_partkey
      |WHERE qty * 5 * n_li < sum_qty
      """.stripMargin.trim))

  private val q18 = QueryDef(
    "q18_large_volume_orders",
    "TPC-H Q18-style large-volume orders: aggregate lineitem once, the " +
      "HAVING-filtered aggregate (204 keys at sf0.01) is the tiny build " +
      "side joined back to orders/customer — AQE broadcasts it at runtime.",
    (s, dir) => {
      val big = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("bigint")).as("sum_qty"))
        .filter(col("sum_qty") > 250L)
      Tables.orders(s, dir)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.customer(s, dir).select("c_custkey", "c_name")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    },
    Some("""
      |SELECT c_name, c_custkey, o_orderkey,
      |       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |       o_totalprice, CAST(sum_qty AS BIGINT) AS sum_qty
      |FROM orders
      |JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS BIGINT)) AS sum_qty
      |      FROM lineitem GROUP BY 1 HAVING sum_qty > 250) big
      |  ON o_orderkey = big.l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
      """.stripMargin.trim))

  private val q21 = QueryDef(
    "q21_waiting_suppliers",
    "TPC-H Q21-style: semi + anti correlation on the same fact — the " +
      "sole returning supplier on multi-supplier finished orders. Both " +
      "rewritten subqueries join on the SAME l_orderkey key.",
    (s, dir) => {
      Tables.supplier(s, dir).createOrReplaceTempView("supplier_v")
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT s_name, count(*) AS numwait
        FROM supplier_v
        JOIN lineitem_v l1 ON s_suppkey = l1.l_suppkey
        JOIN orders_v ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          AND EXISTS (
            SELECT 1 FROM lineitem_v l2
            WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM lineitem_v l3
            WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_returnflag = 'R')
        GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""")
    },
    Some("""
      |SELECT s_name, count(*) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_returnflag = 'R')
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
      """.stripMargin.trim))

  private val q22 = QueryDef(
    "q22_idle_balance",
    "TPC-H Q22-style: uncorrelated scalar subquery (avg positive " +
      "balance, broadcast as one scalar) + NOT EXISTS anti join against " +
      "the urgent-order subset; per-nation rollup of idle high-balance " +
      "customers (every fixture customer has SOME order, so the classic " +
      "no-orders predicate is vacuous — SURVEY §6).",
    (s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("customer_v")
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT c_nationkey, count(*) AS numcust,
               CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DECIMAL(38,2)) AS DOUBLE) AS totacctbal
        FROM customer_v
        WHERE CAST(c_acctbal AS DECIMAL(38,6)) > (
            SELECT avg(CAST(c_acctbal AS DECIMAL(38,6))) FROM customer_v
            WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders_v
                          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        GROUP BY c_nationkey ORDER BY c_nationkey""")
    },
    Some("""
      |SELECT c_nationkey, count(*) AS numcust,
      |       CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DECIMAL(38,2)) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE CAST(c_acctbal AS DECIMAL(38,6)) > (
      |    SELECT avg(CAST(c_acctbal AS DECIMAL(38,6))) FROM customer
      |    WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_nationkey ORDER BY c_nationkey
      """.stripMargin.trim))

  private val q8 = QueryDef(
    "q8_market_share",
    "TPC-H Q8-style market share: of all revenue shipped to ASIA-region " +
      "customers, the share supplied from one nation, by ship year. The " +
      "share is a conditional-sum ratio over ONE fact pass; every dim " +
      "broadcasts. Numerator and denominator are exact-decimal sums " +
      "surfaced as doubles, so the single divide is deterministic.",
    (s, dir) => {
      val nation = Tables.nation(s, dir)
      val custAsia = Tables.customer(s, dir)
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"))
      val suppNation = Tables.supplier(s, dir)
        .join(broadcast(nation.select(col("n_nationkey"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("supp_nation"))
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(custAsia), col("o_custkey") === col("c_custkey"), "left_semi")
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("l_shipdate")).as("l_year"))
        .agg(
          coalesce(xsum(when(col("supp_nation") === "NATION_3", Money.discPrice)), lit(0.0))
            .as("nation_revenue"),
          xsum(Money.discPrice).as("total_revenue"),
          count(lit(1)).as("n_rows"))
        .withColumn("mkt_share_pct",
          round(col("nation_revenue") * 100.0 / col("total_revenue"), 6))
        .orderBy(col("l_year"))
    },
    Some("""
      |SELECT CAST(year(l_shipdate) AS INT) AS l_year,
      |       COALESCE(CAST(FLOOR(SUM(CASE WHEN sn.n_name = 'NATION_3'
      |                     THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) END) * 100) AS DOUBLE) / 100.0, 0.0) AS nation_revenue,
      |       CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) * 100) AS DOUBLE) / 100.0 AS total_revenue,
      |       count(*) AS n_rows,
      |       round(COALESCE(CAST(FLOOR(SUM(CASE WHEN sn.n_name = 'NATION_3'
      |                     THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) END) * 100) AS DOUBLE) / 100.0, 0.0)
      |             * 100.0 /
      |             (CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) * 100) AS DOUBLE) / 100.0), 6) AS mkt_share_pct
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |WHERE o_custkey IN (
      |  SELECT c_custkey FROM customer
      |  JOIN nation cn ON c_nationkey = cn.n_nationkey
      |  JOIN region ON cn.n_regionkey = r_regionkey
      |  WHERE r_name = 'ASIA')
      |GROUP BY 1 ORDER BY 1
      """.stripMargin.trim))

  private val q15 = QueryDef(
    "q15_top_supplier",
    "TPC-H Q15-style top supplier: quarterly revenue per supplier, then " +
      "the supplier(s) matching the scalar MAX — the aggregate is " +
      "computed once and consumed twice (probe + max side). Equality " +
      "on the exact-floor revenue is engine-safe (both sides carry the " +
      "identical double).",
    (s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(xsum(Money.discPrice).as("total_revenue"))
      rev.createOrReplaceTempView("supplier_revenue_v")
      Tables.supplier(s, dir).createOrReplaceTempView("supplier_v")
      s.sql("""
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier_v JOIN supplier_revenue_v ON s_suppkey = l_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM supplier_revenue_v)
        ORDER BY s_suppkey""")
    },
    Some("""
      |WITH rev AS (
      |  SELECT l_suppkey,
      |         CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) * 100) AS DOUBLE) / 100.0 AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY 1
      |)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN rev ON s_suppkey = l_suppkey
      |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
      |ORDER BY s_suppkey
      """.stripMargin.trim))

  private val q19 = QueryDef(
    "q19_disjunctive_revenue",
    "TPC-H Q19-style disjunctive predicate join: three (brand, size, " +
      "quantity) OR-arms across lineitem⋈part. Catalyst factors the " +
      "common sub-predicates OUT of the OR (quantity/size lower bounds " +
      "push to both scans) and keeps the equi-join with the residual OR " +
      "as a post-join filter — never a nested loop.",
    (s, dir) => {
      val part = Tables.part(s, dir)
      val li = Tables.lineitem(s, dir)
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(xsum(Money.discPrice).as("revenue"), count(lit(1)).as("n_rows"))
    },
    Some("""
      |SELECT CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) * 100) AS DOUBLE) / 100.0 AS revenue,
      |       count(*) AS n_rows
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
      """.stripMargin.trim))

  private val q2 = QueryDef(
    "q2_min_cost_supplier",
    "TPC-H Q2-style minimum-cost supplier (fixture-adapted: no partsupp " +
      "table — unit cost = the supplier's lowest observed " +
      "l_extendedprice for the part, and the cost relation is region-" +
      "scoped up front exactly as Q2's inner subquery is). The " +
      "correlated scalar MIN decorrelates " +
      "(RewriteCorrelatedScalarSubquery) into a second aggregate over " +
      "the SAME (part,supplier) relation + an equality join back — both " +
      "shuffles share the l_partkey key family; every dim broadcasts. " +
      "MIN over identical doubles is exact selection in both engines; " +
      "no rounding anywhere; the top-100 cut orders on a unique " +
      "composite key.",
    (s, dir) => {
      val eur = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
      eur.createOrReplaceTempView("eur_supplier_v")
      // region filter lands BEFORE the fact aggregate — at 100 TB the
      // (part,supplier) rollup only ever sees the region's rows
      Tables.lineitem(s, dir)
        .join(broadcast(eur.select("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("l_extendedprice")).as("unit_cost"))
        .createOrReplaceTempView("part_supp_cost_v")
      Tables.part(s, dir).createOrReplaceTempView("part_v")
      s.sql("""
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
        FROM part_supp_cost_v c
        JOIN part_v ON p_partkey = c.l_partkey
        JOIN eur_supplier_v ON s_suppkey = c.l_suppkey
        WHERE p_type = 'LARGE'
          AND unit_cost = (SELECT MIN(c2.unit_cost) FROM part_supp_cost_v c2
                           WHERE c2.l_partkey = c.l_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""")
    },
    Some("""
      |WITH eur AS (
      |  SELECT s_suppkey, s_name, s_acctbal, n_name
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'
      |), cost AS (
      |  SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS unit_cost
      |  FROM lineitem
      |  WHERE l_suppkey IN (SELECT s_suppkey FROM eur)
      |  GROUP BY 1, 2
      |), best AS (
      |  SELECT l_partkey AS b_partkey, MIN(unit_cost) AS min_cost FROM cost GROUP BY 1
      |)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
      |FROM cost
      |JOIN best ON l_partkey = b_partkey AND unit_cost = min_cost
      |JOIN part ON p_partkey = l_partkey
      |JOIN eur ON s_suppkey = l_suppkey
      |WHERE p_type = 'LARGE'
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
      """.stripMargin.trim))

  private val q9 = QueryDef(
    "q9_product_profit",
    "TPC-H Q9-style product profit by supplier nation and ship year " +
      "(fixture-adapted: no partsupp — unit cost = 10% of " +
      "p_retailprice). profit = discPrice − cost·qty entirely in exact " +
      "decimal (every factor sits on its decimal grid), xsum-floored to " +
      "cents. One fact shuffle for the aggregate; part and " +
      "supplier⋈nation dims broadcast; the p_name LIKE filter prunes " +
      "the broadcast side before the join.",
    (s, dir) => {
      val widgetParts = Tables.part(s, dir)
        .filter(col("p_name").like("%widget%"))
        .select(col("p_partkey"), col("p_retailprice"))
      val suppNation = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      val profit = Money.discPrice -
        col("p_retailprice").cast(Money.price) * lit(0.10).cast(Money.rate) *
          col("l_quantity").cast(Money.price)
      Tables.lineitem(s, dir)
        .join(broadcast(widgetParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("nation"), year(col("l_shipdate")).as("o_year"))
        .agg(xsum(profit).as("sum_profit"), count(lit(1)).as("n_rows"))
        .orderBy(col("nation"), col("o_year").desc)
    },
    Some("""
      |SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS o_year,
      |       CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
      |                 - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(0.10 AS DECIMAL(4,2)) * CAST(l_quantity AS DECIMAL(12,2))) * 100) AS DOUBLE) / 100.0 AS sum_profit,
      |       count(*) AS n_rows
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%widget%'
      |GROUP BY 1, 2 ORDER BY 1, 2 DESC
      """.stripMargin.trim))

  private val q11 = QueryDef(
    "q11_important_stock",
    "TPC-H Q11-style important stock (fixture-adapted: value = exact-" +
      "decimal disc-price shipped by EUROPE-region suppliers, per part; " +
      "Q11's fixed HAVING fraction is concentration-unstable across " +
      "scale factors, so the registered shape is top-25-by-value with " +
      "the global-total scalar surfaced as a share). The total is ONE " +
      "broadcast scalar row consumed against the per-part rollup; share " +
      "division runs on the two exact floored-cents doubles so both " +
      "engines divide identical bits. Ordering and the top-k cut use " +
      "the PRESENTED (value, partkey) key.",
    (s, dir) => {
      val eurSupp = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"))
      val vpp = Tables.lineitem(s, dir)
        .join(broadcast(eurSupp), col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy(col("l_partkey"))
        .agg(sum(Money.discPrice.cast(DecimalType(38, 6))).as("vx"))
      val tot = vpp.agg(sum(col("vx")).as("totx"))
      val centsFloor = (c: org.apache.spark.sql.Column) =>
        floor(c * 100).cast("double") / lit(100.0)
      vpp.crossJoin(broadcast(tot))
        .select(col("l_partkey"), centsFloor(col("vx")).as("value"),
          round(centsFloor(col("vx")) / centsFloor(col("totx")), 9).as("share"))
        .orderBy(col("value").desc, col("l_partkey"))
        .limit(25)
    },
    Some("""
      |WITH eur AS (
      |  SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'
      |), val AS (
      |  SELECT l_partkey,
      |         SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(38,6))) AS vx
      |  FROM lineitem WHERE l_suppkey IN (SELECT s_suppkey FROM eur)
      |  GROUP BY 1
      |), tot AS (SELECT SUM(vx) AS totx FROM val)
      |SELECT l_partkey,
      |       CAST(FLOOR(vx * 100) AS DOUBLE) / 100.0 AS value,
      |       round((CAST(FLOOR(vx * 100) AS DOUBLE) / 100.0) / (CAST(FLOOR(totx * 100) AS DOUBLE) / 100.0), 9) AS share
      |FROM val, tot
      |ORDER BY value DESC, l_partkey LIMIT 25
      """.stripMargin.trim))

  private val q16 = QueryDef(
    "q16_parts_supplier",
    "TPC-H Q16-style supplier-relationship count (fixture-adapted: the " +
      "observed (part,supplier) pairs come from lineitem — no partsupp; " +
      "'complaint' suppliers = negative account balance). Pair " +
      "discovery is ONE distinct shuffle on (partkey,suppkey); the " +
      "exclusion list and the filtered part dim broadcast; " +
      "count-distinct runs on the already-distinct pair relation.",
    (s, dir) => {
      val badSupp = Tables.supplier(s, dir)
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      val selParts = Tables.part(s, dir)
        .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 9, 15, 22, 28, 36, 44, 50))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      Tables.lineitem(s, dir)
        .join(broadcast(selParts.select("p_partkey")),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
        .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(selParts), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },
    Some("""
      |SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 9, 15, 22, 28, 36, 44, 50)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3 ORDER BY supplier_cnt DESC, 1, 2, 3
      """.stripMargin.trim))

  private val q20 = QueryDef(
    "q20_potential_promotion",
    "TPC-H Q20-style nested subquery chain: suppliers in one region who " +
      "moved >30 units of any 'small%'-named part during 1996. Catalyst " +
      "rewrites both IN-subqueries to left-semi joins — the part list " +
      "broadcasts into the fact scan, the HAVING aggregate keys on " +
      "(suppkey,partkey), and the surviving supplier ids are a tiny " +
      "semi-join build side. Integer quantity arithmetic throughout.",
    (s, dir) => {
      Tables.supplier(s, dir).createOrReplaceTempView("supplier_v")
      Tables.nation(s, dir).createOrReplaceTempView("nation_v")
      Tables.region(s, dir).createOrReplaceTempView("region_v")
      Tables.part(s, dir).createOrReplaceTempView("part_v")
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
      s.sql("""
        SELECT s_name, s_acctbal
        FROM supplier_v JOIN nation_v ON s_nationkey = n_nationkey
        JOIN region_v ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
          AND s_suppkey IN (
            SELECT l_suppkey FROM lineitem_v
            WHERE l_partkey IN (SELECT p_partkey FROM part_v WHERE p_name LIKE 'small%')
              AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY l_suppkey, l_partkey
            HAVING SUM(CAST(l_quantity AS BIGINT)) > 30)
        ORDER BY s_name""")
    },
    Some("""
      |SELECT s_name, s_acctbal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'EUROPE'
      |  AND s_suppkey IN (
      |    SELECT l_suppkey FROM lineitem
      |    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      |      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |    GROUP BY l_suppkey, l_partkey
      |    HAVING SUM(CAST(l_quantity AS BIGINT)) > 30)
      |ORDER BY s_name
      """.stripMargin.trim))

  val defs: Seq[QueryDef] =
    Seq(q2, q4, q7, q8, q9, q10, q11, q15, q16, q17, q18, q19, q20, q21, q22)
}
