package graft.queries

import graft.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DecimalType, DoubleType, TimestampType}

/** Data-quality / data-governance operators a 100 TB training-data
  * pipeline runs before anything else touches the corpus: a one-pass
  * column profiler (null counts, exact cardinality, typed extrema) and
  * blocked fuzzy record linkage (edit-distance matching that dedupes
  * the key space BEFORE the quadratic comparison step).
  *
  * Reference behavior anchor: the reference's pre-index validation is
  * only IMPLICIT — ingest_hotels.py:9 reads the fixed-schema CSV and
  * the INSERT at ingest_hotels.py:28-36 assumes the nine expected
  * columns exist and are well-typed, crashing on any drift. These
  * operators are the explicit, engine-native form of that sanity step,
  * required by the driver's 100 TB training-data-pipeline mandate (no
  * direct reference counterpart beyond the implicit schema contract).
  */
object QualityQueries {

  /** Engine-stable string form of a typed extremum: timestamps via ISO
    * format, doubles via DECIMAL(18,2) (both engines print "123.45" —
    * raw double→string reprs differ), everything else via plain cast.
    * Applied AFTER the min/max (native-typed ordering, THEN formatting
    * — string-forming first would make numeric extrema lexicographic).
    */
  private def strForm(c: Column, dt: DataType): Column = dt match {
    case TimestampType => date_format(c, "yyyy-MM-dd HH:mm:ss")
    case DoubleType    => c.cast(DecimalType(18, 2)).cast("string")
    case _             => c.cast("string")
  }

  private val profileCols = Seq(
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  private val profileQ = QueryDef(
    "dq_profile_orders",
    "Column profiler over orders: per-column null count, EXACT distinct " +
      "cardinality, and typed min/max (doubles through DECIMAL(18,2), " +
      "timestamps through ISO strings — engine-stable reprs). Split " +
      "into two column-pruned passes so the expensive one stays in " +
      "whole-stage HashAggregate: pass A (all null counts + distincts " +
      "+ numeric/timestamp extrema) keeps only mutable-buffer types in " +
      "the aggregate — a min/max over a STRING column would demote the " +
      "whole multi-distinct Expand to SortAggregate (two extra sorts of " +
      "the expanded data, measured 4× slower); pass B computes just the " +
      "string extrema (no expand, no grouping — a linear scan of the 2 " +
      "string columns) and cross-joins its single row. Output is 6 rows " +
      "regardless of input size; the exact-cardinality expand is the " +
      "documented cost — approx_count_distinct is the sub-linear " +
      "fallback when ±2% suffices at 100 TB.",
    (s, dir) => {
      import org.apache.spark.sql.types.StringType
      val o = Tables.orders(s, dir)
      val types = o.schema.fields.map(f => f.name -> f.dataType).toMap
      val (strCols, numCols) = profileCols.partition(c => types(c) == StringType)
      val aggsA = profileCols.flatMap { c =>
        Seq(
          count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
          count_distinct(col(c)).as(s"${c}__nd"))
      } ++ numCols.flatMap { c =>
        Seq(min(col(c)).as(s"${c}__minN"), max(col(c)).as(s"${c}__maxN"))
      }
      val aggsB = strCols.flatMap { c =>
        Seq(min(col(c)).as(s"${c}__min"), max(col(c)).as(s"${c}__max"))
      }
      val wide = o.agg(aggsA.head, aggsA.tail: _*)
        .crossJoin(o.agg(aggsB.head, aggsB.tail: _*))
        .select(col("*") +: numCols.flatMap(c => Seq(
          strForm(col(s"${c}__minN"), types(c)).as(s"${c}__min"),
          strForm(col(s"${c}__maxN"), types(c)).as(s"${c}__max"))): _*)
      val stackArgs = profileCols.map(c =>
        s"'$c', ${c}__nulls, ${c}__nd, ${c}__min, ${c}__max").mkString(", ")
      wide.select(expr(
          s"stack(${profileCols.length}, $stackArgs) " +
          "AS (col_name, n_nulls, n_distinct, min_s, max_s)"))
        .orderBy(col("col_name"))
    },
    Some(profileCols.map { c =>
      val (minS, maxS) = c match {
        case "o_orderdate" =>
          (s"strftime(min($c), '%Y-%m-%d %H:%M:%S')",
           s"strftime(max($c), '%Y-%m-%d %H:%M:%S')")
        case "o_totalprice" =>
          (s"CAST(CAST(min($c) AS DECIMAL(18,2)) AS VARCHAR)",
           s"CAST(CAST(max($c) AS DECIMAL(18,2)) AS VARCHAR)")
        case _ =>
          (s"CAST(min($c) AS VARCHAR)", s"CAST(max($c) AS VARCHAR)")
      }
      s"""SELECT '$c' AS col_name, count(*) - count($c) AS n_nulls,
         |       count(DISTINCT $c) AS n_distinct, $minS AS min_s, $maxS AS max_s
         |FROM orders""".stripMargin
    }.mkString("\n", "\nUNION ALL\n", "\nORDER BY col_name")),
  )

  private val fuzzyLinkQ = QueryDef(
    "link_fuzzy_parts",
    "Blocked fuzzy record linkage: distinct part names (keys deduped " +
      "with counts BEFORE the quadratic step — the only shape that " +
      "survives scale), self-joined within a blocking key (last name " +
      "token) and matched at Levenshtein distance ≤ 3. Output pairs " +
      "carry the underlying row-pair multiplicity (cnt_a·cnt_b). The " +
      "candidate space is Σ per-block |distinct|², never |rows|² — at " +
      "100 TB the distinct-key relation is the only thing shuffled.",
    (s, dir) => {
      val names = Tables.part(s, dir)
        .groupBy(col("p_name")).agg(count(lit(1)).as("cnt"))
        .withColumn("blk", element_at(split(col("p_name"), " "), -1))
      val a = names.select(col("p_name").as("name_a"), col("cnt").as("cnt_a"), col("blk"))
      val b = names.select(col("p_name").as("name_b"), col("cnt").as("cnt_b"), col("blk"))
      a.join(b, Seq("blk"))
        .filter(col("name_a") < col("name_b"))
        .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
        .filter(col("dist") <= 3)
        .select(col("name_a"), col("name_b"), col("dist"),
          (col("cnt_a") * col("cnt_b")).as("n_row_pairs"))
        .orderBy(col("name_a"), col("name_b"))
    },
    Some("""
      |WITH names AS (
      |  SELECT p_name, count(*) AS cnt, string_split(p_name, ' ')[-1] AS blk
      |  FROM part GROUP BY p_name
      |)
      |SELECT a.p_name AS name_a, b.p_name AS name_b,
      |       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
      |       CAST(a.cnt * b.cnt AS BIGINT) AS n_row_pairs
      |FROM names a JOIN names b ON a.blk = b.blk AND a.p_name < b.p_name
      |WHERE levenshtein(a.p_name, b.p_name) <= 3
      |ORDER BY name_a, name_b
      """.stripMargin.trim))

  private val expectationsQ = QueryDef(
    "dq_expectations_orders",
    "Declarative data-quality expectations over orders (the " +
      "Great-Expectations/Deequ ingest gate): four row-local rules " +
      "(positive total, total under the 400k anomaly budget — " +
      "NON-vacuous: the fixture violates it, date window, known " +
      "priority vocabulary) evaluate in ONE aggregate pass — each rule " +
      "is a sum(violated) column beside a shared count(*), map-side " +
      "partials, unpivoted to a row per rule — plus one referential " +
      "rule (o_custkey resolves in customer) as a left-anti join " +
      "against the deduplicated parent keys. Adding a row-local rule " +
      "adds a column to the partial aggregate, never a pass over the " +
      "100 TB fact table.",
    (s, dir) => {
      import graft.operators.Expectations
      val ord = Tables.orders(s, dir)
      val rowLocal = Expectations.check(ord, Seq(
        "positive_total" -> (col("o_totalprice") > 0),
        "total_under_400k" -> (col("o_totalprice") <= 400000),
        "orderdate_in_window" ->
          col("o_orderdate").between("1995-01-01", "2001-12-31 23:59:59"),
        "known_priority" -> col("o_orderpriority").isin(
          "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")))
      val fk = Expectations.refCheck("custkey_in_customer",
        ord, "o_custkey", Tables.customer(s, dir), "c_custkey")
      rowLocal.unionAll(fk).orderBy(col("rule"))
    },
    Some("""
      |WITH n AS (SELECT count(*) AS n_rows FROM orders),
      |row_local AS (
      |  SELECT * FROM (
      |    SELECT 'positive_total' AS rule,
      |           sum(CASE WHEN NOT COALESCE(o_totalprice > 0, FALSE) THEN 1 ELSE 0 END) AS n_violations
      |    FROM orders
      |    UNION ALL
      |    SELECT 'total_under_400k',
      |           sum(CASE WHEN NOT COALESCE(o_totalprice <= 400000, FALSE) THEN 1 ELSE 0 END)
      |    FROM orders
      |    UNION ALL
      |    SELECT 'orderdate_in_window',
      |           sum(CASE WHEN NOT COALESCE(o_orderdate BETWEEN TIMESTAMP '1995-01-01'
      |             AND TIMESTAMP '2001-12-31 23:59:59', FALSE) THEN 1 ELSE 0 END)
      |    FROM orders
      |    UNION ALL
      |    SELECT 'known_priority',
      |           sum(CASE WHEN NOT COALESCE(o_orderpriority IN ('1-URGENT', '2-HIGH',
      |             '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW'), FALSE) THEN 1 ELSE 0 END)
      |    FROM orders
      |  )
      |), fk AS (
      |  SELECT 'custkey_in_customer' AS rule, count(*) AS n_violations
      |  FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      |    ON o.o_custkey = c.c_custkey
      |  WHERE c.c_custkey IS NULL
      |)
      |SELECT rule, n_violations::BIGINT AS n_violations, n.n_rows
      |FROM (SELECT * FROM row_local UNION ALL SELECT * FROM fk), n
      |ORDER BY rule
      """.stripMargin.trim))

  private val kAnonymity = QueryDef(
    "dq_k_anonymity",
    "k-anonymity / l-diversity audit — the privacy gate a training-data " +
      "release runs before publishing: quasi-identifier = (nation, " +
      "market segment, $1000 balance bucket), k = equivalence-class " +
      "size, l = distinct sensitive values (customer spend tier, " +
      "derived from one orders rollup joined in). Classes with k < 5 " +
      "or l < 2 are the re-identification risks. The bucket uses " +
      "offset-shifted integer division so negative balances floor " +
      "identically in Spark `div` (truncates toward zero) and DuckDB " +
      "`//` (floors) — both see only positive numerators. Output is " +
      "bounded by the QI domain, not the row count; everything is " +
      "exact integer arithmetic.",
    (s, dir) => {
      val spend = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg((sum(col("o_totalprice").cast(DecimalType(12, 2))).cast(DecimalType(38, 2)) * 100)
          .cast("long").as("y_cents"))
      val cust = Tables.customer(s, dir)
        .join(spend, col("c_custkey") === col("o_custkey"), "left")
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("c_mktsegment"),
          expr("(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) + 1000000000) div 100000 - 10000")
            .as("bal_kb"),
          when(coalesce(col("y_cents"), lit(0L)) === 0L, "none")
            .when(col("y_cents") >= 50000000L, "high")
            .otherwise("normal").as("tier"))
      cust.groupBy(col("nation"), col("c_mktsegment"), col("bal_kb"))
        .agg(count(lit(1)).as("k"), countDistinct(col("tier")).as("l"))
        .withColumn("at_risk", (col("k") < 5 || col("l") < 2).cast("long"))
        .orderBy(col("nation"), col("c_mktsegment"), col("bal_kb"))
    },
    Some("""
      |WITH spend AS (
      |  SELECT o_custkey,
      |         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) * 100 AS BIGINT) AS y_cents
      |  FROM orders GROUP BY 1
      |), cust AS (
      |  SELECT n_name AS nation, c_mktsegment,
      |         (CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) + 1000000000) // 100000 - 10000 AS bal_kb,
      |         CASE WHEN COALESCE(y_cents, 0) = 0 THEN 'none'
      |              WHEN y_cents >= 50000000 THEN 'high'
      |              ELSE 'normal' END AS tier
      |  FROM customer
      |  LEFT JOIN spend ON c_custkey = o_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |)
      |SELECT nation, c_mktsegment, bal_kb,
      |       count(*) AS k, count(DISTINCT tier) AS l,
      |       CAST(count(*) < 5 OR count(DISTINCT tier) < 2 AS BIGINT) AS at_risk
      |FROM cust GROUP BY 1, 2, 3
      |ORDER BY nation, c_mktsegment, bal_kb
      """.stripMargin.trim))

  private val tableFingerprint = QueryDef(
    "dq_table_fingerprint",
    "Replication-verification fingerprints: per document source, row " +
      "count, key extrema, and an order-independent additive md5-48 " +
      "row-set checksum (the maint_compact_roundtrip idiom promoted to " +
      "a first-class audit query — compare these few rows across " +
      "replicas/migrations instead of 100 TB of data). The checksum " +
      "folds doc_id, lang, and md5(text), so content corruption, row " +
      "loss and duplication all move it; DECIMAL(38,0) accumulation " +
      "is exact and the string form is engine-stable. One partial-" +
      "aggregated scan; output is |sources| rows.",
    (s, dir) => {
      // coalesce EVERY component: concat_ws silently skips NULLs while
      // the oracle's || nulls the whole key — either way a NULL-bearing
      // row would stop moving the checksum, which is exactly the
      // corruption class a fingerprint must catch. The sentinel is the
      // control char U+0001 (DuckDB chr(1)) — outside any plausible
      // value domain, so a LITERAL string that spells a sentinel can't
      // collide with a genuine NULL and hide that corruption class.
      val rowKey = concat_ws("|",
        coalesce(col("doc_id").cast("string"), lit("\u0001")),
        coalesce(col("lang"), lit("\u0001")),
        coalesce(md5(col("text")), lit("\u0001")))
      val h = conv(substring(md5(rowKey), 1, 12), 16, 10).cast(DecimalType(38, 0))
      Tables.documents(s, dir)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
          sum(col("n_chars")).as("sum_chars"),
          sum(h).cast(DecimalType(38, 0)).cast("string").as("rowset_fp"))
        .orderBy(col("source"))
    },
    Some("""
      |SELECT source, count(*) AS n_rows,
      |       min(doc_id) AS min_id, max(doc_id) AS max_id,
      |       SUM(n_chars)::BIGINT AS sum_chars,
      |       CAST(CAST(SUM(CAST(('0x' || substring(md5(
      |         coalesce(doc_id::VARCHAR, chr(1)) || '|' ||
      |         coalesce(lang, chr(1)) || '|' ||
      |         coalesce(md5(text), chr(1))), 1, 12))::BIGINT
      |         AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR) AS rowset_fp
      |FROM documents GROUP BY 1 ORDER BY source
      """.stripMargin.trim))

  private val driftTv = QueryDef(
    "dq_drift_tv",
    "Distribution-drift monitor: total-variation distance between the " +
      "event-value distributions of the first 15 days and the rest of " +
      "the window (the log-free alternative to PSI/KL — those need " +
      "libm ln, whose cross-engine rounding is unspecified). The " +
      "period split derives from the data's min day (no fixture date " +
      "literal); TV = Σ|c₁n₂ − c₂n₁| / (2n₁n₂) is exact integer " +
      "cross-multiplication over the distinct cents grid (the KS " +
      "machinery pointed at drift), one final division. Output is one " +
      "row; grid work is value-domain-bounded.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
        .select(to_date(col("ts")).as("day"),
          (col("value").cast(DecimalType(12, 2)) * 100).cast("long").as("vc"))
      val tagged = ev
        .withColumn("mind", min(col("day")).over(Window.partitionBy()))
        .select(col("vc"),
          when(datediff(col("day"), col("mind")) < 15, 1L).otherwise(0L).as("is_a"))
      val g = tagged.groupBy(col("vc"))
        .agg(sum(col("is_a")).as("c1"), sum(lit(1L) - col("is_a")).as("c2"))
      val tot = Window.partitionBy()
      g.select(col("vc"), col("c1"), col("c2"),
          sum(col("c1")).over(tot).as("n1"), sum(col("c2")).over(tot).as("n2"))
        .agg(first(col("n1")).as("n_first15"), first(col("n2")).as("n_rest"),
          count(lit(1)).as("n_grid"),
          sum(abs(col("c1") * col("n2") - col("c2") * col("n1"))).as("num"))
        .select(col("n_first15"), col("n_rest"), col("n_grid"),
          round(col("num").cast("double") /
            (lit(2.0) * col("n_first15").cast("double") * col("n_rest").cast("double")), 6)
            .as("tv_distance"))
    },
    Some("""
      |WITH ev AS (
      |  SELECT ts::TIMESTAMP::DATE AS day,
      |         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS vc
      |  FROM events
      |), tagged AS (
      |  SELECT vc, CASE WHEN date_diff('day', min(day) OVER (), day) < 15
      |                  THEN 1 ELSE 0 END AS is_a
      |  FROM ev
      |), g AS (
      |  SELECT vc, SUM(is_a) AS c1, SUM(1 - is_a) AS c2 FROM tagged GROUP BY 1
      |), c AS (
      |  SELECT vc, c1, c2, SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2 FROM g
      |), s AS (
      |  SELECT any_value(n1)::BIGINT AS n_first15, any_value(n2)::BIGINT AS n_rest,
      |         count(*) AS n_grid,
      |         SUM(abs(c1 * n2 - c2 * n1))::BIGINT AS num
      |  FROM c
      |)
      |SELECT n_first15, n_rest, n_grid,
      |       round(num::DOUBLE / (2.0 * n_first15::DOUBLE * n_rest::DOUBLE), 6)
      |         AS tv_distance
      |FROM s
      """.stripMargin.trim))

  private val dpCounts = QueryDef(
    "dq_dp_counts",
    "Differentially-private count release (Laplace mechanism, ε=1, " +
      "sensitivity 1) over per-(lang, source) document counts — the " +
      "aggregate-release gate beside dq_k_anonymity's re-identification " +
      "audit. Noise is drawn by inverse-CDF on a SEEDED uniform " +
      "(md5-48 of a release-key constant + the group key, the " +
      "stat_poisson_bootstrap idiom): Laplace = −b·sign(u−½)·" +
      "ln(1−2|u−½|) — the replayable common-random-numbers form " +
      "production DP systems use so a re-run releases the SAME noise " +
      "instead of averaging it away across retries (the privacy " +
      "budget is spent once); with the seed a fixture constant here, " +
      "this gates the MECHANISM, not a privacy guarantee — stated " +
      "plainly. One group-keyed aggregate, one ln per GROUP (not per " +
      "row); noisy counts floor at 0 and round at 2. Output bounded " +
      "by the (lang × source) domain.",
    (s, dir) => {
      val eps = 1.0
      val u = (graft.operators.TextAnalysis.md5Long48(
        concat(lit("dp-release-1:"), col("lang"), lit("/"), col("source")))
        .cast("double") + lit(0.5)) / lit(281474976710656.0)
      val noise = round(
        (lit(-1.0) / lit(eps)) * signum(u - lit(0.5)) *
          log(lit(1.0) - lit(2.0) * abs(u - lit(0.5))), 6)
      Tables.documents(s, dir)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_true"))
        .withColumn("noise", noise)
        .withColumn("n_noisy",
          round(greatest(col("n_true").cast("double") + col("noise"),
            lit(0.0)), 2))
        .select(col("lang"), col("source"), col("n_noisy"))
        .orderBy(col("lang"), col("source"))
    },
    Some("""
      |WITH g AS (
      |  SELECT lang, source, count(*) AS n_true
      |  FROM documents GROUP BY 1, 2
      |), seeded AS (
      |  SELECT lang, source, n_true,
      |         (CAST(('0x' || substring(md5('dp-release-1:' || lang || '/' || source), 1, 12))::BIGINT
      |               AS DOUBLE) + 0.5) / 281474976710656.0 AS u
      |  FROM g
      |), noised AS (
      |  SELECT lang, source, n_true,
      |         round((-1.0 / 1.0) * sign(u - 0.5) *
      |               ln(1.0 - 2.0 * abs(u - 0.5)), 6) AS noise
      |  FROM seeded
      |)
      |SELECT lang, source,
      |       round(greatest(CAST(n_true AS DOUBLE) + noise, 0.0), 2) AS n_noisy
      |FROM noised
      |ORDER BY lang, source
      """.stripMargin.trim))

  private val refIntegrity = QueryDef(
    "dq_referential_integrity",
    "Foreign-key orphan audit across the star schema — the referential " +
      "health check a warehouse runs before trusting any join result " +
      "(an orphan rate > 0 silently deflates every inner join " +
      "downstream; this query makes that loss visible per FK edge). " +
      "Four child→parent edges, each ONE left-anti join on the key " +
      "(shuffle-partitioned by the key at scale — never a data-sized " +
      "broadcast of the child) reduced to exact counts; orphan_rate " +
      "is one rounded division. Zero orphans on these fixtures is the " +
      "EXPECTED green — the gate pins the mechanism and the totals.",
    (s, dir) => {
      def leg(name: String, child: org.apache.spark.sql.DataFrame, key: String,
              parent: org.apache.spark.sql.DataFrame, pkey: String) = {
        val nChild = child.agg(count(lit(1)).as("n_child"))
        val nOrphan = child.join(parent,
            child(key) === parent(pkey), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
        nChild.crossJoin(nOrphan).select(
          lit(name).as("fk_edge"), col("n_child"), col("n_orphans"),
          round(col("n_orphans").cast("double") / col("n_child").cast("double"), 6)
            .as("orphan_rate"))
      }
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      leg("orders.custkey->customer", o, "o_custkey",
          Tables.customer(s, dir), "c_custkey")
        .unionAll(leg("lineitem.orderkey->orders", l, "l_orderkey", o, "o_orderkey"))
        .unionAll(leg("lineitem.partkey->part", l, "l_partkey",
          Tables.part(s, dir), "p_partkey"))
        .unionAll(leg("lineitem.suppkey->supplier", l, "l_suppkey",
          Tables.supplier(s, dir), "s_suppkey"))
        .orderBy(col("fk_edge"))
    },
    Some("""
      |WITH legs AS (
      |  SELECT 'orders.custkey->customer' AS fk_edge,
      |         (SELECT count(*) FROM orders)::BIGINT AS n_child,
      |         (SELECT count(*) FROM orders o
      |          WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))::BIGINT AS n_orphans
      |  UNION ALL
      |  SELECT 'lineitem.orderkey->orders',
      |         (SELECT count(*) FROM lineitem)::BIGINT,
      |         (SELECT count(*) FROM lineitem l
      |          WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))::BIGINT
      |  UNION ALL
      |  SELECT 'lineitem.partkey->part',
      |         (SELECT count(*) FROM lineitem)::BIGINT,
      |         (SELECT count(*) FROM lineitem l
      |          WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))::BIGINT
      |  UNION ALL
      |  SELECT 'lineitem.suppkey->supplier',
      |         (SELECT count(*) FROM lineitem)::BIGINT,
      |         (SELECT count(*) FROM lineitem l
      |          WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))::BIGINT
      |)
      |SELECT fk_edge, n_child, n_orphans,
      |       round(CAST(n_orphans AS DOUBLE) / CAST(n_child AS DOUBLE), 6) AS orphan_rate
      |FROM legs ORDER BY fk_edge
      """.stripMargin.trim))

  private val pkUniqueness = QueryDef(
    "dq_pk_uniqueness",
    "Primary-key uniqueness + density audit across every single-key " +
      "table — the OTHER half of referential health next to " +
      "dq_referential_integrity's FK edges: per table, row count vs " +
      "exact distinct-key count (duplicates = silent row explosion in " +
      "every downstream join), typed key extrema, and key-range " +
      "density n_keys·10⁶ div (max−min+1) in exact integer millionths " +
      "(density ≪ 1 flags sparse/remapped id spaces before a dense-" +
      "array assumption corrupts a build, e.g. an IVF id-partitioned " +
      "store). Zero duplicates on the fixtures is the EXPECTED green; " +
      "the gate pins the mechanism and the exact counts. Each table " +
      "is ONE map-side-combining aggregate; output is 8 rows.",
    (s, dir) => {
      def audit(name: String, df: org.apache.spark.sql.DataFrame, key: String) =
        df.agg(count(lit(1)).as("n_rows"),
            countDistinct(col(key)).as("n_keys"),
            min(col(key)).cast("long").as("min_key"),
            max(col(key)).cast("long").as("max_key"))
          .select(lit(name).as("table_name"), col("n_rows"), col("n_keys"),
            (col("n_rows") - col("n_keys")).as("n_dup_keys"),
            col("min_key"), col("max_key"),
            (expr("CAST((n_keys * 1000000) div (max_key - min_key + 1) AS BIGINT)")
              .cast("double") / lit(1000000.0)).as("key_density"))
      Seq(
        audit("customer", Tables.customer(s, dir), "c_custkey"),
        audit("documents", Tables.documents(s, dir), "doc_id"),
        audit("embeddings", Tables.embeddings(s, dir), "vec_id"),
        audit("nation", Tables.nation(s, dir), "n_nationkey"),
        audit("orders", Tables.orders(s, dir), "o_orderkey"),
        audit("part", Tables.part(s, dir), "p_partkey"),
        audit("region", Tables.region(s, dir), "r_regionkey"),
        audit("supplier", Tables.supplier(s, dir), "s_suppkey"))
        .reduce(_ unionAll _)
        .orderBy(col("table_name"))
    },
    Some {
      val tables = Seq(
        ("customer", "customer", "c_custkey"),
        ("documents", "documents", "doc_id"),
        ("embeddings", "embeddings", "vec_id"),
        ("nation", "nation", "n_nationkey"),
        ("orders", "orders", "o_orderkey"),
        ("part", "part", "p_partkey"),
        ("region", "region", "r_regionkey"),
        ("supplier", "supplier", "s_suppkey"))
      tables.map { case (name, tbl, key) =>
        s"""|SELECT '$name' AS table_name, count(*) AS n_rows,
            |       count(DISTINCT $key) AS n_keys,
            |       (count(*) - count(DISTINCT $key))::BIGINT AS n_dup_keys,
            |       min($key)::BIGINT AS min_key, max($key)::BIGINT AS max_key,
            |       ((count(DISTINCT $key) * 1000000) //
            |        (max($key)::BIGINT - min($key)::BIGINT + 1))::DOUBLE / 1000000.0
            |         AS key_density
            |FROM $tbl""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
    })

  private val hashBalance = QueryDef(
    "dq_hash_balance",
    "Hash-partition balance audit: customers bucketed by the portable " +
      "48-bit md5 hash mod 32 (the engine's own shuffle-key shape) — " +
      "the check run BEFORE choosing a partition key at 100 TB: a " +
      "skewed bucket histogram here is a straggler task there, and " +
      "the salting decision (operators.Skew) wants this number first. " +
      "Exact BIGINT bucket counts; skew = max·B·10⁶ div n (max-to-" +
      "mean in exact millionths) and the χ²-against-uniform statistic " +
      "— algebraically (B·Σo² − n²)/n — as (…)·10⁶ div n, one exact " +
      "integer division per readout, no float until the final /1e6. " +
      "One map-side-combining rollup over 32 buckets.",
    (s, dir) => {
      val b = Tables.customer(s, dir)
        .select(pmod(graft.operators.TextAnalysis.md5Long48(
          col("c_custkey").cast("string")), lit(32)).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("o"))
      b.agg(count(lit(1)).as("n_buckets"),
          sum(col("o")).as("n_rows"),
          min(col("o")).as("min_bucket"), max(col("o")).as("max_bucket"),
          sum(expr("CAST(o AS DECIMAL(38,0)) * o")).as("so2"))
        .select(col("n_buckets"), col("n_rows"), col("min_bucket"),
          col("max_bucket"),
          (expr("CAST((max_bucket * n_buckets * 1000000) div n_rows AS BIGINT)")
            .cast("double") / lit(1000000.0)).as("skew_ratio"),
          (expr("CAST((CAST(n_buckets AS DECIMAL(38,0)) * so2 - " +
            "CAST(n_rows AS DECIMAL(38,0)) * n_rows) * 1000000 div " +
            "CAST(n_rows AS DECIMAL(38,0)) AS BIGINT)")
            .cast("double") / lit(1000000.0)).as("chi2_uniform"))
    },
    Some("""
      |WITH b AS (
      |  SELECT ('0x' || substring(md5(c_custkey::VARCHAR), 1, 12))::BIGINT % 32 AS bucket,
      |         count(*) AS o
      |  FROM customer GROUP BY 1
      |), s AS (
      |  SELECT count(*)::BIGINT AS n_buckets, SUM(o)::BIGINT AS n_rows,
      |         min(o)::BIGINT AS min_bucket, max(o)::BIGINT AS max_bucket,
      |         SUM(o::HUGEINT * o) AS so2
      |  FROM b
      |)
      |SELECT n_buckets, n_rows, min_bucket, max_bucket,
      |       ((max_bucket * n_buckets * 1000000) // n_rows)::BIGINT::DOUBLE
      |         / 1000000.0 AS skew_ratio,
      |       (((n_buckets::HUGEINT * so2 - n_rows::HUGEINT * n_rows) * 1000000)
      |         // n_rows::HUGEINT)::BIGINT::DOUBLE / 1000000.0 AS chi2_uniform
      |FROM s
      """.stripMargin.trim))

  private val idGaps = QueryDef(
    "dq_id_gaps",
    "Per-source ingest-id GAP audit: doc_id is a global ingest " +
      "counter interleaved across sources, so WITHIN a source the id " +
      "stream is legitimately gapped by other sources' writes — but " +
      "an anomalously LARGE gap in one source means that source's " +
      "feed stalled or a shard was dropped, visible long before any " +
      "content check (the sequence-completeness companion to " +
      "dq_pk_uniqueness's duplicate check). Output: the 10 largest " +
      "(source, preceding id, next id, gap length) gaps — exact " +
      "integers, (len desc, source, id) total order — with the " +
      "source's doc count. Scale shape: NOT one global lag window " +
      "(the single-partition anti-pattern) — gaps are found " +
      "two-level: intra-bucket lag windows partitioned by (source, " +
      "id div 2²⁰) (≤ 2²⁰ ids per window partition) plus a boundary " +
      "pass over the per-(source, bucket) summary, whose window " +
      "partitions by SOURCE and is bounded by keyspace/2²⁰ rows per " +
      "source; the union is EXACTLY the flat per-source lag gap set, " +
      "which is what the oracle computes single-node.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val keys = Tables.documents(s, dir)
        .select(col("source"), col("doc_id").as("k")).distinct()
      val b = keys.withColumn("bkt", expr("k div 1048576"))
      val wIn = Window.partitionBy(col("source"), col("bkt")).orderBy(col("k"))
      val intra = b.withColumn("prev", lag(col("k"), 1).over(wIn))
        .filter(col("prev").isNotNull && col("k") - col("prev") > 1)
        .select(col("source"), col("prev").as("prev_id"), col("k").as("next_id"))
      val bs = b.groupBy(col("source"), col("bkt"))
        .agg(min(col("k")).as("mn"), max(col("k")).as("mx"))
      // boundary pass: per-source window over the (source, bucket)
      // summary — keyspace/2^20 rows per source, bounded by construction
      val wB = Window.partitionBy(col("source")).orderBy(col("bkt"))
      val inter = bs.withColumn("prev_mx", lag(col("mx"), 1).over(wB))
        .filter(col("prev_mx").isNotNull && col("mn") - col("prev_mx") > 1)
        .select(col("source"), col("prev_mx").as("prev_id"), col("mn").as("next_id"))
      val gaps = intra.unionAll(inter)
        .select(col("source"), col("prev_id"), col("next_id"),
          (col("next_id") - col("prev_id") - 1).as("gap_len"))
      val counts = keys.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      gaps.orderBy(col("gap_len").desc, col("source"), col("prev_id")).limit(10)
        .join(broadcast(counts), Seq("source"))
        .select(col("source"), col("n_docs"), col("prev_id"), col("next_id"),
          col("gap_len"))
        .orderBy(col("gap_len").desc, col("source"), col("prev_id"))
    },
    Some("""
      |WITH k AS (SELECT DISTINCT source, doc_id AS k FROM documents),
      |g AS (
      |  SELECT source, lag(k) OVER (PARTITION BY source ORDER BY k) AS prev_id,
      |         k AS next_id
      |  FROM k
      |), gaps AS (
      |  SELECT source, prev_id, next_id, (next_id - prev_id - 1)::BIGINT AS gap_len
      |  FROM g WHERE prev_id IS NOT NULL AND next_id - prev_id > 1
      |), c AS (
      |  SELECT source, count(*)::BIGINT AS n_docs FROM k GROUP BY 1
      |)
      |SELECT source, n_docs, prev_id, next_id, gap_len
      |FROM (SELECT * FROM gaps ORDER BY gap_len DESC, source, prev_id LIMIT 10)
      |JOIN c USING (source)
      |ORDER BY gap_len DESC, source, prev_id
      """.stripMargin.trim))

  private val volumeControl = QueryDef(
    "dq_volume_control",
    "Ingest-volume control chart — the first alarm a feed owner wires: " +
      "per-day event counts (exact BIGINTs on the calendar-bounded day " +
      "grid), a trailing-6-day integer-weight EWMA baseline (weights " +
      "32/16/8/4/2/1 over lags 1-6, the ev_ewma_daily channel — the " +
      "numerator is an exact BIGINT, ONE /63.0 division), and a " +
      "3σ band where σ comes from exact day-over-day delta sufficient " +
      "statistics (n, Σd, Σd² BIGINTs, sample σ in one fixed double " +
      "shape). A day flags when round(|count − ewma|, 6) > " +
      "round(3σ, 6) — both comparands rounded so the engines compare " +
      "identical values. Only days with a FULL 6-day history score " +
      "(the lag-completeness the baseline needs). Work = one day " +
      "rollup + two windows on the day grid; a stalled feed or " +
      "backfill spike reads directly off the flag column.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, dir)
        .select(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("c"))
      val wd = Window.orderBy(col("day"))
      val lagged = daily.select(col("day"), col("c"),
        lag(col("c"), 1).over(wd).as("c1"), lag(col("c"), 2).over(wd).as("c2"),
        lag(col("c"), 3).over(wd).as("c3"), lag(col("c"), 4).over(wd).as("c4"),
        lag(col("c"), 5).over(wd).as("c5"), lag(col("c"), 6).over(wd).as("c6"))
      val deltas = daily.select((col("c") -
        lag(col("c"), 1).over(wd)).as("d")).filter(col("d").isNotNull)
      val sig = deltas.agg(count(lit(1)).as("nd"), sum(col("d")).as("sd"),
        sum(col("d") * col("d")).as("sd2"))
        .select(sqrt((col("sd2").cast("double") -
          col("sd").cast("double") * col("sd").cast("double") /
            col("nd").cast("double")) /
          (col("nd").cast("double") - lit(1.0))).as("sigma"))
      val scored = lagged.filter(col("c6").isNotNull)
        .crossJoin(broadcast(sig))
        .withColumn("ewma_num", lit(32L) * col("c1") + lit(16L) * col("c2") +
          lit(8L) * col("c3") + lit(4L) * col("c4") + lit(2L) * col("c5") + col("c6"))
        .withColumn("ewma", col("ewma_num").cast("double") / lit(63.0))
        .withColumn("deviation", col("c").cast("double") - col("ewma"))
        .withColumn("is_anomaly",
          (round(abs(col("deviation")), 6) >
            round(lit(3.0) * col("sigma"), 6)).cast("long"))
      scored.select(col("day"), col("c").as("n_events"),
        round(col("ewma"), 6).as("ewma"),
        round(col("deviation"), 6).as("deviation"),
        round(col("sigma"), 6).as("sigma"), col("is_anomaly"))
        .orderBy(col("day"))
    },
    Some("""
      |WITH daily AS (
      |  SELECT strftime(ts::TIMESTAMP, '%Y-%m-%d') AS day, count(*)::BIGINT AS c
      |  FROM events GROUP BY 1
      |), lagged AS (
      |  SELECT day, c,
      |         lag(c, 1) OVER (ORDER BY day) AS c1, lag(c, 2) OVER (ORDER BY day) AS c2,
      |         lag(c, 3) OVER (ORDER BY day) AS c3, lag(c, 4) OVER (ORDER BY day) AS c4,
      |         lag(c, 5) OVER (ORDER BY day) AS c5, lag(c, 6) OVER (ORDER BY day) AS c6
      |  FROM daily
      |), deltas AS (
      |  SELECT d FROM (SELECT c - lag(c, 1) OVER (ORDER BY day) AS d FROM daily)
      |  WHERE d IS NOT NULL
      |), sig AS (
      |  SELECT sqrt((SUM(d * d)::DOUBLE - SUM(d)::DOUBLE * SUM(d)::DOUBLE / count(*)::DOUBLE) /
      |              (count(*)::DOUBLE - 1.0)) AS sigma
      |  FROM deltas
      |), scored AS (
      |  SELECT day, c,
      |         (32 * c1 + 16 * c2 + 8 * c3 + 4 * c4 + 2 * c5 + c6)::DOUBLE / 63.0 AS ewma,
      |         sigma
      |  FROM lagged CROSS JOIN sig WHERE c6 IS NOT NULL
      |)
      |SELECT day, c AS n_events, round(ewma, 6) AS ewma,
      |       round(c::DOUBLE - ewma, 6) AS deviation,
      |       round(sigma, 6) AS sigma,
      |       CASE WHEN round(abs(c::DOUBLE - ewma), 6) > round(3.0 * sigma, 6)
      |            THEN 1 ELSE 0 END::BIGINT AS is_anomaly
      |FROM scored ORDER BY day
      """.stripMargin.trim))

  val defs: Seq[QueryDef] =
    Seq(profileQ, fuzzyLinkQ, expectationsQ, kAnonymity, tableFingerprint,
      driftTv, dpCounts, refIntegrity, pkUniqueness, hashBalance, idGaps,
      volumeControl)
}
