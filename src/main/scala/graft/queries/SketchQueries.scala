package graft.queries

import graft.Tables
import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Probabilistic-sketch telemetry queries — the approximate-analytics
  * axis, made exactly reproducible (see [[graft.operators.Sketches]]):
  * because the sketches use the portable md5-derived hash, a DuckDB
  * oracle recomputes every register / counter bit-for-bit, so the
  * *sketch algorithms themselves* sit under the hash gate instead of a
  * tolerance spec. Each query reports the estimate NEXT TO the exact
  * answer — the tuning artifact an operator reads before trusting the
  * sketch at a scale where the exact answer is unaffordable.
  */
object SketchQueries {

  private val hll = QueryDef(
    "sketch_hll_distinct",
    "Deterministic HyperLogLog (p=9, m=512, md5-derived 48-bit hash): " +
      "distinct customers per order priority, estimate vs exact with " +
      "relative error. The register shuffle carries ≤ 512 rows per " +
      "group after map-side max — constant regardless of order count; " +
      "the harmonic sum is an exact BIGINT (integer-weight trick, " +
      "Σ2^(40−reg) < 2^49) and only the final closed-form estimate runs " +
      "in double with one fixed shape on both engines. The exact " +
      "count(distinct) sits beside it as the telemetry yardstick — at " +
      "100 TB the register path replaces it at ~1e-5 the shuffle bytes.",
    (s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_orderpriority"), col("o_custkey"))
      val est = Sketches.hllEstimate(
        Sketches.hllRegisters(o, "o_orderpriority", col("o_custkey"), p = 9),
        "o_orderpriority", p = 9)
      val exact = o.groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("n_exact"))
      exact.join(est, Seq("o_orderpriority"))
        .select(col("o_orderpriority"), col("n_exact"),
          round(col("hll_estimate"), 4).as("hll_estimate"),
          round((col("hll_estimate") - col("n_exact").cast("double")) /
            col("n_exact").cast("double"), 6).as("rel_err"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      |WITH h AS (
      |  SELECT o_orderpriority,
      |         ('0x' || substring(md5(o_custkey::VARCHAR), 1, 12))::BIGINT AS h
      |  FROM orders
      |), b AS (
      |  SELECT o_orderpriority, h & 511 AS bucket, h >> 9 AS w FROM h
      |), r AS (
      |  SELECT o_orderpriority, bucket,
      |         CASE WHEN w = 0 THEN 40 ELSE bit_count((w & -w) - 1) + 1 END AS rk
      |  FROM b
      |), regs AS (
      |  SELECT o_orderpriority, bucket, max(rk) AS reg FROM r GROUP BY 1, 2
      |), s AS (
      |  SELECT o_orderpriority,
      |         SUM(1::BIGINT << CAST(40 - reg AS INTEGER)) AS s_present,
      |         count(*) AS nb
      |  FROM regs GROUP BY 1
      |), f AS (
      |  SELECT o_orderpriority, s_present + (512 - nb) * 1099511627776 AS s_total
      |  FROM s
      |), e AS (
      |  SELECT o_orderpriority,
      |         (0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 512.0::DOUBLE))
      |           * 262144.0::DOUBLE * 1099511627776.0::DOUBLE / s_total::DOUBLE AS est
      |  FROM f
      |), x AS (
      |  SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_exact
      |  FROM orders GROUP BY 1
      |)
      |SELECT x.o_orderpriority, x.n_exact,
      |       round(e.est, 4) AS hll_estimate,
      |       round((e.est - x.n_exact::DOUBLE) / x.n_exact::DOUBLE, 6) AS rel_err
      |FROM e JOIN x USING (o_orderpriority)
      |ORDER BY o_orderpriority
      """.stripMargin.trim))

  private val cms = QueryDef(
    "sketch_cms_heavy_hitters",
    "Deterministic Count-Min sketch (d=4 × w=256, md5 row-salted " +
      "hashes) over the token stream: for the 10 highest-frequency " +
      "tokens, CMS point estimate vs exact count and the collision " +
      "overestimate (CMS never underestimates — the gate proves it " +
      "row by row). The counter build is ONE count shuffle bounded at " +
      "d·w rows per upstream partition by partial aggregation; the " +
      "probe joins the ≤1024-row counter table by broadcast. This is " +
      "the mergeable heavy-hitter shape for a corpus where per-token " +
      "exact counting is the bottleneck.",
    (s, dir) => {
      val tok = TextQueries.docToks(s, dir).select(explode(col("toks")).as("t"))
      val counters = Sketches.cmsCounters(tok, col("t"), depth = 4, width = 256)
      val top = tok.groupBy(col("t")).agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("t")).limit(10)
      Sketches.cmsLookup(top, col("t"), counters, depth = 4, width = 256)
        .select(col("t").as("token"), col("n_exact"), col("cms_estimate"),
          (col("cms_estimate") - col("n_exact")).as("overestimate"))
        .orderBy(col("n_exact").desc, col("token"))
    },
    Some(s"""
      |${Duck.docToks}, tok AS (
      |  SELECT unnest(toks) AS t FROM tt
      |), hx AS (
      |  SELECT ('0x' || substring(md5(i.i::VARCHAR || ':' || tok.t), 1, 12))::BIGINT % 256 AS bucket,
      |         i.i
      |  FROM tok CROSS JOIN (SELECT unnest(range(4)) AS i) i
      |), counters AS (
      |  SELECT i, bucket, count(*) AS cnt FROM hx GROUP BY 1, 2
      |), top AS (
      |  SELECT t, count(*) AS n_exact FROM tok GROUP BY t
      |  ORDER BY n_exact DESC, t LIMIT 10
      |), tb AS (
      |  SELECT top.t, top.n_exact, i.i,
      |         ('0x' || substring(md5(i.i::VARCHAR || ':' || top.t), 1, 12))::BIGINT % 256 AS bucket
      |  FROM top CROSS JOIN (SELECT unnest(range(4)) AS i) i
      |), est AS (
      |  SELECT tb.t, tb.n_exact, min(c.cnt) AS cms_estimate
      |  FROM tb JOIN counters c ON c.i = tb.i AND c.bucket = tb.bucket
      |  GROUP BY 1, 2
      |)
      |SELECT t AS token, n_exact, cms_estimate, cms_estimate - n_exact AS overestimate
      |FROM est ORDER BY n_exact DESC, token
      """.stripMargin.trim))

  private val bloom = QueryDef(
    "sketch_bloom_membership",
    "Deterministic Bloom filter (m=4096 bits as 128 bit_or-aggregated 32-bit-packed " +
      "BIGINT blocks, k=3 md5 salted hashes) over the corpus document " +
      "fingerprints, probed with 5 present fingerprints and 5 ghosts: " +
      "per probe, the bloom verdict, the exact membership, and the " +
      "false-positive flag — the no-false-negatives contract checked " +
      "row by row under the hash gate (the storage-level data-skipping " +
      "sibling of sketch_hll/cms; the production decontamination path " +
      "via Spark's native BloomFilterAggregate is pipeline_" +
      "decontaminate_bloom). Build = ONE bit_or shuffle bounded at 128 " +
      "rows per upstream partition; the 128-row bitmap broadcasts to " +
      "the probes.",
    (s, dir) => {
      import graft.operators.TextAnalysis
      val fps = TextQueries.docToks(s, dir)
        .select(col("doc_id"), TextAnalysis.md5Long48(col("norm")).as("fp"))
      val positions = (0 until 3).map { i =>
        TextAnalysis.md5Long48(concat_ws(":", lit(i.toString), col("fp").cast("string"))) %
          lit(4096L)
      }
      val bitmap = fps
        .select(explode(array(positions: _*)).as("p"))
        .select((col("p") / 32).cast("long").as("block"), (col("p") % 32).as("bit"))
        .groupBy(col("block"))
        .agg(bit_or(TextAnalysis.shl(lit(1L), col("bit").cast("int"))).as("word"))
      val present = fps.filter(col("doc_id").between(1, 5))
        .select(concat(lit("doc_"), col("doc_id").cast("string")).as("probe"), col("fp"))
      val ghosts = s.range(1, 6).toDF("g")
        .select(concat(lit("ghost_"), col("g").cast("string")).as("probe"),
          TextAnalysis.md5Long48(concat(lit("ghost-"), col("g").cast("string"))).as("fp"))
      val probes = present.unionByName(ghosts)
      val probed = probes
        .select(col("probe"), col("fp"),
          posexplode(array((0 until 3).map { i =>
            TextAnalysis.md5Long48(concat_ws(":", lit(i.toString), col("fp").cast("string"))) %
              lit(4096L)
          }: _*)).as(Seq("i", "p")))
        .select(col("probe"), col("fp"), (col("p") / 32).cast("long").as("block"),
          (col("p") % 32).as("bit"))
        .join(broadcast(bitmap), Seq("block"), "left")
        .withColumn("hit",
          (coalesce(col("word"), lit(0L)).bitwiseAND(
            TextAnalysis.shl(lit(1L), col("bit").cast("int"))) =!= 0L).cast("long"))
        .groupBy(col("probe"), col("fp"))
        .agg((min(col("hit")) === 1L).cast("long").as("bloom_hit"))
      val exact = fps.select(col("fp")).distinct().withColumn("present", lit(1L))
      probed.join(broadcast(exact), Seq("fp"), "left")
        .select(col("probe"),
          col("bloom_hit"),
          coalesce(col("present"), lit(0L)).as("exact_present"),
          (col("bloom_hit") === 1L && coalesce(col("present"), lit(0L)) === 0L)
            .cast("long").as("false_positive"))
        .orderBy(col("probe"))
    },
    Some(s"""
      |${Duck.docToks}, fps AS (
      |  SELECT doc_id, ${Duck.md5Long48("norm")} AS fp FROM tt
      |), pos AS (
      |  SELECT (${Duck.md5Long48("i.i::VARCHAR || ':' || fps.fp::VARCHAR")} % 4096) AS p
      |  FROM fps CROSS JOIN (SELECT unnest(range(3)) AS i) i
      |), bitmap AS (
      |  SELECT p // 32 AS block, bit_or(1::BIGINT << CAST(p % 32 AS INTEGER)) AS word
      |  FROM pos GROUP BY 1
      |), probes AS (
      |  SELECT 'doc_' || doc_id::VARCHAR AS probe, fp FROM fps WHERE doc_id BETWEEN 1 AND 5
      |  UNION ALL
      |  SELECT 'ghost_' || g::VARCHAR AS probe,
      |         ${Duck.md5Long48("'ghost-' || g::VARCHAR")} AS fp
      |  FROM (SELECT unnest(range(1, 6)) AS g)
      |), pp AS (
      |  SELECT probe, fp,
      |         (${Duck.md5Long48("i.i::VARCHAR || ':' || probes.fp::VARCHAR")} % 4096) AS p
      |  FROM probes CROSS JOIN (SELECT unnest(range(3)) AS i) i
      |), hits AS (
      |  SELECT pp.probe, pp.fp,
      |         CASE WHEN (COALESCE(b.word, 0) & (1::BIGINT << CAST(pp.p % 32 AS INTEGER))) <> 0
      |              THEN 1 ELSE 0 END AS hit
      |  FROM pp LEFT JOIN bitmap b ON b.block = pp.p // 32
      |), verdict AS (
      |  SELECT probe, fp, CASE WHEN min(hit) = 1 THEN 1 ELSE 0 END AS bloom_hit
      |  FROM hits GROUP BY 1, 2
      |), exact AS (
      |  SELECT DISTINCT fp, 1 AS present FROM fps
      |)
      |SELECT v.probe, v.bloom_hit::BIGINT AS bloom_hit,
      |       COALESCE(e.present, 0)::BIGINT AS exact_present,
      |       CASE WHEN v.bloom_hit = 1 AND COALESCE(e.present, 0) = 0
      |            THEN 1 ELSE 0 END::BIGINT AS false_positive
      |FROM verdict v LEFT JOIN exact e USING (fp)
      |ORDER BY probe
      """.stripMargin.trim))

  private val hllSliding = QueryDef(
    "sketch_hll_sliding",
    "Trailing-7-day distinct users via HLL register MERGE — the " +
      "property that makes sketches the 100 TB answer and a recount " +
      "the wrong one: per-day registers build once (the " +
      "sketch_hll_distinct machinery keyed by day), and EVERY " +
      "trailing window is then a register-wise MAX over ≤ 7·512 " +
      "bounded rows — no re-scan of the events, no re-shuffle of " +
      "users, and the same merge serves any window length, " +
      "out-of-order backfill, or cross-datacenter union (max is " +
      "associative+commutative+idempotent). The exact trailing " +
      "count(DISTINCT) sits beside it as the telemetry yardstick " +
      "(calendar-bounded here; at 100 TB it is exactly what you can " +
      "no longer afford — 7× re-scan per day). Full-history days " +
      "only; harmonic sums exact BIGINT, one fixed-shape double.",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
      val regs = Sketches.hllRegisters(ev, "day", col("user_id"), p = 9)
      val grid = ev.select(col("day")).distinct()
      val d0 = grid.agg(min(col("day")).as("d0"))
      val g = grid.select(col("day").as("gday"))
      val merged = regs.join(g,
          datediff(to_date(col("gday")), to_date(col("day"))).between(0, 6))
        .groupBy(col("gday"), col("bucket")).agg(max(col("reg")).as("reg"))
        .withColumnRenamed("gday", "day")
      val est = Sketches.hllEstimate(merged, "day", p = 9)
      val du = ev.distinct()
      val exact = du.join(g,
          datediff(to_date(col("gday")), to_date(col("day"))).between(0, 6))
        .groupBy(col("gday")).agg(countDistinct(col("user_id")).as("n_exact"))
        .withColumnRenamed("gday", "day")
      est.join(exact, Seq("day")).crossJoin(broadcast(d0))
        .filter(datediff(to_date(col("day")), to_date(col("d0"))) >= 6)
        .select(col("day"), col("n_exact"),
          round(col("hll_estimate"), 4).as("hll_estimate"),
          round((col("hll_estimate") - col("n_exact").cast("double")) /
            col("n_exact").cast("double"), 6).as("rel_err"))
        .orderBy(col("day"))
    },
    Some("""
      |WITH ev AS (
      |  SELECT strftime(ts::TIMESTAMP, '%Y-%m-%d') AS day, user_id FROM events
      |), h AS (
      |  SELECT day, ('0x' || substring(md5(user_id::VARCHAR), 1, 12))::BIGINT AS h
      |  FROM ev
      |), b AS (
      |  SELECT day, h & 511 AS bucket, h >> 9 AS w FROM h
      |), r AS (
      |  SELECT day, bucket,
      |         CASE WHEN w = 0 THEN 40 ELSE bit_count((w & -w) - 1) + 1 END AS rk
      |  FROM b
      |), regs AS (
      |  SELECT day, bucket, max(rk) AS reg FROM r GROUP BY 1, 2
      |), grid AS (
      |  SELECT DISTINCT day FROM ev
      |), merged AS (
      |  SELECT g.day AS day, regs.bucket, max(regs.reg) AS reg
      |  FROM grid g JOIN regs
      |    ON regs.day::DATE BETWEEN g.day::DATE - 6 AND g.day::DATE
      |  GROUP BY 1, 2
      |), s AS (
      |  SELECT day,
      |         SUM(1::BIGINT << CAST(40 - reg AS INTEGER)) AS s_present,
      |         count(*) AS nb
      |  FROM merged GROUP BY 1
      |), f AS (
      |  SELECT day, s_present + (512 - nb) * 1099511627776 AS s_total FROM s
      |), e AS (
      |  SELECT day,
      |         (0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 512.0::DOUBLE))
      |           * 262144.0::DOUBLE * 1099511627776.0::DOUBLE / s_total::DOUBLE AS est
      |  FROM f
      |), x AS (
      |  SELECT g.day AS day, count(DISTINCT d.user_id) AS n_exact
      |  FROM grid g JOIN (SELECT DISTINCT day, user_id FROM ev) d
      |    ON d.day::DATE BETWEEN g.day::DATE - 6 AND g.day::DATE
      |  GROUP BY 1
      |), d0 AS (
      |  SELECT min(day) AS d0 FROM grid
      |)
      |SELECT e.day, x.n_exact,
      |       round(e.est, 4) AS hll_estimate,
      |       round((e.est - x.n_exact::DOUBLE) / x.n_exact::DOUBLE, 6) AS rel_err
      |FROM e JOIN x USING (day) CROSS JOIN d0
      |WHERE e.day::DATE - d0.d0::DATE >= 6
      |ORDER BY day
      """.stripMargin.trim))

  private val hdrQuantiles = QueryDef(
    "sketch_hdr_quantiles",
    "Mergeable log2/linear histogram quantiles (HdrHistogram; " +
      "DDSketch's fixed-base cousin) — the percentile that is " +
      "AFFORDABLE at 100 TB: lineitem prices (exact cents) bucket into " +
      "octave × 16 linear sub-buckets (≤ 64·16 counts per group, " +
      "counts merge by ADDITION — map-side combine, cross-partition, " +
      "streaming all free), and p50/p90/p99 read off the cumulative " +
      "bucket walk with relative error ≤ 1/32 — where the exact " +
      "percentile needs a total sort per group. Every step is exact " +
      "integer arithmetic: floor(log2) via the binary-string length " +
      "(never the host's floating log — the exact-bucket trick), 2^e " +
      "via shiftleft, targets ceil(q·n) in BIGINT, the midpoint " +
      "estimate's ONE double division at the end. The exact type-1 " +
      "percentile sits beside each estimate as the yardstick (the " +
      "unaffordable leg at scale); the oracle replays buckets, " +
      "cumulative walk, targets, midpoints, and the exact leg in SQL.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val k = 16
      val base = Tables.lineitem(s, dir)
        .select(col("l_returnflag").as("flag"),
          (col("l_extendedprice") * 100).cast("long").as("c"))
      val counts = Sketches.hdrBuckets(base, "c", k)
        .groupBy(col("flag"), col("hdr_bucket"), col("hdr_pow"), col("hdr_sub"))
        .agg(count(lit(1)).as("cnt"))
      val wCum = Window.partitionBy(col("flag")).orderBy(col("hdr_bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("flag"))
      val withCum = counts
        .withColumn("cum", sum(col("cnt")).over(wCum))
        .withColumn("n", sum(col("cnt")).over(wAll))
      val qDf = Seq(("p50", 1L, 2L), ("p90", 9L, 10L), ("p99", 99L, 100L))
        .toDF("q", "qnum", "qden")
      val est = withCum.crossJoin(broadcast(qDf))
        .withColumn("target", expr("(n * qnum + qden - 1) div qden"))
        .filter(col("cum") >= col("target"))
        .groupBy(col("flag"), col("q"))
        .agg(min(struct(col("hdr_bucket"), col("hdr_pow"), col("hdr_sub"),
          col("n"))).as("m"))
        .select(col("flag"), col("q"), col("m.n").as("n"),
          (col("m.hdr_pow") * (col("m.hdr_sub") * 2 + lit(2 * k + 1)) /
            lit((2 * k).toDouble)).as("est"))
      val exactVals = base.groupBy(col("flag"), col("c"))
        .agg(count(lit(1)).as("vc"))
        .withColumn("vcum", sum(col("vc")).over(
          Window.partitionBy(col("flag")).orderBy(col("c"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum(col("vc")).over(wAll))
      val exact = exactVals.crossJoin(broadcast(qDf))
        .withColumn("target", expr("(n * qnum + qden - 1) div qden"))
        .filter(col("vcum") >= col("target"))
        .groupBy(col("flag"), col("q"))
        .agg(min(col("c")).as("exact_cents"))
      est.join(exact, Seq("flag", "q"))
        .select(col("flag"), col("q"), col("n"),
          round(col("est"), 4).as("est_cents"), col("exact_cents"),
          round((col("est") - col("exact_cents").cast("double")) /
            col("exact_cents").cast("double"), 6).as("rel_err"))
        .orderBy(col("flag"), col("q"))
    },
    Some("""
      |WITH v AS (
      |  SELECT l_returnflag AS flag, CAST(l_extendedprice * 100 AS BIGINT) AS c
      |  FROM lineitem
      |), b AS (
      |  SELECT flag, c, (length(bin(c)) - 1) AS e,
      |         (1::BIGINT << (length(bin(c)) - 1)) AS pow
      |  FROM v
      |), bk AS (
      |  SELECT flag, e::BIGINT * 16 + ((c - pow) * 16) // pow AS bucket,
      |         pow, ((c - pow) * 16) // pow AS sub, count(*) AS cnt
      |  FROM b GROUP BY 1, 2, 3, 4
      |), cum AS (
      |  SELECT flag, bucket, pow, sub, cnt,
      |         sum(cnt) OVER (PARTITION BY flag ORDER BY bucket
      |                        ROWS UNBOUNDED PRECEDING) AS cum,
      |         sum(cnt) OVER (PARTITION BY flag) AS n
      |  FROM bk
      |), qs AS (
      |  SELECT * FROM (VALUES ('p50', 1::BIGINT, 2::BIGINT),
      |                        ('p90', 9::BIGINT, 10::BIGINT),
      |                        ('p99', 99::BIGINT, 100::BIGINT)) t(q, qnum, qden)
      |), est AS (
      |  SELECT flag, q, min(n) AS n,
      |         min_by(pow * (sub * 2 + 33), bucket) / 32.0 AS est
      |  FROM cum CROSS JOIN qs
      |  WHERE cum >= (n * qnum + qden - 1) // qden
      |  GROUP BY 1, 2
      |), ex AS (
      |  SELECT flag, c, count(*) AS vc FROM v GROUP BY 1, 2
      |), excum AS (
      |  SELECT flag, c,
      |         sum(vc) OVER (PARTITION BY flag ORDER BY c
      |                       ROWS UNBOUNDED PRECEDING) AS vcum,
      |         sum(vc) OVER (PARTITION BY flag) AS n
      |  FROM ex
      |), exact AS (
      |  SELECT flag, q, min(c) AS exact_cents
      |  FROM excum CROSS JOIN qs
      |  WHERE vcum >= (n * qnum + qden - 1) // qden
      |  GROUP BY 1, 2
      |)
      |SELECT e.flag, e.q, e.n::BIGINT AS n, round(e.est, 4) AS est_cents,
      |       x.exact_cents,
      |       round((e.est - x.exact_cents::DOUBLE) / x.exact_cents::DOUBLE, 6)
      |         AS rel_err
      |FROM est e JOIN exact x USING (flag, q)
      |ORDER BY flag, q
      """.stripMargin.trim))

  private val kmvIntersect = QueryDef(
    "sketch_kmv_intersect",
    "K-Minimum-Values (bottom-k, k=256) distinct sketch with a SET-" +
      "INTERSECTION estimate (Bar-Yossef et al. 2002; Beyer et al. " +
      "2007) — the set-overlap question HLL registers cannot answer: " +
      "how many customers placed BOTH a 1-URGENT and a 5-LOW order. " +
      "Each side's sketch is the 256 smallest distinct md5-48 hashes " +
      "(one map-side-combining distinct + TakeOrdered — k longs " +
      "shipped regardless of corpus size); the union sketch is the " +
      "bottom-k of their concatenation, θ its max, and |A∪B| ≈ " +
      "(k−1)·2^48/θ, |A∩B| ≈ (matches in the union sketch / k)·|A∪B| " +
      "— the union sketch is a uniform k-sample of A∪B. Everything is " +
      "exact BIGINT until the two final fixed-shape divisions; the " +
      "exact distinct counts sit beside the estimates as the accuracy " +
      "yardstick (at 100 TB the exact legs are the unaffordable part " +
      "— the sketches ship 2·k longs to the driver of a 1000-executor " +
      "job; sub-k inputs degrade to the exact counts by construction).",
    (s, dir) => {
      val k = 256
      val ords = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderpriority"))
      val aKeys = ords.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      val bKeys = ords.filter(col("o_orderpriority") === "5-LOW")
        .select(col("o_custkey"))
      val ka = Sketches.kmv(aKeys, col("o_custkey"), k)
      val kb = Sketches.kmv(bKeys, col("o_custkey"), k)
      val ku = ka.union(kb).distinct().orderBy(col("h")).limit(k)
      val u = ku.agg(count(lit(1)).as("nu"), max(col("h")).as("theta"))
      val m = ku.join(ka, Seq("h"), "left_semi")
        .join(kb, Seq("h"), "left_semi")
        .agg(count(lit(1)).as("n_match"))
      val ad = aKeys.distinct()
      val bd = bKeys.distinct()
      val xu = ad.union(bd).distinct().agg(count(lit(1)).as("n_union_exact"))
      val xi = ad.join(bd, Seq("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("n_inter_exact"))
      val estU = when(col("nu") < k, col("nu").cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(281474976710656.0) /
          col("theta").cast("double"))
      u.crossJoin(m).crossJoin(xu).crossJoin(xi)
        .withColumn("est_u", estU)
        // empty-input guards (ADVICE r17): an empty priority class makes
        // nu / n_union_exact 0 — the estimate columns go NULL instead of
        // NaN, the same convention rel_err_inter already uses.
        .withColumn("est_i", when(col("nu") > 0,
          (col("n_match").cast("double") / col("nu").cast("double")) * col("est_u")))
        .select(lit(k.toLong).as("k_sketch"),
          col("n_union_exact"), col("n_inter_exact"),
          round(col("est_u"), 4).as("kmv_union_est"),
          round(col("est_i"), 4).as("kmv_inter_est"),
          when(col("n_union_exact") > 0,
            round((col("est_u") - col("n_union_exact").cast("double")) /
              col("n_union_exact").cast("double"), 6)).as("rel_err_union"),
          when(col("n_inter_exact") > 0,
            round((col("est_i") - col("n_inter_exact").cast("double")) /
              col("n_inter_exact").cast("double"), 6)).as("rel_err_inter"))
    },
    Some("""
      |WITH a AS (
      |  SELECT DISTINCT ('0x' || substring(md5(o_custkey::VARCHAR), 1, 12))::BIGINT AS h
      |  FROM orders WHERE o_orderpriority = '1-URGENT'
      |), ka AS (
      |  SELECT h FROM a ORDER BY h LIMIT 256
      |), b AS (
      |  SELECT DISTINCT ('0x' || substring(md5(o_custkey::VARCHAR), 1, 12))::BIGINT AS h
      |  FROM orders WHERE o_orderpriority = '5-LOW'
      |), kb AS (
      |  SELECT h FROM b ORDER BY h LIMIT 256
      |), ku AS (
      |  SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb)
      |  ORDER BY h LIMIT 256
      |), u AS (
      |  SELECT count(*) AS nu, max(h) AS theta FROM ku
      |), m AS (
      |  SELECT count(*) AS n_match FROM ku
      |  WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)
      |), xa AS (
      |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |), xb AS (
      |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
      |), xu AS (
      |  SELECT count(*) AS n_union_exact
      |  FROM (SELECT o_custkey FROM xa UNION SELECT o_custkey FROM xb)
      |), xi AS (
      |  SELECT count(*) AS n_inter_exact FROM xa
      |  WHERE o_custkey IN (SELECT o_custkey FROM xb)
      |), e AS (
      |  SELECT u.nu, m.n_match,
      |         CASE WHEN u.nu < 256 THEN u.nu::DOUBLE
      |              ELSE (255.0::DOUBLE * 281474976710656.0::DOUBLE) / u.theta::DOUBLE
      |         END AS est_u
      |  FROM u, m
      |), f AS (
      |  SELECT est_u,
      |         CASE WHEN nu > 0 THEN (n_match::DOUBLE / nu::DOUBLE) * est_u END AS est_i
      |  FROM e
      |)
      |SELECT 256::BIGINT AS k_sketch,
      |       xu.n_union_exact::BIGINT AS n_union_exact,
      |       xi.n_inter_exact::BIGINT AS n_inter_exact,
      |       round(f.est_u, 4) AS kmv_union_est,
      |       round(f.est_i, 4) AS kmv_inter_est,
      |       CASE WHEN xu.n_union_exact > 0
      |            THEN round((f.est_u - xu.n_union_exact::DOUBLE) / xu.n_union_exact::DOUBLE, 6)
      |       END AS rel_err_union,
      |       CASE WHEN xi.n_inter_exact > 0
      |            THEN round((f.est_i - xi.n_inter_exact::DOUBLE) / xi.n_inter_exact::DOUBLE, 6)
      |       END AS rel_err_inter
      |FROM f, xu, xi
      """.stripMargin.trim))

  val defs: Seq[QueryDef] =
    Seq(hll, cms, bloom, hllSliding, kmvIntersect, hdrQuantiles)
}
