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

  val defs: Seq[QueryDef] = Seq(hll, cms)
}
