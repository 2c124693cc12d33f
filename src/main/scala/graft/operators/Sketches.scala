package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, SQL-recomputable probabilistic sketches: HyperLogLog
  * cardinality registers and a Count-Min frequency sketch.
  *
  * Unlike `approx_count_distinct` / datasketches aggregates (whose
  * register layout and hash are engine-internal, so they can only be
  * spec-gated with a tolerance), these sketches are built from the
  * repo's portable md5-derived 48-bit hash ([[TextAnalysis.md5Long48]])
  * and pure integer arithmetic — every register value and counter is a
  * deterministic function of the input and can be recomputed bit-for-bit
  * by a DuckDB oracle, putting *approximation-algorithm* telemetry under
  * the exact hash gate.
  *
  * Scale design (both sketches are the textbook mergeable shape):
  *   - HLL: the only shuffle carries (group, bucket, max rank) — at most
  *     m = 2^p rows per group after map-side partial `max`, regardless of
  *     input row count. The estimate step is O(groups).
  *   - CMS: the only shuffle carries (row, bucket) partial counts — at
  *     most d·w rows per upstream partition after partial aggregation.
  *     Point lookups join the d·w counter table (a few KB) by broadcast.
  *
  * Float discipline: register sums use the integer-weight trick
  *   Σ 2^(−reg) = Σ 2^(R−reg) / 2^R  with R = 48 − p + 1 (the max rank),
  * so the harmonic sum is an exact BIGINT < 2^(p+R) = 2^49 and only the
  * final closed-form estimate runs in double, with one fixed
  * parenthesization mirrored by the oracle.
  */
object Sketches {

  /** Rank = 1 + trailing-zero count of the post-bucket hash bits: a
    * Geometric(1/2) variable, exactly the distribution HLL needs (the
    * classic presentation uses leading zeros; trailing zeros of the same
    * uniform word are identically distributed and cheaper to compute
    * portably: tz(w) = bit_count((w & −w) − 1)).
    */
  private def rank(w: Column, maxRank: Int): Column =
    when(w === 0, lit(maxRank.toLong))
      .otherwise((bit_count(w.bitwiseAND(-w) - lit(1L)) + lit(1)).cast("long"))

  /** HdrHistogram-style log2/linear bucketing of a POSITIVE long value
    * column — the mergeable quantile sketch (Tene's HdrHistogram;
    * DDSketch is the log-γ cousin): octave = exact floor(log2(c)), `k`
    * linear sub-buckets per octave, so the bucket table is ≤ 64·k rows
    * regardless of row count, counts merge by addition (map-side
    * combine, streaming, cross-partition — all free), and a bucket
    * midpoint estimates any quantile with relative error ≤ 1/(2k).
    * At 100 TB this replaces the total-sort exact percentile the same
    * way HLL replaces count(DISTINCT).
    *
    * Exactness contract: floor(log2) via the binary-string length
    * (`conv(c,10,2)` / DuckDB `bin(c)` — both unpadded), never the
    * host's floating log, so the bucket id is a pure integer function
    * of the value on both engines; 2^exp via shiftleft; the sub-bucket
    * an exact integer div. Adds hdr_exp / hdr_pow / hdr_sub /
    * hdr_bucket columns.
    */
  def hdrBuckets(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2 && Integer.bitCount(k) == 1, s"k=$k must be a power of two >= 2")
    // enforce the POSITIVE precondition per row (same codegen'd guard
    // as RandomWalks.withIntervals, ADVICE r18): c = 0 would silently
    // yield the garbage bucket (hdr_exp=0, hdr_sub=-k), and negative
    // values diverge between Spark conv (unsigned two's complement)
    // and DuckDB bin — fail loudly instead of bucketing nonsense.
    df.withColumn("hdr_exp",
        when(col(valueCol) > 0,
          (length(conv(col(valueCol), 10, 2)) - 1).cast("int"))
          .otherwise(raise_error(concat(
            lit(s"Sketches.hdrBuckets: $valueCol must be > 0, got "),
            col(valueCol).cast("string")))))
      .withColumn("hdr_pow", expr("shiftleft(cast(1 as bigint), hdr_exp)"))
      .withColumn("hdr_sub", expr(s"(($valueCol - hdr_pow) * $k) div hdr_pow"))
      .withColumn("hdr_bucket",
        col("hdr_exp").cast("long") * k + col("hdr_sub"))
  }

  /** HLL registers per group: (groupCol, bucket, reg) with bucket ∈
    * [0, 2^p) and reg = max rank observed in the bucket. Buckets with no
    * observations are absent (the estimate step accounts for them).
    */
  def hllRegisters(df: DataFrame, groupCol: String, key: Column, p: Int = 9): DataFrame = {
    require(p >= 4 && p <= 16, s"p=$p outside [4,16]")
    val m = 1 << p
    val maxRank = 48 - p + 1
    df.select(col(groupCol), TextAnalysis.md5Long48(key.cast("string")).as("h"))
      .select(col(groupCol),
        col("h").bitwiseAND(lit((m - 1).toLong)).as("bucket"),
        shiftright(col("h"), p).as("w"))
      .select(col(groupCol), col("bucket"), rank(col("w"), maxRank).as("rk"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("rk")).as("reg"))
  }

  /** Closed-form HLL estimate per group from a register table:
    * E = α_m · m² / Σ_j 2^(−M_j), empty buckets contributing 2^0 = 1.
    * The harmonic sum is kept exact in BIGINT (see object doc); the one
    * double expression has a fixed shape: ((α · m²) · 2^R) / S.
    * No small-range linear-counting correction: it needs ln (libm, whose
    * cross-engine rounding is unspecified) — the raw estimator is the
    * deterministic, oracle-mirrorable choice and its bias is part of the
    * reported telemetry.
    */
  def hllEstimate(registers: DataFrame, groupCol: String, p: Int = 9): DataFrame = {
    val m = 1 << p
    val maxRank = 48 - p + 1
    val pow2R = 1L << maxRank
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    registers
      .groupBy(col(groupCol))
      .agg(
        sum(TextAnalysis.shl(lit(1L), (lit(maxRank) - col("reg")).cast("int"))).as("s_present"),
        count(lit(1)).as("nb"))
      .withColumn("s_total",
        col("s_present") + (lit(m.toLong) - col("nb")) * lit(pow2R))
      .withColumn("hll_estimate",
        alpha * lit(m.toDouble * m) * lit(pow2R.toDouble) / col("s_total").cast("double"))
      .select(col(groupCol), col("hll_estimate"))
  }

  /** Linear-counting lookup m·ln(m/(m−nb)) for nb ∈ [1, m−1], computed
    * ONCE driver-side and shipped as an array literal — the correction
    * value is a function of nb alone, so pre-tabulating removes libm
    * `ln` from the gated channel entirely (ADVICE r18: Spark log vs
    * DuckDB ln last-ulp rounding is unspecified; [[hllEstimate]]'s doc
    * rejects libm for bit-gated channels). Oracles embed the SAME
    * literals via [[lcLookupSqlArray]] (Double.toString round-trips
    * exactly and DuckDB's parse is correctly rounded, so both engines
    * read identical doubles by construction).
    */
  private[graft] def lcTable(p: Int): Seq[Double] = {
    val m = 1 << p
    (1 until m).map(nb => m.toDouble * math.log(m.toDouble / (m - nb).toDouble))
  }

  /** The [[lcTable]] literals as a DuckDB `[…]::DOUBLE[]` array literal
    * (1-indexed by nb, like Spark's `element_at`).
    */
  private[graft] def lcLookupSqlArray(p: Int): String =
    lcTable(p).mkString("[", ", ", "]::DOUBLE[]")

  /** [[hllEstimate]] with Flajolet et al.'s SMALL-RANGE correction:
    * when the raw estimate is ≤ 2.5·m and empty registers exist,
    * linear counting m·ln(m/V) (V = empty registers) replaces it — the
    * regime a PER-NODE counter lives in (HyperANF's balls are tiny
    * against m even when the graph is huge), where the raw harmonic
    * estimator overshoots by ~m/cardinality. The large-range path is
    * bit-identical to [[hllEstimate]], so large-cardinality consumers
    * see the same numbers. The LC value comes from the pre-tabulated
    * [[lcTable]] literal (one `element_at` on a broadcast-const array),
    * never a runtime `ln` — see [[lcTable]] for the cross-engine
    * rationale.
    */
  def hllEstimateCorrected(registers: DataFrame, groupCol: String,
                           p: Int = 9): DataFrame = {
    val m = 1 << p
    val maxRank = 48 - p + 1
    val pow2R = 1L << maxRank
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    registers
      .groupBy(col(groupCol))
      .agg(
        sum(TextAnalysis.shl(lit(1L), (lit(maxRank) - col("reg")).cast("int"))).as("s_present"),
        count(lit(1)).as("nb"))
      .withColumn("s_total",
        col("s_present") + (lit(m.toLong) - col("nb")) * lit(pow2R))
      .withColumn("raw",
        alpha * lit(m.toDouble * m) * lit(pow2R.toDouble) / col("s_total").cast("double"))
      .withColumn("hll_estimate",
        when(col("raw") <= lit(2.5 * m) && col("nb") < lit(m.toLong),
          element_at(typedLit(lcTable(p)), col("nb").cast("int")))
          .otherwise(col("raw")))
      .select(col(groupCol), col("hll_estimate"))
  }

  /** The d bucket indices of an item in a (depth × width) Count-Min
    * sketch: row i hashes md5(i ‖ ':' ‖ item) — independent rows via the
    * salt prefix, identical in the oracle's SQL.
    */
  def cmsBuckets(item: Column, depth: Int, width: Int): Column =
    array((0 until depth).map { i =>
      TextAnalysis.md5Long48(concat_ws(":", lit(i.toString), item)) % lit(width.toLong)
    }: _*)

  /** The full (row_i, bucket, cnt) counter table of a Count-Min sketch
    * over an item column — at most d·w rows after the single count
    * shuffle (partial aggregation bounds the shuffled bytes at
    * d·w per upstream partition, not d·|items|).
    */
  def cmsCounters(items: DataFrame, item: Column, depth: Int, width: Int): DataFrame =
    items
      .select(posexplode(cmsBuckets(item, depth, width)).as(Seq("row_i", "bucket")))
      .groupBy(col("row_i"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-frequency lookup: adds `cms_estimate` = min over the d
    * counters addressed by `item`. `counters` is tiny (≤ d·w rows) and
    * is broadcast; the probe set never shuffles.
    */
  def cmsLookup(queries: DataFrame, item: Column, counters: DataFrame,
      depth: Int, width: Int): DataFrame = {
    val keyCols = queries.columns.map(col(_))
    val probed = queries.select(
      keyCols :+ posexplode(cmsBuckets(item, depth, width)).as(Seq("row_i", "bucket")): _*)
    probed
      .join(broadcast(counters), Seq("row_i", "bucket"))
      .groupBy(keyCols: _*)
      .agg(min(col("cnt")).as("cms_estimate"))
  }

  /** K-Minimum-Values (bottom-k) distinct sketch of `key`: the k
    * smallest DISTINCT md5-derived 48-bit hash values (Bar-Yossef et
    * al. 2002). One column `h`, ≤ k rows. Mergeable — union sketch =
    * bottom-k of the concatenated sketches — and, unlike HLL, it
    * supports SET-EXPRESSION estimates (Beyer et al. 2007): with
    * K = bottom-k(A ∪ B) and θ = max(K),
    *   |A ∪ B| ≈ (k−1) · 2^48 / θ,
    *   |A ∩ B| ≈ (|K ∩ A ∩ B| / |K|) · |A ∪ B|,
    * because K is a uniform size-k sample of A ∪ B. Distributed shape:
    * the distinct is one map-side-combining shuffle on h, the bottom-k
    * is TakeOrdered (per-partition top-k, never a global sort) — the
    * sketch costs one pass and ships k longs regardless of input size.
    */
  def kmv(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k >= 2, s"k=$k must be >= 2")
    df.select(TextAnalysis.md5Long48(key.cast("string")).as("h"))
      .distinct().orderBy(col("h")).limit(k)
  }
}
