package graft.operators

import graft.operators.TextAnalysis.md5Long48
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data preparation.
  *
  * Both operators key every decision off a PORTABLE hash of the row's
  * id (md5, the same 48-bit construction the dedup family uses), never
  * off `rand()` or partition order:
  *   - reruns and retried tasks produce byte-identical splits (Spark
  *     may re-execute any partition — a nondeterministic sample breaks
  *     exactly-once semantics under retries);
  *   - the split travels with the DATA, not the job: adding documents
  *     never reassigns existing ones across the train/test boundary
  *     (leakage-safe incremental ingestion at 100 TB);
  *   - the DuckDB oracle reproduces the exact assignment.
  *
  * All decisions are per-row projections or per-group window ranks —
  * no driver collect, no global sort.
  */
object Sampling {

  /** Hash bucket in [0, buckets) for an id column — md5-portable. The
    * salt isolates independent splits (a row's train/test fate in one
    * experiment must not correlate with its fate in another).
    */
  def hashBucket(id: Column, salt: String, buckets: Int = 100): Column =
    pmod(md5Long48(concat(id.cast("string"), lit(":" + salt))), lit(buckets.toLong))

  /** Deterministic train/test split label ('train' | 'test') with
    * `trainPct` percent of hash buckets assigned to train.
    */
  def splitLabel(id: Column, salt: String, trainPct: Int): Column =
    when(hashBucket(id, salt) < trainPct, lit("train")).otherwise(lit("test"))

  /** Per-stratum deterministic sample: keep at most `perStratum` rows
    * from each value of `stratumCol`, chosen by hash order (so the
    * sample is stable under reruns and row-order changes). One shuffle
    * on the stratum key; `WindowGroupLimit` keeps only `perStratum`
    * rows per partition before the final rank (no full-stratum sort
    * materialization at scale).
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       perStratum: Int, salt: String = "sample"): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashBucket(col(idCol), salt, 1 << 30), col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= perStratum)
      .drop("sample_rank")
  }

  /** Rebalance a skewed mixture to a UNIFORM one: downsample every
    * stratum (language, domain, source) to exactly the smallest
    * stratum's size — the data-mix leveling step of a training-data
    * pipeline (a corpus 60% en / 3% fr cannot be fed to a model that
    * should weight them equally).
    *
    * Selection is the same deterministic hash-order rank as
    * [[stratifiedSample]] (retry-stable, row-order-independent,
    * oracle-reproducible); the per-stratum budget comes from the data:
    * min over the stratum counts, computed in one map-side-partial
    * aggregate whose single-row result is BROADCAST — no second pass,
    * no driver collect. Cost: one stratum-keyed shuffle for the rank
    * (WindowGroupLimit caps nothing here since the budget is
    * data-dependent, but the window writes only rank ≤ budget rows
    * onward).
    */
  def rebalanceToMin(df: DataFrame, stratumCol: String, idCol: String,
                     salt: String = "rebalance"): DataFrame = {
    val minCount = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("_stratum_n"))
      .agg(min(col("_stratum_n")).as("_min_n"))
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashBucket(col(idCol), salt, 1 << 30), col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .crossJoin(broadcast(minCount))
      .filter(col("_rk") <= col("_min_n"))
      .drop("_rk", "_min_n")
  }

  /** Weighted sample without replacement (Efraimidis–Spirakis A-ES):
    * every row draws priority u^(1/w) from a DETERMINISTIC uniform
    * u ∈ (0, 1] (its md5 hash — not `rand()`, for the same retry /
    * rerun / oracle reasons as the other samplers), and the global
    * top-k priorities win. Rows with weight ≤ 0 are excluded (they
    * have no sampling mass; u^(1/w) would invert the order for w < 0).
    *
    * Scale shape: the priority is a per-row projection and the top-k
    * is `orderBy(...).limit(k)` — Spark plans TakeOrderedAndProject
    * (per-partition bounded heaps + a k-row driver merge), so nothing
    * resembling a global sort ever materializes. The id tiebreak makes
    * the selected SET unique even under (astronomically unlikely)
    * priority collisions.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, salt: String = "wsample"): DataFrame = {
    // (hash48 + 1) / 2^48: exact integer-to-double, exact power-of-two
    // divide -> u is bit-identical in any IEEE engine (and never 0)
    val u = (md5Long48(concat(col(idCol).cast("string"), lit(":" + salt))) + lit(1L))
      .cast("double") / lit(281474976710656.0)
    val priority = pow(u, lit(1.0) / col(weightCol).cast("double"))
    df.filter(col(weightCol) > 0)
      .withColumn("_wpri", priority)
      .orderBy(col("_wpri").desc, col(idCol))
      .limit(k)
      .drop("_wpri")
  }
  /** Temperature-flattened group resampling: keep each row of group g
    * with rate (n_min / n_g)^(1-alpha), so kept counts are ∝ n_g^alpha
    * — alpha = 1 keeps the natural mix, alpha = 0 flattens to uniform
    * (≈ n_min per group), alpha = 0.5 is the sqrt flattening most
    * multilingual training mixes use against head-language dominance.
    * Down-sampling only (the smallest group keeps everything); blowing
    * UP tail groups is replication, a different operator.
    *
    * Determinism/parity: the keep decision is u < r with u the per-row
    * md5-48 uniform (exact dyadic — bit-identical cross-engine, never
    * 0) and r the per-group rate. At alpha = 0.5 the rate is
    * sqrt(n_min/n_g): one correctly-rounded IEEE divide + sqrt, so r is
    * also bit-identical cross-engine. Other alphas go through pow(),
    * which is only ≤1-ulp cross-engine (JVM vs libm) — a boundary row
    * needs u within 1 ulp of r to flip (~2^-48 per row); callers that
    * hash-gate against another engine should stick to 0.5 (the
    * registered query does).
    *
    * Scale shape: group counts are one map-side-combined aggregate of
    * |groups| rows, broadcast back onto the scan (with the single-row
    * global min attached) — the corpus itself is filtered in place:
    * no corpus shuffle, no window, nothing driver-sized.
    */
  def temperatureSample(df: DataFrame, idCol: String, groupCol: String,
                        alpha: Double = 0.5, salt: String = "tempmix"): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1]: $alpha")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_ng"))
    val nMin = counts.agg(min(col("_ng")).as("_nmin"))
    val rates = counts.crossJoin(broadcast(nMin))
      .withColumn("_rate",
        if (alpha == 0.5) sqrt(col("_nmin").cast("double") / col("_ng").cast("double"))
        else pow(col("_nmin").cast("double") / col("_ng").cast("double"), lit(1.0 - alpha)))
      .select(col(groupCol), col("_rate"))
    val u = (md5Long48(concat(col(idCol).cast("string"), lit(":" + salt))) + lit(1L))
      .cast("double") / lit(281474976710656.0)
    df.join(broadcast(rates), Seq(groupCol))
      .filter(u < col("_rate"))
      .drop("_rate")
  }
}
