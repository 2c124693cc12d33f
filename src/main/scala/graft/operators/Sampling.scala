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
}
