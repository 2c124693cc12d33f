package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental aggregate maintenance — the materialized-view pattern:
  * keep per-key ALGEBRAIC partials (sum / count / min / max), and when
  * a delta batch arrives, merge its partials into the base instead of
  * re-aggregating the full fact table. At 100 TB this is the
  * difference between touching |keys| + |delta| rows and re-scanning
  * the corpus on every refresh.
  *
  * The merge is exact because every kept statistic is algebraic
  * (mergeable by sum/sum/min/max) and the sum accumulates in
  * DECIMAL(38,6) — order- and grouping-independent, so
  * merge(partial(A), partial(B)) ≡ partial(A ∪ B) bit-for-bit (the
  * registered query's oracle is the full recompute). AVG and friends
  * derive from (sum, count) at read time; non-algebraic statistics
  * (exact distinct, percentiles) need their own mergeable sketches and
  * are out of scope here.
  */
object IncrementalAgg {

  /** Per-key algebraic partials of `valueCol`: exact-decimal sum, row
    * count, min, max. The stored representation of the rollup.
    */
  def partials(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(
        sum(col(valueCol).cast(DecimalType(38, 6))).as("p_sum"),
        count(lit(1)).as("p_count"),
        min(col(valueCol)).as("p_min"),
        max(col(valueCol)).as("p_max"))

  /** Merge partial relations (same schema) into one: union + re-reduce
    * with the aggregates' own merge functions. Work is proportional to
    * the number of (key, side) rows — the base FACT rows are never
    * touched. Associative and commutative: any merge tree gives the
    * identical result, so refreshes can cascade (hourly → daily →
    * monthly) without drift.
    */
  def merge(parts: Seq[DataFrame], keyCols: Seq[String]): DataFrame =
    parts.reduce(_.unionByName(_))
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("p_sum")).as("p_sum"),
        sum(col("p_count")).as("p_count"),
        min(col("p_min")).as("p_min"),
        max(col("p_max")).as("p_max"))
}
