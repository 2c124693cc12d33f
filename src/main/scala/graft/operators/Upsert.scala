package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-wins upsert (batch MERGE emulation): base ∪ updates, keep
  * one row per key — highest version, updates beating base on version
  * ties. Core Spark has no MERGE INTO (that's a table-format feature);
  * the engine-level primitive is this union + per-key rank:
  *
  *   - ONE shuffle on the key; `WindowGroupLimit` keeps a single row
  *     per key per partition before the final rank, so the sort never
  *     materializes whole key groups;
  *   - deterministic under ties (explicit `_src` priority), so a retry
  *     or rerun produces byte-identical tables — the property a
  *     snapshot-ingest pipeline needs;
  *   - at 100 TB the same op runs per partition-of-keys; with both
  *     sides bucketed by the key it is exchange-free (BucketingSpec
  *     proves the layout).
  */
object Upsert {

  def latestWins(base: DataFrame, updates: DataFrame,
                 keys: Seq[String], versionCol: String): DataFrame = {
    val unioned = base.withColumn("_src", lit(0))
      .unionByName(updates.withColumn("_src", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc, col("_src").desc)
    unioned.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_src")
  }
}
