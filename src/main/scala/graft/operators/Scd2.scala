package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type-2 history builder: collapse a series
  * of full dimension snapshots into one row per (key, value-interval)
  * with `version_from` / `version_to` validity bounds — the standard
  * warehouse shape for "what did this row look like at version v?"
  * queries, and the batch mirror of the CDC path ([[SnapshotDiff]]
  * classifies ONE step; this operator folds N steps into intervals).
  *
  * Execution shape (the 100 TB contract):
  *   - the snapshots are unioned with a `snap_version` literal — a pure
  *     scan-side projection, no shuffle;
  *   - change detection is a key-partitioned window (`lag` over the
  *     tracked columns, null-safe) — ONE hash shuffle on the key;
  *   - interval closing (`lead` on the surviving change rows) reuses
  *     the SAME key partitioning: Catalyst plans a single Exchange for
  *     both windows (filter preserves the distribution), so the whole
  *     history build is one shuffle of |keys| × |versions| rows.
  *
  * Keys absent from a later snapshot keep an open interval (deletes
  * need a tombstone row in the feed to close it — same contract as
  * every log-compacted CDC source).
  */
object Scd2 {

  /** Build the Type-2 history.
    *
    * @param snapshots   (version, full dimension snapshot) pairs;
    *                    versions must be distinct, snapshots complete.
    * @param keyCols     business key columns.
    * @param trackedCols columns whose changes open a new interval
    *                    (null-safe compared; untracked columns take
    *                    their value from the interval-opening snapshot).
    * @return one row per interval: key + tracked cols as of
    *         `version_from`, plus `version_from`, `version_to`
    *         (null = still current), `is_current`.
    */
  def build(snapshots: Seq[(Int, DataFrame)], keyCols: Seq[String],
            trackedCols: Seq[String]): DataFrame = {
    require(snapshots.nonEmpty, "need at least one snapshot")
    require(snapshots.map(_._1).distinct.size == snapshots.size,
      "snapshot versions must be distinct")
    val versioned = snapshots.map { case (v, df) =>
      df.select((keyCols ++ trackedCols).map(col): _*)
        .withColumn("snap_version", lit(v))
    }.reduce(_ unionByName _)

    val byKey = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("snap_version"))
    // first appearance, or any tracked column differing from the
    // previous snapshot's value (null-safe: NULL -> value is a change)
    val opensInterval = trackedCols
      .map(c => !(col(c) <=> lag(col(c), 1).over(byKey)))
      .reduce(_ || _) || row_number().over(byKey) === 1

    versioned
      .withColumn("opens", opensInterval)
      .filter(col("opens"))
      .withColumn("version_from", col("snap_version"))
      .withColumn("version_to", lead(col("snap_version"), 1).over(byKey) - 1)
      .withColumn("is_current", col("version_to").isNull)
      .drop("opens", "snap_version")
  }
}
