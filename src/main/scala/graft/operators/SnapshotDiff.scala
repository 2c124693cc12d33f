package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — the CDC/dataset-versioning primitive: classify every
  * key between two snapshots of a keyed table as `added`, `removed`,
  * `changed`, or `unchanged`. Training-data pipelines run this on every
  * refresh (what moved between corpus v1 and v2? how big is the delta
  * the incremental jobs must process?).
  *
  * Shape: ONE full-outer shuffle join on the key columns — both sides
  * hash-partition on the same key, so at 100 TB the diff is a
  * co-partitioned merge with no data-sized broadcast anywhere; value
  * comparison is a null-safe projection on the joined row. With both
  * snapshots bucketed by the key, the exchange disappears entirely.
  */
object SnapshotDiff {

  /** One row per key present in either snapshot, with `change_type` ∈
    * {added, removed, changed, unchanged}. `compareCols` are checked
    * null-safely (`<=>`), so a value moving to/from NULL counts as a
    * change; columns outside `compareCols` are ignored.
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame,
           keys: Seq[String], compareCols: Seq[String]): DataFrame = {
    val o = oldSnap.select((keys ++ compareCols).map(col): _*)
      .withColumn("_in_old", lit(true))
    val n = newSnap.select((keys ++ compareCols).map(col): _*)
      .withColumn("_in_new", lit(true))
    val renamedN = compareCols.foldLeft(n)((df, c) => df.withColumnRenamed(c, s"_new_$c"))
    val joined = o.join(renamedN, keys, "full_outer")
    val someChanged: Column = compareCols
      .map(c => !(col(c) <=> col(s"_new_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined.withColumn("change_type",
        when(col("_in_old").isNull, lit("added"))
          .when(col("_in_new").isNull, lit("removed"))
          .when(someChanged, lit("changed"))
          .otherwise(lit("unchanged")))
      .drop("_in_old", "_in_new")
  }
}
