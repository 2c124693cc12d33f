package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE INTO semantics over plain DataFrames — the CDC-apply step
  * every table format (Delta/Iceberg/Hudi) exposes as
  * `MERGE INTO target USING source ON keys WHEN MATCHED [AND cond]
  * THEN UPDATE/DELETE WHEN NOT MATCHED THEN INSERT`, expressed here as
  * one full-outer join + per-row resolution so it runs on any store
  * the engine writes. Together with [[SnapshotDiff]] (derive the
  * change set), [[Scd2]] (fold history), and [[Upsert]] (latest-wins
  * compaction) this completes the CDC family: diff → apply → history.
  *
  * Execution shape: ONE co-partitioned full-outer join on the key —
  * both sides hash-shuffle on the key, nothing broadcasts (the source
  * may be 1% or 100% of the target; a data-sized broadcast would be
  * the scale killer), and the resolution is a pure projection.
  * Catalyst pushes the key-join through AQE's skew handling like any
  * other shuffle join.
  *
  * Deletes are WHEN MATCHED AND cond — rows of the target whose
  * matching source row satisfies `deleteCondition` disappear; matched
  * rows otherwise take `updateCols` from the source; unmatched source
  * rows insert when `insertWhenNotMatched`; unmatched target rows pass
  * through.
  */
object Merge {

  def apply(target: DataFrame, source: DataFrame, keys: Seq[String],
            updateCols: Seq[String],
            deleteCondition: Option[Column] = None,
            insertWhenNotMatched: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "MERGE needs at least one key column")
    val dataCols = target.columns.filterNot(keys.contains).toSeq
    require(updateCols.forall(dataCols.contains),
      s"updateCols must be non-key target columns: $updateCols vs $dataCols")
    val srcCols: Seq[Column] =
      keys.map(col) ++
        dataCols.filter(source.columns.contains).map(col) ++
        Seq(lit(true).as("__src_present")) ++
        deleteCondition.map(_.as("__src_delete")).toSeq
    val src = source.select(srcCols: _*)
    val srcPrefixed = src.columns.foldLeft(src)((d, c) =>
      if (keys.contains(c) || c.startsWith("__src")) d
      else d.withColumnRenamed(c, s"__s_$c"))
    val tgt = target.withColumn("__tgt_present", lit(true))
    val joined = tgt.join(srcPrefixed, keys, "full_outer")
    val matched = col("__tgt_present").isNotNull && col("__src_present").isNotNull
    val deleteHit = deleteCondition match {
      case Some(_) => matched && coalesce(col("__src_delete"), lit(false))
      case None => lit(false)
    }
    val keep = joined.filter(!deleteHit)
      .filter(col("__tgt_present").isNotNull || lit(insertWhenNotMatched))
    val resolved = dataCols.foldLeft(keep) { (d, c) =>
      val srcCol = s"__s_$c"
      if (!d.columns.contains(srcCol)) d
      else {
        val useSrc =
          if (updateCols.contains(c))
            // matched-update takes the source value; inserts do too
            col("__src_present").isNotNull
          else
            // non-updatable columns only come from source on insert
            col("__tgt_present").isNull
        d.withColumn(c, when(useSrc, col(srcCol)).otherwise(col(c)))
      }
    }
    resolved.select(target.columns.map(col): _*)
  }
}
