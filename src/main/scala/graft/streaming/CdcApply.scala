package graft.streaming

import graft.operators.Merge
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous CDC apply: a stream of change rows (upserts + delete
  * markers) MERGEs into a parquet target per micro-batch — the
  * streaming form of [[graft.operators.Merge]], and the standard
  * "apply the binlog to the lake table" shape. `foreachBatch` runs the
  * EXACT SAME Merge operator the batch gate hashes, so there is no
  * second merge implementation to drift.
  *
  * Each batch writes a NEW versioned snapshot directory and flips the
  * current-table pointer only after the write commits — readers of the
  * previous snapshot are never broken mid-batch, and a crashed batch
  * leaves the pointer on the last good version (the same
  * swap-on-commit discipline [[graft.operators.Compact]] uses;
  * table formats do this with a metadata pointer instead of a path).
  *
  * Scale: per batch, cost is one co-partitioned key join of
  * |target| + |batch| — the full-snapshot rewrite is the plain-parquet
  * price; with a real table format the same Merge output would become
  * a copy-on-write commit of only the touched files.
  */
object CdcApply {

  final class Applied(val query: StreamingQuery,
                      currentPath: java.util.concurrent.atomic.AtomicReference[String]) {
    /** Path of the latest committed snapshot. */
    def current: String = currentPath.get()
  }

  /** Start the apply stream. `changes` must carry the target's columns
    * plus `deleteCol` (boolean: true = WHEN MATCHED DELETE).
    */
  def applyStream(changes: DataFrame, initialTarget: String, workRoot: String,
                  keys: Seq[String], updateCols: Seq[String], deleteCol: String,
                  checkpoint: String,
                  trigger: Trigger = Trigger.AvailableNow()): Applied = {
    val current = new java.util.concurrent.atomic.AtomicReference[String](initialTarget)
    val version = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = changes.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val target = s.read.parquet(current.get())
          val merged = Merge(target, batch, keys, updateCols,
            deleteCondition = Some(col(deleteCol)))
          val next = s"$workRoot/v${version.incrementAndGet()}"
          merged.write.mode("overwrite").parquet(next)
          current.set(next)
        }
      }
      .start()
    new Applied(q, current)
  }
}
