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

  /** Snapshot versions under `workRoot` whose parquet write COMMITTED
    * (`_SUCCESS` present), as (batchId, path) ascending. Listing goes
    * through the path's Hadoop FileSystem — the work root lives on
    * hdfs://, s3a://, … in production.
    */
  def committedVersions(spark: org.apache.spark.sql.SparkSession,
                        workRoot: String): Seq[(Long, String)] = {
    val root = new org.apache.hadoop.fs.Path(workRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // ONE glob listing for every version's commit marker instead of a
    // per-directory fs.exists round-trip (ADVICE r20: N versions cost N
    // RPCs per micro-batch on an object store; the glob is a single
    // LIST). Returns exactly the dirs the old exists-loop accepted.
    Option(fs.globStatus(new org.apache.hadoop.fs.Path(root, "v*/_SUCCESS")))
      .getOrElse(Array.empty)
      .toSeq
      .map(_.getPath.getParent)
      .filter(_.getName.matches("v\\d+"))
      .map(p => (p.getName.drop(1).toLong, p.toString))
      .sortBy(_._1)
  }

  /** The snapshot a reader (or a restarted stream) should see: the
    * committed version with the highest batch id, else the initial
    * target. This is the RECOVERY rule — the in-memory pointer dies
    * with the driver, the version directories do not.
    */
  def latestSnapshot(spark: org.apache.spark.sql.SparkSession,
                     workRoot: String, initialTarget: String): String =
    committedVersions(spark, workRoot).lastOption.map(_._2)
      .getOrElse(initialTarget)

  /** Start the apply stream. `changes` must carry the target's columns
    * plus `deleteCol` (boolean: true = WHEN MATCHED DELETE).
    *
    * RESTART / EXACTLY-ONCE contract (r19 verdict #3): snapshots are
    * versioned by the micro-batch's own `batchId`, and each batch
    * merges FROM the newest snapshot committed with a STRICTLY SMALLER
    * batch id (not "the newest") — so a batch replayed after a crash
    * re-reads exactly the source its first attempt read and REWRITES
    * its own snapshot to identical content, instead of double-applying
    * its changes to a snapshot that already contains them. Combined
    * with the checkpoint's offset log (Spark never re-runs a batch
    * whose commit log entry exists) the final table after any
    * kill/restart sequence equals the uninterrupted run's
    * (CdcRestartSpec pins a mid-stream kill differential). Empty
    * batches are skipped — the strictly-smaller rule bridges the batch
    * id gaps they leave. Recovery cost per batch is one directory
    * listing of workRoot.
    */
  def applyStream(changes: DataFrame, initialTarget: String, workRoot: String,
                  keys: Seq[String], updateCols: Seq[String], deleteCol: String,
                  checkpoint: String,
                  trigger: Trigger = Trigger.AvailableNow()): Applied = {
    // a restarted stream resumes the pointer from the committed
    // versions, not from initialTarget — resolved BEFORE start() so a
    // fast first batch cannot be overwritten by stale recovery
    val current = new java.util.concurrent.atomic.AtomicReference[String](
      latestSnapshot(changes.sparkSession, workRoot, initialTarget))
    val q = changes.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val prev = committedVersions(s, workRoot)
            .takeWhile(_._1 < batchId).lastOption
            .map(_._2).getOrElse(initialTarget)
          val target = s.read.parquet(prev)
          val merged = Merge(target, batch, keys, updateCols,
            deleteCondition = Some(col(deleteCol)))
          val next = s"$workRoot/v$batchId"
          merged.write.mode("overwrite").parquet(next)
          current.set(next)
        }
      }
      .start()
    new Applied(q, current)
  }
}
