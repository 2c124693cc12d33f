package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction for parquet tables — the maintenance operator
  * every appending pipeline needs at scale: micro-batch sinks (e.g.
  * [[graft.streaming.VectorServing.ingestDedupStream]] appending per
  * batch) accumulate files far below the ~128 MB row-group sweet spot,
  * and a 100 TB table of 4 MB files pays 30× the driver listing /
  * footer-read / task-scheduling overhead of a right-sized one.
  *
  * `rewrite` sizes the output file count from the table's actual bytes
  * (ceil(totalBytes / targetFileBytes)), rewrites through a temp
  * directory, and atomically swaps via rename — readers either see the
  * old layout or the new one, never a partial mix. Partition columns
  * are preserved (`partitionBy`), and within each output file rows are
  * sorted by `sortCols` so parquet min/max column statistics become
  * selective (data skipping for range predicates — the poor man's
  * Z-order for a single sort dimension).
  *
  * This is the open-source shape of lakehouse `OPTIMIZE`; table formats
  * (Delta/Iceberg) add transactional manifests, which plain parquet
  * directories lack — hence the rename swap, which is atomic on HDFS
  * and local filesystems (object stores need the table-format route).
  */
object Compact {

  final case class Stats(files: Long, bytes: Long)

  /** File count + total bytes of the data files under `path`. */
  def tableStats(spark: SparkSession, path: String): Stats = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var files = 0L; var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      // count data files only — skip _SUCCESS and checkpoint metadata
      if (!f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith(".")) {
        files += 1; bytes += f.getLen
      }
    }
    Stats(files, bytes)
  }

  /** Rewrite `path` into ~targetFileBytes-sized parquet files,
    * preserving `partitionBy` layout, sorting rows within files by
    * `sortCols`. Returns (before, after) stats.
    */
  def rewrite(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024,
              partitionBy: Seq[String] = Nil,
              sortCols: Seq[String] = Nil): (Stats, Stats) = {
    val before = tableStats(spark, path)
    val nFiles = math.max(1L, (before.bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(path)
    val repartitioned =
      if (partitionBy.nonEmpty)
        // co-locate each table partition's rows so every partition dir
        // gets whole output files rather than nFiles slivers each
        df.repartition(nFiles, partitionBy.map(col): _*)
      else if (sortCols.nonEmpty)
        // range partitioning makes the per-file sort global-ish: file k
        // holds a contiguous key range → min/max stats are disjoint
        df.repartitionByRange(nFiles, sortCols.map(col): _*)
      else df.repartition(nFiles)
    val sorted =
      if (sortCols.nonEmpty) repartitioned.sortWithinPartitions(sortCols.map(col): _*)
      else repartitioned
    val tmp = path.stripSuffix("/") + "_compact_tmp"
    val writer = sorted.write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(tmp)
    // atomic swap: old dir → trash name, tmp → live, then drop the old
    val p = new Path(path); val t = new Path(tmp)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(path.stripSuffix("/") + "_compact_old")
    if (!fs.rename(p, old)) throw new java.io.IOException(s"rename $p -> $old failed")
    if (!fs.rename(t, p)) { fs.rename(old, p); throw new java.io.IOException(s"rename $t -> $p failed") }
    fs.delete(old, true)
    (before, tableStats(spark, path))
  }
}
