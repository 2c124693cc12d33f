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
  * directory, and swaps via rename. Partition directory layout is
  * preserved, with output files per partition sized from the data (a
  * 50 GB date partition gets ~400 right-sized files, not one); within
  * files rows are sorted by `sortCols` so parquet min/max statistics
  * become selective (data skipping for range predicates — the poor
  * man's Z-order for a single sort dimension).
  *
  * CONCURRENCY CONTRACT — plain parquet directories have no
  * transaction log, so the caller MUST quiesce writers for the
  * duration of `rewrite`: an append that lands between the input
  * listing and the swap is silently lost (it rides along in the
  * discarded old directory). Pause the ingest stream (or compact
  * between its triggers); concurrent READERS are safe on filesystems
  * with atomic rename (HDFS/local — object stores need a real table
  * format). Streaming-sink tables carrying a `_spark_metadata` log
  * must be compacted through the sink's own mechanism, not this one
  * (the rewrite does not recreate the log; metadata files are excluded
  * from stats and from the data rewrite).
  *
  * Crash recovery: the swap is two renames. A crash between them
  * leaves the table at `<path>_compact_old` and nothing at `path` —
  * rename it back to recover; nothing is deleted until both renames
  * succeed. Leftover `_compact_tmp`/`_compact_old` directories from a
  * previous crashed run are detected and removed up front (they are,
  * respectively, a partial rewrite and an already-replaced layout —
  * but `_compact_old` is only removed when `path` itself is healthy;
  * otherwise it IS the table and `rewrite` refuses to run).
  */
object Compact {

  final case class Stats(files: Long, bytes: Long)

  // One cached child session per caller session. Weak keys: the cache
  // must never pin a caller session (the child references only the
  // shared SparkContext). Reusing one child per caller keeps repeated
  // maintenance runs from accumulating ExecutionListenerBus
  // registrations on the shared context listener bus.
  private val readers =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, SparkSession]())

  /** The child session `rewrite` reads and writes through: shares the
    * SparkContext + catalog with `spark` but owns its SQLConf, so
    * disabling partition type inference can't leak into concurrent
    * queries on the caller's session. `rewrite` re-syncs the caller's
    * runtime confs into it on every call (see there); exposed to tests
    * so execution listeners can be registered on the session whose
    * sessionUUID the listener bus actually filters for.
    */
  private[graft] def compactionReader(spark: SparkSession): SparkSession =
    readers.computeIfAbsent(spark, s => s.newSession())

  /** True if any path component BELOW the table root is a metadata
    * dir/file (leading `_` or `.`) — e.g. `_spark_metadata/0`, whose
    * leaf name alone looks like a data file. `root` MUST be qualified
    * with the same FileSystem that produced `file` (listings return
    * fully-qualified paths): comparing against an unqualified root
    * never terminates the walk at the table boundary, so a table that
    * merely LIVES UNDER a dot/underscore ancestor (`/data/.cache/t`)
    * would count zero data files.
    */
  private[graft] def isMetadata(root: Path, file: Path): Boolean = {
    var p = file
    while (p != null && p != root) {
      val n = p.getName
      if (n.startsWith("_") || n.startsWith(".")) return true
      p = p.getParent
    }
    false
  }

  /** File count + total bytes of the DATA files under `path`
    * (metadata trees like `_spark_metadata` excluded at every level).
    */
  def tableStats(spark: SparkSession, path: String): Stats = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // qualify BEFORE comparing: listFiles yields file://-qualified paths
    val root = fs.makeQualified(new Path(path))
    val it = fs.listFiles(root, true)
    var files = 0L; var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (!isMetadata(root, f.getPath)) { files += 1; bytes += f.getLen }
    }
    Stats(files, bytes)
  }

  /** Number of leaf partition directories (`col=value` at every level)
    * `depth` levels below `root` — the partition-combination count read
    * straight from the directory layout, replacing a full
    * `distinct().count()` scan of the data. At 100 TB listing the
    * directory tree is O(#partitions); scanning the table is O(bytes).
    */
  private def countLeafPartitionDirs(fs: org.apache.hadoop.fs.FileSystem,
                                     root: Path, depth: Int): Long =
    if (depth == 0) 1L
    else fs.listStatus(root).iterator
      .filter(s => s.isDirectory && s.getPath.getName.contains("=") &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      .map(s => countLeafPartitionDirs(fs, s.getPath, depth - 1))
      .sum

  /** Rewrite `path` into ~targetFileBytes-sized parquet files,
    * preserving `partitionBy` layout, sorting rows within files by
    * `sortCols`. Returns (before, after) stats. See the object scaladoc
    * for the writer-quiescence contract.
    */
  def rewrite(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024,
              partitionBy: Seq[String] = Nil,
              sortCols: Seq[String] = Nil): (Stats, Stats) = {
    val p = new Path(path.stripSuffix("/"))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path.stripSuffix("/") + "_compact_tmp")
    val old = new Path(path.stripSuffix("/") + "_compact_old")
    // pre-clean leftovers of a crashed run: tmp is always a partial
    // rewrite (safe to drop); old is stale ONLY if the live path exists
    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (fs.exists(old)) {
      if (fs.exists(p)) fs.delete(old, true)
      else throw new java.io.IOException(
        s"$old exists but $p does not — a previous swap crashed mid-rename; " +
          s"recover with: fs.rename($old, $p)")
    }

    val before = tableStats(spark, path)
    val nFiles = math.max(1L, (before.bytes + targetFileBytes - 1) / targetFileBytes).toInt
    // partition values must round-trip VERBATIM: with type inference on,
    // `part=01` reads as int 1 and rewrites to a renamed `part=1`
    // directory — readers keying on the original string value lose the
    // partition. Inference off reads them as strings, and the rewritten
    // directory names are byte-identical (a later read with inference
    // on sees the same types as before the compaction).
    val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    // read (and write) through the cached child session — own SQLConf,
    // shared SparkContext and catalog — so disabling inference can't
    // leak into concurrent queries on the caller's session. The child
    // starts from the INITIAL SparkConf, not the caller's runtime
    // state, so mirror the caller's runtime confs first: the rewrite's
    // write must honor whatever parquet codec / outputTimestampType /
    // rebase-mode / ANSI settings the caller's own writes would use.
    // Non-runtime (static/immutable) entries throw and are skipped.
    val reader = compactionReader(spark)
    val callerConf = spark.conf.getAll
    // the child is CACHED across rewrites, so first drop keys the caller
    // has since unset (both sessions share the initial SparkConf, so a
    // child key absent from the caller's runtime conf means the caller
    // unset it — leaving it would freeze e.g. a long-gone codec choice
    // into every future rewrite), then mirror the current values
    reader.conf.getAll.keys.filterNot(callerConf.contains).foreach { k =>
      try reader.conf.unset(k)
      catch { case _: org.apache.spark.sql.AnalysisException => () }
    }
    callerConf.foreach { case (k, v) =>
      try reader.conf.set(k, v)
      catch { case _: org.apache.spark.sql.AnalysisException => () }
    }
    reader.conf.set(inferKey, "false")
    val df = reader.read.parquet(path)
    val repartitioned =
      if (partitionBy.nonEmpty) {
        // hashing on the partition columns ALONE would send each
        // partition value to one task → one (arbitrarily large) file
        // per directory. Salt with a per-partition bucket sized so each
        // directory gets ~its-bytes/targetFileBytes files.
        // Partition-combo count comes from the directory layout, not a
        // distinct() scan of the data — the values ARE the dir names.
        val nParts = math.max(1L,
          countLeafPartitionDirs(fs, fs.makeQualified(p), partitionBy.length))
        val filesPerPart = math.max(1L, math.ceil(nFiles.toDouble / nParts).toLong).toInt
        val salt = pmod(xxhash64(df.columns.map(col): _*), lit(filesPerPart))
        // RANGE partitioning on (partition cols, salt): each discrete
        // (partValue, salt) combo lands in its own task range, so every
        // directory gets ~filesPerPart files — hash partitioning here
        // collides combos into shared tasks at small bucket counts,
        // collapsing a hot partition back to one oversized file
        df.repartitionByRange(nFiles, partitionBy.map(col) :+ salt: _*)
      } else if (sortCols.nonEmpty)
        // range partitioning makes the per-file sort global-ish: file k
        // holds a contiguous key range → min/max stats are disjoint
        df.repartitionByRange(nFiles, sortCols.map(col): _*)
      else df.repartition(nFiles)
    val sorted =
      if (sortCols.nonEmpty) repartitioned.sortWithinPartitions(sortCols.map(col): _*)
      else repartitioned
    val writer = sorted.write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(tmp.toString)
    // swap: nothing is deleted until both renames succeed; a crash in
    // the window leaves the table intact at `old` (see scaladoc)
    if (!fs.rename(p, old)) throw new java.io.IOException(s"rename $p -> $old failed")
    if (!fs.rename(tmp, p)) { fs.rename(old, p); throw new java.io.IOException(s"rename $tmp -> $p failed") }
    fs.delete(old, true)
    (before, tableStats(spark, path))
  }
}
