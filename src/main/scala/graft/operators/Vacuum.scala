package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.{FileSystem, Path}

/** Retention / orphan-file cleanup for plain-parquet table directories.
  *
  * A directory-backed table has no transaction log, so "the table" is
  * whatever files a scan globs — which means leftovers from crashed or
  * superseded writers (half-staged task files, an append that never
  * "committed", duplicated micro-batch output) silently become table
  * rows. The fix mirrors what every table format does: a MANIFEST names
  * the committed snapshot's data files, and vacuum deletes data files
  * the manifest doesn't know about.
  *
  * Scale notes: both operations are file-metadata work, O(#files) with
  * zero data read — the production cost model for S3/HDFS listings.
  * Listing here is a single recursive driver-side iterator (the same
  * `listFiles(recursive)` every Spark parquet scan starts with); at
  * object-store scale you'd fan the per-prefix listing out with a
  * parallelized listing, but the delete set and safety rules are
  * identical. Deletes never touch metadata files (`_`-prefixed:
  * manifest, _SUCCESS) or directories, so a concurrent reader of the
  * MANIFESTED snapshot is never broken — the files it reads are
  * exactly the files vacuum keeps.
  */
object Vacuum {

  val ManifestFile = "_graft_manifest"

  final case class VacuumStats(kept: Int, deleted: Int)

  private def fs(spark: SparkSession, table: String): (FileSystem, Path) = {
    val p = new Path(table)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Paths of all data files currently under `table` (recursive),
    * relative to the table root. `_`-prefixed names and their subtrees
    * are metadata, not data.
    */
  private def listDataFiles(hfs: FileSystem, root: Path): Seq[String] = {
    val rootUri = root.toUri.getPath
    val it = hfs.listFiles(root, true)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next()
      val rel = f.getPath.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
      if (!rel.split('/').exists(seg => seg.startsWith("_") || seg.startsWith(".")))
        out += rel
    }
    out.toSeq
  }

  /** Record the CURRENT set of data files as the committed snapshot. */
  def writeManifest(spark: SparkSession, table: String): Int = {
    val (hfs, root) = fs(spark, table)
    val files = listDataFiles(hfs, root).sorted
    val out = hfs.create(new Path(root, ManifestFile), true)
    try out.write(files.mkString("\n").getBytes("UTF-8")) finally out.close()
    files.size
  }

  /** Delete data files not named by the manifest (crash leftovers,
    * uncommitted appends). Metadata files are never deleted.
    */
  def vacuum(spark: SparkSession, table: String): VacuumStats = {
    val (hfs, root) = fs(spark, table)
    val manifestPath = new Path(root, ManifestFile)
    require(hfs.exists(manifestPath), s"no $ManifestFile under $table — refusing to vacuum")
    val in = hfs.open(manifestPath)
    val committed =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).toSet
      finally in.close()
    val current = listDataFiles(hfs, root)
    val orphans = current.filterNot(committed)
    orphans.foreach(rel => hfs.delete(new Path(root, rel), false))
    VacuumStats(kept = current.size - orphans.size, deleted = orphans.size)
  }
}
