package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-based table versioning — snapshot-isolated time travel for
  * an append-only parquet table, the Iceberg/Delta core mechanic at
  * operator size (reference capability: none — this is the
  * 100 TB-pipeline surface the driver mandates; a decade-lived training
  * corpus needs "read the table exactly as the March snapshot saw it"
  * for reproducible data mixes and incident forensics).
  *
  * Layout:
  * {{{
  *   path/data/v<version>-<n>.parquet   immutable data files (never rewritten)
  *   path/_versions/v<00000N>.manifest  one data-file name per line
  * }}}
  *
  * The COMMIT POINT is the manifest rename: data files are written
  * first (to a staging dir, then moved in under version-prefixed
  * names), and the manifest — the previous version's file list plus
  * the new files — is staged and atomically renamed LAST. A crash
  * anywhere before that rename leaves the table exactly at its
  * previous version (the new data files are unreferenced orphans a
  * vacuum can reap; no reader ever lists them because readers read
  * file lists from manifests, never from directory listings). Readers
  * of version v are immune to ALL later commits by construction:
  * their file set is frozen in v's manifest and data files are
  * immutable — that is snapshot isolation without locks, and why this
  * layout serves thousands of concurrent readers at 100 TB.
  */
object TimeTravel {

  private def fs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def manifestDir(path: String) = s"$path/_versions"
  private def manifestPath(path: String, v: Int) =
    f"${manifestDir(path)}/v$v%06d.manifest"

  /** Latest committed version, 0 if the table does not exist yet. */
  def currentVersion(spark: SparkSession, path: String): Int = {
    val (f, _) = fs(spark, path)
    val dir = new org.apache.hadoop.fs.Path(manifestDir(path))
    if (!f.exists(dir)) 0
    else f.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .map(_.stripPrefix("v").stripSuffix(".manifest").toInt)
      .foldLeft(0)(math.max)
  }

  private def readManifest(spark: SparkSession, path: String, v: Int): Seq[String] = {
    val (f, _) = fs(spark, path)
    val mp = new org.apache.hadoop.fs.Path(manifestPath(path, v))
    require(f.exists(mp), s"version $v does not exist under $path")
    val in = f.open(mp)
    val bytes = try in.readAllBytes() finally in.close()
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      .split('\n').map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Append `df` as a new commit; returns the new version number.
    * Version 1 on a fresh path. Data files move in under
    * version-prefixed names (immutable — a re-run cannot collide with
    * a committed file because the version it would reuse is already
    * taken), and the manifest rename is the single atomic commit point.
    */
  def commitAppend(spark: SparkSession, path: String, df: DataFrame): Int = {
    val (f, _) = fs(spark, path)
    val prev = currentVersion(spark, path)
    val v = prev + 1
    val staging = s"$path/_staging_v$v"
    df.write.mode("overwrite").parquet(staging)
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$path/data"))
    val parts = f.listStatus(new org.apache.hadoop.fs.Path(staging))
      .map(_.getPath).filter(p => p.getName.startsWith("part-") &&
        p.getName.endsWith(".parquet")).sortBy(_.getName)
    val names = parts.zipWithIndex.map { case (p, i) =>
      val name = f"v$v%06d-$i%05d.parquet"
      require(f.rename(p, new org.apache.hadoop.fs.Path(s"$path/data/$name")),
        s"staging move failed for $name")
      name
    }
    f.delete(new org.apache.hadoop.fs.Path(staging), true)
    val files = (if (prev == 0) Seq.empty else readManifest(spark, path, prev)) ++ names
    // stage-then-rename: the manifest appearing under its final name IS
    // the commit; a crash before this line leaves version `prev` intact
    val tmp = new org.apache.hadoop.fs.Path(s"${manifestDir(path)}/_tmp_v$v")
    f.mkdirs(new org.apache.hadoop.fs.Path(manifestDir(path)))
    val out = f.create(tmp, true)
    out.write(files.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    require(f.rename(tmp, new org.apache.hadoop.fs.Path(manifestPath(path, v))),
      s"manifest commit failed for v$v")
    v
  }

  /** Read the table exactly as version `v` saw it — the file set is
    * frozen in v's manifest, so later commits are invisible no matter
    * when this plan executes.
    */
  def readAsOf(spark: SparkSession, path: String, v: Int): DataFrame = {
    val files = readManifest(spark, path, v).map(n => s"$path/data/$n")
    spark.read.parquet(files: _*)
  }

  /** Latest-version read. */
  def read(spark: SparkSession, path: String): DataFrame =
    readAsOf(spark, path, currentVersion(spark, path))

  /** Data files referenced by NO manifest — crash orphans, safe to
    * reap (the vacuum listing; deletion stays the caller's decision,
    * mirroring operators.Vacuum's dry-run-first contract).
    */
  def orphans(spark: SparkSession, path: String): Seq[String] = {
    val (f, _) = fs(spark, path)
    val cur = currentVersion(spark, path)
    val referenced = (1 to cur).flatMap(v => readManifest(spark, path, v)).toSet
    val dataDir = new org.apache.hadoop.fs.Path(s"$path/data")
    if (!f.exists(dataDir)) Seq.empty
    else f.listStatus(dataDir).map(_.getPath.getName)
      .filterNot(referenced.contains).toSeq.sorted
  }
}
