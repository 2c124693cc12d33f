package graft.queries

/** Shared lifecycle for the one-time write-time artifacts the registered
  * queries memoize per (fixture, JVM): persisted ANN indexes, streamed
  * corpora. One policy, three users — previously copy-pasted.
  */
private[queries] object TmpStores {

  /** A tmp directory scoped to (tag, key, THIS JVM):
    *   - pid-suffixed — a deterministic shared path would let a
    *     concurrent JVM's overwrite delete files out from under this
    *     JVM's registered scans mid-query;
    *   - sibling dirs whose owning JVM is gone are reaped (a kill -9
    *     skips shutdown hooks) while live-pid dirs are left alone;
    *   - deleted on JVM exit via shutdown hook — without it every run
    *     would leak a copy into /tmp.
    * The directory itself is NOT created — callers write into it.
    */
  def pidScopedPath(tag: String, key: String): String = {
    val pid = ProcessHandle.current().pid()
    val tmpRoot = System.getProperty("java.io.tmpdir")
    val prefix = s"${tag}_" + graft.functions.Md5.hex(key).take(12) + "_"
    Option(new java.io.File(tmpRoot).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(prefix))
      .foreach { f =>
        val ownerAlive = f.getName.stripPrefix(prefix).toLongOption
          .exists(p => ProcessHandle.of(p).isPresent)
        if (!ownerAlive)
          new scala.reflect.io.Directory(f).deleteRecursively()
      }
    val path = s"$tmpRoot/$prefix$pid"
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      new scala.reflect.io.Directory(new java.io.File(path)).deleteRecursively()))
    path
  }

  private val memo = scala.collection.concurrent.TrieMap.empty[(String, String), String]

  /** One build per (tag, key, JVM) of an on-disk table: clears the
    * pid-scoped root first (a failed previous attempt leaves half-staged
    * files the new build must not see), runs `build(root)`, memoizes the
    * returned table path. The memoize-after-cleanup-then-build sequence
    * was previously copy-pasted per store.
    */
  def memoizedTable(tag: String, key: String)(build: String => String): String =
    memo.getOrElseUpdate((tag, key), {
      val root = pidScopedPath(tag, key)
      new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
      build(root)
    })

  /** Stage `df` as ONE parquet file `stagingDir/name.parquet` with its
    * mtime pushed `ageMs` into the past — the deterministic-replay
    * primitive for file-source streams: the source picks oldest files
    * first, so staged ages define the micro-batch order exactly.
    * (Shared by the streaming ingest and CDC-apply stores.)
    */
  /** Stage `df` as `nFiles` parquet files `stagingDir/name_NNN.parquet`
    * sharing one mtime `ageMs` in the past — the PARALLEL variant of
    * [[stageFile]] for corpus-sized replay batches (stageFile's
    * coalesce(1) funnels the whole batch through ONE write task; at
    * sf100 that single-threaded staging pass dominated
    * stream_hll_daily's NOWARM probe — r17 verdict #6). All of a
    * batch's files share an mtime strictly older than the next
    * batch's, so a file-source stream with maxFilesPerTrigger = nFiles
    * consumes exactly one staged batch per trigger, preserving the
    * deterministic micro-batch order.
    */
  def stageFiles(df: org.apache.spark.sql.DataFrame, stagingDir: String,
                 name: String, ageMs: Long, nFiles: Int): Unit = {
    val scratch = s"$stagingDir/_scratch_$name"
    df.repartition(nFiles).write.mode("overwrite").parquet(scratch)
    val parts = new java.io.File(scratch).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    // parquet tasks with ZERO rows emit no part file, so a fixture with
    // fewer rows than nFiles per staged batch legitimately writes fewer
    // files (ADVICE r18) — accept any non-empty prefix; the file-source
    // consumer reads whatever was staged. More than nFiles is still a
    // bug (repartition(n) can never fan wider).
    require(parts.nonEmpty && parts.length <= nFiles,
      s"staged ${parts.length} files under $scratch, expected 1..$nFiles")
    new java.io.File(stagingDir).mkdirs()
    val mtime = System.currentTimeMillis() - ageMs
    parts.zipWithIndex.foreach { case (part, i) =>
      val dest = new java.io.File(f"$stagingDir/${name}_$i%03d.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dest.setLastModified(mtime)
    }
    new scala.reflect.io.Directory(new java.io.File(scratch)).deleteRecursively()
  }

  def stageFile(df: org.apache.spark.sql.DataFrame, stagingDir: String,
                name: String, ageMs: Long): Unit = {
    val scratch = s"$stagingDir/_scratch_$name"
    df.coalesce(1).write.mode("overwrite").parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file staged under $scratch"))
    val dest = new java.io.File(s"$stagingDir/$name.parquet")
    dest.getParentFile.mkdirs()
    java.nio.file.Files.move(part.toPath, dest.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dest.setLastModified(System.currentTimeMillis() - ageMs)
    new scala.reflect.io.Directory(new java.io.File(scratch)).deleteRecursively()
  }
}
