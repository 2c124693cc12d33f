package graft

import graft.operators.Compact
import org.apache.spark.sql.functions._

/** Compaction tests: file-count reduction, data fidelity, partition
  * layout preservation, and min/max-friendly sorting.
  */
class CompactSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  private def cleanup(dir: String): Unit = {
    import scala.reflect.io.Directory
    new Directory(new java.io.File(dir).getParentFile).deleteRecursively()
  }

  test("rewrite collapses a fragmented table without changing its contents") {
    val dir = tmpDir("graft_compact")
    try {
      // simulate micro-batch append fragmentation: 40 writes of 25 rows
      val rows = (0L until 1000L).map(i => (i, s"doc $i", (i % 7).toInt))
      rows.grouped(25).foreach { g =>
        g.toDF("id", "text", "grp").coalesce(1).write.mode("append").parquet(dir)
      }
      val before = Compact.tableStats(spark, dir)
      assert(before.files >= 40, s"expected fragmentation, got ${before.files} files")

      val (b, a) = Compact.rewrite(spark, dir, targetFileBytes = 1L << 30)
      assert(b.files == before.files)
      assert(a.files < before.files / 10,
        s"compaction should collapse ${b.files} files, got ${a.files}")
      val back = spark.read.parquet(dir).as[(Long, String, Int)].collect().toSet
      assert(back == rows.toSet, "compaction must be byte-faithful to the data")
    } finally cleanup(dir)
  }

  test("partitioned rewrite keeps the partition directory layout") {
    val dir = tmpDir("graft_compact_part")
    try {
      val rows = (0L until 400L).map(i => (i, s"v$i", (i % 4).toInt))
      rows.grouped(20).foreach { g =>
        g.toDF("id", "v", "part").coalesce(1)
          .write.mode("append").partitionBy("part").parquet(dir)
      }
      val (b, a) = Compact.rewrite(spark, dir, targetFileBytes = 1L << 30,
        partitionBy = Seq("part"))
      assert(a.files < b.files, s"${b.files} -> ${a.files}")
      val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).toSet
      assert(dirs == (0 until 4).map(i => s"part=$i").toSet, s"layout lost: $dirs")
      // partition pruning still works on the compacted table
      val pruned = spark.read.parquet(dir).filter(col("part") === 2)
      assert(pruned.count() == 100)
      val scan = pruned.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      assert(scan.get.selectedPartitions.partitionCount == 1)
    } finally cleanup(dir)
  }

  test("partitioned rewrite splits big partitions into multiple right-sized files") {
    val dir = tmpDir("graft_compact_split")
    try {
      // one hot partition (900 rows) + one small (100): with a target of
      // ~1/4 the table bytes, the hot partition must get >1 output file
      // (hashing on the partition column alone would give exactly 1)
      val rows = (0L until 1000L).map(i => (i, s"payload $i" * 8, if (i < 900) 0 else 1))
      rows.grouped(50).foreach { g =>
        g.toDF("id", "v", "part").coalesce(1)
          .write.mode("append").partitionBy("part").parquet(dir)
      }
      val bytes = Compact.tableStats(spark, dir).bytes
      Compact.rewrite(spark, dir, targetFileBytes = bytes / 4, partitionBy = Seq("part"))
      val hotFiles = new java.io.File(s"$dir/part=0").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(hotFiles > 1, s"hot partition collapsed to $hotFiles file(s)")
      assert(spark.read.parquet(dir).count() == 1000)
    } finally cleanup(dir)
  }

  test("crashed-swap leftovers: stale old dir cleaned, orphaned old dir refuses with recovery hint") {
    val dir = tmpDir("graft_compact_crash")
    try {
      (0L until 100L).map(i => (i, s"v$i")).toDF("id", "v")
        .write.mode("overwrite").parquet(dir)
      // stale leftover (live table present) → silently cleaned, rewrite proceeds
      new java.io.File(dir + "_compact_old").mkdirs()
      Compact.rewrite(spark, dir, targetFileBytes = 1L << 30)
      assert(!new java.io.File(dir + "_compact_old").exists())
      // orphaned leftover (live table missing = crash between renames) → refuse
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.rename(new org.apache.hadoop.fs.Path(dir),
        new org.apache.hadoop.fs.Path(dir + "_compact_old"))
      val e = intercept[java.io.IOException] {
        Compact.rewrite(spark, dir, targetFileBytes = 1L << 30)
      }
      assert(e.getMessage.contains("recover"), e.getMessage)
    } finally cleanup(dir)
  }

  test("tableStats ignores files nested inside metadata directories") {
    val dir = tmpDir("graft_compact_meta")
    try {
      (0L until 10L).map(i => (i, s"v$i")).toDF("id", "v")
        .write.mode("overwrite").parquet(dir)
      val clean = Compact.tableStats(spark, dir)
      val meta = new java.io.File(s"$dir/_spark_metadata")
      meta.mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/_spark_metadata/0"), "x" * 4096)
      assert(Compact.tableStats(spark, dir) == clean,
        "metadata log contents must not count as data files")
    } finally cleanup(dir)
  }

  test("table under a dot-directory ancestor: stats see the data and rewrite is faithful") {
    // regression: isMetadata walked past the (unqualified) root and
    // flagged the `.cache` ANCESTOR as metadata → Stats(0,0) and a
    // rewrite that collapsed everything into one bogus file
    val base = java.nio.file.Files.createTempDirectory("graft_compact_dotroot")
    val dir = s"$base/.cache/t"
    try {
      val rows = (0L until 200L).map(i => (i, s"v$i"))
      rows.grouped(20).foreach { g =>
        g.toDF("id", "v").coalesce(1).write.mode("append").parquet(dir)
      }
      val before = Compact.tableStats(spark, dir)
      assert(before.files >= 10 && before.bytes > 0,
        s"stats must see data under a dotted ancestor, got $before")
      val (b, a) = Compact.rewrite(spark, dir, targetFileBytes = 1L << 30)
      assert(b == before && a.files < b.files && a.bytes > 0, s"$b -> $a")
      assert(spark.read.parquet(dir).as[(Long, String)].collect().toSet == rows.toSet)
    } finally {
      import scala.reflect.io.Directory
      new Directory(base.toFile).deleteRecursively()
    }
  }

  test("partition directory values round-trip verbatim (no type-inference renaming)") {
    val dir = tmpDir("graft_compact_verbatim")
    try {
      // "01" and "001" both parse to int 1 under partition type
      // inference — an inferring rewrite would merge/rename the dirs
      val rows = Seq((1L, "a", "01"), (2L, "b", "001"), (3L, "c", "x7"))
      rows.toDF("id", "v", "part").write.partitionBy("part").parquet(dir)
      Compact.rewrite(spark, dir, targetFileBytes = 1L << 30, partitionBy = Seq("part"))
      val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).toSet
      assert(dirs == Set("part=01", "part=001", "part=x7"),
        s"partition directory names must be preserved byte-for-byte: $dirs")
      assert(spark.read.parquet(dir).count() == 3)
    } finally cleanup(dir)
  }

  test("partitioned rewrite counts partitions from the directory layout, not a data scan") {
    val dir = tmpDir("graft_compact_nocount")
    try {
      val rows = (0L until 300L).map(i => (i, s"v$i", (i % 3).toInt))
      rows.grouped(30).foreach { g =>
        g.toDF("id", "v", "part").coalesce(1)
          .write.mode("append").partitionBy("part").parquet(dir)
      }
      val countActions = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               durationNs: Long): Unit =
          if (funcName == "count") countActions.incrementAndGet()
        override def onFailure(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               exception: Exception): Unit = ()
      }
      // the ExecutionListenerBus filters events by sessionUUID, and
      // rewrite executes on its cached CHILD session — register the
      // listener (and run the FIFO sentinel) on that session, or a
      // regressed distinct().count() inside rewrite would never reach it
      val reader = Compact.compactionReader(spark)
      reader.listenerManager.register(listener)
      try {
        val (b, a) = Compact.rewrite(spark, dir, targetFileBytes = 1L << 30,
          partitionBy = Seq("part"))
        assert(a.files < b.files)
        // listener delivery is async but FIFO: run a sentinel count and
        // wait until the listener sees it — any count() issued by
        // rewrite would have been delivered before the sentinel, so
        // "exactly 1" proves rewrite issued none (no fixed sleep, and a
        // late-delivered rewrite count can't slip past the assert)
        reader.range(1).count()
        val deadline = System.nanoTime() + 10_000_000_000L
        while (countActions.get() == 0 && System.nanoTime() < deadline)
          Thread.sleep(25)
        assert(countActions.get() == 1,
          "partition-combo count must come from fs listing, not distinct().count()")
      } finally reader.listenerManager.unregister(listener)
    } finally cleanup(dir)
  }

  test("rewrite honors the caller's runtime write confs (parquet codec)") {
    val dir = tmpDir("graft_compact_codec")
    val codecKey = "spark.sql.parquet.compression.codec"
    val prev = spark.conf.get(codecKey)
    try {
      (0L until 200L).map(i => (i, s"v$i")).toDF("id", "v")
        .repartition(4).write.mode("overwrite").parquet(dir)
      // the caller's session asks for gzip; the rewrite runs on a child
      // session built from the INITIAL conf — without the runtime-conf
      // sync, compacted files would come out under the default codec
      spark.conf.set(codecKey, "gzip")
      Compact.rewrite(spark, dir, targetFileBytes = 1L << 30)
      val names = new java.io.File(dir).listFiles()
        .map(_.getName).filter(_.endsWith(".parquet")).toSeq
      assert(names.nonEmpty && names.forall(_.contains(".gz.")),
        s"compacted files must use the caller's codec: $names")
      assert(spark.read.parquet(dir).count() == 200)
      // the child session is CACHED — when the caller unsets the key,
      // the next rewrite must not keep compacting with the stale gzip
      spark.conf.unset(codecKey)
      Compact.rewrite(spark, dir, targetFileBytes = 1L << 30)
      val after = new java.io.File(dir).listFiles()
        .map(_.getName).filter(_.endsWith(".parquet")).toSeq
      assert(after.nonEmpty && !after.exists(_.contains(".gz.")),
        s"unset codec must not linger in the cached session: $after")
      assert(spark.read.parquet(dir).count() == 200)
    } finally { spark.conf.set(codecKey, prev); cleanup(dir) }
  }

  test("repeated rewrites reuse one child session per caller (no session churn)") {
    val dir = tmpDir("graft_compact_reuse")
    try {
      (0L until 50L).map(i => (i, s"v$i")).toDF("id", "v")
        .repartition(5).write.mode("overwrite").parquet(dir)
      val first = Compact.compactionReader(spark)
      Compact.rewrite(spark, dir, targetFileBytes = 1L << 30)
      Compact.rewrite(spark, dir, targetFileBytes = 1L << 30)
      assert(Compact.compactionReader(spark) eq first,
        "maintenance runs must not allocate a fresh session (listener-bus churn)")
    } finally cleanup(dir)
  }

  test("sorted rewrite yields disjoint per-file key ranges (min/max data skipping)") {
    val dir = tmpDir("graft_compact_sort")
    try {
      val rows = scala.util.Random.shuffle((0L until 2000L).toList).map(i => (i, s"p$i"))
      rows.grouped(100).foreach { g =>
        g.toDF("id", "payload").coalesce(1).write.mode("append").parquet(dir)
      }
      // tiny target → several output files, range-partitioned by id
      val bytes = Compact.tableStats(spark, dir).bytes
      val (_, a) = Compact.rewrite(spark, dir, targetFileBytes = bytes / 4,
        sortCols = Seq("id"))
      assert(a.files >= 2 && a.files <= 8, s"got ${a.files} files")
      // per-file id ranges must not overlap — that's what makes parquet
      // min/max stats selective for range predicates
      val ranges = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
        .map { f =>
          val d = spark.read.parquet(f.getAbsolutePath)
            .agg(min(col("id")), max(col("id"))).collect()(0)
          (d.getLong(0), d.getLong(1))
        }.sortBy(_._1)
      ranges.sliding(2).foreach {
        case Array((_, hi), (lo, _)) => assert(hi < lo, s"overlapping file ranges: ${ranges.toSeq}")
        case _ => ()
      }
      assert(spark.read.parquet(dir).count() == 2000)
    } finally cleanup(dir)
  }
}
