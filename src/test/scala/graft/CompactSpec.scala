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
