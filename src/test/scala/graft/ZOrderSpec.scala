package graft

import graft.operators.ZOrder
import graft.operators.ZOrder.ColRange

/** Z-order layout tests: bit-interleave correctness of the Morton
  * z-value, data fidelity of the re-layout, and the property the whole
  * operator exists for — per-file min/max envelopes tight on BOTH
  * clustered dimensions (vs. a z-unaware layout of the same file
  * count), which is what parquet row-group skipping prunes on.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  private def cleanup(dir: String): Unit = {
    import scala.reflect.io.Directory
    new Directory(new java.io.File(dir).getParentFile).deleteRecursively()
  }

  test("zValue interleaves bucket bits round-robin (x even positions, y odd)") {
    // ranges [0,255] with endpoint values: buckets hit exactly 0 / 255,
    // so the expected masks are exact (no floating bucket boundaries)
    val df = Seq((0L, 0L), (255L, 0L), (0L, 255L), (255L, 255L)).toDF("x", "y")
    val ranges = Seq(ColRange("x", 0, 255), ColRange("y", 0, 255))
    val z = df.select($"x", $"y", ZOrder.zValue(ranges, bits = 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(z((0L, 0L)) == 0L)
    assert(z((255L, 0L)) == 0x5555L)   // x contributes bits 0,2,4,...
    assert(z((0L, 255L)) == 0xAAAAL)   // y contributes bits 1,3,5,...
    assert(z((255L, 255L)) == 0xFFFFL)
  }

  test("zValue clamps out-of-range values and degenerate ranges") {
    val df = Seq((-10L, 5L), (300L, 5L)).toDF("x", "y")
    // y's range is degenerate (min == max) -> bucket 0 for all rows
    val ranges = Seq(ColRange("x", 0, 255), ColRange("y", 5, 5))
    val z = df.select(ZOrder.zValue(ranges, bits = 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(z == Seq(0L, 0x5555L))
  }

  test("layout is a pure permutation with tight envelopes on both dims") {
    val li = Tables.lineitem(spark, sf("sf0.01"))
      .select($"l_orderkey", $"l_partkey", $"l_suppkey", $"l_extendedprice")
    val zDir = tmpDir("graft_zorder")
    val naiveDir = tmpDir("graft_zorder_naive")
    try {
      val st = ZOrder.layout(spark, li, Seq("l_partkey", "l_suppkey"), zDir, nFiles = 16)
      assert(st.files >= 8, s"expected ~16 files, got ${st.files}")

      val back = spark.read.parquet(zDir)
      assert(back.count() == li.count(), "re-layout must not add/drop rows")
      assert(back.columns.sorted.toSeq == li.columns.sorted.toSeq,
        "helper z column must not leak into the written schema")

      // z-unaware baseline: same data, same file count, hash layout
      li.repartition(16).write.parquet(naiveDir)

      val zCov = ZOrder.avgRangeCoverage(spark, zDir, Seq("l_partkey", "l_suppkey"))
      val nCov = ZOrder.avgRangeCoverage(spark, naiveDir, Seq("l_partkey", "l_suppkey"))
      // ideal 16-file Morton layout covers ~sqrt(1/16)=25% of each dim
      // per file; a hash layout covers ~100%. Generous margins keep the
      // assertion robust to range-partition boundary jitter.
      assert(zCov < 0.55, f"z-order avg range coverage $zCov%.3f should be well below 1")
      assert(zCov < nCov * 0.7,
        f"z-order ($zCov%.3f) should beat the z-unaware layout ($nCov%.3f)")
    } finally { cleanup(zDir); cleanup(naiveDir) }
  }

  test("read path: a 2-D range predicate skips row groups on the z layout, not on hash") {
    // the envelope-tightness test above proves the stats COULD prune;
    // this one proves the parquet read path actually DOES: the scan's
    // numOutputRows metric counts rows decoded after row-group
    // stats skipping (each ~3.7k-row file here is one row group), so a
    // selective box predicate on both clustered dims must decode far
    // less of the z layout than of the same-file-count hash layout
    val li = Tables.lineitem(spark, sf("sf0.01"))
      .select($"l_orderkey", $"l_partkey", $"l_suppkey", $"l_extendedprice")
    val zDir = tmpDir("graft_zskip")
    val naiveDir = tmpDir("graft_zskip_naive")
    try {
      ZOrder.layout(spark, li, Seq("l_partkey", "l_suppkey"), zDir, nFiles = 16)
      li.repartition(16).write.parquet(naiveDir)

      // ~6% × ~16% of the two key ranges ≈ 1% of the z-space: inside
      // 1-2 Morton tiles, but inside EVERY hash file's envelope
      def run(dir: String): (Long, Set[(Long, Long)]) = {
        val q = spark.read.parquet(dir)
          .filter($"l_partkey".between(100, 220) && $"l_suppkey".between(10, 25))
        val rows = q.collect().map(r =>
          (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_partkey"))).toSet
        val exec = q.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        val scan = exec.collectFirst {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s
        }.getOrElse(fail(s"no FileSourceScanExec:\n$exec"))
        (scan.metrics("numOutputRows").value, rows)
      }
      val (zScanned, zRows) = run(zDir)
      val (nScanned, nRows) = run(naiveDir)
      assert(zRows == nRows, "both layouts must return identical rows")
      assert(zRows.nonEmpty, "predicate should match something")
      val total = li.count()
      info(f"scan decoded rows: z=$zScanned n=$nScanned of $total")
      assert(nScanned > total / 2,
        s"hash layout should decode most of the table ($nScanned of $total)")
      assert(zScanned * 3 < nScanned,
        s"z layout should decode <1/3 of the hash layout's rows ($zScanned vs $nScanned)")
    } finally { cleanup(zDir); cleanup(naiveDir) }
  }
}
