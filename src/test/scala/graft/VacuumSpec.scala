package graft

import graft.operators.Vacuum
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VacuumSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_vacuum_spec").toString
    s"$dir/t"
  }

  test("vacuum deletes exactly the unmanifested data files") {
    val table = newTable()
    (0L until 100L).toDF("id").repartition(4).write.parquet(table)
    val committed = Vacuum.writeManifest(spark, table)
    assert(committed == 4)

    // a crashed writer's leftovers: an uncommitted append
    (100L until 150L).toDF("id").repartition(2).write.mode("append").parquet(table)
    assert(spark.read.parquet(table).count() == 150, "orphans leak into scans pre-vacuum")

    val st = Vacuum.vacuum(spark, table)
    assert(st.deleted == 2 && st.kept == 4, s"got $st")
    assert(spark.read.parquet(table).count() == 100, "post-vacuum scan sees the committed snapshot only")
    // idempotent
    val st2 = Vacuum.vacuum(spark, table)
    assert(st2.deleted == 0 && st2.kept == 4)
  }

  test("vacuum never touches metadata files and refuses without a manifest") {
    val table = newTable()
    (0L until 10L).toDF("id").write.parquet(table)
    intercept[IllegalArgumentException] { Vacuum.vacuum(spark, table) }
    Vacuum.writeManifest(spark, table)
    Vacuum.vacuum(spark, table)
    val names = new java.io.File(table).listFiles().map(_.getName)
    assert(names.contains(Vacuum.ManifestFile), "manifest must survive vacuum")
    assert(names.contains("_SUCCESS"), "_SUCCESS must survive vacuum")
  }

  test("vacuum works on partitioned layouts (recursive listing, relative paths)") {
    val table = newTable()
    val df = Seq.tabulate(40)(i => (i.toLong, s"p${i % 2}")).toDF("id", "part")
    df.repartition(col("part")).write.partitionBy("part").parquet(table)
    Vacuum.writeManifest(spark, table)
    // orphan inside a partition directory
    Seq((999L, "p0")).toDF("id", "part")
      .write.mode("append").partitionBy("part").parquet(table)
    val st = Vacuum.vacuum(spark, table)
    assert(st.deleted >= 1, s"got $st")
    assert(spark.read.parquet(table).count() == 40)
  }
}
