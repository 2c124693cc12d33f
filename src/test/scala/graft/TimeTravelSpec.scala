package graft

import graft.operators.TimeTravel
import org.apache.spark.sql.functions._

/** Operator tests for the manifest-versioned table: snapshot isolation
  * (a version's read set is frozen against later commits), the
  * manifest-rename commit point (a crash before it leaves the previous
  * version intact and its data files as reapable orphans), and version
  * accounting. The registered query (maint_time_travel) hash-gates the
  * two snapshots' row sets against the raw fixture; these cover the
  * STORE mechanics.
  */
class TimeTravelSpec extends SparkSpec {

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("graft_ttravel_spec").toString + "/t"

  private lazy val docs = Tables.documents(spark, sf("sf0.001"))
    .select(col("doc_id"), col("text"))

  test("append commits version; read-as-of(v) is frozen against later commits") {
    val path = freshPath()
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 =!= 0)
    assert(TimeTravel.currentVersion(spark, path) == 0)
    assert(TimeTravel.commitAppend(spark, path, even) == 1)
    val v1Before = TimeTravel.readAsOf(spark, path, 1)
      .orderBy("doc_id").collect().toSeq
    assert(TimeTravel.commitAppend(spark, path, odd) == 2)
    // snapshot isolation: v1's read set must be unchanged AFTER v2
    val v1After = TimeTravel.readAsOf(spark, path, 1)
      .orderBy("doc_id").collect().toSeq
    assert(v1After == v1Before)
    assert(v1After.map(_.getLong(0)).forall(_ % 2 == 0))
    // v2 = the full corpus
    assert(TimeTravel.readAsOf(spark, path, 2).count() == docs.count())
    assert(TimeTravel.read(spark, path).count() == docs.count())
    assert(TimeTravel.currentVersion(spark, path) == 2)
  }

  test("crash before the manifest rename leaves the previous version intact; orphans listed") {
    val path = freshPath()
    TimeTravel.commitAppend(spark, path,
      docs.filter(col("doc_id") % 2 === 0))
    val n1 = TimeTravel.read(spark, path).count()
    // manufacture the crash state: data files landed, manifest never
    // renamed — write a file directly into data/ with a v2 name
    val stray = new java.io.File(s"$path/data/v000002-99999.parquet")
    docs.filter(col("doc_id") % 2 =!= 0).limit(5).coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_crash_stage")
    val part = new java.io.File(s"$path/_crash_stage").listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, stray.toPath)
    // current version unchanged; readers never see the orphan
    assert(TimeTravel.currentVersion(spark, path) == 1)
    assert(TimeTravel.read(spark, path).count() == n1)
    assert(TimeTravel.orphans(spark, path) == Seq("v000002-99999.parquet"))
    // a subsequent commit is unaffected (v2 name space: the stray file
    // is not referenced by the new manifest either)
    TimeTravel.commitAppend(spark, path, docs.filter(col("doc_id") % 2 =!= 0))
    assert(TimeTravel.read(spark, path).count() == docs.count())
  }

  test("version history: each version's count is monotone under appends") {
    val path = freshPath()
    val thirds = (0 to 2).map(r => docs.filter(col("doc_id") % 3 === r))
    thirds.foreach(TimeTravel.commitAppend(spark, path, _))
    val counts = (1 to 3).map(v => TimeTravel.readAsOf(spark, path, v).count())
    assert(counts == counts.sorted)
    assert(counts.last == docs.count())
    intercept[IllegalArgumentException] {
      TimeTravel.readAsOf(spark, path, 4)
    }
  }
}
