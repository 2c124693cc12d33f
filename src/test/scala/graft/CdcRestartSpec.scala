package graft

import graft.streaming.CdcApply
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Exactly-once restart-resume differential for the streaming CDC apply
  * (r19 verdict #3): kill the stream mid-run, restart it from the same
  * checkpoint + work root, and the final snapshot must equal the
  * uninterrupted run's — no lost batch, no double-applied batch. This
  * is the one streaming property the per-batch gates cannot see: they
  * only ever run a stream to completion once.
  *
  * The change feed is deliberately ORDER-SENSITIVE (a later batch
  * deletes a row an earlier batch inserted, and re-updates a key an
  * earlier batch updated), so a skipped or doubled batch cannot cancel
  * out.
  */
class CdcRestartSpec extends SparkSpec {
  import spark.implicits._

  private val changeSchema = StructType(Seq(
    StructField("id", LongType), StructField("val", LongType),
    StructField("is_delete", BooleanType)))

  /** Stage one parquet file with a controlled mtime (the file source
    * reads oldest-first), mirroring TmpStores.stageFile (private to the
    * queries package).
    */
  private def stage(df: org.apache.spark.sql.DataFrame, stagingDir: String,
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

  test("CDC apply resumes exactly-once after a mid-stream kill: restart ≡ uninterrupted") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdcrestart").toString
    try {
      val targetPath = s"$root/target"
      (1L to 6L).map(i => (i, i * 10L)).toDF("id", "val")
        .coalesce(1).write.parquet(targetPath)
      val staging = s"$root/staging"
      // batch 1: update id1, delete id2; batch 2: insert id7, update
      // id3; batch 3: delete id7 (inserted one batch earlier — order
      // matters) and RE-update id1 (overwrites batch 1 — order matters)
      stage(Seq((1L, 111L, false), (2L, 0L, true))
        .toDF("id", "val", "is_delete"), staging, "c1", 120000L)
      stage(Seq((7L, 777L, false), (3L, 333L, false))
        .toDF("id", "val", "is_delete"), staging, "c2", 60000L)
      stage(Seq((7L, 0L, true), (1L, 112L, false))
        .toDF("id", "val", "is_delete"), staging, "c3", 1000L)

      def startApply(workRoot: String, ckpt: String, trigger: Trigger) =
        CdcApply.applyStream(
          spark.readStream.schema(changeSchema)
            .option("maxFilesPerTrigger", 1).parquet(staging),
          targetPath, workRoot, keys = Seq("id"), updateCols = Seq("val"),
          deleteCol = "is_delete", checkpoint = ckpt, trigger = trigger)

      def snapshot(path: String): Set[(Long, Long)] =
        spark.read.parquet(path).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet

      // reference: one uninterrupted run to completion
      val ref = startApply(s"$root/wA", s"$root/ckA", Trigger.AvailableNow())
      ref.query.awaitTermination()
      val want = snapshot(ref.current)
      assert(want == Set((1L, 112L), (3L, 333L), (4L, 40L), (5L, 50L), (6L, 60L)),
        s"reference run is wrong before the differential even starts: $want")

      // interrupted run: kill as soon as the first snapshot commits —
      // between micro-batches (or mid-batch-2; either is a valid crash
      // point, the restart must converge from both)
      val killed = startApply(s"$root/wB", s"$root/ckB",
        Trigger.ProcessingTime(0L))
      val deadline = System.currentTimeMillis() + 60000L
      while (CdcApply.committedVersions(spark, s"$root/wB").isEmpty &&
             System.currentTimeMillis() < deadline) Thread.sleep(25L)
      assert(CdcApply.committedVersions(spark, s"$root/wB").nonEmpty,
        "first snapshot never committed — cannot stage the kill")
      killed.query.stop()

      // restart from the SAME checkpoint + work root; drain to the end
      val resumed = startApply(s"$root/wB", s"$root/ckB", Trigger.AvailableNow())
      resumed.query.awaitTermination()
      assert(snapshot(resumed.current) == want,
        s"restarted run diverged from the uninterrupted one:\n" +
          s"got  ${snapshot(resumed.current)}\nwant $want")

      // no double-emit: every committed snapshot is a distinct batch id
      // (a replayed batch REWROTE its own version, never minted a new
      // one), and the recovered pointer is the highest of them
      val versions = CdcApply.committedVersions(spark, s"$root/wB")
      assert(versions.map(_._1) == versions.map(_._1).distinct,
        s"duplicate snapshot versions: $versions")
      // (committedVersions returns FS-qualified file: URIs; the
      // in-process pointer carries the raw path — same location)
      def norm(p: String) = p.stripPrefix("file:")
      assert(norm(resumed.current) == norm(versions.last._2))
      // the recovery rule a fresh reader would apply agrees
      assert(norm(CdcApply.latestSnapshot(spark, s"$root/wB", targetPath)) ==
        norm(resumed.current))
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(root)).deleteRecursively()
    }
  }

  test("a replayed batch merges from the snapshot committed BEFORE it, rewriting its own version idempotently") {
    // simulate the crash-replay source rule directly: with v0 and v1
    // committed, a replay of batch 1 must read v0 (strictly smaller
    // id), not v1 — reading v1 would double-apply batch 1's changes
    val root = java.nio.file.Files.createTempDirectory("graft_cdcreplay").toString
    try {
      val s = spark
      Seq((1L, 5L)).toDF("id", "val").write.parquet(s"$root/w/v0")
      Seq((1L, 6L)).toDF("id", "val").write.parquet(s"$root/w/v1")
      val versions = CdcApply.committedVersions(s, s"$root/w")
      assert(versions.map(_._1) == Seq(0L, 1L))
      // batch id 1 replay: source = v0; batch id 2: source = v1
      assert(versions.takeWhile(_._1 < 1L).lastOption.map(_._2).contains(
        versions.head._2))
      assert(versions.takeWhile(_._1 < 2L).lastOption.map(_._2).contains(
        versions.last._2))
      // an uncommitted (no _SUCCESS) version is invisible to recovery
      val dir = new java.io.File(s"$root/w/v2"); dir.mkdirs()
      assert(CdcApply.committedVersions(s, s"$root/w").map(_._1) == Seq(0L, 1L))
      assert(CdcApply.latestSnapshot(s, s"$root/w", "init") ==
        versions.last._2)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(root)).deleteRecursively()
    }
  }
}
