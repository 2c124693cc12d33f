package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

/** File-source Structured Streaming end-to-end: the events pipeline
  * consumed via `readStream` over a parquet directory (files arriving =
  * micro-batches), written through `writeStream` — the deployment shape
  * for continuous ingestion at scale (a landing directory consumed
  * incrementally with exactly-once file tracking).
  */
class FileStreamSpec extends SparkSpec {
  import graft.streaming.EventPipeline

  test("readStream over a parquet landing dir runs the tumbling pipeline incrementally") {
    val landing = java.nio.file.Files.createTempDirectory("graft_land").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val scratch = java.nio.file.Files.createTempDirectory("graft_scratch").toString
    try {
      // drop the first file before starting (initial batch), second after
      val all = Tables.events(spark, sf("sf0.001"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
      // stage each batch in scratch, then move the bare part file into
      // the flat landing dir (what an ingestion job delivering files
      // does)
      def deliver(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
        val out = s"$scratch/$name"
        df.coalesce(1).write.parquet(out)
        val part = new java.io.File(out).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        assert(part.renameTo(new java.io.File(landing, s"$name.parquet")))
      }
      deliver(all.filter(col("event_id") < 500), "batch1")

      val stream = spark.readStream.schema(schema).parquet(landing)
      val agg = EventPipeline.tumblingStats(
        EventPipeline.withEventTimeWatermark(stream, "10 minutes"), "5 minutes")
      val q = agg.writeStream.format("memory").queryName("t_filestream")
        .outputMode(OutputMode.Append()).start()
      try {
        q.processAllAvailable()
        deliver(all.filter(col("event_id") >= 500), "batch2")
        q.processAllAvailable()
      } finally q.stop()

      // windows finalized by the watermark must match the batch result
      // over the same rows (append mode only emits closed windows)
      val streamed = spark.table("t_filestream")
        .select(col("window_start"), col("event_type"), col("n"))
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      val batch = EventPipeline.tumblingStats(all, "5 minutes")
        .select(col("window_start"), col("event_type"), col("n"))
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(streamed.nonEmpty, "no windows emitted")
      assert(streamed.subsetOf(batch),
        s"streamed windows must agree with batch: extra=${streamed -- batch}")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(landing)).deleteRecursively()
      new Directory(new java.io.File(scratch)).deleteRecursively()
    }
  }
}
