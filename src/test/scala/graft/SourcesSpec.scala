package graft

import org.apache.spark.sql.functions._

/** Source/sink format coverage (SURVEY §2.1): CSV with explicit schema,
  * JSON lines, ORC, and partitioned parquet all round-trip the same
  * data; parquet remains the canonical store (columnar + pushdown).
  */
class SourcesSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rm(dir: String): Unit = {
    import scala.reflect.io.Directory
    new Directory(new java.io.File(dir)).deleteRecursively()
  }

  private lazy val docs = Tables.documents(spark, sf("sf0.001"))
    .select("doc_id", "lang", "source", "n_chars", "text")

  private def key(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, Long)] =
    df.select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq

  test("csv sink/source round trip with explicit schema (quoted free text)") {
    val dir = tmp("graft_csv")
    try {
      docs.write.option("header", "true").option("quoteAll", "true").mode("overwrite").csv(dir)
      val back = spark.read.option("header", "true")
        .schema(docs.schema).option("multiLine", "true").csv(dir)
      assert(key(back) == key(docs))
    } finally rm(dir)
  }

  test("json-lines sink/source round trip") {
    val dir = tmp("graft_json")
    try {
      docs.write.mode("overwrite").json(dir)
      val back = spark.read.schema(docs.schema).json(dir)
      assert(key(back) == key(docs))
    } finally rm(dir)
  }

  test("orc sink/source round trip") {
    val dir = tmp("graft_orc")
    try {
      docs.write.mode("overwrite").orc(dir)
      assert(key(spark.read.orc(dir)) == key(docs))
    } finally rm(dir)
  }

  test("lang-partitioned parquet: partition pruning on the text corpus") {
    val dir = tmp("graft_ppart")
    try {
      docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
      val en = spark.read.parquet(dir).filter(col("lang") === "en")
      val plan = en.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("lang"), plan)
      assert(en.count() == docs.filter(col("lang") === "en").count())
    } finally rm(dir)
  }

  test("schema evolution: mergeSchema unions appended columns, old rows null-fill") {
    val dir = tmp("graft_evolve")
    try {
      // v1 writer: (doc_id, lang); later the pipeline gains a column
      docs.select("doc_id", "lang").limit(10)
        .write.mode("append").parquet(dir)
      docs.select(col("doc_id") + 1000000L as "doc_id", col("lang"),
          col("n_chars"))
        .limit(10).write.mode("append").parquet(dir)
      val back = spark.read.option("mergeSchema", "true").parquet(dir)
      assert(back.columns.sorted.toSeq == Seq("doc_id", "lang", "n_chars"),
        back.columns.mkString(","))
      assert(back.count() == 20)
      // v1 rows surface the evolved column as null, v2 rows keep values
      assert(back.filter(col("n_chars").isNull).count() == 10)
      assert(back.filter(col("doc_id") >= 1000000L && col("n_chars").isNull).count() == 0)
      // column pruning still reaches the scan under the merged schema
      val plan = back.select("doc_id").queryExecution.executedPlan.toString
      assert(plan.contains("ReadSchema: struct<doc_id:bigint>"), plan)
    } finally rm(dir)
  }
}
