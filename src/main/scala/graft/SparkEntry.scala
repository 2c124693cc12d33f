package graft

import graft.queries.Queries
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The real inventory lives in [[graft.queries.Queries]]; this object is
  * the thin, stable facade the driver harness calls.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the reference's end-to-end shape (SURVEY §3.1): exact cosine
    * top-k over the embeddings corpus + match-score derivation.
    */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.prepare(spark)
    Queries.queriesMap("knn_match_score")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.queriesMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Queries.oracleMap
}
