package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing (the 100 TB layout for the
  * fact-to-fact `orders ⋈ lineitem` join): both tables bucketed on the
  * join key → the join plans with ZERO exchanges. This is the storage
  * decision that removes the dominant shuffle at scale.
  */
class BucketingSpec extends SparkSpec {

  test("orders ⋈ lineitem bucketed on the order key joins without a shuffle") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    // force the sort-merge path: at these fixture sizes the optimizer
    // would broadcast, which hides the bucketed-layout property under test
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    try {
      Tables.orders(spark, sf("sf0.001"))
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/orders_b").saveAsTable("orders_b")
      Tables.lineitem(spark, sf("sf0.001"))
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")

      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))

      val plan = joined.queryExecution.executedPlan.toString
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected sort-merge join over bucketed tables:\n$plan")
      // no Exchange below the join: bucketed layout provides the
      // partitioning (the only allowed exchange is the post-join
      // aggregation shuffle, which appears ABOVE the join in the plan
      // string)
      val belowJoin = plan.substring(joinIdx)
      assert(!belowJoin.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // correctness against the plain (shuffling) join
      val expect = Tables.lineitem(spark, sf("sf0.001"))
        .join(Tables.orders(spark, sf("sf0.001")), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      import scala.reflect.io.Directory
      new Directory(new java.io.File(wh)).deleteRecursively()
    }
  }
}
