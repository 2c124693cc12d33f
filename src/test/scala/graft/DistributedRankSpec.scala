package graft

import graft.operators.DistributedRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DistributedRank ≡ the single-partition row_number window, without
  * being one: parity, partition-count independence, pass-through of
  * input columns, and the plan not collapsing to one partition.
  */
class DistributedRankSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (1 to 997).map(i => ((i * 7919) % 1000, i.toLong))
    .toDF("v", "id")

  private def windowRanks: Map[Long, Long] =
    df.withColumn("rank", row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank")).toMap

  test("ranks equal the global row_number window") {
    val got = DistributedRank.byKey(df, Seq(col("v"), col("id")), numPartitions = 8)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank")).toMap
    assert(got == windowRanks)
  }

  test("ranks are independent of partition count and input partitioning") {
    val a = DistributedRank.byKey(df.repartition(13), Seq(col("v"), col("id")), 3)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank")).toMap
    val b = DistributedRank.byKey(df.coalesce(1), Seq(col("v"), col("id")), 17)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank")).toMap
    assert(a == b && a == windowRanks)
  }

  test("every rank 1..n appears exactly once and columns pass through") {
    val out = DistributedRank.byKey(df, Seq(col("v"), col("id")), 8)
    assert(out.columns.toSeq == Seq("v", "id", "rank"))
    val ranks = out.select("rank").as[Long].collect().sorted
    assert(ranks.toSeq == (1L to 997L))
  }

  test("the ranked plan has more than one partition (no global-window collapse)") {
    val out = DistributedRank.byKey(df, Seq(col("v"), col("id")), 8)
    assert(out.rdd.getNumPartitions > 1)
  }
}
