package graft

import graft.operators.Merge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "status", "amount")

  test("matched rows update only the updateCols; unmatched target rows pass through") {
    val source = Seq((2L, "B", 99.0, false)).toDF("id", "status", "amount", "del")
    val out = Merge(target, source, Seq("id"), updateCols = Seq("status"),
      deleteCondition = Some(col("del")))
      .orderBy("id").as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq((1L, "a", 10.0), (2L, "B", 20.0), (3L, "c", 30.0)),
      "status updates from source, amount (not an updateCol) keeps the target value")
  }

  test("when-matched-and-condition deletes; unmatched source inserts with all columns") {
    val source = Seq(
      (3L, "x", 0.0, true),       // delete
      (9L, "n", 90.0, false))     // insert
      .toDF("id", "status", "amount", "del")
    val out = Merge(target, source, Seq("id"), updateCols = Seq("status", "amount"),
      deleteCondition = Some(col("del")))
      .orderBy("id").as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq((1L, "a", 10.0), (2L, "b", 20.0), (9L, "n", 90.0)))
  }

  test("insertWhenNotMatched=false drops unmatched source rows") {
    val source = Seq((9L, "n", 90.0)).toDF("id", "status", "amount")
    val out = Merge(target, source, Seq("id"), updateCols = Seq("status"),
      insertWhenNotMatched = false)
    assert(out.count() == 3)
  }

  test("merge is a shuffle join on the key, never a data-sized broadcast") {
    val n = 10000L
    val bigTarget = spark.range(n).select(col("id"),
      lit("s").as("status"), col("id").cast("double").as("amount"))
    val bigSource = spark.range(n / 2).select(col("id"),
      lit("t").as("status"), lit(0.0).as("amount"))
    val out = Merge(bigTarget, bigSource, Seq("id"), updateCols = Seq("status"))
    val exec = out.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val bnl = exec.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bnl.isEmpty, s"MERGE must not plan a nested-loop join:\n$exec")
    assert(out.count() == n)
    assert(out.filter(col("status") === "t").count() == n / 2)
  }

  test("maint_mor_merge: the read-path logical table equals the copy-on-write result") {
    import org.apache.spark.sql.types.DecimalType
    // the registered query's aggregate is hash-gated; here the ROW-LEVEL
    // logical table is checked against the direct (copy-on-write) form
    val dir = sf("sf0.001")
    val dec = DecimalType(12, 2)
    val direct = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 10 =!= 7)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 10 === 3,
          col("o_totalprice").cast(dec) + lit(1).cast(dec))
          .otherwise(col("o_totalprice").cast(dec)).as("o_totalprice"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    val out = graft.queries.Queries.queriesMap("maint_mor_merge")(spark, dir).collect()
    assert(out.map(_.getLong(1)).sum == direct.size) // n_rows conserves
    // deleted keys really are gone and an updated key carries the bump:
    // recompute one group's fingerprint driver-side from the direct map
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def h48(s: String): BigInt = BigInt(
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12), 16)
    val expectFp = direct.toSeq.groupBy { case (k, _) => base(k)._1 }
      .view.mapValues(_.map { case (k, price) =>
        h48(s"$k|${base(k)._1}|${base(k)._2}|${price.toPlainString}")
      }.sum.toString()).toMap
    out.foreach { r =>
      assert(r.getString(3) == expectFp(r.getString(0)),
        s"fingerprint mismatch for status ${r.getString(0)}")
    }
  }
}
