package graft

import graft.operators.Expectations
import org.apache.spark.sql.functions._

/** Expectations rule-engine tests: violation counting incl. NULL
  * semantics, the one-pass plan contract for row-local suites, and
  * referential-check correctness on engineered violations.
  */
class ExpectationsSpec extends SparkSpec {

  import spark.implicits._

  test("row-local rules: violations counted, NULL predicate = violation") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (-3L, "a"), (null, "c"))
      .toDF("v", "cat")
    val out = Expectations.check(df, Seq(
        "positive" -> (col("v") > 0),
        "known_cat" -> col("cat").isin("a", "b")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // v > 0 is NULL for the null row → violation (a rule that cannot
    // evaluate has not passed); -3 fails outright
    assert(out("positive") == ((2L, 4L)))
    assert(out("known_cat") == ((1L, 4L)))
  }

  test("row-local suite is ONE aggregate pass (single scan, no join)") {
    val df = Tables.orders(spark, sf("sf0.001"))
    val plan = Expectations.check(df, Seq(
        "r1" -> (col("o_totalprice") > 0),
        "r2" -> col("o_orderpriority").isNotNull,
        "r3" -> (col("o_orderkey") > 0)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"row-local rules must not join:\n$plan")
    assert(plan.linesIterator.count(_.contains("Scan parquet")) == 1,
      s"row-local rules must scan once:\n$plan")
  }

  test("refCheck: engineered orphans are counted; clean FK passes") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(1L, 1L, 2L, 9L, 9L).toDF("fk")
    val bad = Expectations.refCheck("fk_ok", child, "fk", parent, "pk")
      .collect()(0)
    assert(bad.getString(0) == "fk_ok")
    assert(bad.getLong(1) == 2L && bad.getLong(2) == 5L)
    val clean = Expectations.refCheck("fk_ok",
        child.filter(col("fk") < 9), "fk", parent, "pk")
      .collect()(0)
    assert(clean.getLong(1) == 0L && clean.getLong(2) == 3L)
  }

  test("null child FK is a violation") {
    val parent = Seq(1L).toDF("pk")
    val child = Seq[java.lang.Long](1L, null).toDF("fk")
    val r = Expectations.refCheck("fk", child, "fk", parent, "pk").collect()(0)
    assert(r.getLong(1) == 1L && r.getLong(2) == 2L)
  }
}
