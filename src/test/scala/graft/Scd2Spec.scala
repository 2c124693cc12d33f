package graft

import graft.operators.Scd2
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, String, Long)*) =
    rows.toDF("id", "status", "amount")

  test("build folds snapshots into validity intervals with change detection") {
    val v1 = snap((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L))
    val v2 = snap((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L))
    val v3 = snap((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 99L))
    val hist = Scd2.build(Seq(1 -> v1, 2 -> v2, 3 -> v3),
      Seq("id"), Seq("status", "amount"))
      .select("id", "version_from", "version_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        Option(r.get(2)).map(_.asInstanceOf[Int]), r.getBoolean(3))).toSet
    assert(hist == Set(
      (1L, 1, None, true),
      (2L, 1, Some(1), false), (2L, 2, None, true),
      (3L, 1, Some(2), false), (3L, 3, None, true)))
  }

  test("tracked values come from the interval-opening snapshot") {
    val v1 = snap((7L, "new", 1L))
    val v2 = snap((7L, "active", 2L))
    val hist = Scd2.build(Seq(1 -> v1, 2 -> v2), Seq("id"), Seq("status", "amount"))
    val cur = hist.filter(col("is_current")).select("status", "amount")
      .as[(String, Long)].collect()
    assert(cur.toSeq == Seq(("active", 2L)))
    val old = hist.filter(!col("is_current")).select("status", "amount")
      .as[(String, Long)].collect()
    assert(old.toSeq == Seq(("new", 1L)))
  }

  test("null-safe change detection: null -> value and value -> null open intervals") {
    val v1 = Seq((1L, Option.empty[String]), (2L, Option("x"))).toDF("id", "status")
    val v2 = Seq((1L, Option("y")), (2L, Option.empty[String])).toDF("id", "status")
    val hist = Scd2.build(Seq(1 -> v1, 2 -> v2), Seq("id"), Seq("status"))
    assert(hist.count() == 4, "both transitions must open a new interval")
  }

  test("a key absent from later snapshots keeps an open interval") {
    val v1 = snap((1L, "a", 1L), (2L, "a", 2L))
    val v2 = snap((1L, "a", 1L)) // key 2 disappeared (no tombstone)
    val hist = Scd2.build(Seq(1 -> v1, 2 -> v2), Seq("id"), Seq("status", "amount"))
    val k2 = hist.filter(col("id") === 2).select("version_from", "is_current")
      .as[(Int, Boolean)].collect()
    assert(k2.toSeq == Seq((1, true)))
  }

  test("history build plans exactly one exchange (shared key partitioning)") {
    val v1 = snap((1L, "a", 1L), (2L, "a", 2L))
    val v2 = snap((1L, "b", 1L), (2L, "a", 2L))
    val hist = Scd2.build(Seq(1 -> v1, 2 -> v2), Seq("id"), Seq("status", "amount"))
    // AQE wraps the plan; collect() doesn't descend through the wrapper
    val exec = hist.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val exchanges = exec.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size == 1,
      s"lag change-detect and lead interval-close must share one shuffle, got ${exchanges.size}:\n$exec")
  }
}
