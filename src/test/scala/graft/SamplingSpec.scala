package graft

import graft.operators.{AsOf, Sampling}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("splitLabel is deterministic, id-keyed, and roughly honors the percentage") {
    val ids = (0L until 1000L).toDF("id")
    val labeled = ids.withColumn("split", Sampling.splitLabel(col("id"), "split", 80))
    val once = labeled.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val twice = labeled.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(once == twice, "split must be stable across executions")
    val trainFrac = once.values.count(_ == "train") / 1000.0
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"got $trainFrac, expected ~0.8")
    // a different salt must give an independent assignment (not identical)
    val other = ids.withColumn("split", Sampling.splitLabel(col("id"), "other", 80))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(once != other, "salts must decorrelate splits")
  }

  test("split assignment is stable under corpus growth (no leakage on ingest)") {
    val small = (0L until 100L).toDF("id")
      .withColumn("split", Sampling.splitLabel(col("id"), "s", 80))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val grown = (0L until 200L).toDF("id")
      .withColumn("split", Sampling.splitLabel(col("id"), "s", 80))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(small.forall { case (id, sp) => grown(id) == sp },
      "adding rows must never move an existing row across the split boundary")
  }

  test("stratifiedSample keeps at most k per stratum, deterministically") {
    val df = Seq.tabulate(300)(i => (i.toLong, s"lang${i % 3}")).toDF("id", "lang")
    val s1 = Sampling.stratifiedSample(df, "lang", "id", perStratum = 10)
    val counts = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ == 10L), s"got $counts")
    val ids1 = s1.select("id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.stratifiedSample(df, "lang", "id", perStratum = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2, "sample must be deterministic")
    // under-full strata are kept whole
    val tiny = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "lang")
    assert(Sampling.stratifiedSample(tiny, "lang", "id", 10).count() == 3)
  }

  test("timeRangeJoin equals the brute-force range join, including bucket-boundary pairs") {
    import graft.operators.RangeJoin
    // seconds chosen to straddle bucket boundaries for span=10s
    val left = Seq((1L, 100L, 10L), (2L, 1L, 25L), (3L, 2L, 31L))
      .toDF("lid", "user_id", "lsec")
      .withColumn("lts", timestamp_seconds(col("lsec")))
    val right = Seq((1L, 3L), (1L, 10L), (1L, 20L), (1L, 21L), (2L, 30L), (9L, 10L))
      .toDF("user_id", "rsec")
      .withColumn("rts", timestamp_seconds(col("rsec")))
    val got = RangeJoin.timeRangeJoin(left, right, "lts", "rts",
        beforeUs = 10000000L, afterUs = 0L, keys = Seq("user_id"))
      .select("lid", "rsec").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: rsec ∈ [lsec-10, lsec]
    val l = Seq((1L, 100L, 10L), (2L, 1L, 25L), (3L, 2L, 31L))
    val r = Seq((1L, 3L), (1L, 10L), (1L, 20L), (1L, 21L), (2L, 30L), (9L, 10L))
    val expect = (for {
      (lid, lu, ls) <- l; (ru, rs) <- r
      if lu == ru && rs >= ls - 10 && rs <= ls
    } yield (lid, rs)).toSet
    assert(got == expect)
    assert(expect.contains((3L, 30L)), "fixture must exercise a cross-bucket pair")
    // no duplicate pairs from the two-bucket explode
    val all = RangeJoin.timeRangeJoin(left, right, "lts", "rts",
      10000000L, 0L, Seq("user_id")).collect()
    assert(all.length == expect.size)
  }

  test("latestWins upsert: higher version wins, update beats base on version tie") {
    import graft.operators.Upsert
    val base = Seq((1L, "a", 3L), (2L, "b", 3L), (4L, "d", 9L)).toDF("k", "val", "ver")
    val upd = Seq((2L, "B", 5L), (3L, "C", 1L), (4L, "D", 9L)).toDF("k", "val", "ver")
    val got = Upsert.latestWins(base, upd, Seq("k"), "ver")
      .select("k", "val").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "a",  // untouched base row survives
      2L -> "B",  // higher version wins
      3L -> "C",  // insert (no base row)
      4L -> "D")) // version tie → update side wins
    // schema preserved, helper columns dropped
    assert(Upsert.latestWins(base, upd, Seq("k"), "ver").columns.toSeq ==
      Seq("k", "val", "ver"))
  }

  test("property: timeRangeJoin equals brute force on seeded random events (asymmetric window)") {
    import graft.operators.RangeJoin
    val rnd = new scala.util.Random(7)
    val ls = Seq.tabulate(120)(i => (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
    val rs = Seq.tabulate(150)(j => (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
    val left = ls.toDF("lid", "user_id", "lsec").withColumn("lts", timestamp_seconds(col("lsec")))
    val right = rs.toDF("user_id", "rsec").withColumn("rts", timestamp_seconds(col("rsec")))
    // window = [ts − 15s, ts + 7s]: span 22s, asymmetric → exercises both bucket edges
    val got = RangeJoin.timeRangeJoin(left, right, "lts", "rts",
        beforeUs = 15000000L, afterUs = 7000000L, keys = Seq("user_id"))
      .select("lid", "rsec").collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = for {
      (lid, lu, lt) <- ls; (ru, rt) <- rs
      if lu == ru && rt >= lt - 15 && rt <= lt + 7
    } yield (lid, rt)
    assert(got.sorted.toSeq == expect.sorted.toSeq,
      s"got ${got.length} pairs, expected ${expect.length}")
  }

  test("asof lastMatchTs attaches the latest at-or-before match per key") {
    val ev = Seq(
      // (event_id, user, type, ts-seconds)
      (1L, 1L, "view", 10L), (2L, 1L, "click", 15L),  // click sees view@10
      (3L, 1L, "view", 20L), (4L, 1L, "click", 20L),  // tie: same-ts view counts (>= semantics)
      (5L, 2L, "click", 5L),                          // no view for user 2 → null
      (6L, 3L, "view", 30L)                           // view with no click → filtered out
    ).toDF("event_id", "user_id", "event_type", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val out = AsOf.selfAsOf(ev, "user_id", "ts",
        probePred = col("event_type") === "click",
        matchPred = col("event_type") === "view")
      .select(col("event_id"), col("asof_lag_us"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(out == Map(
      2L -> Some(5000000L), // 15s - 10s
      4L -> Some(0L),       // same-instant view
      5L -> None))          // unmatched
  }

  test("rebalanceToMin levels every stratum to the smallest one, deterministically") {
    // skewed mix: 100 a, 40 b, 15 c → uniform 15/15/15
    val df = ((0 until 100).map(i => (i.toLong, "a")) ++
      (100 until 140).map(i => (i.toLong, "b")) ++
      (140 until 155).map(i => (i.toLong, "c"))).toDF("id", "lang")
    val out = Sampling.rebalanceToMin(df, "lang", "id")
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 15L, "b" -> 15L, "c" -> 15L), s"got $counts")
    // the smallest stratum survives intact (its own rank ≤ its own size)
    val cIds = out.filter(col("lang") === "c").select("id").collect().map(_.getLong(0)).toSet
    assert(cIds == (140L until 155L).toSet)
    // deterministic under re-execution and row order
    val again = Sampling.rebalanceToMin(df.orderBy(col("id").desc), "lang", "id")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("weightedSample is deterministic, weight-biased, and heap-planned") {
    // weights 1 vs 100: the heavy ids should dominate a 50-of-200 draw
    val df = ((0L until 100L).map(i => (i, 1.0)) ++
      (100L until 200L).map(i => (i, 100.0))).toDF("id", "w")
    val out = Sampling.weightedSample(df, "id", "w", k = 50)
    val ids = out.select("id").collect().map(_.getLong(0)).toSet
    assert(ids.size == 50)
    val heavy = ids.count(_ >= 100L)
    assert(heavy >= 40, s"100x weights should dominate the draw, got $heavy/50 heavy")
    // byte-identical under re-execution and input row order
    val again = Sampling.weightedSample(df.orderBy(col("id").desc), "id", "w", k = 50)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == ids)
    // zero/negative weights carry no sampling mass
    val withZero = df.withColumn("w", when(col("id") < 100L, lit(0.0)).otherwise(col("w")))
    val onlyHeavy = Sampling.weightedSample(withZero, "id", "w", k = 150)
      .select("id").collect().map(_.getLong(0))
    assert(onlyHeavy.length == 100 && onlyHeavy.forall(_ >= 100L))
    // top-k must plan as TakeOrderedAndProject (bounded heaps), never a
    // global Sort
    val plan = Sampling.weightedSample(df, "id", "w", k = 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"unexpected plan:\n$plan")
  }

  test("temperatureSample: √-flattened kept counts, smallest group keeps all, no corpus shuffle") {
    // groups: a=1600, b=400, c=100 → α=0.5 rates 0.25, 0.5, 1.0
    val df = ((0L until 1600L).map(i => (i, "a")) ++
      (1600L until 2000L).map(i => (i, "b")) ++
      (2000L until 2100L).map(i => (i, "c"))).toDF("id", "g")
    val kept = Sampling.temperatureSample(df, "id", "g")
    val counts = kept.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected √(n_min·n_g): a→400, b→200, c→100 (c exactly — rate 1)
    assert(counts("c") == 100L, s"smallest group must keep everything: $counts")
    assert(math.abs(counts("a") - 400L) < 80, s"a should keep ~400: $counts")
    assert(math.abs(counts("b") - 200L) < 60, s"b should keep ~200: $counts")
    // deterministic under re-execution and row order
    val ids = kept.select("id").collect().map(_.getLong(0)).toSet
    val again = Sampling.temperatureSample(df.orderBy(col("id").desc), "id", "g")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == ids)
    // α=1 keeps the natural mix untouched
    assert(Sampling.temperatureSample(df, "id", "g", alpha = 1.0).count() == 2100L)
    // the corpus side must not shuffle: rates broadcast-join onto the scan
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"rates must broadcast:\n$plan")
  }

  test("incremental rollup: any merge tree of partials equals the direct aggregate") {
    import graft.operators.IncrementalAgg
    val df = Seq.tabulate(300)(i => (i.toLong, s"k${i % 4}", (i * 37 % 997) / 100.0))
      .toDF("id", "k", "v")
    val keys = Seq("k")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("k").collect().map(_.toString).toSeq
    val direct = rows(IncrementalAgg.partials(df, keys, "v"))
    val a = IncrementalAgg.partials(df.filter(col("id") % 3 === 0), keys, "v")
    val b = IncrementalAgg.partials(df.filter(col("id") % 3 === 1), keys, "v")
    val c = IncrementalAgg.partials(df.filter(col("id") % 3 === 2), keys, "v")
    // flat merge and cascaded merge must both equal the full recompute
    assert(rows(IncrementalAgg.merge(Seq(a, b, c), keys)) == direct)
    assert(rows(IncrementalAgg.merge(
      Seq(IncrementalAgg.merge(Seq(a, b), keys), c), keys)) == direct)
    // a key present only in the delta must appear in the merged rollup
    val extra = IncrementalAgg.partials(
      Seq((9999L, "k9", 1.25)).toDF("id", "k", "v"), keys, "v")
    val withNew = IncrementalAgg.merge(Seq(a, extra), keys)
    assert(withNew.filter(col("k") === "k9").count() == 1)
  }

  test("temperatureSample keep-set is stable under corpus growth") {
    // the per-row uniform is id-keyed, so adding rows only changes
    // RATES, not u — a kept id with rate r stays kept if r doesn't drop
    val df1 = ((0L until 400L).map(i => (i, "a")) ++
      (400L until 500L).map(i => (i, "c"))).toDF("id", "g")
    val kept1 = Sampling.temperatureSample(df1, "id", "g")
      .select("id").collect().map(_.getLong(0)).toSet
    // same corpus again → byte-identical
    val kept2 = Sampling.temperatureSample(df1, "id", "g")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept1 == kept2)
  }
}
