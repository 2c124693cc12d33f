package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Deterministic HLL / Count-Min sketches: estimator quality on known
  * cardinalities, the structural guarantees the hash gate relies on
  * (CMS never underestimates; registers are merge-stable), and
  * partitioning-independence of the results.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("HLL estimate lands within 3σ of a known cardinality") {
    // 5000 distinct keys, one group; σ/n ≈ 1.04/√512 ≈ 4.6%
    val df = (1 to 5000).map(i => ("g", i.toLong)).toDF("grp", "k")
    val est = Sketches.hllEstimate(
      Sketches.hllRegisters(df, "grp", col("k")), "grp")
      .head().getDouble(1)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.14, s"estimate $est")
  }

  test("HLL registers are duplicate-insensitive and partition-independent") {
    val base = (1 to 800).map(i => ("g", i.toLong)).toDF("grp", "k")
    val dup = base.union(base).union(base).repartition(7)
    val a = Sketches.hllRegisters(base, "grp", col("k"))
      .orderBy("bucket").collect().toSeq
    val b = Sketches.hllRegisters(dup, "grp", col("k"))
      .orderBy("bucket").collect().toSeq
    assert(a == b)
  }

  test("HLL per-group estimates are independent across groups") {
    // both groups sit above the raw estimator's working range (n ≳ 2.5m
    // = 1280): below it the uncorrected estimator floors at α·m ≈ 369
    // (no linear-counting correction — needs libm ln; see hllEstimate doc)
    val df = ((1 to 20000).map(i => ("a", i.toLong)) ++
      (1 to 3000).map(i => ("b", i.toLong))).toDF("grp", "k")
    val est = Sketches.hllEstimate(Sketches.hllRegisters(df, "grp", col("k")), "grp")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(est("a") - 20000.0) / 20000.0 < 0.2, s"a=${est("a")}")
    assert(math.abs(est("b") - 3000.0) / 3000.0 < 0.25, s"b=${est("b")}")
    assert(est("a") > est("b") * 3)
  }

  test("CMS never underestimates and is exact in a collision-free regime") {
    // 40 distinct items in a 4×256 sketch: collisions possible but rare;
    // the ≥ guarantee must hold for every item regardless
    val items = (1 to 40).flatMap(i => Seq.fill(i)(s"item_$i")).toDF("t")
    val counters = Sketches.cmsCounters(items, col("t"), depth = 4, width = 256)
    val exact = items.groupBy("t").agg(count(lit(1)).as("n_exact"))
    val est = Sketches.cmsLookup(exact, col("t"), counters, depth = 4, width = 256)
    val rows = est.collect()
    assert(rows.length == 40)
    rows.foreach { r =>
      val (n, e) = (r.getAs[Long]("n_exact"), r.getAs[Long]("cms_estimate"))
      assert(e >= n, s"${r.getString(0)}: cms $e < exact $n")
    }
    // with 40 items over 4 rows of 256 buckets, at least one item should
    // be measured exactly (all-rows collision-free)
    assert(rows.exists(r => r.getAs[Long]("cms_estimate") == r.getAs[Long]("n_exact")))
  }

  test("CMS counters bound: at most depth × width rows, counts sum to depth × N") {
    val items = (1 to 500).map(i => s"w${i % 37}").toDF("t")
    val counters = Sketches.cmsCounters(items, col("t"), depth = 4, width = 16)
    assert(counters.count() <= 4 * 16)
    val total = counters.agg(sum("cnt")).head().getLong(0)
    assert(total == 4L * 500)
  }

  test("KMV is exact below k and duplicate-insensitive") {
    val small = (1 to 100).flatMap(i => Seq.fill(3)(i.toLong)).toDF("k")
    val sk = Sketches.kmv(small, col("k"), k = 256)
    // 100 distinct < k: the sketch holds every distinct hash
    assert(sk.count() == 100L)
    val noDup = Sketches.kmv((1 to 100).map(_.toLong).toDF("k"), col("k"), 256)
    assert(sk.orderBy("h").collect().toSeq == noDup.orderBy("h").collect().toSeq)
  }

  test("KMV union sketch is mergeable: bottom-k of concatenated sketches") {
    val a = (1 to 3000).map(_.toLong).toDF("k")
    val b = (2000 to 5000).map(_.toLong).toDF("k")
    val ka = Sketches.kmv(a, col("k"), 256)
    val kb = Sketches.kmv(b, col("k"), 256)
    val merged = ka.union(kb).distinct().orderBy("h").limit(256)
      .collect().map(_.getLong(0)).toSeq
    val direct = Sketches.kmv(a.union(b), col("k"), 256)
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(merged.sorted == direct)
  }

  test("KMV cardinality estimate lands within 3σ of a known cardinality") {
    // (k−1)·2^48/θ with k=256: σ ≈ 1/√(k−2) ≈ 6.3%
    val df = (1 to 20000).map(_.toLong).toDF("k")
    val sk = Sketches.kmv(df, col("k"), 256)
    val theta = sk.agg(max("h")).head().getLong(0)
    val est = 255.0 * 281474976710656.0 / theta.toDouble
    assert(math.abs(est - 20000.0) / 20000.0 < 0.19, s"estimate $est")
  }
}
