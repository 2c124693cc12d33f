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

  test("HDR buckets: exact octave/sub assignment, boundary values, bounded table") {
    val vals = Seq(1L, 2L, 3L, 15L, 16L, 17L, 31L, 32L, 1000000L,
      (1L << 40) - 1, 1L << 40)
    vals.foreach { c =>
      val e = 63 - java.lang.Long.numberOfLeadingZeros(c)
      val pow = 1L << e
      val sub = (c - pow) * 16 / pow
      val got = Sketches.hdrBuckets(Seq(c).toDF("c"), "c", 16)
        .select("hdr_exp", "hdr_pow", "hdr_sub", "hdr_bucket").head()
      assert(got.getInt(0) == e && got.getLong(1) == pow &&
        got.getLong(2) == sub && got.getLong(3) == e.toLong * 16 + sub,
        s"c=$c: got $got expected ($e, $pow, $sub)")
    }
  }

  test("HDR quantile estimate: midpoint within 1/(2k) relative error; counts merge by addition") {
    val k = 16
    // deterministic skewed values (md5-derived so no RNG)
    val vals = (1 to 4000).map { i =>
      1L + (graft.functions.Md5.long48(s"hdr:$i") % 1000000L)
    }
    val df = vals.toDF("c")
    val counts = Sketches.hdrBuckets(df, "c", k)
      .groupBy("hdr_bucket", "hdr_pow", "hdr_sub").count()
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .sortBy(_._1)
    // table is bounded: far fewer buckets than rows
    assert(counts.length <= 64 * k && counts.length < vals.length)
    // counts merge by addition: two halves re-bucketed sum to the whole
    val h1 = Sketches.hdrBuckets(vals.take(2000).toDF("c"), "c", k)
      .groupBy("hdr_bucket").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h2 = Sketches.hdrBuckets(vals.drop(2000).toDF("c"), "c", k)
      .groupBy("hdr_bucket").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    counts.foreach { case (b, (_, _, cnt)) =>
      assert(h1.getOrElse(b, 0L) + h2.getOrElse(b, 0L) == cnt,
        s"bucket $b: halves must sum to the whole")
    }
    // estimate error bound at p50/p90/p99
    val sorted = vals.sorted
    Seq(0.5, 0.9, 0.99).foreach { q =>
      val target = math.ceil(q * vals.length).toLong
      var cum = 0L
      val (pow, sub) = counts.collectFirst {
        case (_, (p, sb, cnt)) if { cum += cnt; cum >= target } => (p, sb)
      }.get
      val est = pow.toDouble * (2 * sub + 2 * k + 1) / (2.0 * k)
      val exact = sorted(target.toInt - 1).toDouble
      assert(math.abs(est - exact) / exact <= 1.0 / (2 * k) + 1e-9,
        s"q=$q est=$est exact=$exact")
    }
  }
}
