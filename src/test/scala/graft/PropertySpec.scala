package graft

import graft.functions.{CentroidBuffer, CentroidAggregator, HashingEmbedder}
import graft.operators.Ann
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties over the driver-side (pure-JVM) components —
  * the parts of the engine that run outside Spark jobs: the offline
  * embedder contract, LSH probe-set combinatorics, IVF probe selection,
  * and the centroid aggregator algebra (SURVEY §5.3).
  */
class PropertySpec extends AnyFunSuite {

  private def check(label: String, prop: Prop, n: Int = 50): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$label: ${res.status}")
  }

  private val textGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.const(" "), Gen.asciiPrintableStr))
      .map(_.mkString(" "))

  test("embedder: every text maps to a unit vector of the declared dim, deterministically") {
    val e = HashingEmbedder(dim = 32, seed = 11)
    check("embedder", Prop.forAll(textGen) { t =>
      val v = e.encode(t)
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      v.length == 32 && math.abs(norm - 1.0) < 1e-4 && v.toSeq == e.encode(t).toSeq
    })
  }

  test("portable embedder: unit vector of declared dim, deterministic, tokenization-stable") {
    val e = graft.functions.Md5PortableEmbedder(dim = 48)
    check("md5 embedder", Prop.forAll(textGen) { t =>
      val v = e.encode(t)
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      v.length == 48 && math.abs(norm - 1.0) < 1e-4 && v.toSeq == e.encode(t).toSeq &&
        // tokenization invariance: separators/case cannot change the vector
        v.toSeq == e.encode(t.toUpperCase.replace(' ', '\t')).toSeq
    })
  }

  test("portable embedder matches the DuckDB-mirror formula token by token") {
    // the SQL oracle's construction recomputed in plain JVM code —
    // a divergence here would silently break every embed oracle row
    val e = graft.functions.Md5PortableEmbedder(dim = 16)
    val tokGen = Gen.nonEmptyListOf(Gen.alphaLowerStr.suchThat(_.nonEmpty)).map(_.mkString(" "))
    check("mirror", Prop.forAll(tokGen) { text =>
      val acc = new Array[Double](16)
      text.split(" ").filter(_.nonEmpty).foreach { t =>
        val hex = graft.functions.Md5.hex(t)
        val bucket = (java.lang.Long.parseLong(hex.take(12), 16) % 16).toInt
        acc(bucket) += (if (Character.digit(hex.charAt(12), 16) < 8) 1.0 else -1.0)
      }
      val norm = math.sqrt(acc.map(x => x * x).sum)
      val expect =
        if (norm == 0.0) { val z = new Array[Float](16); z(0) = 1.0f; z.toSeq }
        else acc.map(x => (x / norm).toFloat).toSeq
      e.encode(text).toSeq == expect
    })
  }

  test("lsh probe sets: size = Σ C(nBits, r), all within radius, contains the origin") {
    val gen = for {
      nBits <- Gen.choose(2, 12)
      radius <- Gen.choose(0, 3)
      bucket <- Gen.choose(0L, (1L << nBits) - 1)
    } yield (nBits, radius, bucket)
    def choose(n: Int, k: Int): Long =
      if (k == 0) 1L else choose(n, k - 1) * (n - k + 1) / k
    check("probeBuckets", Prop.forAll(gen) { case (nBits, radius, bucket) =>
      val probes = Ann.probeBuckets(bucket, nBits, radius)
      val expectSize = (0 to radius).map(r => choose(nBits, r)).sum
      probes.contains(bucket) &&
        probes.distinct.length == probes.length &&
        probes.length == expectSize &&
        probes.forall(p => java.lang.Long.bitCount(p ^ bucket) <= radius)
    })
  }

  test("ivf probes: exactly nprobe distinct centroid ids, closest-first") {
    val vecGen = Gen.listOfN(8, Gen.choose(-5.0f, 5.0f)).map(_.toArray)
    val gen = for {
      q <- vecGen
      cents <- Gen.listOfN(6, vecGen).map(_.toArray)
      nprobe <- Gen.choose(1, 6)
    } yield (q, cents, nprobe)
    def l2(a: Array[Float], b: Array[Float]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum)
    check("probeIds", Prop.forAll(gen) { case (q, cents, nprobe) =>
      val probes = Ann.probeIds(q, cents, nprobe)
      val dists = probes.map(i => l2(q, cents(i)))
      val all = cents.indices.map(i => l2(q, cents(i))).sorted
      probes.length == nprobe &&
        probes.distinct.length == nprobe &&
        dists == dists.sorted &&
        math.abs(dists.last - all(nprobe - 1)) < 1e-12
    })
  }

  test("centroid aggregator: reduce-then-merge equals the direct mean, any split") {
    val dim = 4
    val vecGen = Gen.listOfN(dim, Gen.choose(-10.0f, 10.0f)).map(_.toSeq)
    val gen = for {
      vs <- Gen.nonEmptyListOf(vecGen)
      split <- Gen.choose(0, vs.length)
    } yield (vs, split)
    check("centroid", Prop.forAll(gen) { case (vs, split) =>
      val agg = new CentroidAggregator(dim)
      val (l, r) = vs.splitAt(split)
      val bufL = l.foldLeft(agg.zero)(agg.reduce)
      val bufR = r.foldLeft(CentroidBuffer(new Array[Double](dim), 0L))(agg.reduce)
      val got = agg.finish(agg.merge(bufL, bufR))
      val expect = (0 until dim).map(i => (vs.map(_(i).toDouble).sum / vs.length).toFloat)
      got.lazyZip(expect).forall((a, b) => math.abs(a - b) < 1e-4)
    })
  }

  test("duplicate-window interval union: sorted-lag sum equals brute-force coverage") {
    // the arithmetic core of Dedup.duplicateWindowSpans: for sorted
    // duplicated start positions, Σ (first → w, else min(gap, w))
    // must equal |∪ [p, p+w)| exactly — overlapping, touching, and
    // disjoint spans alike
    val gen = for {
      w <- Gen.choose(1, 12)
      ps <- Gen.listOf(Gen.choose(0, 200)).map(_.distinct.sorted)
    } yield (w, ps)
    check("intervalUnion", Prop.forAll(gen) { case (w, ps) =>
      val lagSum = ps.headOption.map(_ => w).getOrElse(0) +
        ps.lazyZip(ps.drop(1)).map((prev, p) => math.min(p - prev, w)).sum
      val brute = ps.flatMap(p => p until p + w).distinct.size
      lagSum == brute
    }, n = 200)
  }
}
