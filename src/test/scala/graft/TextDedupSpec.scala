package graft

import graft.operators.{Dedup, TextAnalysis}
import graft.operators.TextAnalysis._
import org.apache.spark.sql.functions._

/** Operator tests for the text-analysis and dedup surface. */
class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String) =
    Seq(Tuple1(text)).toDF("text").select(c).collect()(0)

  test("normalize collapses whitespace and lowercases") {
    assert(one(normalize(col("text")), "  Hello\t\tWORLD  x ").getString(0) == "hello world x")
  }

  test("tokens drop empties; counts; avg length") {
    val r = Seq(Tuple1("a bb, ccc!")).toDF("text")
      .select(tokens(col("text")).as("t"), tokenCount(col("text")).as("n"),
        avgTokenLen(col("text")).as("l")).collect()(0)
    assert(r.getSeq[String](0) == Seq("a", "bb", "ccc"))
    assert(r.getLong(1) == 3L && math.abs(r.getDouble(2) - 2.0) < 1e-12)
  }

  test("punct count and quality score bounds") {
    assert(one(punctCount(col("text")), "a,b.c!").getLong(0) == 3L)
    val scores = Seq(
      "the quick brown fox is a fine animal and it jumps over the lazy dog",
      "zzz", "").map(t => one(qualityScore(col("text")), t).getDouble(0))
    scores.foreach(s => assert(s >= 0.0 && s <= 1.0))
    assert(scores(0) > scores(1))
    assert(scores(2) == 0.0)
  }

  test("langId picks the stopword-dominant language; und on no hits") {
    assert(one(langId(col("text")), "der hund und die katze ist da").getString(0) == "de")
    assert(one(langId(col("text")), "the cat and the dog is a pet").getString(0) == "en")
    assert(one(langId(col("text")), "xyzzy qwerty").getString(0) == "und")
  }

  test("fingerprint is whitespace/case-insensitive but content-sensitive") {
    val f1 = one(fingerprint(col("text")), "Hello   World").getString(0)
    val f2 = one(fingerprint(col("text")), "hello world").getString(0)
    val f3 = one(fingerprint(col("text")), "hello worlds").getString(0)
    assert(f1 == f2 && f1 != f3)
  }

  test("shingles: sliding k-grams, distinct; short text → single shingle") {
    assert(one(shingles(col("text"), 3), "a b c d").getSeq[String](0).toSet ==
      Set("a b c", "b c d"))
    assert(one(shingles(col("text"), 3), "a b").getSeq[String](0) == Seq("a b"))
    assert(one(shingles(col("text"), 2), "x y x y").getSeq[String](0).toSet ==
      Set("x y", "y x"))
  }

  test("simhash48 HOF implementation equals the explicit explode computation") {
    val docs = Tables.documents(spark, sf("sf0.001")).limit(50)
    val hof = docs.select(col("doc_id"), simhash48(col("text")).as("s"))
    val votes = docs
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("t"))
      .select(col("doc_id"), TextAnalysis.md5Long48(col("t")).as("h"))
      .crossJoin(spark.range(48).select(col("id").cast("int").as("b")))
      .groupBy("doc_id", "b")
      .agg(sum(when(expr("shiftright(h, b) & 1") === 1, 1L).otherwise(-1L)).as("vote"))
      .groupBy("doc_id")
      .agg(sum(when(col("vote") > 0, expr("shiftleft(1L, b)")).otherwise(0L)).as("s"))
    val a = hof.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = votes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("hamming distance on packed signatures") {
    val r = Seq((5L, 6L)).toDF("a", "b")
      .select(hammingDistance(col("a"), col("b"))).collect()(0)
    assert(r.getLong(0) == 2L) // 101 vs 110
  }

  private val dupDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "The  quick BROWN fox jumps over the lazy dog"), // exact dup after normalize
    (3L, "the quick brown fox jumps over the lazy cat"),  // near dup
    (4L, "completely different content about spark engines and parquet files"),
    (5L, "completely different content about spark engines and parquet files today"))
    .toDF("doc_id", "text")

  test("exact dedup groups normalize-equal texts; drop ids keep the min id") {
    val groups = Dedup.exactGroups(dupDocs, "text", "doc_id").collect()
    assert(groups.map(_.getAs[Long]("group_size")).sorted.toSeq == Seq(1L, 1L, 1L, 2L))
    val drops = Dedup.exactDropIds(dupDocs, "text", "doc_id").collect().map(_.getLong(0)).toSet
    assert(drops == Set(2L))
  }

  test("ngram jaccard finds near-dup pairs with correct similarity") {
    val pairs = Dedup.ngramJaccardPairs(dupDocs, "text", "doc_id", shingleK = 3, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((1L, 2L)) == 1.0) // identical after normalize
    assert(m.contains((1L, 3L)) && m((1L, 3L)) > 0.5 && m((1L, 3L)) < 1.0)
    assert(m.contains((4L, 5L)))
    assert(!m.contains((1L, 4L)))
  }

  test("ngram containment catches the asymmetric inclusion Jaccard misses") {
    // doc 7 is doc 6 quoted whole inside a much longer page: containment
    // (6 in 7) must read ~1.0 while Jaccard stays low — the wrapper-page
    // relation this operator exists for
    val docs = dupDocs.union(Seq(
      (6L, "the quick brown fox jumps over the lazy dog"),
      (7L, "header boilerplate navigation menu item " +
        "the quick brown fox jumps over the lazy dog " +
        "footer copyright legal terms privacy contact about careers")).
      toDF("doc_id", "text"))
    val pairs = Dedup.ngramContainmentPairs(docs, "text", "doc_id",
      shingleK = 3, threshold = 0.5, maxShingleDf = None)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(5), r.getDouble(6), r.getDouble(7)))
      .toMap
    val (aInB, bInA, mx) = pairs((6L, 7L))
    assert(aInB == 1.0, s"doc 6 is fully contained in 7: $aInB")
    assert(bInA < 0.5, s"doc 7 is NOT contained in 6: $bInA")
    assert(mx == 1.0)
    // and the corresponding Jaccard is far below the containment —
    // the exact asymmetry claim
    val j = Dedup.ngramJaccardPairs(docs, "text", "doc_id", shingleK = 3,
      threshold = 0.0, maxShingleDf = None)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((6L, 7L)) < 0.5 && j((6L, 7L)) > 0.0)
    // directional values replay: common/na and common/nb exactly
    val (c67, na, nb) = {
      val row = Dedup.ngramContainmentPairs(docs, "text", "doc_id",
        shingleK = 3, threshold = 0.0, maxShingleDf = None)
        .filter(col("id_a") === 6 && col("id_b") === 7).collect().head
      (row.getLong(2), row.getLong(3), row.getLong(4))
    }
    assert(aInB == BigDecimal(c67.toDouble / na.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(bInA == BigDecimal(c67.toDouble / nb.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("minhash LSH candidates include true near-dups (recall on this corpus)") {
    val cands = Dedup.minhashCandidatePairs(dupDocs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L))) // identical signatures always collide
    val verified = Dedup.jaccardOnPairs(dupDocs,
      Dedup.minhashCandidatePairs(dupDocs, "text", "doc_id"), "text", "doc_id", 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(verified((1L, 2L)) == 1.0)
  }

  test("simhash pairs: normalize-equal docs at hamming 0") {
    val pairs = Dedup.simhashPairs(dupDocs, "text", "doc_id", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.contains((1L, 2L, 0L)))
  }

  test("simhash hot-band cap drops mega-bucket pairs, keeps small-bucket pairs") {
    // 40 identical docs = one mega duplicate cluster (every band bucket
    // has 40 members); docs 100/101 are an isolated identical pair
    val mega = (1L to 40L).map(i => (i, "the quick brown fox jumps over the lazy dog again and again"))
    val small = Seq((100L, "completely different text about spark physical plans"),
      (101L, "completely different text about spark physical plans"))
    val docs = (mega ++ small).toDF("doc_id", "text")
    val capped = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 0,
        maxBandSize = Some(10))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((100L, 101L)),
      s"cap must drop the mega cluster's pairs and keep the small pair: $capped")
    // explicitly uncapped finds all 40·39/2 mega pairs plus the small pair
    val full = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 0,
      maxBandSize = None)
    assert(full.count() == 40L * 39 / 2 + 1)
  }

  test("simhash hot-band cap is ON by default and bounds per-band work") {
    // A mega-duplicate cluster one past the default cap: every band
    // bucket holds DefaultMaxBandSize+1 members, so the DEFAULT path
    // must drop all of them (bounded Σ|bucket|² per band value) while
    // keeping the isolated small pair. Uncapped this would be ~5·10⁷
    // pairs; capped it is exactly one.
    val n = Dedup.DefaultMaxBandSize + 1
    val mega = (1L to n.toLong).map(i => (i, "identical mega cluster body text"))
    val small = Seq((2000000L, "an unrelated isolated duplicate pair"),
      (2000001L, "an unrelated isolated duplicate pair"))
    val docs = (mega ++ small).toDF("doc_id", "text")
    val defaulted = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(defaulted == Set((2000000L, 2000001L)),
      s"default cap must drop the mega cluster, keep the small pair: ${defaulted.take(5)}")
    // below the cap the default path is bit-identical to uncapped
    // (the fixture-safety property the constant is chosen for)
    assert(Dedup.simhashPairs(dupDocs, "text", "doc_id", maxHamming = 0).collect().toSet ==
      Dedup.simhashPairs(dupDocs, "text", "doc_id", maxHamming = 0, maxBandSize = None).collect().toSet)
  }

  test("null text propagates null through the text operators (defined contract)") {
    val df = Seq(Tuple1(Option.empty[String])).toDF("text")
      .select(normalize(col("text")).as("norm"), tokens(col("text")).as("toks"),
        tokenCount(col("text")).as("n"), fingerprint(col("text")).as("fp"),
        qualityScore(col("text")).as("q"))
    val r = df.collect()(0)
    (0 until r.length).foreach(i => assert(r.isNullAt(i), s"field $i not null: $r"))
  }

  test("approx_count_distinct tracks the exact distinct count (SURVEY §2.5)") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val r = docs.agg(
      countDistinct(col("source")).as("exact"),
      approx_count_distinct(col("source"), 0.02).as("approx")).collect()(0)
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx=$approx vs exact=$exact")
  }

  test("approx_percentile tracks exact percentiles within the rank-error bound (SURVEY §2.5)") {
    // the t-digest/GK sketch is the scale path for quantiles (exact
    // percentile materializes the whole column per group); accuracy N
    // bounds rank error by n/N — assert the VALUE lands within the
    // exact p±0.01 quantile envelope
    val ev = Tables.events(spark, sf("sf0.001"))
    Seq(0.5, 0.9, 0.99).foreach { p =>
      val r = ev.agg(
        expr(s"percentile(value, ${p - 0.01})").as("lo"),
        expr(s"percentile(value, ${math.min(p + 0.01, 1.0)})").as("hi"),
        expr(s"approx_percentile(value, $p, 1000)").as("approx")).collect()(0)
      val (lo, hi, approx) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(approx >= lo && approx <= hi,
        s"p=$p: approx=$approx outside exact envelope [$lo, $hi]")
    }
  }

  test("duplicateClusters: transitive chains merge, disjoint pairs stay separate") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val clusters = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("duplicateClusters: pointer doubling converges in O(log diameter) rounds on a chain") {
    val n = 64 // worst case for plain propagation: diameter 63
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // localThreshold = 0 forces the distributed loop — the property
    // under test here; the adaptive local path is covered separately
    val (clusters, rounds) =
      Dedup.duplicateClustersWithRounds(pairs, maxIter = 20, localThreshold = 0L)
    val rows = clusters.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.length == n)
    assert(rows.forall(_._2 == 1L), "every chain node must land in cluster 1")
    // log₂(64) = 6; +3 covers the hop offset and the final no-change round.
    // Plain one-hop propagation would need 63 rounds here.
    val bound = (math.log(n.toDouble) / math.log(2.0)).ceil.toInt + 3
    assert(rounds <= bound, s"took $rounds rounds, bound $bound")
  }

  test("duplicateClusters adaptive local fallback equals the distributed loop (rounds = 0)") {
    // irregular component structure: chain + triangle + isolated pair
    val pairs = (Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)) ++
      Seq((20L, 21L), (21L, 22L), (20L, 22L)) ++ Seq((30L, 31L)))
      .toDF("id_a", "id_b")
    val (local, localRounds) = Dedup.duplicateClustersWithRounds(pairs)
    val (dist, distRounds) =
      Dedup.duplicateClustersWithRounds(pairs, localThreshold = 0L)
    assert(localRounds == 0, "small graphs must take the driver union-find")
    assert(distRounds > 0, "threshold 0 must force the distributed loop")
    assert(local.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      dist.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq,
      "both paths must produce identical min-label clusterings")
  }

  test("duplicateClusters reliable mode: identical results, checkpoint-dir blocks, truncated lineage") {
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty)
    // without a checkpoint dir, reliable mode must fail fast — NOT
    // surface as a mid-job Spark error after shuffles already ran
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException] {
      Dedup.duplicateClusters(pairs, reliable = true, localThreshold = 0L)
    }
    assert(e.getMessage.contains("setCheckpointDir"))

    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    sc.setCheckpointDir(ckpt)
    try {
      val (rel, relRounds) =
        Dedup.duplicateClustersWithRounds(pairs, reliable = true, localThreshold = 0L)
      val (loc, locRounds) =
        Dedup.duplicateClustersWithRounds(pairs, reliable = false, localThreshold = 0L)
      assert(rel.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
        loc.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
      assert(relRounds == locRounds)
      // the per-round materialization really landed on the reliable dir
      def fileCount(p: java.io.File): Int =
        if (p.isDirectory) p.listFiles.map(fileCount).sum else 1
      assert(fileCount(new java.io.File(ckpt)) > 0,
        s"expected reliable checkpoint blocks under $ckpt")
      // lineage is truncated: the returned frame reads checkpointed
      // blocks (an RDD scan), not the 2×-per-round join tree
      val leaves = rel.queryExecution.optimizedPlan.collectLeaves()
      assert(leaves.forall(_.getClass.getSimpleName.contains("LogicalRDD")),
        s"expected checkpoint-scan leaves, got ${leaves.map(_.getClass.getSimpleName)}")

      // incremental dedup honors the same switch
      val docs = Seq(
        (1L, "alpha beta gamma delta epsilon", false),
        (2L, "alpha beta gamma delta epsilon", true),
        (3L, "totally novel content here now", true)
      ).toDF("doc_id", "text", "new_flag")
      val relInc = Dedup.incrementalDedupFlags(docs, "text", "doc_id",
        col("new_flag"), reliable = true)
      val locInc = Dedup.incrementalDedupFlags(docs, "text", "doc_id",
        col("new_flag"), reliable = false)
      assert(relInc.collect().map(_.toString).sorted.toSeq ==
        locInc.collect().map(_.toString).sorted.toSeq)
    } finally {
      // leave no checkpoint dir behind for later suites sharing the session
      sc.setCheckpointDir(null)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    }
  }

  test("tfidf top terms: corpus-common terms score zero, rare terms rank first") {
    val docs = Seq(
      (1L, "apple banana banana common"),
      (2L, "cherry common"),
      (3L, "banana common")
    ).toDF("doc_id", "text")
    val out = operators.TfIdf.topTerms(docs, "text", "doc_id", 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    val byDoc = out.groupBy(_._1)
    // 'common' appears in all 3 docs → ln(3/3)=0; never the top term
    // doc 1: apple ln(3)≈1.099 beats banana 2·ln(3/2)≈0.811 — rarity wins
    assert(byDoc(1L).map(x => (x._2, x._3)).sorted.toSeq ==
      Seq((1, "apple"), (2, "banana")))
    assert(byDoc(2L).head._3 == "cherry", "df=1 term wins doc 2")
    val cherry = byDoc(2L).head._4
    assert(math.abs(cherry - math.round(math.log(3.0) * 1e6) / 1e6) < 1e-9)
    assert(out.filter(_._3 == "common").forall(_._4 == 0.0))
  }

  test("chunkTokens: overlap windows, short-doc single window, empty-doc empty window") {
    import graft.operators.TextChunking.chunkTokens
    val toks = (1 to 10).map(i => s"t$i")
    val out = Seq(Tuple1(toks)).toDF("toks")
      .select(chunkTokens(col("toks"), chunkSize = 4, overlap = 1).as("ch"))
      .collect()(0).getSeq[Seq[String]](0)
    // stride 3 over 10 tokens → starts 0,3,6,9
    assert(out == Seq(
      Seq("t1", "t2", "t3", "t4"), Seq("t4", "t5", "t6", "t7"),
      Seq("t7", "t8", "t9", "t10"), Seq("t10")))
    val short = Seq(Tuple1(Seq("a"))).toDF("toks")
      .select(chunkTokens(col("toks"), 4, 1).as("ch")).collect()(0).getSeq[Seq[String]](0)
    assert(short == Seq(Seq("a")))
    val empty = Seq(Tuple1(Seq.empty[String])).toDF("toks")
      .select(chunkTokens(col("toks"), 4, 1).as("ch")).collect()(0).getSeq[Seq[String]](0)
    assert(empty == Seq(Seq.empty[String]), "empty doc → one empty (filterable) window")
  }

  test("topBigramFraction: hand-computed repetition fraction; no-bigram docs absent") {
    import graft.operators.TextFilters.topBigramFraction
    val docs = Seq(
      (1L, Seq("a", "b", "a", "b", "c")), // bigrams: ab,ba,ab,bc → top 2/4
      (2L, Seq("x")),                     // no bigrams → no row
      (3L, Seq.empty[String])
    ).toDF("doc_id", "toks")
    val got = topBigramFraction(docs, "toks", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 0.5))
  }

  test("dupNgramCharFraction: repeated grams carry their char mass; short docs absent") {
    import graft.operators.TextFilters.dupNgramCharFraction
    val docs = Seq(
      // 2-grams: "aa bb","bb aa","aa bb","bb cc" — "aa bb" occurs twice
      // (2 occ × 4 chars = 8 of 4×4=16 total chars) → 0.5
      (1L, Seq("aa", "bb", "aa", "bb", "cc")),
      // fully repetitive: every 2-gram is "x x" → 1.0
      (2L, Seq("x", "x", "x", "x")),
      // no repeats → 0.0
      (3L, Seq("a", "b", "c")),
      // shorter than n → no row (caller coalesces to 0)
      (4L, Seq("solo")),
      (5L, Seq.empty[String])
    ).toDF("doc_id", "toks")
    val got = dupNgramCharFraction(docs, "toks", "doc_id", 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 0.5, 2L -> 1.0, 3L -> 0.0))
  }

  test("dupNgramCharFraction gates a synthetically repetitive doc at the Gopher caps") {
    import graft.operators.TextFilters.dupNgramCharFraction
    // a doc that loops one 5-token phrase 10 times: every 5-gram occurs
    // repeatedly, so the dup-5gram char fraction is 1.0 — far past the
    // paper's 0.15 cap; a non-repeating doc of the same length is 0.0
    val phrase = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val looped = (1 to 10).flatMap(_ => phrase)
    val distinct = (1 to 50).map(i => s"tok$i")
    val docs = Seq((1L, looped), (2L, distinct)).toDF("doc_id", "toks")
    val got = dupNgramCharFraction(docs, "toks", "doc_id", 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 1.0 && got(2L) == 0.0)
  }

  test("duplicateWindowSpans: cross-doc + intra-doc dups, exact interval union") {
    import graft.operators.Dedup.duplicateWindowSpans
    val docs = Seq(
      // "a b c" (p0) also appears in docs 2 and 6 → dup; "b c d" unique
      (1L, Seq("a", "b", "c", "d")),
      // "a b c" at p1 → dup; "x a b" unique
      (2L, Seq("x", "a", "b", "c")),
      // every window is "q q q" (3 occurrences, intra-doc) → all dup;
      // union of [0,3),[1,4),[2,5) = 5 tokens
      (3L, Seq("q", "q", "q", "q", "q")),
      // shorter than w → zero windows, zero coverage
      (4L, Seq("z1", "z2")),
      // all windows unique → zero dup
      (5L, Seq("m1", "m2", "m3", "m4", "m5")),
      // dup windows at p0 and p4 with a gap > w: two DISJOINT spans,
      // union = 3 + 3 = 6 of 7 tokens
      (6L, Seq("a", "b", "c", "k1", "a", "b", "c"))
    ).toDF("doc_id", "toks")
    val got = duplicateWindowSpans(docs, "toks", "doc_id", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) == ((2L, 1L, 3L, 4L)))
    assert(got(2L) == ((2L, 1L, 3L, 4L)))
    assert(got(3L) == ((3L, 3L, 5L, 5L)))
    assert(got(4L) == ((0L, 0L, 0L, 2L)))
    assert(got(5L) == ((3L, 0L, 0L, 5L)))
    assert(got(6L) == ((5L, 2L, 6L, 7L)))
  }

  test("removeDuplicateWindows: first occurrence survives, later intervals cut") {
    import graft.operators.Dedup.removeDuplicateWindows
    val docs = Seq(
      // "a b c" at (1,0) is the corpus-wide canonical → doc untouched
      (1L, Seq("a", "b", "c", "d")),
      // "a b c" at (2,1) is non-canonical → [1,4) cut → kept [x]
      (2L, Seq("x", "a", "b", "c")),
      // all windows "q q q"; canonical (3,0), removals [1,4)∪[2,5):
      // the canonical occurrence itself loses tokens 1-2 to the
      // overlap (interval removal is token-exact) → kept [q]
      (3L, Seq("q", "q", "q", "q", "q")),
      // shorter than w → untouched
      (4L, Seq("z1", "z2")),
      // both "a b c" occurrences non-canonical → [0,3)∪[4,7) cut
      (6L, Seq("a", "b", "c", "k1", "a", "b", "c"))
    ).toDF("doc_id", "toks")
    val got = removeDuplicateWindows(docs, "toks", "doc_id", 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](2)).toMap
    assert(got(1L) == Seq("a", "b", "c", "d"))
    assert(got(2L) == Seq("x"))
    assert(got(3L) == Seq("q"))
    assert(got(4L) == Seq("z1", "z2"))
    assert(got(6L) == Seq("k1"))
  }

  test("packSequences: exclusive prefix cut every seqLen, independent per shard") {
    import graft.operators.TextChunking.packSequences
    val docs = Seq(
      (1L, "en", 60L), (2L, "en", 60L), (3L, "en", 60L),  // prior 0,60,120 → packs 0,0,1
      (4L, "de", 100L), (5L, "de", 10L)                   // prior 0,100 → packs 0,1
    ).toDF("doc_id", "lang", "n")
    val got = packSequences(docs, col("n"), col("doc_id"), col("lang"), seqLen = 100)
      .select("doc_id", "pack_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L, 5L -> 1L))
  }

  test("embedding near-dup pairs respect blocking and threshold") {
    val embs = Seq(
      (1L, 0, Seq(1f, 0f)), (2L, 0, Seq(0.99f, 0.14f)),
      (3L, 0, Seq(0f, 1f)), (4L, 1, Seq(1f, 0f)))
      .toDF("vec_id", "label", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(embs, "embedding", "vec_id", "label", maxDistance = 0.05)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L))) // 3 too far; 4 other block
  }

  test("incrementalDedupFlags: exact dup, near dup, and novel incoming docs") {
    import org.apache.spark.sql.functions.pmod
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base),                                   // existing
      (2L, "totally different words here entirely one two three"), // existing
      (10L, base),                                  // incoming: exact dup of 1
      (15L, base + " lambda"),                      // incoming: near dup of 1
      (20L, "nothing shared with any existing corpus document at all")) // incoming: novel
      .toDF("doc_id", "text")
    val out = Dedup.incrementalDedupFlags(docs, "text", "doc_id",
        isNew = pmod(col("doc_id"), lit(5)) === 0, threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
          r.getBoolean(4))).toMap
    assert(out(10L) == ((true, Some(1L), true)), s"exact dup: ${out(10L)}")
    assert(out(15L)._1 == false && out(15L)._2 == Some(1L) && out(15L)._3,
      s"near dup: ${out(15L)}")
    assert(out(20L) == ((false, None, false)), s"novel: ${out(20L)}")
    // existing docs never appear in the output (incoming-only contract)
    assert(out.keySet == Set(10L, 15L, 20L))
  }

  test("null text: decontaminate and incremental dedup treat it as novel/clean (defined contract)") {
    import org.apache.spark.sql.functions.pmod
    // null text yields null tokens → null shingles → absent from every
    // gram/band relation: such docs are never flagged and never match
    val docs = Seq((1L, "alpha beta gamma delta epsilon"), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val decon = graft.operators.Decontaminate
      .flagContaminated(docs, bench, "text", "doc_id", n = 3)
      .select("doc_id", "contaminated").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(decon == Map(1L -> true, 5L -> false))
    val inc = Dedup.incrementalDedupFlags(docs, "text", "doc_id",
        isNew = pmod(col("doc_id"), lit(5)) === 0)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(4)))
    assert(inc.toSeq == Seq((5L, false, false)), s"got ${inc.toSeq}")
  }

  test("decontaminate flags corpus docs sharing an n-gram with the benchmark") {
    import graft.operators.Decontaminate
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words then the quick brown fox jumps and more"), // shares a 5-gram
      (2L, "completely unrelated content with no benchmark overlap at all"))
      .toDF("doc_id", "text")
    val out = Decontaminate.flagContaminated(corpus, bench, "text", "doc_id", n = 5)
      .select("doc_id", "n_contaminated_grams", "contaminated")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(1L)._2 && out(1L)._1 >= 1L, s"doc 1 should be flagged: ${out(1L)}")
    assert(out(2L) == ((0L, false)), s"doc 2 clean: ${out(2L)}")
  }

  test("flagContaminatedBloom reproduces the exact path bit-for-bit") {
    import graft.operators.Decontaminate
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words then the quick brown fox jumps and more"),
      (2L, "completely unrelated content with no benchmark overlap at all"),
      (3L, "over the lazy dog sentences keep going with extra tokens here"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "n_contaminated_grams", "contaminated")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val exact = rows(Decontaminate.flagContaminated(corpus, bench, "text", "doc_id", n = 5))
    val bloom = rows(Decontaminate.flagContaminatedBloom(corpus, bench, "text", "doc_id", n = 5,
      expectedItems = 1000L))
    assert(bloom == exact, s"bloom=$bloom exact=$exact")
    // degenerate benches: empty (null bloom) and no-overlap
    val empty = bench.where(lit(false))
    assert(rows(Decontaminate.flagContaminatedBloom(corpus, empty, "text", "doc_id", n = 5))
      == rows(Decontaminate.flagContaminated(corpus, empty, "text", "doc_id", n = 5)))
  }

  test("bloom filter: zero false negatives, bounded false positives") {
    import graft.functions.BloomFunctions._
    val keys = (1L to 1000L).toDF("k")
    val bytes = keys.agg(bloomFilterAgg(col("k"), 1000L).as("bf"))
      .head().getAs[Array[Byte]](0)
    // every inserted key must hit (bloom has no false negatives)
    val hits = keys.where(mightContain(lit(bytes), col("k"))).count()
    assert(hits == 1000L)
    // fresh keys: false-positive rate stays near the ~3% design point
    val fresh = (1000001L to 1010000L).toDF("k")
    val fp = fresh.where(mightContain(lit(bytes), col("k"))).count()
    assert(fp < 500L, s"false positives $fp / 10000 exceeds 5%")
  }

  test("PII redaction: all four pattern families redact; clean text untouched") {
    import graft.operators.TextFilters.{redactPii, piiCount, PiiPatterns}
    val rows = Seq(
      (1L, "reach Jane.Doe+spam@sub.example.co.uk or call +1 (555) 010-9999 now"),
      (2L, "server 192.168.001.042 logged ssn 123-45-6789 at midnight"),
      (3L, "no personal data here, just plain prose with the number 7"))
      .toDF("doc_id", "text")
    val red = rows.select(col("doc_id"), redactPii(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(red(1L) == "reach [EMAIL] or call [PHONE] now", red(1L))
    assert(red(2L) == "server [IP] logged ssn [SSN] at midnight", red(2L))
    assert(red(3L) == "no personal data here, just plain prose with the number 7")
    // counts audit the ORIGINAL occurrences per family
    val counts = rows.select(
      PiiPatterns.map { case (n, p, _) => piiCount(col("text"), p).as(n) }: _*)
      .collect()
    assert(counts(0).getLong(0) == 1 && counts(0).getLong(3) >= 1) // email + phone
    assert(counts(1).getLong(1) == 1 && counts(1).getLong(2) == 1) // ip + ssn
    assert(counts(2).toSeq == Seq(0L, 0L, 0L, 0L))
  }

  test("ngramNoveltyPerDoc: first doc owns its grams; exact copies score zero novelty") {
    import graft.operators.Novelty
    val docs = Seq(
      (1L, "w x y z q"),
      (2L, "w x y z q"),                 // exact copy of doc 1
      (3L, "w x y z new1 new2 new3"))    // 2 of 5 grams seen in doc 1
      .toDF("doc_id", "text")
      .withColumn("toks", tokens(normalize(col("text"))))
    val out = Novelty.ngramNoveltyPerDoc(docs, "toks", "doc_id", k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == (3L, 3L), s"doc 1 must own all its grams: $out")
    assert(out(2L) == (3L, 0L), s"an exact later copy has zero novelty: $out")
    assert(out(3L) == (5L, 3L), s"doc 3: 3 of 5 grams are new: $out")
  }

  test("semanticPruneFlags prunes higher-id eps-neighbors within a cluster only") {
    val df = Seq(
      (0L, 0, Array(1.0f, 0.0f)),    // keeper (lowest id of its eps-group)
      (1L, 0, Array(1.0f, 0.001f)),  // near-identical, same cluster -> pruned
      (2L, 0, Array(0.0f, 1.0f)),    // orthogonal, same cluster -> kept
      (3L, 1, Array(1.0f, 0.0f)))    // identical direction, OTHER cluster -> kept
      .toDF("id", "blk", "v")
    val out = Dedup.semanticPruneFlags(df, "v", "id", "blk", maxDistance = 0.1)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out == Map(0L -> false, 1L -> true, 2L -> false, 3L -> false), out.toString)
  }
}
