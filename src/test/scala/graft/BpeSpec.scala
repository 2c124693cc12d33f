package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE trainer semantics on hand-computable dictionaries. */
class BpeSpec extends SparkSpec {

  private def dict(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toSeq.toDF("word", "freq")
  }

  test("merge application is left-to-right greedy without overlap re-merge") {
    import spark.implicits._
    val out = Seq("aaa", "aaaa", "ba", "a")
      .toDF("word")
      .select(Bpe.mergeSyms(Bpe.chars(col("word")), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0).toList)
    assert(out(0) == List("aa", "a"))   // no chain into the merged symbol
    assert(out(1) == List("aa", "aa"))
    assert(out(2) == List("b", "a"))
    assert(out(3) == List("a"))
  }

  test("training learns the frequency-ordered merges with exact counts") {
    val (finalDict, merges) =
      Bpe.train(dict("the" -> 10L, "then" -> 3L, "he" -> 5L), rounds = 3)
    // round 1: (h,e) = 18 beats (t,h) = 13 and (e,n) = 3
    assert(merges.map(m => (m.round, m.left, m.right, m.count)) == Seq(
      (1, "h", "e", 18L),
      (2, "t", "he", 13L),
      (3, "the", "n", 3L)))
    // vocab: {t,he,n} -> {the,he,n} -> {the,then,he}
    assert(merges.map(_.vocabAfter) == Seq(3L, 3L, 3L))
    val syms = finalDict.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    assert(syms == Map(
      "the" -> List("the"), "then" -> List("then"), "he" -> List("he")))
    finalDict.unpersist()
  }

  test("count ties break lexicographically on (left, right)") {
    val (d, merges) = Bpe.train(dict("ba" -> 2L, "ab" -> 2L), rounds = 1)
    d.unpersist()
    assert(merges.head.left == "a" && merges.head.right == "b")
  }

  test("encode ≡ train: re-applying the merge list reproduces the trained dict") {
    // the txt_bpe_encode differential: folding the learned merges over
    // raw characters must land exactly on the symbols train produced —
    // on the SAME words, apply is a pure replay of training's folds
    val words = dict("the" -> 10L, "then" -> 3L, "he" -> 5L, "tent" -> 2L)
    val (finalDict, merges) = Bpe.train(words, rounds = 3)
    val replayed = merges.foldLeft(
      words.withColumn("syms", Bpe.chars(col("word")))) { (df, m) =>
      df.withColumn("syms", Bpe.mergeSyms(col("syms"), m.left, m.right))
    }
    val got = replayed.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    val want = finalDict.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    finalDict.unpersist()
    assert(got == want)
    // and an out-of-dict word still encodes deterministically
    import spark.implicits._
    val novel = merges.foldLeft(
      Seq("thethe").toDF("word").withColumn("syms", Bpe.chars(col("word")))) {
      (df, m) => df.withColumn("syms", Bpe.mergeSyms(col("syms"), m.left, m.right))
    }.head().getSeq[String](1).toList
    assert(novel == List("the", "the"))
  }
}
