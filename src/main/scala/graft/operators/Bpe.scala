package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING — the vocabulary-learning step
  * of a training-data pipeline (Sennrich et al. 2016), in its scalable
  * classical form: merges are learned from the WORD-FREQUENCY
  * DICTIONARY, not the raw corpus. The corpus is touched exactly once
  * (tokenize → word counts); every merge round then works on the
  * bounded dict (top-V words × symbols-per-word), so a 100 TB corpus
  * costs one aggregation pass plus O(rounds) jobs over a few thousand
  * rows.
  *
  * Determinism contract (what lets the DuckDB oracle replay training
  * bit-for-bit): pair counts are exact integers; the best pair is
  * (count DESC, left, right) — ties broken lexicographically on the
  * binary collation both engines share; merge application is the
  * left-to-right greedy fold (a merged symbol never re-matches its own
  * left half because `p1 || p2 != p1`).
  */
object Bpe {

  /** One learned merge: the pair, its weighted count at selection time,
    * and the dict-wide distinct-symbol count after applying it.
    */
  final case class Merge(round: Int, left: String, right: String,
                         count: Long, vocabAfter: Long)

  /** Word → its initial symbol sequence (single characters).
    * Spark's `split(s, "")` keeps a trailing empty string (Java split
    * with limit −1); the filter drops it — DuckDB's
    * `string_split_regex(s, '')` yields bare chars already.
    */
  def chars(word: Column): Column =
    filter(split(word, ""), c => c =!= "")

  /** Apply one learned merge to a symbol array: the left-to-right
    * greedy fold. acc starts as [first symbol]; each next symbol either
    * completes the pair (replace acc's last element with the merged
    * symbol) or appends. Mirrored in SQL by `list_reduce` over
    * single-element lists (the accumulator must be LIST-typed there —
    * see ev_holt_forecast's scaladoc for why not a struct).
    */
  def mergeSyms(arr: Column, p1: String, p2: String): Column =
    aggregate(
      slice(arr, lit(2), size(arr) - 1),
      array(element_at(arr, 1)),
      (acc, x) =>
        when(element_at(acc, -1) === lit(p1) && x === lit(p2),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(p1 + p2))))
          .otherwise(concat(acc, array(x))))

  /** Weighted adjacent-pair counts over a dict with columns
    * (word, freq, syms).
    */
  def pairCounts(dict: DataFrame): DataFrame =
    dict
      .select(col("freq"),
        explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"))
      .select(col("p").getField("0").as("l"), col("p").getField("1").as("r"),
        col("freq"))
      .groupBy(col("l"), col("r"))
      .agg(sum(col("freq")).as("c"))

  /** Train `rounds` merges over a (word, freq) dict. Returns the final
    * dict (word, freq, syms) and the merge table. Each round collects
    * exactly ONE row (the argmax pair) — the same legitimate
    * driver-side scalar as a fitted centroid; everything else stays in
    * DataFrames.
    */
  def train(dictWords: DataFrame, rounds: Int): (DataFrame, Seq[Merge]) = {
    var dict = dictWords
      .select(col("word"), col("freq"), chars(col("word")).as("syms"))
      .cache()
    val merges = Seq.newBuilder[Merge]
    for (r <- 1 to rounds) {
      val best = pairCounts(dict)
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.nonEmpty) {
        val (p1, p2, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        val next = dict
          .select(col("word"), col("freq"),
            mergeSyms(col("syms"), p1, p2).as("syms"))
          .cache()
        val vocab = next.select(explode(col("syms")).as("s"))
          .agg(countDistinct(col("s"))).collect()(0).getLong(0)
        dict.unpersist()
        dict = next
        merges += Merge(r, p1, p2, c, vocab)
      }
    }
    (dict, merges.result())
  }
}
