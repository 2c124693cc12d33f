package graft.operators

import graft.operators.TextAnalysis._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag documents whose
  * word n-grams overlap an evaluation/benchmark set (the GPT-3-style
  * "13-gram overlap" check; n is a parameter — the fixture corpus'
  * short word-salad docs use n=5).
  *
  * Scale shape: the benchmark side is SMALL by definition (eval sets
  * are MBs; the corpus is TBs), so its distinct gram-hash set is
  * BROADCAST — the corpus streams through a broadcast semi-join-style
  * aggregation with no corpus shuffle on the gram key. Per-document
  * work is the same tokenize→shingle→md5 projection the dedup family
  * uses (hashes, not strings, cross the join). If a benchmark ever
  * outgrew broadcast range, dropping the `broadcast` hint degrades
  * gracefully to a shuffle join on the gram hash.
  *
  * Reference: the reference app has no decontamination (it is a 40-row
  * search demo); this is part of the driver-mandated training-data
  * pipeline surface.
  */
object Decontaminate {

  /** Distinct n-gram md5-hashes per document: (id, g). */
  private def gramRelation(docs: DataFrame, textCol: String, idCol: String,
                           n: Int): DataFrame =
    docs.select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .select(col("id"),
        explode(transform(shinglesFromTokens(col("toks"), n), s => md5Long48(s))).as("g"))

  /** Per-corpus-document count of distinct n-grams also present
    * anywhere in `bench`: (id, n_hits). Documents with zero overlap are
    * ABSENT (left-join + coalesce at the call site, or use
    * [[flagContaminated]]).
    */
  def overlapCounts(corpus: DataFrame, bench: DataFrame, textCol: String,
                    idCol: String, n: Int): DataFrame = {
    val benchGrams = gramRelation(bench, textCol, idCol, n)
      .select(col("g")).distinct()
    gramRelation(corpus, textCol, idCol, n)
      .join(broadcast(benchGrams), Seq("g"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** [[flagContaminated]] with a Bloom-filter pre-filter — the shape
    * for when the benchmark gram set outgrows an exact broadcast. The
    * exact path broadcasts 8 bytes per distinct bench gram; at ~9 BITS
    * per item (3% fpp) the bloom stays broadcastable roughly 7× longer.
    * Corpus grams stream through `mightContain` (a codegen'd literal
    * predicate — no join, no shuffle), and only the surviving ~fpp
    * fraction plus true hits reaches the exact confirm semi-join, which
    * therefore joins a sliver of the corpus instead of all of it (no
    * broadcast hint: AQE broadcasts while the bench set fits, degrades
    * to a shuffle join beyond — the beyond-broadcast fallback this
    * variant exists for). No false negatives + exact confirm ⇒ the output
    * is IDENTICAL to [[flagContaminated]] for any fpp, which is what
    * lets the query share the exact oracle.
    *
    * The bloom is built by one aggregate over the bench grams and
    * collected to the driver (a few MB — same order as the broadcast it
    * replaces); `expectedItems` sizes it (defaults pessimistically to
    * 1M when the caller has no estimate).
    */
  def flagContaminatedBloom(corpus: DataFrame, bench: DataFrame,
                            textCol: String, idCol: String, n: Int,
                            minOverlap: Int = 1,
                            expectedItems: Long = 1000000L): DataFrame = {
    import graft.functions.BloomFunctions._
    val benchGrams = gramRelation(bench, textCol, idCol, n)
      .select(col("g")).distinct()
    val bloomBytes = benchGrams
      .agg(bloomFilterAgg(col("g"), expectedItems).as("bf"))
      .head().getAs[Array[Byte]](0)
    // empty bench ⇒ null bloom ⇒ nothing can hit; mirror flagContaminated
    val grams = gramRelation(corpus, textCol, idCol, n)
    val survivors =
      if (bloomBytes == null) grams.where(lit(false))
      else grams.where(mightContain(lit(bloomBytes), col("g")))
    val counts = survivors.join(benchGrams, Seq("g"), "left_semi")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hits"))
      .withColumnRenamed("id", idCol)
    corpus.join(broadcast(counts), Seq(idCol), "left")
      .withColumn("n_contaminated_grams", coalesce(col("n_hits"), lit(0L)))
      .drop("n_hits")
      .withColumn("contaminated", col("n_contaminated_grams") >= minOverlap)
  }

  /** Corpus rows + `n_contaminated_grams` + `contaminated` flag
    * (overlap ≥ `minOverlap` distinct n-grams). The corpus never
    * shuffles: overlap counts ride a broadcast join back onto the
    * corpus id — the counts relation only holds documents with ≥1
    * benchmark hit, which is rare by construction (it is the
    * contamination being hunted), so it stays broadcastable even when
    * the corpus is not.
    */
  def flagContaminated(corpus: DataFrame, bench: DataFrame, textCol: String,
                       idCol: String, n: Int, minOverlap: Int = 1): DataFrame = {
    val counts = overlapCounts(corpus, bench, textCol, idCol, n)
      .withColumnRenamed("id", idCol)
    corpus.join(broadcast(counts), Seq(idCol), "left")
      .withColumn("n_contaminated_grams", coalesce(col("n_hits"), lit(0L)))
      .drop("n_hits")
      .withColumn("contaminated", col("n_contaminated_grams") >= minOverlap)
  }
}
