package graft.operators

import graft.functions.VectorFunctions.cosineDistance
import graft.operators.TextAnalysis._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline surface
  * (driver mandate — the reference has none; its corpus is 40 curated
  * rows): exact, MinHash+LSH, SimHash, n-gram Jaccard, and
  * embedding-cosine near-dup.
  *
  * Scale design (the part that matters at 100 TB):
  *   - exact dedup shuffles only (fingerprint → id) pairs, never text;
  *   - near-dup detection NEVER does an unblocked O(n²) self-join — every
  *     variant first maps documents into buckets (LSH bands, SimHash
  *     bands, shared shingles) and only compares within buckets;
  *   - signatures (minhash/simhash) are computed in one shuffle-free
  *     projection pass with higher-order functions, then only the small
  *     (id, signature) relation shuffles.
  *
  * Portability: all hashes are md5-derived (see [[TextAnalysis]]) so the
  * DuckDB oracle recomputes identical signatures.
  */
object Dedup {

  /** Exact duplicate groups by normalized-text fingerprint. Returns one
    * row per distinct fingerprint: canonical (min) id, group size.
    * Only (fingerprint, id) shuffles — the map side projects away text.
    */
  def exactGroups(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(fingerprint(col(textCol)).as("fp"), col(idCol))
      .groupBy("fp")
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("group_size"))

  /** Ids to drop under exact dedup (everything but the canonical id of
    * each group) — the "dedup filter" a training pipeline applies.
    */
  def exactDropIds(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp")).orderBy(col(idCol))
    docs.select(fingerprint(col(textCol)).as("fp"), col(idCol))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > 1)
      .select(col(idCol))
  }

  /** MinHash signature: for each of `numHashes` seeds, the minimum of
    * md5(seed || '|' || shingle) over the document's shingles — string
    * minima, portable across engines. One pass, no shuffle.
    */
  def minhashSignature(text: Column, shingleK: Int, numHashes: Int): Column = {
    val sh = shingles(text, shingleK)
    transform(sequence(lit(0), lit(numHashes - 1)), seed =>
      array_min(transform(sh, s => md5(concat(seed.cast("string"), lit("|"), s)))))
  }

  /** LSH band keys from a minhash signature: `numBands` groups of
    * `rowsPerBand` consecutive signature entries, each band hashed to one
    * md5 key. Docs sharing ≥1 band key are candidate near-dups.
    */
  def lshBandKeys(signature: Column, numBands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(numBands - 1)), b =>
      concat(b.cast("string"), lit(":"),
        md5(array_join(slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)), ","))))

  /** Candidate near-dup pairs via MinHash LSH: band keys → explode →
    * self-join on band → distinct pairs. The self-join is on tiny
    * (band_key, id) rows; band-key skew is bounded by band count.
    * Returns (id_a, id_b) with id_a < id_b.
    */
  def minhashCandidatePairs(docs: DataFrame, textCol: String, idCol: String,
                            shingleK: Int = 3, numHashes: Int = 12,
                            numBands: Int = 4): DataFrame = {
    val rowsPerBand = numHashes / numBands
    val sig = minhashSignature(col(textCol), shingleK, numHashes)
    val banded = docs.select(
        col(idCol).as("id"),
        explode(lshBandKeys(sig, numBands, rowsPerBand)).as("band"))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard similarity of distinct shingle sets for given pairs,
    * via explode + join + group (set intersection as a count). `pairs`
    * must have (id_a, id_b).
    */
  def jaccardOnPairs(docs: DataFrame, pairs: DataFrame, textCol: String,
                     idCol: String, shingleK: Int): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      shingles(col(textCol), shingleK).as("sh"))
      .select(col("id"), size(col("sh")).cast("long").as("n_sh"),
        explode(col("sh")).as("s"))
    val common = sh.as("x").join(sh.as("y"), col("x.s") === col("y.s"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.n_sh").as("na"), col("y.n_sh").as("nb"))
      .join(pairs, Seq("id_a", "id_b"), "left_semi")
      .groupBy("id_a", "id_b", "na", "nb")
      .agg(count(lit(1)).as("n_common"))
    common.select(col("id_a"), col("id_b"),
      round(col("n_common").cast("double") /
        (col("na") + col("nb") - col("n_common")).cast("double"), 6).as("jaccard"))
  }

  /** All-pairs n-gram Jaccard above a threshold, blocked by shared
    * shingles (a pair with zero common shingles has Jaccard 0 and is
    * never materialized). The shingle join is the blocking step: cost is
    * Σ_shingle df(shingle)² — bounded in practice by rare shingles; a
    * production run caps df with a frequency filter like `maxShingleDf`.
    */
  def ngramJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
                        shingleK: Int = 3, threshold: Double = 0.1,
                        maxShingleDf: Option[Int] = None): DataFrame = {
    val sh0 = docs.select(col(idCol).as("id"),
      shingles(col(textCol), shingleK).as("sh"))
      .select(col("id"), size(col("sh")).cast("long").as("n_sh"),
        explode(col("sh")).as("s"))
    val sh = maxShingleDf match {
      case Some(cap) =>
        val keep = sh0.groupBy("s").agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select("s")
        sh0.join(broadcast(keep), Seq("s"), "left_semi")
      case None => sh0
    }
    sh.as("x").join(sh.as("y"), col("x.s") === col("y.s") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.n_sh").as("na"), col("y.n_sh").as("nb"))
      .agg(count(lit(1)).as("n_common"))
      .select(col("id_a"), col("id_b"),
        round(col("n_common").cast("double") /
          (col("na") + col("nb") - col("n_common")).cast("double"), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash near-dup pairs: 48-bit signatures, banded into 4×12-bit
    * chunks for blocking (hamming-close pairs almost surely share a
    * chunk), verified with exact hamming distance ≤ `maxHamming`.
    */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 16): DataFrame = {
    val sigs = docs.select(col(idCol).as("id"), simhash48(col(textCol)).as("sig"))
    val withBands = sigs.select(col("id"), col("sig"),
      explode(array((0 until 4).map(b =>
        concat(lit(s"$b:"), shiftright(col("sig"), b * 12).bitwiseAND(lit(0xFFFL)).cast("string"))): _*)).as("band"))
    withBands.as("a")
      .join(withBands.as("b"), col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hammingDistance(col("a.sig"), col("b.sig")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding near-dup pairs: cosine distance below `maxDistance`,
    * blocked by a coarse partition column (label / cluster id from an
    * ANN index — see [[Ann]]). Within-block pairwise only.
    */
  def embeddingNearDupPairs(embs: DataFrame, vecCol: String, idCol: String,
                            blockCol: String, maxDistance: Double): DataFrame = {
    val e = embs.select(col(idCol).as("id"), col(blockCol).as("blk"), col(vecCol).as("v"))
    e.as("a").join(e.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(cosineDistance(col("a.v"), col("b.v")), 6).as("cos_dist"))
      .filter(col("cos_dist") <= maxDistance)
  }
}
