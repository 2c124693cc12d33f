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

  /** MinHash permutation family parameters. The hash domain is 32-bit
    * (first 8 md5 hex chars) and the modulus is the Mersenne prime
    * 2³¹−1, so a·h genuinely wraps (a monotone, non-wrapping map would
    * make every seed's minimum pick the same shingle and degenerate the
    * whole signature to one hash). Multipliers stay < 2³⁰, keeping
    * a·h < 2⁶² — no BIGINT overflow in either engine (DuckDB checks).
    */
  val MinhashPrime = 2147483647L        // 2³¹ − 1
  private val MultMod = 1073741789L     // prime < 2³⁰ bounding the multiplier

  /** MinHash signature from PRE-HASHED shingles: each shingle is
    * digested once (md5 → 32-bit int, [[md5Long32]]); the `numHashes`
    * permutations are cheap affine maps h ↦ (aₛ·h + bₛ) mod (2³¹−1) —
    * the standard hash-once/permute-many MinHash. Digesting per
    * (seed, shingle) instead would multiply the md5 work by
    * `numHashes`.
    *
    * Takes the hash-array COLUMN, not the text: the caller must
    * materialize it (see [[minhashCandidatePairs]] — Catalyst inlines
    * singly-referenced aliases into HOF lambdas, re-evaluating them per
    * element).
    */
  def minhashSignature(shingleHashesCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), s => {
      val a = ((s + 1) * lit(2654435761L)) % lit(MultMod)
      val b = ((s + 1) * lit(97531L)) % lit(MultMod)
      array_min(transform(shingleHashesCol, h =>
        (h * a + b) % lit(MinhashPrime)))
    })

  /** First 8 md5 hex chars as a 32-bit BIGINT (DuckDB:
    * `('0x' || substring(md5(x), 1, 8))::BIGINT`).
    */
  def md5Long32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** LSH band keys from a minhash signature: `numBands` groups of
    * `rowsPerBand` consecutive signature entries, each band hashed to one
    * md5 key. Docs sharing ≥1 band key are candidate near-dups.
    */
  def lshBandKeys(signature: Column, numBands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(numBands - 1)), b =>
      concat(b.cast("string"), lit(":"),
        md5(array_join(
          transform(slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)),
            v => v.cast("string")), ","))))

  /** Candidate near-dup pairs via MinHash LSH: band keys → explode →
    * self-join on band → distinct pairs. The self-join is on tiny
    * (band_key, id) rows; band-key skew is bounded by band count.
    * Returns (id_a, id_b) with id_a < id_b.
    */
  /** (id, sh: array<string>) shingle relation for `docs` — the shared
    * input of candidate generation and Jaccard verification. `toks` is
    * a named column: the shingle lambda slices it per element, and an
    * inlined tokenizer would re-split per shingle.
    */
  def shingleRelation(docs: DataFrame, textCol: String, idCol: String,
                      shingleK: Int): DataFrame =
    docs
      .select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .select(col("id"), shinglesFromTokens(col("toks"), shingleK).as("sh"))

  def minhashCandidatePairs(docs: DataFrame, textCol: String, idCol: String,
                            shingleK: Int = 3, numHashes: Int = 12,
                            numBands: Int = 4): DataFrame =
    minhashCandidatePairsFromShingles(
      shingleRelation(docs, textCol, idCol, shingleK), numHashes, numBands)

  /** (id, sig) MinHash signature relation from a prepared (id, sh)
    * relation. The repartition is a MATERIALIZATION BARRIER as much as
    * parallelism: CollapseProject counts syntactic references, so
    * without it the shingle-hash pipeline would be inlined into the
    * signature lambda and re-evaluated once per seed per row. The
    * exchange ships only (id, hash-array) rows and forces single
    * evaluation on its map side.
    */
  def minhashSignatures(shingleRel: DataFrame, numHashes: Int): DataFrame = {
    val par = shingleRel.sparkSession.sparkContext.defaultParallelism
    shingleRel
      .select(col("id"), transform(col("sh"), s => md5Long32(s)).as("hs"))
      .repartition(par, col("id"))
      .select(col("id"), minhashSignature(col("hs"), numHashes).as("sig"))
  }

  /** Candidate pairs from a prepared (id, sh) relation. */
  def minhashCandidatePairsFromShingles(shingleRel: DataFrame, numHashes: Int,
                                        numBands: Int): DataFrame = {
    val rowsPerBand = numHashes / numBands
    val banded = minhashSignatures(shingleRel, numHashes)
      .select(col("id"),
        explode(lshBandKeys(col("sig"), numBands, rowsPerBand)).as("band"))
      // the band relation is tiny (numBands rows per doc) and both
      // self-join sides consume it — materialize once
      .cache()
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
                     idCol: String, shingleK: Int): DataFrame =
    jaccardOnPairsFromShingles(
      shingleRelation(docs, textCol, idCol, shingleK), pairs)

  /** Exact Jaccard for candidate pairs from a prepared (id, sh)
    * relation.
    */
  def jaccardOnPairsFromShingles(shingleRel: DataFrame, pairs: DataFrame): DataFrame = {
    // Restrict the shingle index to documents that occur in a candidate
    // pair BEFORE the shingle self-join: candidates are sparse (LSH
    // band collisions), so this turns an |corpus|-inverted-index join
    // into one over only the candidate docs.
    val candIds = pairs.select(col("id_a").as("id"))
      .union(pairs.select(col("id_b").as("id"))).distinct()
    // joins run on 48-bit shingle hashes, not shingle strings: integer
    // keys shuffle/compare far cheaper, and at corpus scale the
    // collision probability (n²/2⁴⁹) is negligible — the oracle mirrors
    // the same hashing so the check stays exact
    val sh = shingleRel
      .join(candIds, Seq("id"), "left_semi")
      .select(col("id"), size(col("sh")).cast("long").as("n_sh"),
        explode(transform(col("sh"), s => TextAnalysis.md5Long48(s))).as("s"))
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

  /** Incremental ingest dedup — the at-scale production shape: a NEW
    * batch of documents is checked against the EXISTING corpus without
    * ever re-pairing existing×existing. Input is one relation with an
    * `isNew` predicate marking the incoming batch; output is one row
    * per incoming document:
    *
    *   (id, is_exact_dup, best_match_id, best_jaccard, is_near_dup)
    *
    *   - exact: normalized-text md5 semi-join against existing
    *     fingerprints (shuffles (fp, id) pairs only);
    *   - near: MinHash+LSH bands on BOTH sides, but the candidate join
    *     is incoming-bands × existing-bands — cost is |incoming| ×
    *     band-collisions, independent of |existing|² — then exact
    *     shingle-Jaccard verification on the sparse candidates, keeping
    *     each incoming doc's best (max-Jaccard, tie → smallest existing
    *     id) match.
    *
    * At 100 TB the existing corpus' band relation is a precomputed,
    * band-key-bucketed table maintained at ingest (write-time index);
    * this method recomputes it inline because the fixtures are small —
    * the join/verify shape is identical either way.
    *
    * EVALUATION NOTE: the result is materialized EAGERLY (one job,
    * `localCheckpoint`) so the band/candidate caches the pipeline needs
    * internally can be dropped before returning — a long-lived session
    * calling this per micro-batch accumulates zero retained cache
    * blocks. The returned frame reads from its checkpoint blocks
    * (released when the frame is GC'd); it is |incoming|-sized, the
    * smallest relation in the whole computation.
    *
    * The default `reliable = false` stores those blocks in NON-RELIABLE
    * executor storage: on a real cluster an executor loss after return
    * makes the frame unrecoverable (lineage is truncated) and fails the
    * caller's batch. Fine for local/test; a production ingest loop
    * should `spark.sparkContext.setCheckpointDir(...)` and pass
    * `reliable = true` — same eager-materialize + cache-drop contract,
    * blocks on the cluster FS instead (see [[materialize]] and the same
    * note on [[duplicateClustersWithRounds]]).
    */
  def incrementalDedupFlags(docs: DataFrame, textCol: String, idCol: String,
                            isNew: Column, shingleK: Int = 3,
                            numHashes: Int = 12, numBands: Int = 4,
                            threshold: Double = 0.5,
                            reliable: Boolean = false): DataFrame = {
    val rowsPerBand = numHashes / numBands
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val base = docs.select(col(idCol).as("id"), isNew.as("is_new"), col(textCol).as("txt"))

    // exact: incoming fingerprints present among existing fingerprints
    val fps = base.select(col("id"), col("is_new"), fingerprint(col("txt")).as("fp"))
    val exactDups = fps.filter(col("is_new")).as("n")
      .join(fps.filter(!col("is_new")).select(col("fp")).distinct().as("e"), Seq("fp"), "left_semi")
      .select(col("id"))

    // near: banded minhash on both sides, incoming × existing band join
    val rel = base
      .select(col("id"), col("is_new"), tokens(col("txt")).as("toks"))
      .select(col("id"), col("is_new"), shinglesFromTokens(col("toks"), shingleK).as("sh"))
    // same materialization barrier + cache contract as
    // minhashCandidatePairsFromShingles (see comments there)
    val banded = rel
      .select(col("id"), col("is_new"), transform(col("sh"), s => md5Long32(s)).as("hs"))
      .repartition(par, col("id"))
      .select(col("id"), col("is_new"), minhashSignature(col("hs"), numHashes).as("sig"))
      .select(col("id"), col("is_new"),
        explode(lshBandKeys(col("sig"), numBands, rowsPerBand)).as("band"))
      .cache()
    // cached: the candidate pair list is tiny and referenced 3× by the
    // Jaccard verify (both candIds union branches + the semi-join) —
    // uncached, the whole band join would re-run per reference. Same
    // cache-hygiene contract as simhashPairs (callers own eviction).
    val cand = banded.filter(col("is_new")).as("n")
      .join(banded.filter(!col("is_new")).as("e"), col("n.band") === col("e.band"))
      .select(col("n.id").as("id_a"), col("e.id").as("id_b"))
      .distinct()
      .cache()
    val verified = jaccardOnPairsFromShingles(rel.select(col("id"), col("sh")), cand)
    // best existing match per incoming doc: max jaccard, tie → smallest
    // existing id (struct max is lexicographic; -id_b turns "smallest
    // id" into "largest negated id")
    val best = verified
      .groupBy(col("id_a").as("id"))
      .agg(max(struct(col("jaccard"), (-col("id_b")).as("neg_id"))).as("b"))
      .select(col("id"), (-col("b.neg_id")).as("best_match_id"),
        col("b.jaccard").as("best_jaccard"))

    val flags = base.filter(col("is_new")).select(col("id"))
      .join(exactDups.withColumn("is_exact_dup", lit(true)), Seq("id"), "left")
      .join(best, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("is_exact_dup"), lit(false)).as("is_exact_dup"),
        col("best_match_id"), col("best_jaccard"),
        coalesce(col("best_jaccard") >= threshold, lit(false)).as("is_near_dup"))
    // materialize once (the caches above make that single job cheap),
    // then drop the intermediates — the caller gets a self-contained
    // frame and the session retains no cache blocks (see scaladoc)
    val out = materialize(flags, reliable)
    banded.unpersist(false)
    cand.unpersist(false)
    out
  }

  /** Default document-frequency cap on inverted-index shingles — the
    * 100 TB guard: the blocking join costs Σ_shingle df², so one
    * boilerplate shingle shared by 10⁶ docs alone would generate 10¹²
    * candidate pairs. Capping df drops only shingles so common they
    * carry no near-dup signal (pairs sharing ONLY capped shingles are
    * missed by design — boilerplate-only overlap is not duplication).
    * Set well above any fixture df so small-SF results are unchanged.
    */
  val DefaultMaxShingleDf = 1000

  /** All-pairs n-gram Jaccard above a threshold, blocked by shared
    * shingles (a pair with zero common shingles has Jaccard 0 and is
    * never materialized). The shingle join is the blocking step: cost is
    * Σ_shingle df(shingle)², so hot shingles are capped at
    * `maxShingleDf` (default [[DefaultMaxShingleDf]]; `None` = uncapped
    * exact mode). Jaccard denominators always use the FULL shingle-set
    * sizes — the cap only prunes which pairs get generated.
    *
    * SEMANTICS NOTE: the capped default makes this operator
    * *approximate* — a pair whose only shingle overlap is via
    * hotter-than-cap shingles is never emitted. This is the intended
    * production default (boilerplate-only overlap is not duplication,
    * and the uncapped join is quadratic in hot-shingle df); callers who
    * need the exact all-pairs semantics must pass
    * `maxShingleDf = None` explicitly. Default changed from `None` in
    * an earlier revision — existing callers relying on exact results
    * should pin it.
    */
  /** The capped integer-keyed shingle inverted index shared by the
    * Jaccard and containment pair generators: (id, n_sh, s) rows, hot
    * shingles (df > cap) dropped via a bounded broadcast anti-join.
    */
  private def shingleIndex(docs: DataFrame, textCol: String, idCol: String,
                           shingleK: Int,
                           maxShingleDf: Option[Int]): DataFrame = {
    val sh0 = docs
      .select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .select(col("id"), shinglesFromTokens(col("toks"), shingleK).as("sh"))
      .select(col("id"), size(col("sh")).cast("long").as("n_sh"),
        explode(transform(col("sh"), s => TextAnalysis.md5Long48(s))).as("s"))
    maxShingleDf match {
      case Some(cap) =>
        // broadcast the HOT list (df > cap), not the keep list: hot
        // shingles are few BY CONSTRUCTION (the cap exists because they
        // are outliers), so the broadcast stays bounded at 100 TB,
        // whereas the keep side is O(all distinct shingles). The
        // aggregate producing it is map-side-partial, output tiny.
        val hot = sh0.groupBy("s").agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select("s")
        sh0.join(broadcast(hot), Seq("s"), "left_anti")
      case None => sh0
    }
  }

  /** Shared-shingle pair counts from the inverted index: one row per
    * (id_a < id_b) pair that shares ≥1 surviving shingle, with both
    * set sizes and the common count — cost Σ df(shingle)², never n².
    */
  private def sharedShinglePairs(sh: DataFrame): DataFrame =
    sh.as("x").join(sh.as("y"), col("x.s") === col("y.s") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.n_sh").as("na"), col("y.n_sh").as("nb"))
      .agg(count(lit(1)).as("n_common"))

  def ngramJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
                        shingleK: Int = 3, threshold: Double = 0.1,
                        maxShingleDf: Option[Int] = Some(DefaultMaxShingleDf)): DataFrame =
    sharedShinglePairs(shingleIndex(docs, textCol, idCol, shingleK, maxShingleDf))
      .select(col("id_a"), col("id_b"),
        round(col("n_common").cast("double") /
          (col("na") + col("nb") - col("n_common")).cast("double"), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)

  /** Directional n-gram CONTAINMENT pairs — the asymmetric near-dup
    * relation Jaccard systematically misses: a short document quoted
    * whole inside a long one has containment(short in long) ≈ 1 while
    * Jaccard ≈ |short|/|long| ≈ 0 (Broder 1997 distinguishes exactly
    * these two resemblance measures). Same capped inverted-index
    * blocking and Σ df² cost as [[ngramJaccardPairs]]; emits both
    * directions per pair plus the max, filtered on the max.
    */
  def ngramContainmentPairs(docs: DataFrame, textCol: String, idCol: String,
                            shingleK: Int = 3, threshold: Double = 0.5,
                            maxShingleDf: Option[Int] = Some(DefaultMaxShingleDf)): DataFrame =
    sharedShinglePairs(shingleIndex(docs, textCol, idCol, shingleK, maxShingleDf))
      .select(col("id_a"), col("id_b"), col("n_common"),
        col("na"), col("nb"),
        round(col("n_common").cast("double") / col("na").cast("double"), 6)
          .as("contain_a_in_b"),
        round(col("n_common").cast("double") / col("nb").cast("double"), 6)
          .as("contain_b_in_a"))
      .withColumn("max_containment",
        greatest(col("contain_a_in_b"), col("contain_b_in_a")))
      .filter(col("max_containment") >= threshold)

  /** SimHash near-dup pairs: 48-bit signatures, banded into 4×12-bit
    * chunks for blocking (hamming-close pairs almost surely share a
    * chunk), verified with exact hamming distance ≤ `maxHamming`.
    *
    * CACHE HYGIENE: the banded signature relation is `.cache()`d (both
    * self-join sides consume it; see comment below) and stays
    * registered until the caller drops it — in a long-lived session
    * invoking dedup operators repeatedly, call
    * `spark.catalog.clearCache()` (what Verify/Bench do per query) or
    * `unpersist` the returned frame's sources between invocations.
    */
  /** In-block pairwise work is Σ |band bucket|² — on a corpus with
    * pathological duplicate density a single hot band value can hold
    * 10⁵ documents (5·10⁹ pairs in ONE join key = one task). The
    * DEFAULT cap drops band buckets larger than this; a document pair
    * sharing a dropped band is still found through its other 3 bands
    * unless ALL its bands are hot (i.e. it sits in a mega-duplicate
    * cluster — which exact dedup or a cluster-level pass should own).
    * Same mitigation shape as the n-gram path's `maxShingleDf`
    * (`DefaultMaxShingleDf`): the constant sits ABOVE every observed
    * fixture band size so capped results are bit-identical to
    * uncapped — measured max band bucket is 1 656 (sf0.1), 2 289
    * (synthesized sf1), 4 863 (synthesized sf10; replica token
    * suffixes diversify signatures, so growth is sublinear) — while
    * still bounding a real mega-dup corpus's hottest band to
    * ≤ 10⁴ docs ⇒ ≤ 5·10⁷ pairs per band value, task-sized. Pass
    * `maxBandSize = None` to disable.
    */
  val DefaultMaxBandSize = 10000

  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 16,
                   maxBandSize: Option[Int] = Some(DefaultMaxBandSize)): DataFrame = {
    val sigs = docs
      .select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .select(col("id"), simhash48FromTokens(col("toks")).as("sig"))
    val withBands = sigs.select(col("id"), col("sig"),
      explode(array((0 until 4).map(b =>
        concat(lit(s"$b:"), shiftright(col("sig"), b * 12).bitwiseAND(lit(0xFFFL)).cast("string"))): _*)).as("band"))
      // materialize the (id, sig, band) relation ONCE: the self-join
      // consumes it on both sides, and the broadcast-build side would
      // otherwise re-run the whole tokenize→simhash pipeline — worse,
      // the join key's IsNotNull gets pushed into the parquet scan as
      // the full simhash expression (a third evaluation per row).
      // Mirrors the minhash `banded` cache.
      .cache()
    // hot-band exclusion: the hot LIST (buckets above the cap) is tiny
    // by construction — broadcast it into a left-anti join; the band
    // relation itself never re-shuffles (mirrors the ngram df cap)
    val pruned = maxBandSize match {
      case Some(cap) =>
        val hot = withBands.groupBy(col("band"))
          .agg(count(lit(1)).as("n")).filter(col("n") > cap).select("band")
        withBands.join(broadcast(hot), Seq("band"), "left_anti")
      case None => withBands
    }
    pruned.as("a")
      .join(pruned.as("b"), col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hammingDistance(col("a.sig"), col("b.sig")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Duplicate clusters from pairwise near-dup edges: connected
    * components with component id = min member id. Min-label
    * propagation WITH pointer doubling — each round every node (a)
    * adopts the smallest root in its closed neighborhood (hop), then
    * (b) shortcuts to its root's root (doubling). The hop moves labels
    * one edge; the shortcut compounds previous rounds, so the distance
    * a label still has to travel shrinks geometrically → **O(log
    * diameter) rounds**, not O(diameter): a 100 TB near-dup CHAIN of
    * length d costs ~log₂ d rounds. Fully distributed — no edge list
    * is ever collected.
    *
    * Convergence is detected with **one action per round**: the
    * changed-node count rides the cached label frame as an aggregate
    * column (no separate convergence join). Partition count is sized
    * from the edge count. The returned frame is `localCheckpoint`ed —
    * materialized, lineage truncated (20 rounds of join lineage would
    * otherwise replan downstream), and every loop cache released.
    *
    * `pairs` must carry (id_a, id_b); returns (id, cluster_id) for
    * every node incident to an edge.
    */
  def duplicateClusters(pairs: DataFrame, maxIter: Int = 20,
                        reliable: Boolean = false,
                        localThreshold: Long = DefaultCcLocalThreshold): DataFrame =
    duplicateClustersWithRounds(pairs, maxIter, reliable, localThreshold)._1

  /** Directed-edge count at or below which the CC loop short-circuits
    * to a driver-side union-find (4M directed edges = 2M near-dup
    * pairs ≈ 32 MB on the driver). The pointer-doubling loop exists
    * for graphs that DON'T fit a driver — per round it pays two joins,
    * an aggregate, a materialization barrier, and a count action, so
    * on the sparse graphs dedup actually produces (near-dup pairs are
    * ≪ corpus size) the distributed loop is pure fixed overhead. Same
    * adaptive local-fallback idea as AQE's runtime broadcast demotion:
    * the plan is chosen by the measured size, not the operator's worst
    * case, and the result is identical (spec'd both paths).
    */
  val DefaultCcLocalThreshold: Long = 4000000L

  /** Eager materialization + lineage truncation, the per-round barrier
    * both dedup loops depend on (plans quadruple per round without it).
    *
    *   - `reliable = false` (default): `localCheckpoint(true)` —
    *     executor-local block storage. Fastest; correct on local /
    *     single-JVM runs, but on a real cluster an executor loss makes
    *     the truncated lineage unrecoverable and fails the job.
    *   - `reliable = true`: `checkpoint()` (eager) — blocks on the
    *     SparkContext checkpoint directory (HDFS/object store at
    *     cluster scale), surviving executor loss at the cost of one
    *     cluster-FS round-trip per materialization. Requires
    *     `sc.setCheckpointDir(...)`; fails fast with a clear message
    *     otherwise (Spark's own error surfaces mid-job).
    */
  private def materialize(df: DataFrame, reliable: Boolean): DataFrame =
    if (reliable) {
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "reliable = true requires spark.sparkContext.setCheckpointDir(<cluster-fs path>)")
      df.checkpoint()
    } else df.localCheckpoint(true)

  /** [[duplicateClusters]] plus the number of rounds actually run
    * (spec hook for the O(log diameter) bound).
    *
    * FAULT TOLERANCE: per-round materialization goes through
    * [[materialize]] — lineage truncation is mandatory here (plans
    * quadruple per round). The default `reliable = false` uses
    * non-reliable `localCheckpoint(true)` storage: losing an executor
    * loses its blocks and fails the job (Spark cannot recompute
    * truncated lineage). On a real cluster running hours-long 100 TB
    * clustering, set `sc.setCheckpointDir(hdfsPath)` and pass
    * `reliable = true` — same plan shape, adds a cluster-FS round-trip
    * per round. Local/single-JVM runs (tests, bench) cannot lose
    * executors, so the fast path is the right default here.
    */
  def duplicateClustersWithRounds(pairs: DataFrame, maxIter: Int = 20,
                                  reliable: Boolean = false,
                                  localThreshold: Long = DefaultCcLocalThreshold): (DataFrame, Int) = {
    val sc = pairs.sparkSession.sparkContext
    // materialize the pair relation ONCE before symmetrizing: the union
    // references it twice, and near-dup pair generation (inverted-index
    // joins) is far too expensive to recompute per branch. The eager
    // checkpoint also truncates that lineage out of the loop's plans.
    val p = materialize(pairs.select(col("id_a"), col("id_b")), reliable)
    // count scans the checkpointed blocks (no recompute). No distinct()
    // on the symmetrized union: generators emit unique (a<b) pairs so
    // the two branches cannot collide, and even caller-supplied
    // duplicate edges are harmless under a min() aggregate — not worth
    // a shuffle to dedup.
    val edgeCount = p.count() * 2
    if (edgeCount <= localThreshold) {
      // adaptive local fallback (see DefaultCcLocalThreshold): the
      // measured graph fits the driver comfortably — union-find there
      // beats O(log diameter) rounds of cluster jobs outright. Rounds
      // reported as 0 distinguishes the path for callers/specs.
      val spark = pairs.sparkSession
      import spark.implicits._
      val es = p.select(col("id_a").cast("long"), col("id_b").cast("long"))
        .as[(Long, Long)].collect()
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        // path compression
        var c = x
        while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        // union to the smaller root: roots stay the component minimum,
        // matching the distributed loop's min-label semantics
        if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      }
      val out = parent.keys.toSeq.map(id => (id, find(id)))
      return (out.toDF("id", "cluster_id"), 0)
    }
    // per-round fixed task overhead dominates on sparse dedup graphs;
    // size the loop's parallelism from the data: ~1M edges per
    // partition, capped by the cluster's parallelism
    val numParts = math.max(1, math.min(sc.defaultParallelism.toLong,
      edgeCount / 1000000L + 1L).toInt)
    val edges = p
      .union(p.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .repartition(numParts, col("id_a"))
      .cache()

    var labels = edges.select(col("id_a").as("id")).distinct()
      .withColumn("root", col("id"))
      .cache()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // (a) hop: smallest root over the closed neighborhood (least()
      // skips the null from nodes whose neighbors carry no smaller root)
      val nbrMin = labels.as("l")
        .join(edges.as("e"), col("l.id") === col("e.id_a"))
        .groupBy(col("e.id_b").as("id"))
        .agg(min(col("l.root")).as("nbr_root"))
      val hopped = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), least(col("root"), col("nbr_root")).as("root"),
          col("root").as("old_root"))
      // (b) shortcut: root ← root's root (roots are node ids, so the
      // self-join always hits; left + coalesce guards the root row itself)
      val m = hopped.select(col("id").as("m_id"), col("root").as("m_root"))
      // eager localCheckpoint = the round's ONE materialization, and it
      // truncates lineage: hopped and next each reference their input
      // twice, so without truncation the logical plan QUADRUPLES per
      // round (4^20 nodes — analyzer OOM long before any data moves).
      // Truncation also unlinks the previous round's blocks → the
      // ContextCleaner frees them as the old frame goes unreachable.
      val next = materialize(
        hopped.join(m, hopped("root") === col("m_id"), "left")
          .select(col("id"),
            coalesce(col("m_root"), col("root")).as("root"),
            (coalesce(col("m_root"), col("root")) =!= col("old_root"))
              .cast("long").as("changed")),
        reliable)
      // change count scans only the checkpointed blocks (no recompute);
      // coalesce: SUM over an empty node set is NULL, not 0
      val changes = next.agg(coalesce(sum(col("changed")), lit(0L)))
        .first().getLong(0)
      labels.unpersist() // frees the initial cache; no-op on checkpoints
      // the stray `changed` column is projected away at every use site
      labels = next
      converged = changes == 0
      iter += 1
    }
    // the checkpoint made the result self-contained — release the edge
    // cache; nothing the caller holds depends on it
    val result = labels.select(col("id"), col("root").as("cluster_id"))
    edges.unpersist()
    (result, iter)
  }

  /** Embedding near-dup pairs: cosine distance below `maxDistance`,
    * blocked by a coarse partition column (label / cluster id from an
    * ANN index — see [[Ann]]). Within-block pairwise only.
    *
    * CACHE HYGIENE: same contract as [[simhashPairs]] — the projected
    * self-join input is `.cache()`d and callers own eviction
    * (`spark.catalog.clearCache()` between repeated invocations in a
    * long-lived session).
    */
  /** Cross-document duplicate-window spans — the window-granular
    * approximation of exact-substring dedup (Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better"): a
    * w-token window whose space-joined text occurs ≥ 2 times ANYWHERE
    * in the corpus (another document, or again in the same one) marks a
    * duplicated span start. Complements [[graft.operators.TextFilters
    * .dupNgramCharFractions]] (intra-document repetition) with the
    * corpus-level view a substring-dedup pass acts on.
    *
    * Returns one row per input doc: (id, n_windows, n_dup_windows,
    * covered_tokens, total_tokens). `covered_tokens` is the exact size
    * of the union of [p, p+w) over duplicated start positions p,
    * computed with the sorted-lag trick — Σ least(p − lag(p), w) with
    * the first position contributing w — so no per-token explode is
    * ever materialized. Docs shorter than w (or empty) report zeroes.
    *
    * Scale shape: windows explode once per side (hash + position
    * travel, never the window string); the duplicated-hash set is one
    * (hash → count≥2) aggregate with map-side combine; it joins back to
    * positions as a LEFT SEMI on the 48-bit hash — both sides shuffle
    * on the hash, skew bounded by true mega-duplicate windows. The
    * interval union is one window function + aggregate over (id, p) —
    * a single doc-keyed shuffle chain. The explode is recomputed for
    * the two consumers from the column-pruned scan (cheaper at corpus
    * scale than caching terabytes of exploded windows).
    */
  /** (id, p, gh): every w-token window occurrence as (0-based start,
    * 48-bit md5 hash of the space-joined window). Docs shorter than w
    * contribute nothing.
    */
  private def windowPositions(docs: DataFrame, toksCol: String, idCol: String,
                              w: Int): DataFrame = {
    val toks = col(toksCol)
    docs
      .where(size(toks) >= w)
      .select(col(idCol).as("id"),
        explode(transform(sequence(lit(0), size(toks) - w), i =>
          struct(i.as("p"),
            md5Long48(array_join(slice(toks, i + 1, lit(w)), " ")).as("gh")))).as("t"))
      .select(col("id"), col("t.p").as("p"), col("t.gh").as("gh"))
  }

  def duplicateWindowSpans(docs: DataFrame, toksCol: String, idCol: String,
                           w: Int): DataFrame = {
    require(w >= 1, s"window size must be >= 1, got $w")
    val toks = col(toksCol)
    val pos = windowPositions(docs, toksCol, idCol, w)
    val dupHashes = pos.groupBy("gh").agg(count(lit(1)).as("c"))
      .where(col("c") >= 2).select("gh")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("p")
    val cov = pos.join(dupHashes, Seq("gh"), "left_semi")
      .withColumn("d", col("p") - lag("p", 1).over(win))
      .groupBy("id")
      .agg(count(lit(1)).as("n_dup_windows"),
        sum(when(col("d").isNull, lit(w)).otherwise(least(col("d"), lit(w))))
          .as("covered_tokens"))
    docs
      .select(col(idCol).as("id"),
        greatest(size(toks) - w + 1, lit(0)).cast("long").as("n_windows"),
        size(toks).cast("long").as("total_tokens"))
      .join(cov, Seq("id"), "left")
      .select(col("id"), col("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        col("total_tokens"))
  }

  /** Exact-substring dedup at window granularity, first-occurrence-wins
    * (the ACTION of Lee et al. 2021 where [[duplicateWindowSpans]] is
    * the measurement): for every window hash occurring ≥ 2 times in the
    * corpus, the lexicographically smallest (id, p) occurrence is
    * canonical; every OTHER occurrence marks its [p, p+w) for removal
    * in its document. Returns (id, toks, kept) — `kept` is the token
    * array with all removal intervals cut out (a canonical occurrence
    * can still lose tokens to an OVERLAPPING removal interval; interval
    * removal is token-exact, not occurrence-atomic). Docs with nothing
    * to remove pass through unchanged.
    *
    * Scale shape: the canonical pick is one (gh → min(id,p), count)
    * aggregate with map-side combine — NOT a row_number window, which
    * would funnel a mega-duplicate boilerplate hash into one sort
    * partition; the join back on gh can still skew on such a hash, but
    * its build side is one row per key, exactly the shape AQE skew-join
    * splitting handles. Removal positions then collect per doc (bounded
    * by doc length) and the cut is a per-row HOF — no per-token explode.
    */
  def removeDuplicateWindows(docs: DataFrame, toksCol: String, idCol: String,
                             w: Int): DataFrame = {
    require(w >= 1, s"window size must be >= 1, got $w")
    val pos = windowPositions(docs, toksCol, idCol, w)
    val stats = pos.groupBy("gh")
      .agg(min(struct(col("id"), col("p"))).as("can"), count(lit(1)).as("c"))
      .where(col("c") >= 2)
      .select(col("gh"), col("can"))
    val rm = pos.join(stats, Seq("gh"))
      .where(!(col("id") === col("can.id") && col("p") === col("can.p")))
      .select(col("id"), col("p"))
    val lists = rm.groupBy("id").agg(sort_array(collect_list(col("p"))).as("ps"))
    docs.select(col(idCol).as("id"), col(toksCol).as("toks"))
      .join(lists, Seq("id"), "left")
      .select(col("id"), col("toks"),
        when(col("ps").isNull, col("toks"))
          .otherwise(filter(col("toks"), (_, i) =>
            !exists(col("ps"), p => p <= i && i < p + w)))
          .as("kept"))
  }

  def embeddingNearDupPairs(embs: DataFrame, vecCol: String, idCol: String,
                            blockCol: String, maxDistance: Double): DataFrame = {
    // both join sides consume this projection; when the block column is
    // a computed ANN assignment (argmin over centroids) an uncached
    // frame would evaluate it once per side
    val e = embs.select(col(idCol).as("id"), col(blockCol).as("blk"), col(vecCol).as("v"))
      .cache()
    e.as("a").join(e.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(cosineDistance(col("a.v"), col("b.v")), 6).as("cos_dist"))
      .filter(col("cos_dist") <= maxDistance)
  }

  /** SemDeDup-style semantic pruning (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication"): within each ANN cluster, a vector is pruned iff
    * some LOWER-id vector sits within `maxDistance` cosine distance —
    * the deterministic keep-lowest-id variant of the paper's
    * keep-one-per-ε-group rule (the paper keeps the member farthest
    * from the centroid; any fixed representative choice gives the same
    * dedup power, and min-id is retry- and engine-stable). Returns the
    * input columns plus a `pruned` flag.
    *
    * Scale shape: the pairwise step is cluster-blocked
    * ([[embeddingNearDupPairs]] — Σ|cluster|² work, linear when the
    * cluster count scales with the corpus); the pruned-id set (≤ one
    * row per input vector, usually far fewer) is the only thing joined
    * back, as a build side onto the corpus scan. The distance filter
    * applies to the 6-decimal-rounded distance, keeping the ε boundary
    * engine-exact.
    */
  def semanticPruneFlags(embs: DataFrame, vecCol: String, idCol: String,
                         blockCol: String, maxDistance: Double): DataFrame = {
    val pruned = embeddingNearDupPairs(embs, vecCol, idCol, blockCol, maxDistance)
      .select(col("id_b").as("_pid")).distinct()
    embs.join(pruned, embs(idCol) === col("_pid"), "left")
      .withColumn("pruned", col("_pid").isNotNull)
      .drop("_pid")
  }
}
