package graft.queries

import graft.Tables
import graft.operators.{Ann, Dedup}
import org.apache.spark.sql.functions._

/** Deduplication query surface over `documents` / `embeddings` (driver
  * mandate). Thresholds are calibrated against the fixtures: the corpus
  * contains genuine near-duplicates (max 3-gram Jaccard ≈ 0.99) but no
  * exact duplicates; embeddings are well-separated (min cosine distance
  * ≈ 0.53), so the embedding query reports closest pairs rather than
  * thresholding into an empty set.
  */
object DedupQueries {

  /** Shared DuckDB CTE: doc shingles (k=3) from the token pipeline. */
  private[queries] val duckShingles =
    s"""${Duck.docToks}, sh AS (
       |  SELECT doc_id, ${Duck.shingles(3)} AS shingles FROM tt
       |)""".stripMargin

  private val exact = QueryDef(
    "dedup_exact",
    "Exact dedup histogram: group documents by normalized-text md5, " +
      "report group-size distribution. Shuffles only (fp, id) pairs — " +
      "text never leaves the map side.",
    (s, dir) => {
      val d = Tables.documentsSpread(s, dir)
      Dedup.exactGroups(d, "text", "doc_id")
        .groupBy(col("group_size"))
        .agg(count(lit(1)).as("n_groups"), min(col("canonical_id")).as("min_canonical_id"))
        .orderBy(col("group_size"))
    },
    Some(s"""
      |${Duck.docToks}, g AS (
      |  SELECT md5(norm) AS fp, min(doc_id) AS canonical_id, count(*) AS group_size
      |  FROM tt GROUP BY fp
      |)
      |SELECT group_size, count(*) AS n_groups, min(canonical_id) AS min_canonical_id
      |FROM g GROUP BY group_size ORDER BY group_size
      """.stripMargin.trim))

  /** Shared DuckDB CTE tail: df-capped inverted index (mirrors
    * `Dedup.DefaultMaxShingleDf` — the Σ df² guard; n_sh keeps the FULL
    * set size, the cap only prunes pair generation).
    */
  /** [[duckCappedIndex]] with the `ex` leg MATERIALIZED — for oracles
    * that self-join `ex` under further multiply-referenced CTEs (the
    * corpus-scale HyperANF chain), where DuckDB's per-reference CTE
    * inlining would recompute the shingle explosion once per round
    * (>60 GB temp spill at sf10; see ROUND19_NOTES).
    */
  private[queries] lazy val duckCappedIndexMaterialized: String =
    duckCappedIndex
      .replace("ex0 AS (", "ex0 AS MATERIALIZED (")
      .replace("), ex AS (", "), ex AS MATERIALIZED (")

  private[queries] val duckCappedIndex =
    s"""ex0 AS (
       |  SELECT doc_id, len(shingles)::BIGINT AS n_sh,
       |         unnest(list_transform(shingles, x -> ('0x' || substring(md5(x), 1, 12))::BIGINT)) AS s FROM sh
       |), ex AS (
       |  SELECT * FROM ex0
       |  WHERE s IN (SELECT s FROM ex0 GROUP BY s HAVING count(*) <= ${Dedup.DefaultMaxShingleDf})
       |)""".stripMargin

  /** The Jaccard ≥ 0.3 near-dup pair graph (k=3 shingles, df-capped
    * inverted-index blocking), MEMOIZED as a per-(fixture, JVM) parquet
    * table — the [[StatQueries.coPurchaseEdges]] single-builder pattern
    * applied to the dedup stack: four registered queries consume this
    * exact relation (dedup_clusters, pipeline_canonical_docs,
    * dedup_source_matrix, graph_hyperanf_docs), and before the memo each
    * re-paid the shingle → capped-inverted-index → Σ df² pair join.
    * The build is deterministic (md5 shingle hashes, exact integer
    * counts, round-at-6 Jaccard), so the memo is invisible to the hash
    * gate; every consumer's oracle still replays the full shingle →
    * pair pipeline in SQL. At 100 TB this is the materialize-the-
    * pair-graph-once pattern a dedup pipeline runs anyway — the pair
    * table is the artifact, not the query (guide §1.2: don't recompute
    * what four operators share).
    */
  private[queries] def jaccardPairs03(s: org.apache.spark.sql.SparkSession,
                                      dir: String): org.apache.spark.sql.DataFrame = {
    val table = TmpStores.memoizedTable("graft_jacpairs03", dir) { root =>
      val d = Tables.documentsSpread(s, dir)
      val path = s"$root/pairs"
      Dedup.ngramJaccardPairs(d, "text", "doc_id", shingleK = 3,
          threshold = 0.3, maxShingleDf = Some(Dedup.DefaultMaxShingleDf))
        .write.parquet(path)
      path
    }
    s.read.parquet(table)
  }

  private val ngram = QueryDef(
    "dedup_ngram_jaccard",
    "N-gram (3-shingle) Jaccard near-dup pairs ≥ 0.1. Blocked by shared " +
      "shingles: a pair is only materialized if it shares ≥1 shingle, so " +
      "cost is Σ df(shingle)² over the inverted index, not n² — with hot " +
      "shingles capped at df ≤ " + Dedup.DefaultMaxShingleDf +
      " (the 100 TB guard; oracle mirrors the cap).",
    (s, dir) => {
      val d = Tables.documentsSpread(s, dir)
      Dedup.ngramJaccardPairs(d, "text", "doc_id", shingleK = 3, threshold = 0.1,
          maxShingleDf = Some(Dedup.DefaultMaxShingleDf))
        .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
    },
    Some(s"""
      |$duckShingles, $duckCappedIndex, pairs AS (
      |  SELECT x.doc_id AS id_a, y.doc_id AS id_b, x.n_sh AS na, y.n_sh AS nb, count(*) AS common
      |  FROM ex x JOIN ex y ON x.s = y.s AND x.doc_id < y.doc_id
      |  GROUP BY 1, 2, 3, 4
      |)
      |SELECT id_a, id_b, round(common::DOUBLE / (na + nb - common)::DOUBLE, 6) AS jaccard
      |FROM pairs WHERE round(common::DOUBLE / (na + nb - common)::DOUBLE, 6) >= 0.1
      |ORDER BY jaccard DESC, id_a, id_b
      """.stripMargin.trim))

  private val containment = QueryDef(
    "dedup_ngram_containment",
    "Directional n-gram CONTAINMENT near-dup pairs (Broder 1997's " +
      "second resemblance measure) — the asymmetric relation " +
      "dedup_ngram_jaccard systematically misses: a short document " +
      "quoted whole inside a long one has containment(short→long) ≈ 1 " +
      "while Jaccard ≈ |short|/|long| ≈ 0, and quote-inclusion / " +
      "boilerplate-wrapper pages are exactly what a training-data " +
      "pipeline needs to catch beside symmetric dups. Same capped " +
      "shingle inverted-index blocking (Σ df² cost, hot shingles " +
      "dropped via the bounded hot-list broadcast — oracle mirrors " +
      "the cap); both directions + the max per pair, max ≥ 0.5, " +
      "top-30 by (max desc, id_a, id_b).",
    (s, dir) => {
      val d = Tables.documentsSpread(s, dir)
      Dedup.ngramContainmentPairs(d, "text", "doc_id", shingleK = 3,
          threshold = 0.5, maxShingleDf = Some(Dedup.DefaultMaxShingleDf))
        .orderBy(col("max_containment").desc, col("id_a"), col("id_b"))
        .limit(30)
    },
    Some(s"""
      |$duckShingles, $duckCappedIndex, pairs AS (
      |  SELECT x.doc_id AS id_a, y.doc_id AS id_b, x.n_sh AS na, y.n_sh AS nb, count(*) AS n_common
      |  FROM ex x JOIN ex y ON x.s = y.s AND x.doc_id < y.doc_id
      |  GROUP BY 1, 2, 3, 4
      |), c AS (
      |  SELECT id_a, id_b, n_common, na, nb,
      |         round(n_common::DOUBLE / na::DOUBLE, 6) AS contain_a_in_b,
      |         round(n_common::DOUBLE / nb::DOUBLE, 6) AS contain_b_in_a
      |  FROM pairs
      |), m AS (
      |  SELECT *, greatest(contain_a_in_b, contain_b_in_a) AS max_containment
      |  FROM c
      |)
      |SELECT id_a, id_b, n_common, na, nb, contain_a_in_b, contain_b_in_a,
      |       max_containment
      |FROM m WHERE max_containment >= 0.5
      |ORDER BY max_containment DESC, id_a, id_b LIMIT 30
      """.stripMargin.trim))

  /** Shared DuckDB CTE chain mirroring `Dedup.minhashSignatures` +
    * `minhashCandidatePairsFromShingles` (12 hashes, 4×3 bands): `sig`
    * holds the signatures, `cand` the distinct LSH candidate pairs —
    * consumed by both dedup_minhash_lsh and dedup_minhash_estimate (no
    * copy drift).
    */
  private val duckMinhashCand =
    """hs AS (
      |  SELECT doc_id, list_transform(shingles,
      |    x -> ('0x' || substring(md5(x), 1, 8))::BIGINT) AS h
      |  FROM sh
      |), sig AS (
      |  SELECT doc_id, list_transform(range(12),
      |    s -> list_min(list_transform(h,
      |      v -> (v * (((s + 1) * 2654435761) % 1073741789)
      |            + (((s + 1) * 97531) % 1073741789)) % 2147483647))) AS sg
      |  FROM hs
      |), bands AS (
      |  SELECT doc_id, unnest(list_transform(range(4),
      |    b -> b::VARCHAR || ':' || md5(array_to_string(list_slice(sg, b*3+1, b*3+3), ',')))) AS band
      |  FROM sig
      |), cand AS (
      |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      |  FROM bands x JOIN bands y ON x.band = y.band AND x.doc_id < y.doc_id
      |)""".stripMargin

  /** Shared CTE tail: exact shingle-Jaccard counts for the `cand` pairs
    * (mirrors `Dedup.jaccardOnPairsFromShingles`).
    */
  private val duckCandJaccard =
    """ex AS (
      |  SELECT doc_id, len(shingles)::BIGINT AS n_sh,
      |         unnest(list_transform(shingles, x -> ('0x' || substring(md5(x), 1, 12))::BIGINT)) AS s FROM sh
      |), common AS (
      |  SELECT x.doc_id AS id_a, y.doc_id AS id_b, x.n_sh AS na, y.n_sh AS nb, count(*) AS n_common
      |  FROM ex x JOIN ex y ON x.s = y.s AND x.doc_id < y.doc_id
      |  JOIN cand c ON c.id_a = x.doc_id AND c.id_b = y.doc_id
      |  GROUP BY 1, 2, 3, 4
      |)""".stripMargin

  private val minhash = QueryDef(
    "dedup_minhash_lsh",
    "MinHash(12) + LSH(4 bands × 3 rows) candidate pairs, verified with " +
      "exact shingle Jaccard. Signatures are one shuffle-free HOF pass; " +
      "only (band_key, id) shuffles for the candidate join.",
    (s, dir) => {
      val d = Tables.documentsSpread(s, dir)
      // one cached shingle relation feeds BOTH candidate generation and
      // the Jaccard verify (tokenize+shingle once); the candidate pairs
      // are cached because they are referenced 3× downstream (both
      // semi-join sides + the id restriction)
      val sh = Dedup.shingleRelation(d, "text", "doc_id", shingleK = 3).cache()
      val cands = Dedup.minhashCandidatePairsFromShingles(sh, numHashes = 12, numBands = 4)
        .cache()
      Dedup.jaccardOnPairsFromShingles(sh, cands)
        .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
    },
    Some(s"""
      |$duckShingles, $duckMinhashCand, $duckCandJaccard
      |SELECT id_a, id_b, round(n_common::DOUBLE / (na + nb - n_common)::DOUBLE, 6) AS jaccard
      |FROM common ORDER BY jaccard DESC, id_a, id_b
      """.stripMargin.trim))

  private val minhashEstimate = QueryDef(
    "dedup_minhash_estimate",
    "MinHash estimator quality, in-engine: for every LSH candidate pair, " +
      "the signature-agreement Jaccard ESTIMATE (matching positions / " +
      "12) next to the exact shingle Jaccard and the absolute error — " +
      "the tuning artifact for picking numHashes/bands on a real corpus. " +
      "One signature relation feeds candidate generation AND the " +
      "estimate; the exact verify runs only on the (sparse) candidates, " +
      "so the added cost over dedup_minhash_lsh is two id-keyed joins " +
      "of 12-int signature rows.",
    (s, dir) => {
      val d = Tables.documentsSpread(s, dir)
      val sh = Dedup.shingleRelation(d, "text", "doc_id", shingleK = 3).cache()
      // consumed twice (sig_a and sig_b join legs) — without a barrier
      // the 12-hash HOF signature pass ran once per leg (r21, guide
      // §1.2). |docs| × 12 ints, bounded.
      val sigs = Dedup.minhashSignatures(sh, numHashes = 12).localCheckpoint()
      val cands = Dedup.minhashCandidatePairsFromShingles(sh, numHashes = 12, numBands = 4)
        .cache()
      val exact = Dedup.jaccardOnPairsFromShingles(sh, cands)
      val est = cands
        .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
        .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          round(size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
            b => b)).cast("double") / 12.0, 6).as("est_jaccard"))
      est.join(exact, Seq("id_a", "id_b"))
        .select(col("id_a"), col("id_b"), col("est_jaccard"), col("jaccard"),
          round(abs(col("est_jaccard") - col("jaccard")), 6).as("abs_err"))
        .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
    },
    Some(s"""
      |$duckShingles, $duckMinhashCand, $duckCandJaccard, est AS (
      |  SELECT c.id_a, c.id_b,
      |         len(list_filter(range(12), i -> sa.sg[i+1] = sb.sg[i+1]))::BIGINT AS matches
      |  FROM cand c JOIN sig sa ON sa.doc_id = c.id_a
      |  JOIN sig sb ON sb.doc_id = c.id_b
      |)
      |SELECT m.id_a, m.id_b,
      |       round(matches::DOUBLE / 12.0, 6) AS est_jaccard,
      |       round(n_common::DOUBLE / (na + nb - n_common)::DOUBLE, 6) AS jaccard,
      |       round(abs(round(matches::DOUBLE / 12.0, 6)
      |                 - round(n_common::DOUBLE / (na + nb - n_common)::DOUBLE, 6)), 6) AS abs_err
      |FROM common m JOIN est ON m.id_a = est.id_a AND m.id_b = est.id_b
      |ORDER BY jaccard DESC, m.id_a, m.id_b
      """.stripMargin.trim))

  private val simhash = QueryDef(
    "dedup_simhash",
    "SimHash near-dup: 48-bit signatures banded into 4×12-bit chunks for " +
      "blocking, exact hamming verify, 30 closest pairs. Signature pass " +
      "is shuffle-free; the band join shuffles only (band, id, sig).",
    (s, dir) => {
      val d = Tables.documentsSpread(s, dir)
      Dedup.simhashPairs(d, "text", "doc_id", maxHamming = 48)
        .orderBy(col("hamming"), col("id_a"), col("id_b"))
        .limit(30)
    },
    Some(s"""
      |${Duck.docToks}, tok AS (
      |  SELECT doc_id, unnest(list_distinct(toks)) AS t FROM tt
      |), h AS (
      |  SELECT doc_id, ${Duck.md5Long48("t")} AS hv FROM tok
      |), bits AS (
      |  SELECT doc_id, b, sum(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
      |  FROM h CROSS JOIN (SELECT generate_series AS b FROM generate_series(0, 47))
      |  GROUP BY doc_id, b
      |), sim AS (
      |  SELECT doc_id, sum(CASE WHEN vote > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS sig
      |  FROM bits GROUP BY doc_id
      |), bands AS (
      |  SELECT doc_id, sig, unnest(list_transform(range(4),
      |    b -> b::VARCHAR || ':' || ((sig >> (b*12)) & 4095)::VARCHAR)) AS band
      |  FROM sim
      |), cand AS (
      |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
      |         bit_count(xor(x.sig, y.sig))::BIGINT AS hamming
      |  FROM bands x JOIN bands y ON x.band = y.band AND x.doc_id < y.doc_id
      |)
      |SELECT id_a, id_b, hamming FROM cand
      |ORDER BY hamming, id_a, id_b LIMIT 30
      """.stripMargin.trim))

  /** DuckDB sequential-order L2 distance (matches `graft.functions.L2Distance`). */
  private def duckL2(a: String, b: String): String =
    s"sqrt(list_sum(list_transform(range(len($a)), i -> (($a)[i+1] - ($b)[i+1]) * (($a)[i+1] - ($b)[i+1]))))"

  /** The corpus-dependent block count per fixture dir, plus which dir
    * ran last — read by the late-bound oracle (the SQL must mirror the
    * run's own nlist; a single unkeyed slot would let a different-SF
    * run in the same JVM poison the dump). Same shape as the KMeans
    * late-oracle store in VectorQueries.
    */
  private object EmbBlockStore {
    val nlists = scala.collection.concurrent.TrieMap.empty[String, Int]
    @volatile var lastDir: Option[String] = None
  }

  /** The run-scaled block count (⌈n/1000⌉, min 16 — see embCos querydoc)
    * recorded for the late-bound oracles.
    */
  private def scaledNlist(s: org.apache.spark.sql.SparkSession, dir: String): Int = {
    val nlist = math.max(16,
      math.ceil(Tables.embeddings(s, dir).count().toDouble / 1000.0).toInt)
    EmbBlockStore.nlists(dir) = nlist
    EmbBlockStore.lastDir = Some(dir)
    nlist
  }

  /** Shared late-oracle CTE: seeded-centroid cluster assignment of the
    * embeddings table (SQL mirror of `Ann.seededCentroids` +
    * `Ann.assignClusters` at the run's nlist) — `e(vec_id, embedding,
    * cluster_id)`. Shared by both cluster-blocked embedding queries so
    * the assignment SQL can't drift between them.
    */
  private def duckClusteredEmb(nlist: Int): String =
    s"""WITH cents AS (
       |  SELECT vec_id AS cid, embedding::DOUBLE[] AS c FROM embeddings WHERE vec_id < $nlist
       |), e AS (
       |  SELECT vec_id, embedding, cid AS cluster_id FROM (
       |    SELECT emb.vec_id, emb.embedding, c.cid,
       |           row_number() OVER (PARTITION BY emb.vec_id
       |                              ORDER BY ${duckL2("emb.embedding::DOUBLE[]", "c.c")}, c.cid) AS rn
       |    FROM embeddings emb CROSS JOIN cents c
       |  ) WHERE rn = 1
       |), p AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |         round(1.0 - list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
       |           (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
       |            sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) AS cos_dist
       |  FROM e a JOIN e b ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
       |)""".stripMargin

  private val embCos = QueryDef(
    "dedup_embedding_cosine",
    "Embedding near-dup scan: 20 closest pairs by cosine distance, " +
      "blocked on the ANN IVF cluster id (seeded centroids — operators" +
      ".Ann). nlist SCALES with the corpus (⌈n/1000⌉, min 16): blocked " +
      "pairwise work is n²/nlist, so a fixed block count is quadratic " +
      "in disguise — nlist ∝ n makes it n·(block size), linear. " +
      "(Measured: fixed nlist=16 was 61× for the 10× sf1→sf10 decade; " +
      "scaled blocking is ~linear.) The blocking key is the SAME " +
      "partition column the IVF index stores by, so at 100 TB the " +
      "pairwise work is per-partition-local. The oracle is late-bound: " +
      "it embeds the run's actual nlist.",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val nlist = scaledNlist(s, dir)
      val cents = Ann.seededCentroids(e, "embedding", "vec_id", nlist = nlist)
      val indexed = Ann.assignClusters(e, "embedding", cents)
      Dedup.embeddingNearDupPairs(indexed, "embedding", "vec_id", "cluster_id", maxDistance = 2.0)
        .orderBy(col("cos_dist"), col("id_a"), col("id_b"))
        .limit(20)
    },
    oracle = None,
    oracleLate = Some(() => EmbBlockStore.lastDir.flatMap(EmbBlockStore.nlists.get).map { nlist =>
      s"""
      |${duckClusteredEmb(nlist)}
      |SELECT id_a, id_b, cos_dist FROM p
      |ORDER BY cos_dist, id_a, id_b LIMIT 20
      """.stripMargin.trim
    }))

  private val semPrune = QueryDef(
    "dedup_semantic_prune",
    "SemDeDup-style semantic pruning (Abbas et al. 2023): within each " +
      "ANN cluster (seeded centroids, run-scaled nlist — same blocking " +
      "as dedup_embedding_cosine), prune every vector with a lower-id " +
      "neighbor at cosine distance ≤ 0.62 — the deterministic " +
      "keep-lowest-id variant of keep-one-per-ε-group. ε sits at the " +
      "fixture's 0.1% closest-pair quantile (the corpus has no true " +
      "near-dups — SURVEY §6), exercising a non-vacuous boundary. " +
      "Output: per-cluster kept/pruned counts + exact pruned-id " +
      "checksum (all-integer — zero float-parity surface beyond the " +
      "6-decimal ε boundary, which both engines compare on the rounded " +
      "distance).",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val nlist = scaledNlist(s, dir)
      val cents = Ann.seededCentroids(e, "embedding", "vec_id", nlist = nlist)
      val indexed = Ann.assignClusters(e, "embedding", cents)
      Dedup.semanticPruneFlags(indexed, "embedding", "vec_id", "cluster_id",
          maxDistance = 0.62)
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(when(col("pruned"), 1L).otherwise(0L)).as("n_pruned"),
          coalesce(sum(when(col("pruned"), col("vec_id"))), lit(0L)).as("pruned_id_sum"))
        .orderBy(col("cluster_id"))
    },
    oracle = None,
    oracleLate = Some(() => EmbBlockStore.lastDir.flatMap(EmbBlockStore.nlists.get).map { nlist =>
      s"""
      |${duckClusteredEmb(nlist)}, pr AS (
      |  SELECT DISTINCT id_b FROM p WHERE cos_dist <= 0.62
      |)
      |SELECT cluster_id, count(*) AS n_vecs,
      |       CAST(count(pr.id_b) AS BIGINT) AS n_pruned,
      |       CAST(COALESCE(SUM(pr.id_b), 0) AS BIGINT) AS pruned_id_sum
      |FROM e LEFT JOIN pr ON e.vec_id = pr.id_b
      |GROUP BY cluster_id ORDER BY cluster_id
      """.stripMargin.trim
    }))

  private val clusters = QueryDef(
    "dedup_clusters",
    "Duplicate clusters: connected components over the Jaccard ≥ 0.3 " +
      "near-dup pair graph (pointer-doubling min-label propagation, " +
      "O(log diameter) rounds; oracle = recursive transitive closure). " +
      "cluster_id = smallest member id.",
    (s, dir) => {
      val pairs = jaccardPairs03(s, dir)
      Dedup.duplicateClusters(pairs)
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"), max(col("id")).as("max_member_id"))
        .orderBy(col("cluster_id"))
    },
    Some(s"""
      |$duckShingles, $duckCappedIndex, jpairs AS (
      |  SELECT x.doc_id AS id_a, y.doc_id AS id_b, x.n_sh AS na, y.n_sh AS nb, count(*) AS common
      |  FROM ex x JOIN ex y ON x.s = y.s AND x.doc_id < y.doc_id
      |  GROUP BY 1, 2, 3, 4
      |), edges0 AS (
      |  SELECT id_a, id_b FROM jpairs
      |  WHERE round(common::DOUBLE / (na + nb - common)::DOUBLE, 6) >= 0.3
      |), edges AS (
      |  SELECT id_a, id_b FROM edges0
      |  UNION SELECT id_b, id_a FROM edges0
      |), closure AS (
      |  WITH RECURSIVE cl(a, b) AS (
      |    SELECT DISTINCT id_a, id_a FROM edges
      |    UNION
      |    SELECT cl.a, e.id_b FROM cl JOIN edges e ON cl.b = e.id_a
      |  )
      |  SELECT a, b FROM cl
      |)
      |SELECT min_b AS cluster_id, count(*) AS n_members, max(a) AS max_member_id
      |FROM (SELECT a, min(b) AS min_b FROM closure GROUP BY a)
      |GROUP BY min_b ORDER BY cluster_id
      """.stripMargin.trim))

  private val canonical = QueryDef(
    "pipeline_canonical_docs",
    "Canonical-document selection — the end-use of the dedup stack: " +
      "near-dup clusters (Jaccard ≥ 0.3 → connected components) keep " +
      "only their highest-quality member (tiebreak doc_id); docs with " +
      "no near-dup edge are their own canonical. One row per surviving " +
      "document.",
    (s, dir) => {
      import graft.operators.TextAnalysis
      import org.apache.spark.sql.expressions.Window
      val d = Tables.documentsSpread(s, dir)
        .withColumn("norm", TextAnalysis.normalize(col("text")))
        .withColumn("toks", TextAnalysis.tokensFromNorm(col("norm")))
        .withColumn("quality",
          round(TextAnalysis.qualityScoreFromParts(col("toks"), col("norm")), 6))
      val pairs = jaccardPairs03(s, dir)
      val clustered = Dedup.duplicateClusters(pairs).withColumnRenamed("id", "doc_id")
      val w = Window.partitionBy(col("cluster_id"))
        .orderBy(col("quality").desc, col("doc_id"))
      d.select(col("doc_id"), col("quality"))
        .join(clustered, Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
        .withColumn("rnk", row_number().over(w))
        .withColumn("n_members",
          count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
        .filter(col("rnk") === 1)
        .select(col("cluster_id"), col("doc_id").as("canonical_doc_id"),
          col("n_members"), col("quality"))
        .orderBy(col("cluster_id"))
    },
    Some {
      import graft.operators.TextAnalysis.stopwords
      s"""
      |$duckShingles, $duckCappedIndex, jpairs AS (
      |  SELECT x.doc_id AS id_a, y.doc_id AS id_b, x.n_sh AS na, y.n_sh AS nb, count(*) AS common
      |  FROM ex x JOIN ex y ON x.s = y.s AND x.doc_id < y.doc_id
      |  GROUP BY 1, 2, 3, 4
      |), edges0 AS (
      |  SELECT id_a, id_b FROM jpairs
      |  WHERE round(common::DOUBLE / (na + nb - common)::DOUBLE, 6) >= 0.3
      |), edges AS (
      |  SELECT id_a, id_b FROM edges0
      |  UNION SELECT id_b, id_a FROM edges0
      |), closure AS (
      |  WITH RECURSIVE cl(a, b) AS (
      |    SELECT DISTINCT id_a, id_a FROM edges
      |    UNION
      |    SELECT cl.a, e.id_b FROM cl JOIN edges e ON cl.b = e.id_a
      |  )
      |  SELECT a, b FROM cl
      |), clu AS (
      |  SELECT a AS doc_id, min(b) AS cluster_id FROM closure GROUP BY a
      |), q AS (
      |  SELECT doc_id,
      |         round(CASE WHEN len(toks) = 0 THEN 0.0 ELSE
      |           0.4 * least(1.0, ${Duck.hits(stopwords("en"))}::DOUBLE * 8.0 / len(toks)::DOUBLE)
      |           + 0.3 * least(1.0, len(toks)::DOUBLE / 50.0)
      |           + 0.3 * (1.0 - ${Duck.punct}::DOUBLE / length(norm)::DOUBLE) END, 6) AS quality
      |  FROM tt
      |), j AS (
      |  SELECT q.doc_id, COALESCE(clu.cluster_id, q.doc_id) AS cluster_id, q.quality
      |  FROM q LEFT JOIN clu USING (doc_id)
      |), r AS (
      |  SELECT *,
      |         row_number() OVER (PARTITION BY cluster_id ORDER BY quality DESC, doc_id) AS rnk,
      |         count(*) OVER (PARTITION BY cluster_id) AS n_members
      |  FROM j
      |)
      |SELECT cluster_id, doc_id AS canonical_doc_id, n_members, quality
      |FROM r WHERE rnk = 1 ORDER BY cluster_id
      """.stripMargin.trim
    })

  /** CTE chain (appended after [[duckShingles]]) recomputing
    * `Dedup.incrementalDedupFlags` (12 minhashes, 4 bands, 3-shingles):
    * MinHash signatures → LSH bands → incoming×existing candidates →
    * exact Jaccard → best existing match per incoming doc (`best`), plus
    * exact fingerprints (`fpx`). `incoming(col)` renders the
    * incoming-batch predicate — shared by the batch `dedup_incremental`
    * oracle and the streaming `stream_ingest_dedup` oracle so the two
    * gates can never drift.
    *
    * The Jaccard verify mirrors the Spark side's candidate-doc
    * restriction (`jaccardOnPairsFromShingles` semi-joins candIds BEFORE
    * its shingle join) and drives the intersection count from the `cand`
    * pair, so the count's cost is |cand| × shingles-per-doc. An earlier
    * revision self-joined the UNRESTRICTED exploded index (Σ df² over
    * the whole corpus) — semantically identical, but at synthesized sf10
    * (5M docs, 26M exploded shingles, hot shared shingles) it spilled
    * past a 94 GB filesystem where the restricted form touches ~1M rows.
    *
    * The `AS MATERIALIZED` hints are load-bearing, not cosmetic: DuckDB
    * inlines plain CTEs per reference, which (a) re-expands the whole
    * signature→bands→cand chain once per consumer (four band-join
    * subtrees in one EXPLAIN) and (b) frees the optimizer to run the
    * shingle equi-join BEFORE the pair restriction — the exact Σ df²
    * blowup the restriction exists to prevent. Materializing cand / cids
    * / ex / pa pins the evaluation order: `common` is a single
    * two-relation join on (doc_id, s), output bounded by |pa|.
    * Semantics are unchanged (the hint only forces evaluation).
    */
  private[queries] def duckIncrementalCtes(incoming: String => String): String =
    s"""hs AS (
       |  SELECT doc_id, list_transform(shingles,
       |    x -> ('0x' || substring(md5(x), 1, 8))::BIGINT) AS h
       |  FROM sh
       |), sig AS (
       |  SELECT doc_id, list_transform(range(12),
       |    s -> list_min(list_transform(h,
       |      v -> (v * (((s + 1) * 2654435761) % 1073741789)
       |            + (((s + 1) * 97531) % 1073741789)) % 2147483647))) AS sg
       |  FROM hs
       |), bands AS (
       |  SELECT doc_id, unnest(list_transform(range(4),
       |    b -> b::VARCHAR || ':' || md5(array_to_string(list_slice(sg, b*3+1, b*3+3), ',')))) AS band
       |  FROM sig
       |), cand AS MATERIALIZED (
       |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM bands x JOIN bands y ON x.band = y.band
       |  WHERE ${incoming("x.doc_id")} AND NOT (${incoming("y.doc_id")})
       |), cids AS MATERIALIZED (
       |  SELECT id_a AS doc_id FROM cand UNION SELECT id_b FROM cand
       |), ex AS MATERIALIZED (
       |  SELECT doc_id, len(shingles)::BIGINT AS n_sh,
       |         unnest(list_transform(shingles, x -> ('0x' || substring(md5(x), 1, 12))::BIGINT)) AS s
       |  FROM sh WHERE doc_id IN (SELECT doc_id FROM cids)
       |), pa AS MATERIALIZED (
       |  SELECT c.id_a, c.id_b, xa.n_sh AS na, xa.s
       |  FROM cand c JOIN ex xa ON xa.doc_id = c.id_a
       |), common AS (
       |  SELECT p.id_a, p.id_b, p.na AS na, xb.n_sh AS nb, count(*) AS n_common
       |  FROM pa p JOIN ex xb ON xb.doc_id = p.id_b AND xb.s = p.s
       |  GROUP BY 1, 2, 3, 4
       |), jac AS (
       |  SELECT id_a, id_b,
       |         round(n_common::DOUBLE / (na + nb - n_common)::DOUBLE, 6) AS jaccard
       |  FROM common
       |), best AS (
       |  SELECT id_a AS id, id_b AS best_match_id, jaccard AS best_jaccard
       |  FROM jac
       |  QUALIFY row_number() OVER (PARTITION BY id_a ORDER BY jaccard DESC, id_b) = 1
       |), fpx AS MATERIALIZED (
       |  SELECT doc_id, md5(norm) AS fp FROM tt
       |)""".stripMargin

  /** Exact-dup EXISTS predicate over `fpx` for a row aliased `tt` that
    * itself comes FROM `fpx` (so `tt.fp` is in scope). The final selects
    * deliberately read the narrow materialized `fpx` (doc_id, fp) rather
    * than `tt`: `tt` carries `norm` (KB of text) and `toks` (a ~400
    * string list) per row, and hauling those through 5M-row hash joins
    * is tens of GB of spill at sf10 for columns the output never uses.
    * `fpx` has exactly one row per `tt` row (doc_id is the documents
    * PK), so the rewrite is value-identical.
    */
  private[queries] def duckExactDupExists(incoming: String => String): String =
    s"""(EXISTS (SELECT 1 FROM fpx e
       |                WHERE NOT (${incoming("e.doc_id")})
       |                  AND e.fp = tt.fp))""".stripMargin

  private val incremental = QueryDef(
    "dedup_incremental",
    "Incremental ingest dedup — the 100 TB production shape: the " +
      "incoming batch (doc_id ≡ 0 mod 5) is checked against the " +
      "existing corpus only (fingerprint semi-join for exact; incoming-" +
      "bands × existing-bands MinHash LSH + Jaccard verify for near) — " +
      "existing×existing is never re-paired. One row per incoming doc " +
      "with its best existing match.",
    (s, dir) => {
      val d = Tables.documentsSpread(s, dir)
      Dedup.incrementalDedupFlags(d, "text", "doc_id",
          isNew = pmod(col("doc_id"), lit(5)) === 0,
          shingleK = 3, numHashes = 12, numBands = 4, threshold = 0.5)
        .orderBy(col("id"))
    },
    Some {
      val inc = (c: String) => s"$c % 5 = 0"
      s"""
      |$duckShingles, ${duckIncrementalCtes(inc)}
      |SELECT tt.doc_id AS id,
      |       ${duckExactDupExists(inc)} AS is_exact_dup,
      |       best.best_match_id, best.best_jaccard,
      |       COALESCE(best.best_jaccard >= 0.5, false) AS is_near_dup
      |FROM fpx tt LEFT JOIN best ON tt.doc_id = best.id
      |WHERE tt.doc_id % 5 = 0 ORDER BY id
      """.stripMargin.trim
    })

  private val sourceMatrix = QueryDef(
    "dedup_source_matrix",
    "Cross-source contamination matrix: near-dup pairs (Jaccard ≥ 0.3) " +
      "aggregated to (source_a, source_b) counts — which feeds " +
      "duplicate across which, the view that decides source-level " +
      "dedup policy. The near-dup pair list is the SPARSE side — it, " +
      "not the corpus-sized (doc_id, source) dimension, is what gets " +
      "broadcast: the corpus stays the streamed probe side of both " +
      "joins, so nothing O(|corpus|) ever crosses the network or parks " +
      "on the driver. Pair endpoints are canonicalized (min source " +
      "first) so the matrix is triangular.",
    (s, dir) => {
      val d = Tables.documentsSpread(s, dir)
      val pairs = jaccardPairs03(s, dir)
      val src = d.select(col("doc_id"), col("source"))
      // broadcast(pairs), never broadcast(src): src is O(|corpus|) rows
      // (driver OOM at 100 TB); pairs is bounded by the near-dup rate.
      // The second join broadcasts the (pairs ⋈ source_a) result, which
      // has exactly |pairs| rows — still the sparse side.
      val withA = broadcast(pairs)
        .join(src.as("sa"), col("id_a") === col("sa.doc_id"))
        .select(col("id_b"), col("sa.source").as("src_a"))
      broadcast(withA)
        .join(src.as("sb"), col("id_b") === col("sb.doc_id"))
        .select(least(col("src_a"), col("sb.source")).as("source_a"),
          greatest(col("src_a"), col("sb.source")).as("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("source_a"), col("source_b"))
    },
    Some(s"""
      |$duckShingles, $duckCappedIndex, jp AS (
      |  SELECT x.doc_id AS id_a, y.doc_id AS id_b, x.n_sh AS na, y.n_sh AS nb, count(*) AS common
      |  FROM ex x JOIN ex y ON x.s = y.s AND x.doc_id < y.doc_id
      |  GROUP BY 1, 2, 3, 4
      |), pr AS (
      |  SELECT id_a, id_b FROM jp
      |  WHERE round(common::DOUBLE / (na + nb - common)::DOUBLE, 6) >= 0.3
      |)
      |SELECT least(da.source, db.source) AS source_a,
      |       greatest(da.source, db.source) AS source_b,
      |       count(*) AS n_pairs
      |FROM pr
      |JOIN documents da ON pr.id_a = da.doc_id
      |JOIN documents db ON pr.id_b = db.doc_id
      |GROUP BY 1, 2 ORDER BY 1, 2
      """.stripMargin.trim))

  private val windowSpans = QueryDef(
    "dedup_window_spans",
    "Cross-document duplicate-window spans — the window-granular " +
      "approximation of exact-substring dedup (Lee et al. 2021): a " +
      "10-token window occurring ≥ 2 times anywhere in the corpus marks " +
      "a duplicated span start; per doc, report window/dup-window " +
      "counts and the EXACT union size of the duplicated [p, p+10) " +
      "intervals via the sorted-lag trick (Σ least(gap, w)) — no " +
      "per-token explode. Window strings never shuffle (48-bit hash + " +
      "position travel); the duplicated-hash set is one count≥2 " +
      "aggregate semi-joined back on the hash. The corpus-level twin " +
      "of txt_dup_ngrams' intra-document repetition gate.",
    (s, dir) => {
      import graft.operators.TextAnalysis.tokens
      val d = Tables.documentsSpread(s, dir)
        .withColumn("toks", tokens(col("text")))
      Dedup.duplicateWindowSpans(d, "toks", "doc_id", 10)
        .select(col("id").as("doc_id"), col("n_windows"), col("n_dup_windows"),
          col("covered_tokens"), col("total_tokens"),
          round(when(col("total_tokens") > 0,
            col("covered_tokens").cast("double") / col("total_tokens").cast("double"))
            .otherwise(lit(0.0)), 6).as("dup_span_frac"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      |${Duck.docToks}, pos AS (
      |  SELECT doc_id, t.p AS p, t.gh AS gh FROM (
      |    SELECT doc_id, unnest(list_transform(range(len(toks) - 9),
      |           i -> struct_pack(p := i, gh := ${Duck.md5Long48("array_to_string(list_slice(toks, i + 1, i + 10), ' ')")}))) AS t
      |    FROM tt WHERE len(toks) >= 10)
      |), dup AS (SELECT gh FROM pos GROUP BY gh HAVING count(*) >= 2),
      |cov AS (
      |  SELECT doc_id, count(*) AS n_dup_windows,
      |         SUM(CASE WHEN d IS NULL THEN 10 ELSE LEAST(d, 10) END)::BIGINT AS covered_tokens
      |  FROM (SELECT doc_id, p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS d
      |        FROM pos SEMI JOIN dup USING (gh))
      |  GROUP BY doc_id
      |)
      |SELECT tt.doc_id,
      |       GREATEST(len(toks) - 9, 0)::BIGINT AS n_windows,
      |       COALESCE(n_dup_windows, 0)::BIGINT AS n_dup_windows,
      |       COALESCE(covered_tokens, 0)::BIGINT AS covered_tokens,
      |       len(toks)::BIGINT AS total_tokens,
      |       round(CASE WHEN len(toks) > 0
      |             THEN COALESCE(covered_tokens, 0)::DOUBLE / len(toks)::DOUBLE
      |             ELSE 0.0 END, 6) AS dup_span_frac
      |FROM tt LEFT JOIN cov USING (doc_id) ORDER BY tt.doc_id
      """.stripMargin.trim))

  private val removeSpans = QueryDef(
    "dedup_remove_spans",
    "Exact-substring dedup at window granularity, first-occurrence-" +
      "wins — the ACTION where dedup_window_spans is the measurement " +
      "(Lee et al. 2021): for every 10-token window repeated anywhere " +
      "in the corpus, the lexicographically smallest (doc, position) " +
      "occurrence survives and every other occurrence's interval is " +
      "cut from its document. Canonical pick is a map-side-combining " +
      "(hash → min, count) aggregate, NOT a row_number window (which " +
      "would funnel a mega-duplicate boilerplate hash into one sort " +
      "partition); the cut is a per-row HOF over collected removal " +
      "positions. Cleaned docs are md5-fingerprinted so the oracle " +
      "covers exact kept-token contents.",
    (s, dir) => {
      import graft.operators.TextAnalysis.tokens
      val d = Tables.documentsSpread(s, dir)
        .withColumn("toks", tokens(col("text")))
      Dedup.removeDuplicateWindows(d, "toks", "doc_id", 10)
        .select(col("id").as("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          (size(col("toks")) - size(col("kept"))).cast("long").as("n_removed"),
          md5(array_join(col("kept"), " ")).as("kept_md5"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      |${Duck.docToks}, pos AS (
      |  SELECT doc_id, t.p AS p, t.gh AS gh FROM (
      |    SELECT doc_id, unnest(list_transform(range(len(toks) - 9),
      |           i -> struct_pack(p := i, gh := ${Duck.md5Long48("array_to_string(list_slice(toks, i + 1, i + 10), ' ')")}))) AS t
      |    FROM tt WHERE len(toks) >= 10)
      |), rm AS (
      |  SELECT doc_id, p FROM (
      |    SELECT doc_id, p, row_number() OVER (PARTITION BY gh ORDER BY doc_id, p) AS rn
      |    FROM pos)
      |  WHERE rn > 1
      |), lists AS (
      |  SELECT doc_id, list_sort(list(p)) AS ps FROM rm GROUP BY doc_id
      |), cl AS (
      |  SELECT tt.doc_id, toks,
      |         CASE WHEN ps IS NULL THEN toks ELSE
      |           list_filter(list_transform(range(len(toks)),
      |             i -> CASE WHEN len(list_filter(ps, p -> p <= i AND i < p + 10)) > 0
      |                  THEN NULL ELSE toks[i + 1] END), x -> x IS NOT NULL)
      |         END AS kept
      |  FROM tt LEFT JOIN lists ON tt.doc_id = lists.doc_id
      |)
      |SELECT doc_id, len(toks)::BIGINT AS n_tokens,
      |       (len(toks) - len(kept))::BIGINT AS n_removed,
      |       md5(COALESCE(array_to_string(kept, ' '), '')) AS kept_md5
      |FROM cl ORDER BY doc_id
      """.stripMargin.trim))

  val defs: Seq[QueryDef] =
    Seq(exact, ngram, containment, minhash, minhashEstimate, simhash, embCos, semPrune,
      clusters, canonical, incremental, sourceMatrix, windowSpans, removeSpans)
}
