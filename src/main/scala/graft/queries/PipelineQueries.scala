package graft.queries

import graft.Tables
import graft.operators.Sampling
import graft.operators.TextAnalysis._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Composite training-data-preparation pipeline — the engine's actual
  * 100 TB use case, end to end in ONE oracle-checked query: documents →
  * exact-dedup (keep first per fingerprint) → quality gate → language
  * gate → per-document statistics. Every stage is shuffle-minimal: the
  * dedup rank is the only wide operation; everything else stays in the
  * projection.
  */
object PipelineQueries {

  private val prep = QueryDef(
    "pipeline_training_prep",
    "Full prep pipeline: normalize → tokenize once → exact-dedup " +
      "(row_number over fingerprint) → quality ≥ 0.45 → detected_lang " +
      "= 'en' → stats. One wide op (dedup rank); stats ride the " +
      "projection.",
    (s, dir) => {
      val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
      Tables.documentsSpread(s, dir)
        .withColumn("norm", normalize(col("text")))
        .withColumn("toks", tokensFromNorm(col("norm")))
        .withColumn("fp", md5(col("norm")))
        .withColumn("dup_rank", row_number().over(w))
        .filter(col("dup_rank") === 1)
        .withColumn("quality", round(qualityScoreFromParts(col("toks"), col("norm")), 6))
        .withColumn("detected_lang", langIdFromTokens(col("toks")))
        .filter(col("quality") >= 0.45 && col("detected_lang") === "en")
        .select(col("doc_id"), col("fp"), col("quality"),
          size(col("toks")).cast("long").as("n_tokens"),
          size(array_distinct(col("toks"))).cast("long").as("n_distinct_tokens"))
        .orderBy(col("doc_id"))
    },
    Some {
      val langs = stopwords.keys.toSeq.sorted
      val hitSel = langs.map(l => s"${Duck.hits(stopwords(l))} AS hits_$l").mkString(",\n       ")
      val m = langs.map(l => s"hits_$l").mkString("greatest(", ", ", ")")
      val caseChain = langs.map(l => s"WHEN hits_$l = $m THEN '$l'").mkString(" ")
      s"""
      |${Duck.docToks}, deduped AS (
      |  SELECT doc_id, norm, toks, md5(norm) AS fp
      |  FROM tt
      |  QUALIFY row_number() OVER (PARTITION BY md5(norm) ORDER BY doc_id) = 1
      |), scored AS (
      |  SELECT doc_id, fp, toks,
      |         len(toks)::BIGINT AS n,
      |         ${Duck.hits(stopwords("en"))} AS en_hits,
      |         ${Duck.punct} AS np,
      |         length(norm) AS nc,
      |         $hitSel
      |  FROM deduped
      |), gated AS (
      |  SELECT doc_id, fp, toks, n,
      |         round(CASE WHEN n = 0 THEN 0.0 ELSE
      |           0.4 * least(1.0, en_hits::DOUBLE * 8.0 / n::DOUBLE)
      |           + 0.3 * least(1.0, n::DOUBLE / 50.0)
      |           + 0.3 * (1.0 - np::DOUBLE / nc::DOUBLE) END, 6) AS quality,
      |         CASE WHEN $m = 0 THEN 'und' $caseChain END AS detected_lang
      |  FROM scored
      |)
      |SELECT doc_id, fp, quality, n AS n_tokens,
      |       len(list_distinct(toks))::BIGINT AS n_distinct_tokens
      |FROM gated
      |WHERE quality >= 0.45 AND detected_lang = 'en'
      |ORDER BY doc_id
      """.stripMargin.trim
    })

  private val split = QueryDef(
    "pipeline_train_test_split",
    "Deterministic 80/20 train/test split: md5-hash bucket of doc_id " +
      "(salted), never rand() — stable under task retries, and " +
      "incremental ingestion can't reassign existing docs across the " +
      "leak boundary. Pure projection + tiny aggregate.",
    (s, dir) => {
      Tables.documents(s, dir)
        .withColumn("split", Sampling.splitLabel(col("doc_id"), "split", 80))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars").cast("decimal(38,6)")).cast("decimal(38,2)").cast("double").as("chars_sum"))
        .orderBy(col("split"))
    },
    Some(s"""
      |SELECT CASE WHEN ${Duck.md5Long48("doc_id::VARCHAR || ':split'")} % 100 < 80
      |         THEN 'train' ELSE 'test' END AS split,
      |       count(*) AS n_docs,
      |       CAST(CAST(SUM(CAST(n_chars AS DECIMAL(38,6))) AS DECIMAL(38,2)) AS DOUBLE) AS chars_sum
      |FROM documents GROUP BY 1 ORDER BY 1
      """.stripMargin.trim))

  private val balanced = QueryDef(
    "pipeline_balanced_sample",
    "Per-language balanced downsample (class rebalancing): keep 30 " +
      "docs per lang chosen by salted hash order — deterministic, " +
      "rerun-stable. One shuffle on the stratum key; WindowGroupLimit " +
      "caps per-partition work before the rank.",
    (s, dir) => {
      Sampling.stratifiedSample(Tables.documents(s, dir), "lang", "doc_id",
          perStratum = 30)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"),
          min(col("doc_id")).as("min_doc_id"),
          sum(col("doc_id").cast("decimal(38,6)")).cast("decimal(38,2)").cast("double").as("id_sum"))
        .orderBy(col("lang"))
    },
    Some(s"""
      |WITH ranked AS (
      |  SELECT lang, doc_id,
      |         row_number() OVER (PARTITION BY lang ORDER BY
      |           ${Duck.md5Long48("doc_id::VARCHAR || ':sample'")} % 1073741824, doc_id) AS rnk
      |  FROM documents
      |)
      |SELECT lang, count(*) AS n_sampled, min(doc_id) AS min_doc_id,
      |       CAST(CAST(SUM(CAST(doc_id AS DECIMAL(38,6))) AS DECIMAL(38,2)) AS DOUBLE) AS id_sum
      |FROM ranked WHERE rnk <= 30
      |GROUP BY lang ORDER BY lang
      """.stripMargin.trim))

  /** Shared oracle for both decontamination variants: the bloom path's
    * output is provably identical to the exact path (no false
    * negatives + exact confirm join), so one SQL gates both.
    */
  private val duckDecontaminate: String =
    s"""
      |${Duck.docToks}, sh5 AS (
      |  SELECT doc_id, ${Duck.shingles(5)} AS shingles FROM tt
      |), bg AS (
      |  SELECT DISTINCT unnest(list_transform(shingles,
      |           x -> ('0x' || substring(md5(x), 1, 12))::BIGINT)) AS g
      |  FROM sh5 WHERE doc_id % 100 = 7
      |), cg AS (
      |  SELECT doc_id, unnest(list_transform(shingles,
      |           x -> ('0x' || substring(md5(x), 1, 12))::BIGINT)) AS g
      |  FROM sh5 WHERE doc_id % 100 <> 7
      |), hits AS (
      |  SELECT cg.doc_id, count(*) AS n FROM cg JOIN bg USING (g) GROUP BY cg.doc_id
      |)
      |SELECT tt.doc_id, COALESCE(hits.n, 0)::BIGINT AS n_contaminated_grams,
      |       COALESCE(hits.n, 0) >= 1 AS contaminated
      |FROM tt LEFT JOIN hits ON tt.doc_id = hits.doc_id
      |WHERE tt.doc_id % 100 <> 7 ORDER BY tt.doc_id
      """.stripMargin.trim

  private val decontaminate = QueryDef(
    "pipeline_decontaminate",
    "Benchmark decontamination (GPT-3-style n-gram overlap check): " +
      "docs sharing any 5-gram with the benchmark slice (doc_id ≡ 7 " +
      "mod 100) are flagged. The benchmark gram set is broadcast — the " +
      "corpus never shuffles on the gram key; per-doc work is the " +
      "shared tokenize→shingle→md5 projection.",
    (s, dir) => {
      import graft.operators.Decontaminate
      val d = Tables.documentsSpread(s, dir)
      val bench = d.filter(pmod(col("doc_id"), lit(100)) === 7)
      val corpus = d.filter(pmod(col("doc_id"), lit(100)) =!= 7)
      Decontaminate.flagContaminated(corpus, bench, "text", "doc_id", n = 5)
        .select(col("doc_id"), col("n_contaminated_grams"), col("contaminated"))
        .orderBy(col("doc_id"))
    },
    Some(duckDecontaminate))

  private val decontaminateBloom = QueryDef(
    "pipeline_decontaminate_bloom",
    "Bloom-prefiltered decontamination — the beyond-broadcast-scale " +
      "variant of pipeline_decontaminate: the benchmark gram set is " +
      "compressed into a Bloom filter (~9 bits/item at 3% fpp vs 8 " +
      "bytes/item for the exact broadcast set), corpus grams stream " +
      "through a codegen'd might_contain literal (no join, no " +
      "shuffle), and only the surviving sliver reaches the exact " +
      "confirm semi-join (no broadcast hint — AQE broadcasts while " +
      "the bench set is small, degrades to a shuffle join beyond). " +
      "No false negatives + exact confirm " +
      "makes the output IDENTICAL to the exact path for any fpp, so " +
      "both queries share one oracle.",
    (s, dir) => {
      import graft.operators.Decontaminate
      val d = Tables.documentsSpread(s, dir)
      val bench = d.filter(pmod(col("doc_id"), lit(100)) === 7)
      val corpus = d.filter(pmod(col("doc_id"), lit(100)) =!= 7)
      // default 1M expectedItems: right-sized for the fixtures and sf1;
      // at sf10 the bench outgrows it and fpp degrades — GRACEFULLY
      // (more survivors to confirm, identical output)
      Decontaminate.flagContaminatedBloom(corpus, bench, "text", "doc_id", n = 5)
        .select(col("doc_id"), col("n_contaminated_grams"), col("contaminated"))
        .orderBy(col("doc_id"))
    },
    Some(duckDecontaminate))

  private val rebalance = QueryDef(
    "pipeline_rebalance_langs",
    "Data-mix leveling: downsample every language to the smallest " +
      "language's size (uniform mixture), selection by salted hash " +
      "order — deterministic, retry-stable; the budget is data-derived " +
      "(min stratum count, one broadcast single-row aggregate). Kept " +
      "ids are fingerprinted (md5 of the sorted id list) so the check " +
      "covers exact membership, not just counts.",
    (s, dir) => {
      Sampling.rebalanceToMin(Tables.documents(s, dir), "lang", "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"),
          md5(array_join(transform(sort_array(collect_list(col("doc_id"))),
            _.cast("string")), ",")).as("ids_md5"))
        .orderBy(col("lang"))
    },
    Some(s"""
      |WITH ranked AS (
      |  SELECT lang, doc_id,
      |         row_number() OVER (PARTITION BY lang ORDER BY
      |           ${Duck.md5Long48("doc_id::VARCHAR || ':rebalance'")} % 1073741824, doc_id) AS rk
      |  FROM documents
      |), m AS (
      |  SELECT min(cnt) AS mn FROM (SELECT count(*) AS cnt FROM documents GROUP BY lang)
      |)
      |SELECT lang, count(*) AS n_kept,
      |       md5(string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)) AS ids_md5
      |FROM ranked, m WHERE rk <= mn
      |GROUP BY lang ORDER BY lang
      """.stripMargin.trim))

  private val weighted = QueryDef(
    "pipeline_weighted_sample",
    "Importance-weighted sample without replacement (Efraimidis–" +
      "Spirakis): 200 documents drawn with probability ∝ n_chars via " +
      "deterministic md5-uniform priorities u^(1/w) — the " +
      "quality-weighted corpus subsetting step of a training-data mix. " +
      "Top-k is TakeOrderedAndProject (per-partition heaps + k-row " +
      "driver merge, no global sort). Parity: u = (hash48+1)/2^48 and " +
      "1/w are bit-exact cross-engine; pow itself is only ≤1-ulp " +
      "cross-engine (JVM Math.pow vs libm), which flips the selected " +
      "set only if the kth and (k+1)th priorities differ by ~1e-16 — " +
      "hash-uniform priorities space ~1e-10 apart at this n, and exact " +
      "ties are pinned by the id tiebreak. Output aggregates the " +
      "selected set (count, id/weight sums, extrema).",
    (s, dir) => {
      Sampling.weightedSample(Tables.documents(s, dir), "doc_id", "n_chars", k = 200)
        .agg(
          count(lit(1)).as("n_sampled"),
          sum(col("doc_id").cast("decimal(38,6)")).cast("decimal(38,2)").cast("double").as("id_sum"),
          sum(col("n_chars").cast("decimal(38,6)")).cast("decimal(38,2)").cast("double").as("w_sum"),
          min(col("doc_id")).as("min_doc_id"),
          max(col("doc_id")).as("max_doc_id"))
    },
    Some(s"""
      |WITH pri AS (
      |  SELECT doc_id, n_chars,
      |         pow((${Duck.md5Long48("doc_id::VARCHAR || ':wsample'")} + 1) / 281474976710656.0,
      |             1.0 / CAST(n_chars AS DOUBLE)) AS p
      |  FROM documents WHERE n_chars > 0
      |), top AS (
      |  SELECT doc_id, n_chars FROM pri ORDER BY p DESC, doc_id LIMIT 200
      |)
      |SELECT count(*) AS n_sampled,
      |       CAST(CAST(SUM(CAST(doc_id AS DECIMAL(38,6))) AS DECIMAL(38,2)) AS DOUBLE) AS id_sum,
      |       CAST(CAST(SUM(CAST(n_chars AS DECIMAL(38,6))) AS DECIMAL(38,2)) AS DOUBLE) AS w_sum,
      |       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
      |FROM top
      """.stripMargin.trim))

  private val temperature = QueryDef(
    "pipeline_temperature_mix",
    "Temperature-flattened language mix (α = 0.5 — the sqrt flattening " +
      "multilingual training mixes apply against head-language " +
      "dominance): keep each doc of language g with rate " +
      "sqrt(n_min/n_g), so kept counts are ∝ √n_g and the smallest " +
      "language keeps everything. Decision = md5-48 uniform < rate; at " +
      "α=0.5 the rate is one IEEE divide + sqrt — bit-identical " +
      "cross-engine (no pow — Sampling.temperatureSample scaladoc). " +
      "Group rates broadcast onto the scan: the corpus never shuffles.",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val kept = Sampling.temperatureSample(docs, "doc_id", "lang", alpha = 0.5)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"),
          sum(col("doc_id")).as("kept_id_sum"))
      docs.groupBy(col("lang")).agg(count(lit(1)).as("n_orig"))
        .join(kept, Seq("lang"), "left")
        .select(col("lang"), col("n_orig"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("kept_id_sum"), lit(0L)).as("kept_id_sum"))
        .orderBy(col("lang"))
    },
    Some(s"""
      |WITH cnt AS (
      |  SELECT lang, count(*) AS ng FROM documents GROUP BY 1
      |), r AS (
      |  SELECT lang, ng, sqrt((SELECT min(ng) FROM cnt)::DOUBLE / ng::DOUBLE) AS rate
      |  FROM cnt
      |), kept AS (
      |  SELECT d.lang, count(*) AS n_kept, CAST(SUM(d.doc_id) AS BIGINT) AS kept_id_sum
      |  FROM documents d JOIN r ON d.lang = r.lang
      |  WHERE (${Duck.md5Long48("d.doc_id::VARCHAR || ':tempmix'")} + 1) / 281474976710656.0 < r.rate
      |  GROUP BY 1
      |)
      |SELECT cnt.lang, cnt.ng AS n_orig,
      |       COALESCE(kept.n_kept, 0) AS n_kept,
      |       COALESCE(kept.kept_id_sum, 0) AS kept_id_sum
      |FROM cnt LEFT JOIN kept ON cnt.lang = kept.lang
      |ORDER BY cnt.lang
      """.stripMargin.trim))

  private val mixReport = QueryDef(
    "pipeline_mix_report",
    "The end-of-pipeline data card, four stages composed in ONE " +
      "oracle-checked query: exact-dedup (keep first per fingerprint) → " +
      "quality gate (≥ 0.45) → temperature-flattened language mix " +
      "(α = 0.5 over the GATED corpus — rates derive from post-gate " +
      "counts) → per-language token budget with share-of-mix. The " +
      "report a training run actually consumes. One wide op per stage " +
      "(dedup rank, rate broadcast, final rollup); the share divides " +
      "exact integer token counts once in double.",
    (s, dir) => {
      val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
      val gated = Tables.documentsSpread(s, dir)
        .withColumn("norm", normalize(col("text")))
        .withColumn("toks", tokensFromNorm(col("norm")))
        .withColumn("fp", md5(col("norm")))
        .withColumn("dup_rank", row_number().over(w))
        .filter(col("dup_rank") === 1)
        .withColumn("quality", round(qualityScoreFromParts(col("toks"), col("norm")), 6))
        .filter(col("quality") >= 0.45)
      val kept = Sampling.temperatureSample(gated, "doc_id", "lang",
        alpha = 0.5, salt = "mixreport")
      val agg = kept.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(col("toks")).cast("long")).as("n_tokens"))
      agg.withColumn("token_share_pct",
          floor(col("n_tokens").cast("double") * 10000.0
            / sum(col("n_tokens")).over(Window.partitionBy()).cast("double"))
            .cast("double") / 100.0)
        .orderBy(col("lang"))
    },
    Some(s"""
      |${Duck.docToks}, deduped AS (
      |  SELECT doc_id, lang, norm, toks
      |  FROM tt
      |  QUALIFY row_number() OVER (PARTITION BY md5(norm) ORDER BY doc_id) = 1
      |), scored AS (
      |  SELECT doc_id, lang, len(toks)::BIGINT AS n,
      |         ${Duck.hits(stopwords("en"))} AS en_hits,
      |         ${Duck.punct} AS np,
      |         length(norm) AS nc
      |  FROM deduped
      |), gated AS (
      |  SELECT doc_id, lang, n FROM scored
      |  WHERE round(CASE WHEN n = 0 THEN 0.0 ELSE
      |          0.4 * least(1.0, en_hits::DOUBLE * 8.0 / n::DOUBLE)
      |          + 0.3 * least(1.0, n::DOUBLE / 50.0)
      |          + 0.3 * (1.0 - np::DOUBLE / nc::DOUBLE) END, 6) >= 0.45
      |), cnt AS (
      |  SELECT lang, count(*) AS ng FROM gated GROUP BY 1
      |), r AS (
      |  SELECT lang, sqrt((SELECT min(ng) FROM cnt)::DOUBLE / ng::DOUBLE) AS rate
      |  FROM cnt
      |), kept AS (
      |  SELECT g.* FROM gated g JOIN r USING (lang)
      |  WHERE (${Duck.md5Long48("g.doc_id::VARCHAR || ':mixreport'")} + 1) / 281474976710656.0 < r.rate
      |), agg AS (
      |  SELECT lang, count(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS n_tokens
      |  FROM kept GROUP BY 1
      |)
      |SELECT lang, n_docs, n_tokens,
      |       FLOOR(n_tokens::DOUBLE * 10000.0
      |             / (SELECT SUM(n_tokens) FROM agg)::DOUBLE) / 100.0 AS token_share_pct
      |FROM agg ORDER BY lang
      """.stripMargin.trim))

  private val hardNegatives = QueryDef(
    "pipeline_hard_negatives",
    "Hard-negative mining for contrastive embedding training: for each " +
      "of 8 anchor vectors, the nearest non-self neighbor is the " +
      "positive and ranks 2–4 are the hard negatives, emitted as " +
      "(anchor, pos, neg) triplets with the pos/neg distance margin — " +
      "the triplet-loss training set. Anchors broadcast onto ONE corpus " +
      "scan (BroadcastNestedLoopJoin, corpus never shuffles); the " +
      "per-anchor rank filter is WindowGroupLimit-pruned map-side, so " +
      "only |anchors|·4 rows survive to the shuffle. Ranking and " +
      "margins use the 6-dp-rounded distances (the cross-engine " +
      "ordering rule), id-tiebroken.",
    (s, dir) => {
      import graft.functions.VectorFunctions.cosineDistance
      val emb = Tables.embeddings(s, dir)
      val anchorIds = (1L to 8L)
      val anchors = emb.filter(col("vec_id").isin(anchorIds: _*))
        .select(col("vec_id").as("anchor_id"), col("embedding").as("qv"))
      val w = Window.partitionBy(col("anchor_id")).orderBy(col("dist"), col("vec_id"))
      val ranked = emb.crossJoin(broadcast(anchors))
        .filter(col("vec_id") =!= col("anchor_id"))
        .withColumn("dist", round(cosineDistance(col("embedding"), col("qv")), 6))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 4)
      val pos = ranked.filter(col("rk") === 1)
        .select(col("anchor_id"), col("vec_id").as("pos_id"), col("dist").as("pos_dist"))
      val neg = ranked.filter(col("rk") >= 2)
        .select(col("anchor_id"), col("vec_id").as("neg_id"),
          col("dist").as("neg_dist"), (col("rk") - 1).cast("long").as("neg_rank"))
      pos.join(neg, Seq("anchor_id"))
        .select(col("anchor_id"), col("pos_id"), col("neg_id"), col("neg_rank"),
          col("pos_dist"), col("neg_dist"),
          round(col("neg_dist") - col("pos_dist"), 6).as("margin"))
        .orderBy(col("anchor_id"), col("neg_rank"))
    },
    Some(s"""
      |WITH anchors AS (
      |  SELECT vec_id AS anchor_id, embedding::DOUBLE[] AS qv
      |  FROM embeddings WHERE vec_id IN (1, 2, 3, 4, 5, 6, 7, 8)
      |), d AS (
      |  SELECT a.anchor_id, e.vec_id,
      |         round(${Duck.cosine("e.embedding::DOUBLE[]", "a.qv")}, 6) AS dist
      |  FROM embeddings e CROSS JOIN anchors a
      |  WHERE e.vec_id <> a.anchor_id
      |), r AS (
      |  SELECT anchor_id, vec_id, dist,
      |         row_number() OVER (PARTITION BY anchor_id ORDER BY dist, vec_id) AS rk
      |  FROM d
      |), pos AS (
      |  SELECT anchor_id, vec_id AS pos_id, dist AS pos_dist FROM r WHERE rk = 1
      |), neg AS (
      |  SELECT anchor_id, vec_id AS neg_id, dist AS neg_dist, rk - 1 AS neg_rank
      |  FROM r WHERE rk BETWEEN 2 AND 4
      |)
      |SELECT p.anchor_id, p.pos_id, n.neg_id, n.neg_rank,
      |       p.pos_dist, n.neg_dist,
      |       round(n.neg_dist - p.pos_dist, 6) AS margin
      |FROM pos p JOIN neg n USING (anchor_id)
      |ORDER BY anchor_id, neg_rank
      """.stripMargin.trim))

  private val featureHash = QueryDef(
    "ml_feature_hash_census",
    "Hashing-trick featurization (the fixed-dimension categorical " +
      "encoder for training pipelines): order categoricals " +
      "(status/priority/year) hash into a 64-dim signed feature space " +
      "via the portable md5 hash + ±1 nibble sign (the " +
      "Md5PortableEmbedder convention), and the query reports the " +
      "per-dimension census — net signed weight, distinct source " +
      "features (collision count), and row mass — the artifact that " +
      "tells you whether 64 dims is enough BEFORE training. One " +
      "64-row-bounded aggregation; no vocabulary state anywhere, which " +
      "is the entire point of feature hashing at 100 TB.",
    (s, dir) => {
      val f = Tables.orders(s, dir).select(explode(array(
          concat(lit("status="), col("o_orderstatus")),
          concat(lit("pri="), col("o_orderpriority")),
          concat(lit("year="), year(col("o_orderdate")).cast("string")))).as("f"))
      f.select(col("f"),
          (md5Long48(col("f")) % 64).as("dim"),
          when(conv(substring(md5(col("f")), 13, 1), 16, 10).cast("long") < 8, lit(1L))
            .otherwise(lit(-1L)).as("sign"))
        .groupBy(col("dim"))
        .agg(sum(col("sign")).as("weight"),
          countDistinct(col("f")).as("n_features"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("dim"))
    },
    Some("""
      |WITH fx AS (
      |  SELECT unnest(['status=' || o_orderstatus,
      |                 'pri=' || o_orderpriority,
      |                 'year=' || year(o_orderdate)::VARCHAR]) AS f
      |  FROM orders
      |), h AS (
      |  SELECT f,
      |         ('0x' || substring(md5(f), 1, 12))::BIGINT % 64 AS dim,
      |         CASE WHEN ('0x' || substring(md5(f), 13, 1))::BIGINT < 8
      |              THEN 1 ELSE -1 END AS sign
      |  FROM fx
      |)
      |SELECT dim, SUM(sign)::BIGINT AS weight,
      |       count(DISTINCT f) AS n_features, count(*) AS n_rows
      |FROM h GROUP BY dim ORDER BY dim
      """.stripMargin.trim))

  private val curriculum = QueryDef(
    "pipeline_curriculum",
    "Curriculum-learning schedule: the corpus is globally ordered " +
      "easy→hard by a difficulty proxy (token count, doc_id tiebreak), " +
      "every document gets its training step from DistributedRank " +
      "(range-partitioned sort + offsets — the global order WITHOUT a " +
      "single-partition window), and steps are cut into 10 curriculum " +
      "stages by the rank-proportional formula shared with " +
      "ml_quantile_bins. Per-stage report: docs, token-count extrema, " +
      "exact total tokens, mean via one division. This is the " +
      "schedule-construction pass a trainer consumes as-is; the only " +
      "corpus-sized work is one tokenizing scan + the range sort.",
    (s, dir) => {
      val toks = Tables.documentsSpread(s, dir)
        .select(col("doc_id"),
          graft.operators.TextAnalysis.tokenCount(col("text")).as("n_tok"))
      val ranked = graft.operators.DistributedRank.byKey(
        toks, Seq(col("n_tok"), col("doc_id")))
      val n = ranked.agg(count(lit(1)).as("n"))
      ranked.crossJoin(broadcast(n))
        .withColumn("stage", expr("((rank - 1) * 10) div n"))
        .groupBy(col("stage"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_tok")).as("min_tokens"),
          max(col("n_tok")).as("max_tokens"),
          sum(col("n_tok")).as("total_tokens"))
        .withColumn("mean_tokens",
          round(col("total_tokens").cast("double") / col("n_docs").cast("double"), 6))
        .orderBy(col("stage"))
    },
    Some(s"""
      |WITH t0 AS (
      |  SELECT doc_id, ${Duck.norm} AS norm FROM documents
      |), toks AS (
      |  SELECT doc_id, len(${Duck.toks})::BIGINT AS n_tok FROM t0
      |), ranked AS (
      |  SELECT n_tok,
      |         row_number() OVER (ORDER BY n_tok, doc_id) AS rank,
      |         count(*) OVER () AS n
      |  FROM toks
      |)
      |SELECT ((rank - 1) * 10) // n AS stage,
      |       count(*) AS n_docs,
      |       min(n_tok) AS min_tokens,
      |       max(n_tok) AS max_tokens,
      |       SUM(n_tok)::BIGINT AS total_tokens,
      |       round(SUM(n_tok)::DOUBLE / count(*)::DOUBLE, 6) AS mean_tokens
      |FROM ranked GROUP BY 1 ORDER BY stage
      """.stripMargin.trim))

  private val dsir = QueryDef(
    "pipeline_dsir_select",
    "DSIR data selection (Xie et al. 2023, 'Data Selection for Language " +
      "Models via Importance Resampling'): raw documents are resampled " +
      "toward a target domain (here lang='en') by importance weights " +
      "under hashed-n-gram bag models. Features = every unigram + " +
      "bigram occurrence, hashed into B=1024 buckets (fixed dimension " +
      "— no vocabulary state at 100 TB, same argument as the hashing " +
      "trick); p̂ (target) and q̂ (raw) are add-one-smoothed bucket " +
      "unigram models, a doc's log-weight is Σ ln(p̂_b/q̂_b) over its " +
      "feature occurrences, and selection is Gumbel top-k — key = " +
      "log w + Gumbel(md5(doc_id)) — which IS sampling-without-" +
      "replacement ∝ w, made deterministic by the hash (no RNG state " +
      "to reconcile across engines or executors). Scale shape: the " +
      "ratio table is ≤ B rows (broadcast); doc scoring is one " +
      "doc-keyed aggregate; top-k is TakeOrderedAndProject, not a " +
      "global sort. Float parity: each ln term rounds to 6 decimals, " +
      "per-doc sums accumulate in exact DECIMAL(38,6) (order-" +
      "independent), and the Gumbel perturbation joins the sum as a " +
      "rounded decimal — the selection key is exact until one final " +
      "cast.",
    (s, dir) => {
      val B = 1024L
      val tk = TextQueries.docToks(s, dir)
      // every unigram + bigram occurrence, hashed to a bucket
      val bigrams = zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => concat(a, lit(" "), b))
      val bf = tk
        .select(col("doc_id"), col("lang"),
          explode(concat(col("toks"), bigrams)).as("f"))
        .select(col("doc_id"), col("lang"), (md5Long48(col("f")) % B).as("b"))
      val src = bf.groupBy(col("b")).agg(count(lit(1)).as("cq"))
      val tgt = bf.filter(col("lang") === "en")
        .groupBy(col("b")).agg(count(lit(1)).as("ct"))
      val tot = bf.agg(
        count(lit(1)).as("nq"),
        count(when(col("lang") === "en", lit(1))).as("np"))
      // log p̂/q̂ per bucket: factors widen to double BEFORE multiplying
      // (BIGINT products would overflow at real corpus sizes)
      val ratio = src.join(tgt, Seq("b"), "left").crossJoin(broadcast(tot))
        .select(col("b"), round(log(
          ((coalesce(col("ct"), lit(0L)) + 1L).cast("double") *
            (col("nq") + B).cast("double")) /
            ((col("cq") + 1L).cast("double") * (col("np") + B).cast("double"))),
          6).as("term"))
      val docw = bf.join(broadcast(ratio), Seq("b"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_feat"),
          sum(col("term").cast(DecimalType(38, 6))).as("lw"))
      // deterministic Gumbel(0,1): u from the portable 48-bit doc hash
      val u = (md5Long48(concat(lit("dsir:"), col("doc_id").cast("string")))
        .cast("double") + lit(0.5)) / lit(281474976710656.0)
      docw.join(tk.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .withColumn("gum", round(-log(-log(u)), 6).cast(DecimalType(38, 6)))
        .select(col("doc_id"), col("lang"), col("n_feat"),
          col("lw").cast("double").as("log_w"),
          (col("lw") + col("gum")).cast("double").as("sel_key"))
        .orderBy(col("sel_key").desc, col("doc_id")).limit(20)
    },
    Some(s"""
      |${Duck.docToks},
      |feat AS (
      |  SELECT doc_id, lang,
      |         unnest(list_concat(toks,
      |           list_transform(range(len(toks) - 1),
      |             i -> toks[i + 1] || ' ' || toks[i + 2]))) AS f
      |  FROM tt
      |), bf AS (
      |  SELECT doc_id, lang,
      |         ('0x' || substring(md5(f), 1, 12))::BIGINT % 1024 AS b
      |  FROM feat
      |), src AS (SELECT b, count(*) AS cq FROM bf GROUP BY 1),
      |tgt AS (SELECT b, count(*) AS ct FROM bf WHERE lang = 'en' GROUP BY 1),
      |tot AS (
      |  SELECT (SELECT count(*) FROM bf) AS nq,
      |         (SELECT count(*) FROM bf WHERE lang = 'en') AS np
      |), ratio AS (
      |  SELECT s.b,
      |         round(ln((CAST(COALESCE(t.ct, 0) + 1 AS DOUBLE) * CAST(nq + 1024 AS DOUBLE)) /
      |                  (CAST(s.cq + 1 AS DOUBLE) * CAST(np + 1024 AS DOUBLE))), 6) AS term
      |  FROM src s LEFT JOIN tgt t ON s.b = t.b CROSS JOIN tot
      |), docw AS (
      |  SELECT bf.doc_id, count(*) AS n_feat,
      |         SUM(CAST(term AS DECIMAL(38,6))) AS lw
      |  FROM bf JOIN ratio ON bf.b = ratio.b GROUP BY 1
      |), keyed AS (
      |  SELECT d.doc_id, tt.lang, d.n_feat,
      |         CAST(d.lw AS DOUBLE) AS log_w,
      |         CAST(d.lw + CAST(round(-ln(-ln(
      |           ((('0x' || substring(md5('dsir:' || d.doc_id), 1, 12))::BIGINT)::DOUBLE + 0.5)
      |             / 281474976710656.0)), 6) AS DECIMAL(38,6)) AS DOUBLE) AS sel_key
      |  FROM docw d JOIN tt ON d.doc_id = tt.doc_id
      |)
      |SELECT doc_id, lang, n_feat, log_w, sel_key
      |FROM keyed ORDER BY sel_key DESC, doc_id LIMIT 20
      """.stripMargin.trim))

  private val classifierFilter = QueryDef(
    "pipeline_classifier_filter",
    "Seed-rule → classifier quality filtering (the CCNet / GPT-3 " +
      "pipeline step: label a seed set by cheap rules, train a linear " +
      "text classifier, score EVERYTHING): training docs (doc_id % 3 " +
      "≠ 0) are labeled positive by the engine's own quality gate " +
      "(quality ≥ 0.45 ∧ lang = 'en' — the pipeline_training_prep " +
      "rule), a binary Naive-Bayes log-odds model trains in ONE " +
      "counts aggregation (add-one smoothing over the shared train " +
      "vocabulary), and every corpus doc scores mean per-token " +
      "log-odds ln p(w|pos) − ln p(w|neg) + the prior log-ratio — " +
      "the length-normalized linear scorer fastText reduces to. " +
      "Scale shape: training = two corpus-scan aggregates; the " +
      "per-token odds table joins on the token key (vocabulary-" +
      "sized, never broadcast); scoring is one doc-keyed aggregate; " +
      "top-k is TakeOrderedAndProject. Float parity: each ln odds " +
      "term and the prior round to 6 decimals, per-doc sums " +
      "accumulate in DECIMAL(38,6), and the mean divides by the " +
      "exact in-vocab token count. Output: the top 25 docs the " +
      "classifier would keep, with their rule labels — the view " +
      "showing the classifier generalizing past its seed rule.",
    (s, dir) => {
      val tk = TextQueries.docToks(s, dir)
        .withColumn("pos_rule",
          round(qualityScoreFromParts(col("toks"), col("norm")), 6) >= 0.45 &&
            col("lang") === "en")
        .select(col("doc_id"), col("lang"), col("toks"), col("pos_rule"))
      val train = tk.filter(col("doc_id") % 3 =!= 0)
      val trainTok = train.select(col("pos_rule"), explode(col("toks")).as("w"))
      val cnt = trainTok.groupBy(col("w")).agg(
        count(when(col("pos_rule"), lit(1))).as("cp"),
        count(when(!col("pos_rule"), lit(1))).as("cn"))
      val tot = trainTok.agg(
        count(when(col("pos_rule"), lit(1))).as("np"),
        count(when(!col("pos_rule"), lit(1))).as("nn"),
        countDistinct(col("w")).as("v"))
      val prior = train.agg(round(log(
        (count(when(col("pos_rule"), lit(1))) + 1L).cast("double") /
          (count(when(!col("pos_rule"), lit(1))) + 1L).cast("double")), 6)
        .cast(DecimalType(38, 6)).as("lprior"))
      val odds = cnt.crossJoin(broadcast(tot))
        .select(col("w"), round(
          log(((col("cp") + 1L).cast("double") / (col("np") + col("v")).cast("double")) /
            ((col("cn") + 1L).cast("double") / (col("nn") + col("v")).cast("double"))),
          6).as("lo"))
      tk.select(col("doc_id"), col("lang"), col("pos_rule"),
          explode(col("toks")).as("w"))
        .join(odds, Seq("w"))
        .groupBy(col("doc_id"), col("lang"), col("pos_rule"))
        .agg(count(lit(1)).as("n_tok"),
          sum(col("lo").cast(DecimalType(38, 6))).as("lo_sum"))
        .crossJoin(broadcast(prior))
        .select(col("doc_id"), col("lang"), col("pos_rule"), col("n_tok"),
          round((col("lo_sum") + col("lprior")).cast("double") /
            col("n_tok").cast("double"), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id")).limit(25)
    },
    Some(s"""
      |${Duck.docToks},
      |lab AS (
      |  SELECT doc_id, lang, toks,
      |         (round(CASE WHEN len(toks) = 0 THEN 0.0 ELSE
      |            0.4 * least(1.0, ${Duck.hits(stopwords("en"))}::DOUBLE * 8.0 / len(toks)::DOUBLE)
      |            + 0.3 * least(1.0, len(toks)::DOUBLE / 50.0)
      |            + 0.3 * (1.0 - ${Duck.punct}::DOUBLE / length(norm)::DOUBLE) END, 6) >= 0.45
      |          AND lang = 'en') AS pos_rule
      |  FROM tt
      |),
      |train AS (SELECT * FROM lab WHERE doc_id % 3 <> 0),
      |traintok AS (SELECT pos_rule, unnest(toks) AS w FROM train),
      |cnt AS (
      |  SELECT w, count(*) FILTER (WHERE pos_rule) AS cp,
      |         count(*) FILTER (WHERE NOT pos_rule) AS cn
      |  FROM traintok GROUP BY 1
      |),
      |tot AS (
      |  SELECT count(*) FILTER (WHERE pos_rule) AS np,
      |         count(*) FILTER (WHERE NOT pos_rule) AS nn,
      |         count(DISTINCT w) AS v
      |  FROM traintok
      |),
      |prior AS (
      |  SELECT CAST(round(ln(
      |           (count(*) FILTER (WHERE pos_rule) + 1)::DOUBLE /
      |           (count(*) FILTER (WHERE NOT pos_rule) + 1)::DOUBLE), 6)
      |         AS DECIMAL(38,6)) AS lprior
      |  FROM train
      |),
      |odds AS (
      |  SELECT w, round(ln(
      |           (CAST(cp + 1 AS DOUBLE) / CAST(np + v AS DOUBLE)) /
      |           (CAST(cn + 1 AS DOUBLE) / CAST(nn + v AS DOUBLE))), 6) AS lo
      |  FROM cnt CROSS JOIN tot
      |),
      |scored AS (
      |  SELECT l.doc_id, l.lang, l.pos_rule, count(*) AS n_tok,
      |         SUM(CAST(o.lo AS DECIMAL(38,6))) AS lo_sum
      |  FROM (SELECT doc_id, lang, pos_rule, unnest(toks) AS w FROM lab) l
      |  JOIN odds o ON l.w = o.w
      |  GROUP BY 1, 2, 3
      |)
      |SELECT doc_id, lang, pos_rule, n_tok,
      |       round(CAST(lo_sum + lprior AS DOUBLE) / CAST(n_tok AS DOUBLE), 6) AS score
      |FROM scored CROSS JOIN prior
      |ORDER BY score DESC, doc_id LIMIT 25
      """.stripMargin.trim))

  private val epochShuffle = QueryDef(
    "pipeline_epoch_shuffle",
    "Deterministic per-epoch dataset shuffle — the between-epochs " +
      "reordering every training run needs, with the RNG replaced by " +
      "the portable hash so shards, resumes, and re-runs agree on the " +
      "exact order: epoch e ranks every document by md5_48(e:doc_id) " +
      "via the distributed rank operator (range exchange + per-" +
      "partition offsets — NEVER the single-task global row_number, " +
      "the canonical 100 TB anti-pattern). The gate pins the " +
      "permutation itself: each epoch's first-5 head, Σrank = " +
      "n(n+1)/2 (proves every rank appears exactly once), and the " +
      "Σ rank·doc_id permutation fingerprint in exact DECIMAL (a " +
      "swapped pair changes it; different epochs — different " +
      "fingerprints — prove the reshuffle actually reorders). Three " +
      "epochs = three range exchanges over (hash, id); no driver " +
      "state, no sampled boundaries leaking into ranks (the total " +
      "order makes range placement irrelevant).",
    (s, dir) => {
      import graft.operators.{DistributedRank, TextAnalysis}
      val dec19 = DecimalType(19, 0)
      val dec38 = DecimalType(38, 0)
      val docs = Tables.documents(s, dir).select(col("doc_id"))
      val ranked = (1 to 3).map { e =>
        val keyed = docs
          .withColumn("epoch", lit(e.toLong))
          .withColumn("k", TextAnalysis.md5Long48(
            concat_ws(":", lit(e.toString), col("doc_id").cast("string"))))
        DistributedRank.byKey(keyed, Seq(col("k"), col("doc_id")))
      }.reduce(_ unionByName _)
      val per = ranked.groupBy(col("epoch")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("rank").cast(dec19)).cast(dec38).cast("string").as("sum_rank"),
        sum(col("rank").cast(dec19) * col("doc_id").cast(dec19))
          .cast(dec38).cast("string").as("perm_fp"))
      ranked.filter(col("rank") <= 5)
        .select(col("epoch"), col("rank").as("rnk"), col("doc_id"))
        .join(per, Seq("epoch"))
        .select(col("epoch"), col("rnk"), col("doc_id"),
          col("n_docs"), col("sum_rank"), col("perm_fp"))
        .orderBy(col("epoch"), col("rnk"))
    },
    Some("""
      |WITH e AS (
      |  SELECT unnest([1, 2, 3]) AS epoch
      |), k AS (
      |  SELECT e.epoch, d.doc_id,
      |         ('0x' || substring(md5(e.epoch::VARCHAR || ':' || d.doc_id::VARCHAR), 1, 12))::BIGINT AS k
      |  FROM documents d CROSS JOIN e
      |), r AS (
      |  SELECT epoch, doc_id,
      |         row_number() OVER (PARTITION BY epoch ORDER BY k, doc_id) AS rnk
      |  FROM k
      |), per AS (
      |  SELECT epoch, count(*) AS n_docs,
      |         CAST(CAST(SUM(CAST(rnk AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS VARCHAR) AS sum_rank,
      |         CAST(CAST(SUM(CAST(rnk AS DECIMAL(19,0)) * CAST(doc_id AS DECIMAL(19,0)))
      |              AS DECIMAL(38,0)) AS VARCHAR) AS perm_fp
      |  FROM r GROUP BY 1
      |)
      |SELECT r.epoch::BIGINT AS epoch, r.rnk::BIGINT AS rnk, r.doc_id,
      |       per.n_docs::BIGINT AS n_docs, per.sum_rank, per.perm_fp
      |FROM r JOIN per USING (epoch)
      |WHERE r.rnk <= 5
      |ORDER BY epoch, rnk
      """.stripMargin.trim))

  val defs: Seq[QueryDef] =
    Seq(prep, split, balanced, decontaminate, decontaminateBloom, rebalance,
      weighted, temperature, mixReport, hardNegatives, featureHash, curriculum,
      dsir, classifierFilter, epochShuffle)
}
