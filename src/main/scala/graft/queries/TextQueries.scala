package graft.queries

import graft.Tables
import graft.operators.TextAnalysis._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis query surface over the `documents` fixture (driver
  * mandate: language-ID, quality scoring, token counting, document
  * fingerprinting). All per-document work is a shuffle-free projection;
  * only the final top-k token aggregation shuffles (32 → tiny).
  *
  * Each query projects `norm` and `toks` ONCE and derives every
  * statistic from those named columns — the regex tokenization is the
  * dominant per-row cost and must not be re-evaluated per statistic
  * (CollapseProject keeps multiply-referenced non-cheap aliases
  * materialized).
  */
object TextQueries {

  /** (doc_id, lang, …, norm, toks) over the spread documents read. */
  private[graft] def docToks(s: SparkSession, dir: String): DataFrame =
    Tables.documentsSpread(s, dir)
      .withColumn("norm", normalize(col("text")))
      .withColumn("toks", tokensFromNorm(col("norm")))

  private val stats = QueryDef(
    "txt_stats",
    "Per-document token statistics: counts, distinct counts, mean token " +
      "length, punctuation count. Pure projection — no shuffle, scales " +
      "linearly with document count.",
    (s, dir) => {
      docToks(s, dir).select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct_tokens"),
        round(avgTokenLenFromTokens(col("toks")), 6).as("avg_token_len"),
        punctCount(col("norm")).as("n_punct"),
        bpeTokenCount(col("norm")).as("n_bpe_tokens"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      |${Duck.docToks}
      |SELECT doc_id, len(toks)::BIGINT AS n_tokens,
      |       len(list_distinct(toks))::BIGINT AS n_distinct_tokens,
      |       round(list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks), 6) AS avg_token_len,
      |       ${Duck.punct} AS n_punct,
      |       len(regexp_extract_all(norm, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+'))::BIGINT AS n_bpe_tokens
      |FROM tt ORDER BY doc_id
      """.stripMargin.trim))

  private val langQ = QueryDef(
    "txt_lang_id",
    "Heuristic language-ID: per-language stopword hit counts, argmax with " +
      "deterministic tie-break (hits desc, lang asc), no hits → 'und'.",
    (s, dir) => {
      val hitCols = stopwords.keys.toSeq.sorted.map(l =>
        stopwordHitsFromTokens(col("toks"), stopwords(l)).as(s"hits_$l"))
      docToks(s, dir)
        .select(Seq(col("doc_id"), col("lang"),
          langIdFromTokens(col("toks")).as("detected_lang")) ++ hitCols: _*)
        .orderBy(col("doc_id"))
    },
    Some {
      val langs = stopwords.keys.toSeq.sorted
      val hitSel = langs.map(l => s"${Duck.hits(stopwords(l))} AS hits_$l").mkString(",\n       ")
      val m = langs.map(l => s"hits_$l").mkString("greatest(", ", ", ")")
      val caseChain = langs.map(l => s"WHEN hits_$l = $m THEN '$l'").mkString("\n         ")
      s"""
      |${Duck.docToks}, h AS (
      |  SELECT doc_id, lang, $hitSel
      |  FROM tt
      |)
      |SELECT doc_id, lang,
      |       CASE WHEN $m = 0 THEN 'und'
      |         $caseChain
      |       END AS detected_lang,
      |       ${langs.map(l => s"hits_$l").mkString(", ")}
      |FROM h ORDER BY doc_id
      """.stripMargin.trim
    })

  private val quality = QueryDef(
    "txt_quality",
    "Composite quality score: 0.4·stopword-density + 0.3·length-saturation " +
      "+ 0.3·(1 − punctuation-ratio), deterministic double math.",
    (s, dir) => {
      docToks(s, dir)
        .select(col("doc_id"),
          round(qualityScoreFromParts(col("toks"), col("norm")), 6).as("quality_score"))
        .orderBy(col("quality_score").desc, col("doc_id"))
    },
    Some(s"""
      |${Duck.docToks}, q AS (
      |  SELECT doc_id,
      |         len(toks)::BIGINT AS n,
      |         ${Duck.hits(stopwords("en"))} AS en_hits,
      |         ${Duck.punct} AS np,
      |         length(norm) AS nc
      |  FROM tt
      |)
      |SELECT doc_id,
      |       round(CASE WHEN n = 0 THEN 0.0 ELSE
      |         0.4 * least(1.0, en_hits::DOUBLE * 8.0 / n::DOUBLE)
      |         + 0.3 * least(1.0, n::DOUBLE / 50.0)
      |         + 0.3 * (1.0 - np::DOUBLE / nc::DOUBLE) END, 6) AS quality_score
      |FROM q ORDER BY quality_score DESC, doc_id
      """.stripMargin.trim))

  private val fp = QueryDef(
    "txt_fingerprint",
    "Document fingerprints: md5 of normalized text (exact-dup key) and " +
      "min-shingle-hash (content-similarity key, winnowing-style).",
    (s, dir) => {
      docToks(s, dir).select(
        col("doc_id"),
        md5(col("norm")).as("fp_md5"),
        array_min(transform(shinglesFromTokens(col("toks"), 3), sh => md5(sh))).as("fp_shingle_min"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      |${Duck.docToks}
      |SELECT doc_id, md5(norm) AS fp_md5,
      |       list_min(list_transform(${Duck.shingles(3)}, s -> md5(s))) AS fp_shingle_min
      |FROM tt ORDER BY doc_id
      """.stripMargin.trim))

  private val topTokens = QueryDef(
    "txt_top_tokens",
    "Corpus vocabulary head: explode tokens → count → top 25. The only " +
      "shuffle in the text surface; partial aggregation makes the " +
      "shuffled data |vocab|, not |tokens|.",
    (s, dir) => {
      docToks(s, dir)
        .select(explode(col("toks")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(25)
    },
    Some(s"""
      |${Duck.docToks}
      |SELECT t AS token, count(*) AS n
      |FROM (SELECT unnest(toks) AS t FROM tt)
      |GROUP BY t ORDER BY n DESC, token LIMIT 25
      """.stripMargin.trim))

  private val bigramLift = QueryDef(
    "txt_bigram_lift",
    "Bigram collocation mining: corpus-wide lift (observed/expected " +
      "co-occurrence, the log-free PMI core) for bigrams seen ≥5 times, " +
      "top 25. Bigrams come from two aligned slices zipped per document " +
      "(no positional explode); unigram counts join on the term key " +
      "(vocab unbounded — never broadcast, the TF-IDF rule); the two " +
      "corpus totals are single-row broadcasts. The ratio is computed " +
      "in ONE fixed parenthesization over exact integer counts, so both " +
      "engines round identically; ranking and the cut use the " +
      "PRESENTED (rounded lift, bigram) key.",
    (s, dir) => {
      val tk = docToks(s, dir)
      val uni = tk.select(explode(col("toks")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
      val tot = uni.agg(sum(col("c")).as("t_tokens"))
      val bi = tk.select(explode(zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("pr"))
        .groupBy(col("pr.w1").as("w1"), col("pr.w2").as("w2"))
        .agg(count(lit(1)).as("cab"))
      val btot = bi.agg(sum(col("cab")).as("n_bigrams"))
      bi.filter(col("cab") >= 5)
        .join(uni.select(col("w").as("w1"), col("c").as("ca")), Seq("w1"))
        .join(uni.select(col("w").as("w2"), col("c").as("cb")), Seq("w2"))
        .crossJoin(broadcast(tot)).crossJoin(broadcast(btot))
        .select(concat(col("w1"), lit(" "), col("w2")).as("bigram"),
          col("cab").as("n_ab"),
          round((col("cab").cast("double") * col("t_tokens").cast("double") *
              col("t_tokens").cast("double")) /
            (col("n_bigrams").cast("double") * col("ca").cast("double") *
              col("cb").cast("double")), 6).as("lift"))
        .orderBy(col("lift").desc, col("bigram"))
        .limit(25)
    },
    Some(s"""
      |${Duck.docToks}, uni AS (
      |  SELECT t AS w, count(*) AS c FROM (SELECT unnest(toks) AS t FROM tt) GROUP BY 1
      |), tot AS (SELECT SUM(c) AS t_tokens FROM uni),
      |bi0 AS (
      |  SELECT unnest(list_transform(range(len(toks)-1), i -> {'w1': toks[i+1], 'w2': toks[i+2]})) AS pr FROM tt
      |), bi AS (
      |  SELECT pr.w1 AS w1, pr.w2 AS w2, count(*) AS cab FROM bi0 GROUP BY 1, 2
      |), btot AS (SELECT SUM(cab) AS n_bigrams FROM bi)
      |SELECT w1 || ' ' || w2 AS bigram, cab AS n_ab,
      |       round(((CAST(cab AS DOUBLE) * CAST(t_tokens AS DOUBLE)) * CAST(t_tokens AS DOUBLE))
      |             / ((CAST(n_bigrams AS DOUBLE) * CAST(ca.c AS DOUBLE)) * CAST(cb.c AS DOUBLE)), 6) AS lift
      |FROM bi JOIN uni ca ON bi.w1 = ca.w JOIN uni cb ON bi.w2 = cb.w, tot, btot
      |WHERE cab >= 5
      |ORDER BY lift DESC, bigram LIMIT 25
      """.stripMargin.trim))

  private val lmQ = QueryDef(
    "txt_lm_score",
    "Bigram language-model quality scoring with stupid backoff (Brants " +
      "et al. 2007) — the perplexity-filter signal of a pretraining " +
      "pipeline: a bigram LM is fitted on the even-doc_id HALF of the " +
      "corpus (so held-out docs genuinely hit the backoff path), and " +
      "every doc scores mean log-prob of its bigrams — seen: " +
      "ln(c(w1w2)/c(w1)); unseen: ln(0.4·(c(w2)+1)/(N+V)) (add-one on " +
      "the unigram backoff so OOV words score finitely). Counts join " +
      "on vocab keys (never broadcast); the two corpus scalars " +
      "broadcast as one row. Float-parity: each ln term is ROUNDED to " +
      "6 decimals first (engine-stable), then summed in exact " +
      "DECIMAL(38,6) — the per-doc sum is order-independent, so the " +
      "vocab-shuffle's row order cannot flip the hash. Output: the 10 " +
      "lowest-scoring docs — the gibberish-filter view.",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      def pairs(toksCol: org.apache.spark.sql.Column) = zip_with(
        slice(toksCol, lit(1), size(toksCol) - 1),
        slice(toksCol, lit(2), size(toksCol) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))
      val tk = docToks(s, dir).select(col("doc_id"), col("toks"))
      val train = tk.filter(col("doc_id") % 2 === 0)
      val uni = train.select(explode(col("toks")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c1"))
      val stats = uni.agg(sum(col("c1")).as("n_tok"), count(lit(1)).as("n_vocab"))
      val bi = train.select(explode(pairs(col("toks"))).as("pr"))
        .groupBy(col("pr.w1").as("w1"), col("pr.w2").as("w2"))
        .agg(count(lit(1)).as("c2"))
      val docBi = tk.select(col("doc_id"), explode(pairs(col("toks"))).as("pr"))
        .select(col("doc_id"), col("pr.w1").as("w1"), col("pr.w2").as("w2"))
      val scored = docBi
        .join(bi, Seq("w1", "w2"), "left")
        .join(uni.select(col("w").as("w1"), col("c1").as("c1w1")), Seq("w1"), "left")
        .join(uni.select(col("w").as("w2"), col("c1").as("c1w2")), Seq("w2"), "left")
        .crossJoin(broadcast(stats))
        .withColumn("lp", round(
          when(col("c2").isNotNull,
            log(col("c2").cast("double") / col("c1w1").cast("double")))
            .otherwise(log(
              (lit(0.4) * (coalesce(col("c1w2"), lit(0L)) + lit(1L)).cast("double")) /
                (col("n_tok") + col("n_vocab")).cast("double"))), 6))
      scored.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          sum(col("lp").cast(DecimalType(38, 6))).as("lp_sum"))
        .select(col("doc_id"), col("n_bigrams"),
          round(col("lp_sum").cast("double") / col("n_bigrams").cast("double"), 6)
            .as("avg_lp"))
        .orderBy(col("avg_lp"), col("doc_id")).limit(10)
    },
    Some(s"""
      |${Duck.docToks},
      |train AS (SELECT doc_id, toks FROM tt WHERE doc_id % 2 = 0),
      |uni AS (
      |  SELECT t AS w, count(*) AS c1 FROM (SELECT unnest(toks) AS t FROM train) GROUP BY 1
      |), st AS (SELECT SUM(c1) AS n_tok, COUNT(*) AS n_vocab FROM uni),
      |bi AS (
      |  SELECT pr.w1 AS w1, pr.w2 AS w2, count(*) AS c2 FROM (
      |    SELECT unnest(list_transform(range(len(toks)-1), i -> {'w1': toks[i+1], 'w2': toks[i+2]})) AS pr
      |    FROM train
      |  ) GROUP BY 1, 2
      |), docbi AS (
      |  SELECT doc_id, pr.w1 AS w1, pr.w2 AS w2 FROM (
      |    SELECT doc_id, unnest(list_transform(range(len(toks)-1), i -> {'w1': toks[i+1], 'w2': toks[i+2]})) AS pr
      |    FROM tt
      |  )
      |), scored AS (
      |  SELECT d.doc_id,
      |         round(CASE WHEN b.c2 IS NOT NULL
      |               THEN ln(CAST(b.c2 AS DOUBLE) / CAST(u1.c1 AS DOUBLE))
      |               ELSE ln((0.4 * CAST(COALESCE(u2.c1, 0) + 1 AS DOUBLE))
      |                       / CAST((st.n_tok + st.n_vocab) AS DOUBLE))
      |               END, 6) AS lp
      |  FROM docbi d
      |  LEFT JOIN bi b ON d.w1 = b.w1 AND d.w2 = b.w2
      |  LEFT JOIN uni u1 ON d.w1 = u1.w
      |  LEFT JOIN uni u2 ON d.w2 = u2.w
      |  CROSS JOIN st
      |)
      |SELECT doc_id, count(*) AS n_bigrams,
      |       round(CAST(SUM(CAST(lp AS DECIMAL(38,6))) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS avg_lp
      |FROM scored GROUP BY doc_id
      |ORDER BY avg_lp, doc_id LIMIT 10
      """.stripMargin.trim))

  private val simhashQ = QueryDef(
    "txt_simhash",
    "48-bit SimHash per document, computed in one pass with higher-order " +
      "functions (no explode, no shuffle); oracle recomputes it the " +
      "explicit way (token × bit explode + vote sums).",
    (s, dir) => {
      docToks(s, dir)
        .select(col("doc_id"), simhash48FromTokens(col("toks")).as("simhash"))
        .orderBy(col("doc_id"))
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
      |)
      |SELECT doc_id, sum(CASE WHEN vote > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
      |FROM bits GROUP BY doc_id ORDER BY doc_id
      """.stripMargin.trim))

  private val embedQ = QueryDef(
    "txt_embed_pipeline",
    "Batch embedding pipeline (reference ingest shape, ingest_hotels" +
      ".py:21-34, set-oriented): documents → batched partition-local " +
      "encode → unit-norm 64-d vectors via the md5-portable encoder; " +
      "oracle recomputes every vector in SQL (md5 buckets + float32 " +
      "quantization) and checks dim + norm per row.",
    (s, dir) => {
      import graft.functions.{Embeddings, Md5PortableEmbedder}
      import graft.functions.VectorFunctions._
      val d = Tables.documentsSpread(s, dir)
      val embedded = Embeddings.embedDataFrame(
        d.select("doc_id", "text"), "text", "vec", Md5PortableEmbedder(dim = 64))
      embedded.select(
        col("doc_id"),
        vectorDim(col("vec")).as("dim"),
        round(l2Norm(col("vec")), 4).as("norm"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      |${Duck.docToks}, ${Duck.md5EmbedVecs(64)}
      |SELECT doc_id, 64::INT AS dim, round(sqrt(list_dot_product(v, v)), 4) AS norm
      |FROM vecs ORDER BY doc_id
      """.stripMargin.trim))

  private val embedQuantQ = QueryDef(
    "txt_embed_quantized",
    "Calibrated-scale INT8 embedding seam (the ONNX-int8 swap-in " +
      "contract): the SAME embedDataFrame pipeline runs with " +
      "QuantizedEmbedder(base, amax) — base encode → symmetric int8 " +
      "quantize at the calibrated scale (amax = max |component| over " +
      "the corpus, ONE bounded aggregate; static post-training " +
      "quantization's calibration step) → dequantize to float32 — so " +
      "swapping a real int8 model in is a model-VALUE change, not a " +
      "pipeline change. The gate hash-checks the error-vs-float " +
      "telemetry itself (vec_quantization_error's contract, pushed " +
      "through the embed path): per-doc cosine error and max " +
      "component error between the float and quantized seams, rolled " +
      "up with DECIMAL sums. The oracle recomputes BOTH seams in SQL — " +
      "the portable embedder bit-for-bit, the calibration max, the " +
      "half-up clamped quantization arithmetic — so a green hash pins " +
      "every quantized component, not just the summary.",
    (s, dir) => {
      import graft.functions.{Embeddings, Md5PortableEmbedder, QuantizedEmbedder}
      import graft.functions.VectorFunctions._
      val base = Md5PortableEmbedder(dim = 64)
      val d = Tables.documentsSpread(s, dir).select("doc_id", "text")
      val emb = Embeddings.embedDataFrame(d, "text", "vec", base)
      // calibration: one bounded aggregate — a single double leaves the
      // cluster, exactly like an index's stats
      val amax = emb
        .agg(max(array_max(transform(col("vec"), x => abs(x)))))
        .head().getFloat(0).toDouble
      val qemb = Embeddings.embedDataFrame(d, "text", "qvec",
        QuantizedEmbedder(base, amax))
      emb.join(qemb.select("doc_id", "qvec"), "doc_id")
        .select(
          round(cosineDistance(col("vec"), col("qvec")), 6).as("cos_err"),
          array_max(zip_with(col("vec"), col("qvec"),
            (a, b) => abs(a.cast("double") - b.cast("double")))).as("abs_err"))
        .agg(
          count(lit(1)).as("n_docs"),
          round(lit(amax), 6).as("amax"),
          round(sum(col("cos_err").cast("decimal(38,6)")).cast("double") /
            count(lit(1)).cast("double"), 6).as("mean_cos_err"),
          round(max(col("cos_err")), 6).as("max_cos_err"),
          round(max(col("abs_err")), 6).as("max_abs_err"))
    },
    Some(s"""
      |${Duck.docToks}, ${Duck.md5EmbedVecs(64)},
      |am AS (
      |  SELECT max(abs(c)) AS amax FROM comp
      |), qcomp AS (
      |  SELECT c.doc_id, c.bucket, c.c,
      |         CAST(CAST(greatest(-127.0, least(127.0,
      |                floor(c.c * 127.0 / am.amax + 0.5)))
      |              * am.amax / 127.0 AS FLOAT) AS DOUBLE) AS qc
      |  FROM comp c CROSS JOIN am
      |), pairs AS (
      |  -- ORDERED lists so the dot products accumulate in bucket order,
      |  -- exactly like the Spark expression's index-order pass
      |  SELECT doc_id, list(c ORDER BY bucket) AS v,
      |         list(qc ORDER BY bucket) AS qv,
      |         max(abs(c - qc)) AS abs_err
      |  FROM qcomp GROUP BY doc_id
      |), per_doc AS (
      |  SELECT doc_id, round(${Duck.cosine("v", "qv")}, 6) AS cos_err, abs_err
      |  FROM pairs
      |)
      |SELECT count(*)::BIGINT AS n_docs,
      |       (SELECT round(amax, 6) FROM am) AS amax,
      |       round(CAST(sum(CAST(cos_err AS DECIMAL(38,6))) AS DOUBLE)
      |             / count(*)::DOUBLE, 6) AS mean_cos_err,
      |       round(max(cos_err), 6) AS max_cos_err,
      |       round(max(abs_err), 6) AS max_abs_err
      |FROM per_doc
      """.stripMargin.trim))

  private val embedQuantSampledQ = QueryDef(
    "txt_embed_quant_sampled",
    "SAMPLED calibration + COLUMNAR backfill — the deployment shape of " +
      "the int8 seam (r18 verdict #4): txt_embed_quantized calibrates " +
      "on the full corpus and re-encodes every document (corpus-linear " +
      "× 2 encodes, by design); production calibrates amax on a hash " +
      "sample (doc_id % 100 == 0 — deterministic, replayable) and " +
      "backfills the STORED float vectors through one columnar " +
      "quantize→dequantize projection (quantizeInt8Clamped — no " +
      "re-encode; saturation is REAL under a sampled scale, so " +
      "components above the sampled amax clip to ±127 exactly like a " +
      "deployed int8 model, and the clip count rides the output as " +
      "calibration-quality telemetry). Error-vs-full-calibration " +
      "rides beside it: the same backfill at the full-corpus amax, " +
      "both cosine-error channels DECIMAL-rolled. The oracle " +
      "recomputes the embeddings bit-for-bit, both calibration " +
      "maxima, the half-up clamped arithmetic, the clip count and " +
      "both error rollups in SQL — a green hash pins every backfilled " +
      "component of both seams.",
    (s, dir) => {
      import graft.functions.{Embeddings, Md5PortableEmbedder}
      import graft.functions.VectorFunctions._
      val d = Tables.documentsSpread(s, dir).select("doc_id", "text")
      val emb = Embeddings.embedDataFrame(d, "text", "vec",
        Md5PortableEmbedder(dim = 64))
      // calibration: ONE bounded aggregate per scale — a scalar leaves
      // the cluster, like an index's stats. Sampled = the doc_id % 100
      // hash sample; full = the whole corpus (the yardstick seam).
      val cal = emb.agg(
        max(when(pmod(col("doc_id"), lit(100)) === 0, quantScale(col("vec"))))
          .as("amax_s"),
        max(quantScale(col("vec"))).as("amax_f"),
        sum(when(pmod(col("doc_id"), lit(100)) === 0, 1L).otherwise(0L))
          .as("n_cal")).head()
      // ADVICE r19: an empty hash sample leaves amax_s NULL and
      // getDouble would throw a bare NPE — fail with the actual cause
      // (the corpus' doc_ids never hit the sample predicate) instead
      require(!cal.isNullAt(0),
        "sampled int8 calibration is empty: no doc_id % 100 == 0 rows " +
          "in the corpus — widen the sample predicate or calibrate on " +
          "the full corpus (txt_embed_quantized's seam)")
      val (amaxS, amaxF, nCal) =
        (cal.getDouble(0), cal.getDouble(1), cal.getLong(2))
      val backfilled = emb
        .withColumn("deq_s",
          dequantizeInt8(quantizeInt8Clamped(col("vec"), lit(amaxS)), lit(amaxS)))
        .withColumn("deq_f",
          dequantizeInt8(quantizeInt8Clamped(col("vec"), lit(amaxF)), lit(amaxF)))
        .select(
          clippedCount(col("vec"), lit(amaxS)).cast("long").as("clip_s"),
          round(cosineDistance(col("vec"), col("deq_s")), 6).as("cos_err_s"),
          array_max(zip_with(col("vec"), col("deq_s"),
            (a, b) => abs(a.cast("double") - b.cast("double")))).as("abs_err_s"),
          round(cosineDistance(col("vec"), col("deq_f")), 6).as("cos_err_f"))
      backfilled.agg(
        count(lit(1)).as("n_docs"),
        lit(nCal).as("n_cal"),
        round(lit(amaxS), 6).as("amax_sampled"),
        round(lit(amaxF), 6).as("amax_full"),
        sum(col("clip_s")).as("n_clipped"),
        round(sum(col("cos_err_s").cast("decimal(38,6)")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_cos_err_sampled"),
        round(max(col("cos_err_s")), 6).as("max_cos_err_sampled"),
        round(max(col("abs_err_s")), 6).as("max_abs_err_sampled"),
        round(sum(col("cos_err_f").cast("decimal(38,6)")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_cos_err_full"))
    },
    Some(s"""
      |${Duck.docToks}, ${Duck.md5EmbedVecs(64)},
      |am_s AS (
      |  SELECT max(abs(c)) AS amax FROM comp WHERE doc_id % 100 = 0
      |), am_f AS (
      |  SELECT max(abs(c)) AS amax FROM comp
      |), qcomp AS (
      |  SELECT c.doc_id, c.bucket, c.c,
      |         CASE WHEN floor(c.c * 127.0 / am_s.amax + 0.5) > 127.0
      |                OR floor(c.c * 127.0 / am_s.amax + 0.5) < -127.0
      |              THEN 1 ELSE 0 END AS clipped,
      |         CAST(CAST(greatest(-127.0, least(127.0,
      |                floor(c.c * 127.0 / am_s.amax + 0.5)))
      |              * am_s.amax / 127.0 AS FLOAT) AS DOUBLE) AS qc_s,
      |         CAST(CAST(greatest(-127.0, least(127.0,
      |                floor(c.c * 127.0 / am_f.amax + 0.5)))
      |              * am_f.amax / 127.0 AS FLOAT) AS DOUBLE) AS qc_f
      |  FROM comp c CROSS JOIN am_s CROSS JOIN am_f
      |), pairs AS (
      |  SELECT doc_id, list(c ORDER BY bucket) AS v,
      |         list(qc_s ORDER BY bucket) AS qv_s,
      |         list(qc_f ORDER BY bucket) AS qv_f,
      |         max(abs(c - qc_s)) AS abs_err_s,
      |         sum(clipped) AS clip_s
      |  FROM qcomp GROUP BY doc_id
      |), per_doc AS (
      |  SELECT doc_id, round(${Duck.cosine("v", "qv_s")}, 6) AS cos_err_s,
      |         round(${Duck.cosine("v", "qv_f")}, 6) AS cos_err_f,
      |         abs_err_s, clip_s
      |  FROM pairs
      |)
      |SELECT count(*)::BIGINT AS n_docs,
      |       (SELECT count(*) FROM documents WHERE doc_id % 100 = 0)::BIGINT AS n_cal,
      |       (SELECT round(amax, 6) FROM am_s) AS amax_sampled,
      |       (SELECT round(amax, 6) FROM am_f) AS amax_full,
      |       sum(clip_s)::BIGINT AS n_clipped,
      |       round(CAST(sum(CAST(cos_err_s AS DECIMAL(38,6))) AS DOUBLE)
      |             / count(*)::DOUBLE, 6) AS mean_cos_err_sampled,
      |       round(max(cos_err_s), 6) AS max_cos_err_sampled,
      |       round(max(abs_err_s), 6) AS max_abs_err_sampled,
      |       round(CAST(sum(CAST(cos_err_f AS DECIMAL(38,6))) AS DOUBLE)
      |             / count(*)::DOUBLE, 6) AS mean_cos_err_full
      |FROM per_doc
      """.stripMargin.trim))

  /** Driver-side embedding of the e2e query text — the reference's
    * search entry point embeds the user query exactly once on the
    * client (`streamlit_app.py:45-52`); here the same portable model
    * embeds both corpus (distributed) and query (driver literal).
    */
  private val e2eModel = graft.functions.Md5PortableEmbedder(dim = 64)
  private val e2eQueryVec = e2eModel.encode("graft portable embed knn query")

  private val embedKnnQ = QueryDef(
    "txt_embed_knn_e2e",
    "End-to-end reference ingest+search path, fully oracle-checked: " +
      "documents → batched md5-portable embedding (mapPartitions, " +
      "broadcast model) → exact cosine top-10 against a driver-embedded " +
      "query literal. The DuckDB oracle recomputes the corpus vectors " +
      "in SQL (bit-identical float32s) and mirrors the KNN.",
    (s, dir) => {
      import graft.functions.Embeddings
      import graft.operators.Knn
      val d = Tables.documentsSpread(s, dir)
      val embedded = Embeddings.embedDataFrame(
        d.select("doc_id", "text"), "text", "vec", e2eModel)
      Knn.search(embedded, "vec", "doc_id", e2eQueryVec, k = 10)
        .select(col("doc_id"), round(col("distance_score"), 6).as("distance"))
        .orderBy(col("distance"), col("doc_id"))
    },
    Some {
      val qLit = Duck.vecLit(e2eQueryVec)
      s"""
      |${Duck.docToks}, ${Duck.md5EmbedVecs(64)},
      |d AS (
      |  SELECT doc_id, ${Duck.cosine("v", qLit)} AS dist
      |  FROM vecs ORDER BY dist, doc_id LIMIT 10
      |)
      |SELECT doc_id, round(dist, 6) AS distance
      |FROM d ORDER BY distance, doc_id
      """.stripMargin.trim
    })

  /** BM25 query terms — high-df tokens of the fixture corpus so the
    * saturation terms exercise meaningfully.
    */
  private val bm25Terms = Seq("spark", "table", "scan")

  /** (doc_id, bm25) — per-document BM25 score (k1=1.2, b=0.75, Lucene
    * idf) for [[bm25Terms]], rounded to 6 decimals. SHARED by
    * `txt_bm25_topk` and the RRF fusion's lexical leg (single-builder
    * rule — a parity fix to one can never strand the other). Per-doc
    * tf/dl ride the token projection (no explode — the query term set
    * is tiny and fixed); corpus stats (N, Σdl, per-term df) are ONE
    * map-side-partial aggregate whose single row is broadcast back.
    */
  private def bm25Scored(s: SparkSession, dir: String): DataFrame = {
    val base = docToks(s, dir)
      .select(col("doc_id"), col("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))
    val withTf = bm25Terms.foldLeft(base) { (df, t) =>
      df.withColumn(s"tf_$t", size(filter(col("toks"), x => x === t)).cast("double"))
    }
    val statCols =
      Seq(count(lit(1)).cast("double").as("n_docs"),
        sum(col("dl").cast("decimal(38,6)")).cast("decimal(38,2)").cast("double").as("dl_sum")) ++
        bm25Terms.map(t =>
          sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).cast("double").as(s"df_$t"))
    val stats = withTf.agg(statCols.head, statCols.tail: _*)
    val avgdl = col("dl_sum") / col("n_docs")
    val score = bm25Terms.map { t =>
      val tf = col(s"tf_$t"); val df = col(s"df_$t")
      val idf = log((col("n_docs") - df + 0.5) / (df + 0.5) + 1.0)
      idf * ((tf * 2.2) / (tf + lit(1.2) * (lit(1.0) - 0.75 + lit(0.75) * col("dl") / avgdl)))
    }.reduce(_ + _)
    withTf.crossJoin(broadcast(stats))
      .select(col("doc_id"), round(score, 6).as("bm25"))
  }

  /** The SQL twin of [[bm25Scored]]: CTE chain (appended after
    * `Duck.docToks`) ending in `bm25sc(doc_id, bm25)`.
    */
  private val duckBm25Cte: String = {
    val tfSel = bm25Terms.map(t =>
      s"len(list_filter(toks, x -> x = '$t'))::DOUBLE AS tf_$t").mkString(",\n       ")
    val dfSel = bm25Terms.map(t =>
      s"sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END)::DOUBLE AS df_$t").mkString(",\n       ")
    val scoreSql = bm25Terms.map(t =>
      s"ln((n_docs - df_$t + 0.5) / (df_$t + 0.5) + 1.0) * " +
        s"((tf_$t * 2.2) / (tf_$t + 1.2 * (1.0 - 0.75 + 0.75 * dl / (dl_sum / n_docs))))")
      .mkString(" + ")
    s"""base AS (
    |  SELECT doc_id, len(toks)::DOUBLE AS dl,
    |       $tfSel
    |  FROM tt
    |), st AS (
    |  SELECT count(*)::DOUBLE AS n_docs,
    |       CAST(CAST(SUM(CAST(dl AS DECIMAL(38,6))) AS DECIMAL(38,2)) AS DOUBLE) AS dl_sum,
    |       $dfSel
    |  FROM base
    |), bm25sc AS (
    |  SELECT doc_id, round($scoreSql, 6) AS bm25
    |  FROM base, st
    |)""".stripMargin
  }

  private val bm25Q = QueryDef(
    "txt_bm25_topk",
    "BM25 ranking (k1=1.2, b=0.75, Lucene idf): top-10 documents for a " +
      "3-term query. Per-doc tf/dl ride the token projection (no " +
      "explode — the query term set is tiny and fixed); corpus stats " +
      "(N, Σdl, per-term df) are ONE map-side-partial aggregate whose " +
      "single row is broadcast back. Rank on the rounded score so a " +
      "1-ulp ln() divergence can't flip cross-engine ordering.",
    (s, dir) =>
      bm25Scored(s, dir)
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(10),
    Some(s"""
      |${Duck.docToks}, $duckBm25Cte
      |SELECT doc_id, bm25
      |FROM bm25sc
      |ORDER BY bm25 DESC, doc_id LIMIT 10
      """.stripMargin.trim))

  private val hybridRrfQ = QueryDef(
    "knn_hybrid_rrf",
    "Hybrid lexical+vector retrieval with reciprocal-rank fusion " +
      "(Cormack et al. 2009, the fusion every hybrid vector engine " +
      "ships): BM25 top-30 (shared bm25Scored builder) and embedded " +
      "cosine KNN top-30 (shared e2e embedder — DuckDB recomputes the " +
      "float32 vectors bit-for-bit) are each ranked on their rounded " +
      "score, full-outer-joined on doc_id, and fused as " +
      "Σ 1/(60+rank) — a fixed two-term sum of exact double divisions, " +
      "so the fused score is cross-engine bit-identical. Each leg is a " +
      "TakeOrderedAndProject over its own scan; the rank windows run " +
      "over 30-row relations and the fusion join is 30×30 — at 100 TB " +
      "the only data-sized work is the two scans. Final top-10 on " +
      "(rrf DESC, doc_id).",
    (s, dir) => {
      import graft.functions.Embeddings
      import graft.operators.Knn
      import org.apache.spark.sql.expressions.Window
      val lexTop = bm25Scored(s, dir)
        .orderBy(col("bm25").desc, col("doc_id")).limit(30)
        .withColumn("lex_rank",
          row_number().over(Window.orderBy(col("bm25").desc, col("doc_id")))
            .cast("long"))
      val embedded = Embeddings.embedDataFrame(
        Tables.documentsSpread(s, dir).select("doc_id", "text"),
        "text", "vec", e2eModel)
      val semTop = Knn.search(embedded, "vec", "doc_id", e2eQueryVec, k = 30)
        .select(col("doc_id"), round(col("distance_score"), 6).as("vdist"))
        .withColumn("vec_rank",
          row_number().over(Window.orderBy(col("vdist").asc, col("doc_id")))
            .cast("long"))
      val rrf = coalesce(lit(1.0) / (lit(60) + col("lex_rank")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(60) + col("vec_rank")), lit(0.0))
      lexTop.select("doc_id", "lex_rank")
        .join(semTop.select("doc_id", "vec_rank"), Seq("doc_id"), "full_outer")
        .withColumn("rrf", round(rrf, 6))
        .orderBy(col("rrf").desc, col("doc_id")).limit(10)
        .select(col("doc_id"), col("lex_rank"), col("vec_rank"), col("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
    },
    Some(s"""
      |${Duck.docToks}, $duckBm25Cte, ${Duck.md5EmbedVecs(64)},
      |lex AS (
      |  SELECT doc_id, bm25 FROM bm25sc ORDER BY bm25 DESC, doc_id LIMIT 30
      |), lexr AS (
      |  SELECT doc_id,
      |         row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
      |  FROM lex
      |), sem AS (
      |  SELECT doc_id, round(dist, 6) AS vdist FROM (
      |    SELECT doc_id, ${Duck.cosine("v", Duck.vecLit(e2eQueryVec))} AS dist
      |    FROM vecs ORDER BY dist, doc_id LIMIT 30
      |  )
      |), semr AS (
      |  SELECT doc_id,
      |         row_number() OVER (ORDER BY vdist, doc_id) AS vec_rank
      |  FROM sem
      |), fused AS (
      |  SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id, l.lex_rank, v.vec_rank,
      |         round(COALESCE(1.0 / (60 + l.lex_rank), 0.0)
      |               + COALESCE(1.0 / (60 + v.vec_rank), 0.0), 6) AS rrf
      |  FROM lexr l FULL OUTER JOIN semr v ON l.doc_id = v.doc_id
      |), top AS (
      |  SELECT doc_id, lex_rank, vec_rank, rrf FROM fused
      |  ORDER BY rrf DESC, doc_id LIMIT 10
      |)
      |SELECT doc_id, lex_rank, vec_rank, rrf
      |FROM top ORDER BY rrf DESC, doc_id
      """.stripMargin.trim))

  /** Two fixed "query token" vectors for the late-interaction query —
    * multi-vector queries are MaxSim's whole point.
    */
  private val maxsimQueryVecs: Seq[Array[Float]] =
    Seq("spark partition shuffle scan", "vector index probe search")
      .map(e2eModel.encode)

  private val maxsimQ = QueryDef(
    "knn_maxsim_colbert",
    "Late-interaction multi-vector retrieval (ColBERT MaxSim, " +
      "Khattab & Zaharia 2020): each document is represented by MANY " +
      "vectors — one per 32-token chunk (stride 24, the " +
      "txt_chunk_windows layout) — and a 2-vector query scores a doc " +
      "as Σ over query vectors of the MAX chunk similarity. The max " +
      "is an algebraic aggregate, so the chunk explosion collapses " +
      "via map-side partials in ONE (doc_id)-keyed shuffle of " +
      "(doc_id, sim…) rows — chunk vectors never cross the network; " +
      "at 100 TB the multi-vector index scales by chunks scanned, not " +
      "chunks shuffled. DuckDB recomputes the chunk embeddings " +
      "bit-for-bit (md5-portable embedder over the chunk token " +
      "slices) and mirrors both maxes; the 2-term final sum is " +
      "fixed-order.",
    (s, dir) => {
      import graft.functions.Embeddings
      import graft.operators.TextChunking.chunkTokens
      val chunks = docToks(s, dir)
        .select(col("doc_id"),
          posexplode(chunkTokens(col("toks"), chunkSize = 32, overlap = 8))
            .as(Seq("chunk_idx", "chunk")))
        .filter(size(col("chunk")) > 0)
        .select(col("doc_id"), array_join(col("chunk"), " ").as("chunk_text"))
      val emb = Embeddings.embedDataFrame(chunks, "chunk_text", "cvec", e2eModel)
      val sims = maxsimQueryVecs.zipWithIndex.foldLeft(emb) { case (df, (qv, i)) =>
        df.withColumn(s"sim_$i", lit(1.0) -
          graft.functions.VectorFunctions.cosineDistance(col("cvec"), typedLit(qv.toSeq)))
      }
      sims.groupBy(col("doc_id"))
        .agg(max(col("sim_0")).as("m0"), max(col("sim_1")).as("m1"))
        .select(col("doc_id"), round(col("m0") + col("m1"), 6).as("maxsim"))
        .orderBy(col("maxsim").desc, col("doc_id")).limit(10)
    },
    Some {
      val q0 = Duck.vecLit(maxsimQueryVecs(0))
      val q1 = Duck.vecLit(maxsimQueryVecs(1))
      s"""
      |${Duck.docToks}, ch AS (
      |  SELECT doc_id,
      |         unnest(list_transform(range(((greatest(len(toks),1) - 1) // 24)::BIGINT + 1),
      |                i -> struct_pack(idx := i, chunk := list_slice(toks, i*24 + 1, i*24 + 32)))) AS c
      |  FROM tt
      |), ck AS (
      |  SELECT doc_id, c.idx AS chunk_idx, c.chunk AS ctoks FROM ch WHERE len(c.chunk) > 0
      |), ctok AS (
      |  SELECT doc_id, chunk_idx, unnest(ctoks) AS t FROM ck
      |), cbk AS (
      |  SELECT doc_id, chunk_idx,
      |         (('0x' || substring(md5(t), 1, 12))::BIGINT % 64) AS bucket,
      |         CASE WHEN ('0x' || substring(md5(t), 13, 1))::BIGINT < 8 THEN 1 ELSE -1 END AS sign
      |  FROM ctok
      |), cacc AS (
      |  SELECT doc_id, chunk_idx, bucket, sum(sign)::DOUBLE AS w FROM cbk GROUP BY 1, 2, 3
      |), cdense AS (
      |  SELECT k.doc_id, k.chunk_idx, r.i AS bucket, COALESCE(a.w, 0.0) AS w
      |  FROM ck k CROSS JOIN (SELECT unnest(range(64)) AS i) r
      |  LEFT JOIN cacc a ON a.doc_id = k.doc_id AND a.chunk_idx = k.chunk_idx AND a.bucket = r.i
      |), cnrm AS (
      |  SELECT doc_id, chunk_idx, sqrt(sum(w * w)) AS nn FROM cdense GROUP BY 1, 2
      |), ccomp AS (
      |  SELECT d.doc_id, d.chunk_idx, d.bucket,
      |         CASE WHEN n.nn = 0 THEN (CASE WHEN d.bucket = 0 THEN 1.0 ELSE 0.0 END)
      |              ELSE CAST(CAST(d.w / n.nn AS FLOAT) AS DOUBLE) END AS c
      |  FROM cdense d JOIN cnrm n ON d.doc_id = n.doc_id AND d.chunk_idx = n.chunk_idx
      |), cvecs AS (
      |  SELECT doc_id, chunk_idx, list(c ORDER BY bucket) AS v FROM ccomp GROUP BY 1, 2
      |), sims AS (
      |  SELECT doc_id,
      |         1.0 - ${Duck.cosine("v", q0)} AS sim_0,
      |         1.0 - ${Duck.cosine("v", q1)} AS sim_1
      |  FROM cvecs
      |), agg AS (
      |  SELECT doc_id, round(max(sim_0) + max(sim_1), 6) AS maxsim
      |  FROM sims GROUP BY doc_id
      |)
      |SELECT doc_id, maxsim FROM agg ORDER BY maxsim DESC, doc_id LIMIT 10
      """.stripMargin.trim
    })

  private val tfidfQ = QueryDef(
    "txt_tfidf_top_terms",
    "Top-3 TF-IDF terms per document (tf · ln(N/df)): explode + two " +
      "keyed aggregates (map-side partials), vocab-keyed shuffle join " +
      "for df (never broadcast — vocab is unbounded at scale), " +
      "WindowGroupLimit per-doc rank. Rank on the rounded score so a " +
      "1-ulp ln() divergence can't flip cross-engine ordering.",
    (s, dir) =>
      graft.operators.TfIdf.topTerms(Tables.documentsSpread(s, dir), "text", "doc_id", 3)
        .orderBy(col("doc_id"), col("rnk")),
    Some(s"""
      |${Duck.docToks}, tokx AS (
      |  SELECT doc_id, unnest(toks) AS tok FROM tt
      |), tf AS (
      |  SELECT doc_id, tok, count(*)::BIGINT AS tf FROM tokx GROUP BY 1, 2
      |), dfreq AS (
      |  SELECT tok, count(*)::BIGINT AS df FROM tf GROUP BY 1
      |), scored AS (
      |  SELECT tf.doc_id, tf.tok,
      |         round(tf.tf * ln((SELECT count(*) FROM documents)::DOUBLE / dfreq.df), 6) AS tfidf
      |  FROM tf JOIN dfreq USING (tok)
      |), ranked AS (
      |  SELECT doc_id, tok, tfidf,
      |         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rnk
      |  FROM scored
      |)
      |SELECT doc_id, rnk, tok, tfidf FROM ranked WHERE rnk <= 3
      |ORDER BY doc_id, rnk
      """.stripMargin.trim))

  private val chunksQ = QueryDef(
    "txt_chunk_windows",
    "Context-length chunking: 32-token windows with 8-token overlap " +
      "(stride 24), final partial window kept. Pure per-row HOF + " +
      "posexplode — no shuffle; chunk text fingerprinted (md5) so the " +
      "cross-engine check covers exact window contents.",
    (s, dir) => {
      import graft.operators.TextChunking.chunkTokens
      docToks(s, dir)
        .select(col("doc_id"),
          posexplode(chunkTokens(col("toks"), chunkSize = 32, overlap = 8))
            .as(Seq("chunk_idx", "chunk")))
        .filter(size(col("chunk")) > 0)
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          size(col("chunk")).cast("long").as("n_chunk_tokens"),
          md5(array_join(col("chunk"), " ")).as("chunk_fp"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },
    Some(s"""
      |${Duck.docToks}, ch AS (
      |  SELECT doc_id,
      |         unnest(list_transform(range(((greatest(len(toks),1) - 1) // 24)::BIGINT + 1),
      |                i -> struct_pack(idx := i, chunk := list_slice(toks, i*24 + 1, i*24 + 32)))) AS c
      |  FROM tt
      |)
      |SELECT doc_id, c.idx AS chunk_idx, len(c.chunk)::BIGINT AS n_chunk_tokens,
      |       md5(array_to_string(c.chunk, ' ')) AS chunk_fp
      |FROM ch WHERE len(c.chunk) > 0 ORDER BY doc_id, chunk_idx
      """.stripMargin.trim))

  private val packQ = QueryDef(
    "pipeline_pack_sequences",
    "Concat-and-cut sequence packing: per language shard, docs in " +
      "doc_id order are cut every 512 tokens; pack_id = exclusive " +
      "running token sum ÷ 512. Parallelism = shards (each prefix sum " +
      "is an independent window partition); deterministic layout → " +
      "rerun-identical training shards.",
    (s, dir) => {
      import graft.operators.TextChunking.packSequences
      val withN = docToks(s, dir)
        .select(col("doc_id"), col("lang"), size(col("toks")).cast("long").as("n"))
      packSequences(withN, col("n"), col("doc_id"), col("lang"), seqLen = 512)
        .groupBy(col("lang"), col("pack_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n").cast("decimal(38,6)")).cast("long").as("n_tokens"))
        .orderBy(col("lang"), col("pack_id"))
    },
    Some(s"""
      |${Duck.docToks}, cnt AS (
      |  SELECT doc_id, lang, len(toks)::BIGINT AS n FROM tt
      |), cum AS (
      |  SELECT lang, doc_id, n,
      |         COALESCE(SUM(n) OVER (PARTITION BY lang ORDER BY doc_id
      |                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
      |  FROM cnt
      |)
      |SELECT lang, (prior // 512)::BIGINT AS pack_id, count(*) AS n_docs,
      |       CAST(SUM(CAST(n AS DECIMAL(38,6))) AS BIGINT) AS n_tokens
      |FROM cum GROUP BY 1, 2 ORDER BY lang, pack_id
      """.stripMargin.trim))

  private val tokenBudgetQ = QueryDef(
    "txt_token_budget",
    "Training-cost accounting: BPE-ish token totals per (lang, source) " +
      "shard with each shard's share of the corpus budget — the " +
      "number that prices a training run and drives mixture weights. " +
      "One map-side-partial aggregate; the corpus total rides a window " +
      "over the tiny aggregated frame, not the raw data.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val shard = docToks(s, dir)
        .select(col("lang"), col("source"), bpeTokenCount(col("norm")).as("n_bpe"))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bpe").cast("decimal(38,6)")).cast("long").as("n_tokens"))
      shard
        .withColumn("share",
          round(col("n_tokens").cast("double") /
            sum(col("n_tokens")).over(Window.partitionBy()).cast("double"), 6))
        .orderBy(col("lang"), col("source"))
    },
    Some(s"""
      |${Duck.docToks}, shard AS (
      |  SELECT lang, source, count(*) AS n_docs,
      |         CAST(SUM(CAST(len(regexp_extract_all(norm, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+'))::BIGINT AS DECIMAL(38,6))) AS BIGINT) AS n_tokens
      |  FROM tt GROUP BY 1, 2
      |)
      |SELECT lang, source, n_docs, n_tokens,
      |       round(n_tokens::DOUBLE / sum(n_tokens) OVER ()::DOUBLE, 6) AS share
      |FROM shard ORDER BY lang, source
      """.stripMargin.trim))

  private val gopherQ = QueryDef(
    "txt_gopher_filters",
    "Gopher-style quality gate (Rae et al. 2021 A1.1): mean word " +
      "length ∈ [3,10], symbol/word < 0.1, alpha-word fraction > 0.8, " +
      "≥ 2 en stopwords, top-bigram fraction ≤ 0.2. Shape metrics are " +
      "linear HOF projections; the repetition metric aggregates " +
      "(explode + two map-side-combining groupBys), never O(d²)/row.",
    (s, dir) => {
      import graft.operators.TextFilters._
      val base = docToks(s, dir).select(col("doc_id"), col("norm"), col("toks"))
      val bg = topBigramFraction(base, "toks", "doc_id")
        .withColumnRenamed("id", "doc_id")
      base.join(bg, Seq("doc_id"), "left")
        .select(col("doc_id"),
          round(meanWordLen(col("toks")), 6).as("mean_word_len"),
          round(symbolWordRatio(col("norm"), col("toks")), 6).as("symbol_ratio"),
          round(alphaWordFraction(col("toks")), 6).as("alpha_frac"),
          stopwordHitsFromTokens(col("toks"), stopwords("en")).as("en_stops"),
          round(coalesce(col("top_bigram_frac"), lit(0.0)), 6).as("top_bigram_frac"))
        .withColumn("gopher_pass",
          col("mean_word_len").between(3.0, 10.0) && col("symbol_ratio") < 0.1 &&
            col("alpha_frac") > 0.8 && col("en_stops") >= 2 &&
            col("top_bigram_frac") <= 0.2)
        .orderBy(col("doc_id"))
    },
    Some(s"""
      |${Duck.docToks}, bg AS (
      |  SELECT doc_id, unnest(list_transform(range(len(toks) - 1),
      |         i -> toks[i+1] || ' ' || toks[i+2])) AS b
      |  FROM tt WHERE len(toks) >= 2
      |), bgc AS (
      |  SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2
      |), bgf AS (
      |  SELECT doc_id, max(c)::DOUBLE / sum(c)::DOUBLE AS top_bigram_frac
      |  FROM bgc GROUP BY doc_id
      |), m AS (
      |  SELECT tt.doc_id,
      |         round(CASE WHEN len(toks) = 0 THEN 0.0 ELSE
      |           list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks) END, 6) AS mean_word_len,
      |         round(CASE WHEN len(toks) = 0 THEN 0.0 ELSE
      |           ((length(norm) - length(replace(norm, '#', '')))
      |            + (length(norm) - length(replace(norm, '...', ''))) / 3)::DOUBLE / len(toks) END, 6) AS symbol_ratio,
      |         round(CASE WHEN len(toks) = 0 THEN 0.0 ELSE
      |           len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::DOUBLE / len(toks) END, 6) AS alpha_frac,
      |         ${Duck.hits(stopwords("en"))} AS en_stops,
      |         round(COALESCE(bgf.top_bigram_frac, 0.0), 6) AS top_bigram_frac
      |  FROM tt LEFT JOIN bgf ON tt.doc_id = bgf.doc_id
      |)
      |SELECT *, (mean_word_len BETWEEN 3.0 AND 10.0 AND symbol_ratio < 0.1
      |           AND alpha_frac > 0.8 AND en_stops >= 2
      |           AND top_bigram_frac <= 0.2) AS gopher_pass
      |FROM m ORDER BY doc_id
      """.stripMargin.trim))

  /** Renders one n's oracle CTE triple (grams → counts → fraction). */
  private def duckDupNgram(n: Int): String =
    s"""g$n AS (
       |  SELECT doc_id, ('0x' || substring(md5(g), 1, 12))::BIGINT AS gh,
       |         (length(g) - ${n - 1})::BIGINT AS chars
       |  FROM (
       |    SELECT doc_id, unnest(list_transform(range(len(toks) - ${n - 1}),
       |           i -> array_to_string(list_slice(toks, i + 1, i + $n), ' '))) AS g
       |    FROM tt WHERE len(toks) >= $n)
       |), c$n AS (
       |  SELECT doc_id, gh, chars, count(*) AS c FROM g$n GROUP BY 1, 2, 3
       |), f$n AS (
       |  SELECT doc_id, SUM(CASE WHEN c >= 2 THEN c * chars ELSE 0 END)::DOUBLE
       |           / SUM(c * chars)::DOUBLE AS f
       |  FROM c$n GROUP BY doc_id
       |)""".stripMargin

  private val dupNgramsQ = QueryDef(
    "txt_dup_ngrams",
    "Duplicate-n-gram repetition gate — the second half of Gopher's " +
      "repetition battery (Rae et al. 2021 A1.1): per-doc fraction of " +
      "n-gram-occurrence characters inside n-grams repeated within the " +
      "document, for n=5 (cap 0.15) and n=10 (cap 0.10), plus n=2 with " +
      "no cap (the paper's dup family starts at 5, but the fixture's " +
      "~30-word vocabulary only repeats bigrams within a doc — n=2 is " +
      "what keeps this oracle discriminating rather than all-zero). " +
      "Gram strings never shuffle (a 48-bit hash + char length " +
      "travel); two map-side-combining aggregates per n — the intra-" +
      "document twin of the cross-document dedup family.",
    (s, dir) => {
      import graft.operators.TextFilters
      val base = docToks(s, dir).select(col("doc_id"), col("toks"))
      // one-pass family: single scan + single doc-keyed shuffle chain
      // for all three n (see dupNgramCharFractions scaladoc)
      val fam = TextFilters.dupNgramCharFractions(base, "toks", "doc_id", Seq(2, 5, 10))
        .withColumnRenamed("id", "doc_id")
      base.select(col("doc_id"))
        .join(fam, Seq("doc_id"), "left")
        .select(col("doc_id"),
          round(coalesce(col("dup_2gram_char_frac"), lit(0.0)), 6).as("dup_2gram_char_frac"),
          round(coalesce(col("dup_5gram_char_frac"), lit(0.0)), 6).as("dup_5gram_char_frac"),
          round(coalesce(col("dup_10gram_char_frac"), lit(0.0)), 6).as("dup_10gram_char_frac"))
        .withColumn("repetition_pass",
          col("dup_5gram_char_frac") <= 0.15 && col("dup_10gram_char_frac") <= 0.10)
        .orderBy(col("doc_id"))
    },
    Some(s"""
      |${Duck.docToks}, ${duckDupNgram(2)}, ${duckDupNgram(5)}, ${duckDupNgram(10)}
      |SELECT tt.doc_id,
      |       round(COALESCE(f2.f, 0.0), 6) AS dup_2gram_char_frac,
      |       round(COALESCE(f5.f, 0.0), 6) AS dup_5gram_char_frac,
      |       round(COALESCE(f10.f, 0.0), 6) AS dup_10gram_char_frac,
      |       (round(COALESCE(f5.f, 0.0), 6) <= 0.15
      |        AND round(COALESCE(f10.f, 0.0), 6) <= 0.10) AS repetition_pass
      |FROM tt LEFT JOIN f2 ON tt.doc_id = f2.doc_id
      |        LEFT JOIN f5 ON tt.doc_id = f5.doc_id
      |        LEFT JOIN f10 ON tt.doc_id = f10.doc_id
      |ORDER BY tt.doc_id
      """.stripMargin.trim))

  private val piiQ = QueryDef(
    "txt_pii_redact",
    "PII redaction (email / IPv4 / SSN / phone → tags) — the pre-" +
      "training scrub, as a chain of codegen'd regexp_replace " +
      "projections (linear per row, no shuffle). The fixture corpus " +
      "carries no PII, so each doc gets a deterministic doc_id-derived " +
      "payload appended first; audit counts are taken on the " +
      "PROGRESSIVELY redacted text in application order (the phone " +
      "pattern must not re-count SSN digits), and the oracle replays " +
      "the identical pattern chain in RE2 (patterns restricted to the " +
      "Java∩RE2-identical subset; DuckDB needs the 'g' flag to match " +
      "Spark's replace-all).",
    (s, dir) => {
      import graft.operators.TextFilters._
      val d = Tables.documentsSpread(s, dir)
      val payload = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or +1 (555) 010-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
        lit(" at 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
        lit(".17 id 123-45-6789"))
      // fold the pattern chain: count pattern i on the text with
      // patterns 1..i-1 already redacted, then redact it too
      val (countCols, redacted) =
        PiiPatterns.foldLeft((Seq.empty[org.apache.spark.sql.Column], payload)) {
          case ((cols, cur), (name, pat, tag)) =>
            (cols :+ piiCount(cur, pat).as(s"n_$name"),
              regexp_replace(cur, pat, java.util.regex.Matcher.quoteReplacement(tag)))
        }
      d.select(col("doc_id") +: countCols :+ md5(redacted).as("redacted_fp"): _*)
        .orderBy(col("doc_id"))
    },
    Some {
      import graft.operators.TextFilters.PiiPatterns
      val chain = PiiPatterns.zipWithIndex.map { case ((name, pat, tag), i) =>
        s"""p${i + 1} AS (
           |  SELECT doc_id, len(regexp_extract_all(t, '$pat'))::BIGINT AS n_$name,
           |         ${(1 to i).map(j => s"n_${PiiPatterns(j - 1)._1}, ").mkString}regexp_replace(t, '$pat', '$tag', 'g') AS t
           |  FROM p$i
           |)""".stripMargin
      }.mkString(", ")
      val names = PiiPatterns.map { case (n, _, _) => s"n_$n" }.mkString(", ")
      s"""
      |WITH p0 AS (
      |  SELECT doc_id,
      |         text || ' contact user' || doc_id::VARCHAR || '@example.com or +1 (555) 010-'
      |              || lpad((doc_id % 10000)::VARCHAR, 4, '0')
      |              || ' at 10.0.' || (doc_id % 256)::VARCHAR || '.17 id 123-45-6789' AS t
      |  FROM documents
      |), $chain
      |SELECT doc_id, $names, md5(t) AS redacted_fp
      |FROM p${PiiPatterns.length} ORDER BY doc_id
      """.stripMargin.trim
    })

  private val noveltyQ = QueryDef(
    "txt_ngram_novelty",
    "Cross-document n-gram novelty profile (CCNet/RefinedWeb-style " +
      "curation signal): per source, what fraction of member docs' " +
      "distinct 3-grams occur THERE first (global min doc id = " +
      "ingestion order) — re-crawled boilerplate sources score low, " +
      "fresh ones high. Gram strings never shuffle (48-bit hash + char " +
      "length travel — operators.Novelty); the share is exact integer " +
      "arithmetic surfaced through one deterministic double divide.",
    (s, dir) => {
      import graft.operators.Novelty
      val docs = docToks(s, dir)
      val perDoc = Novelty.ngramNoveltyPerDoc(docs, "toks", "doc_id", k = 3)
        .withColumnRenamed("id", "doc_id")
      perDoc.join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_grams")).as("total_grams"),
          sum(col("n_novel")).as("novel_grams"))
        .withColumn("novelty_pct",
          floor(col("novel_grams").cast("double") * 10000.0
            / col("total_grams").cast("double")).cast("double") / 100.0)
        .orderBy(col("source"))
    },
    Some(s"""
      |${Duck.docToks}, g AS (
      |  SELECT doc_id, ${Duck.md5Long48("s")} AS gh, length(s) AS glen
      |  FROM (SELECT doc_id, unnest(${Duck.shingles(3)}) AS s FROM tt)
      |), f AS (
      |  SELECT gh, glen, min(doc_id) AS first_id FROM g GROUP BY 1, 2
      |), pd AS (
      |  SELECT g.doc_id, count(*) AS n_grams,
      |         SUM(CASE WHEN f.first_id = g.doc_id THEN 1 ELSE 0 END) AS n_novel
      |  FROM g JOIN f USING (gh, glen) GROUP BY 1
      |)
      |SELECT source, count(*) AS n_docs,
      |       CAST(SUM(n_grams) AS BIGINT) AS total_grams,
      |       CAST(SUM(n_novel) AS BIGINT) AS novel_grams,
      |       FLOOR(SUM(n_novel)::DOUBLE * 10000.0 / SUM(n_grams)::DOUBLE) / 100.0 AS novelty_pct
      |FROM pd JOIN tt USING (doc_id)
      |GROUP BY source ORDER BY source
      """.stripMargin.trim))

  /** Cross-encoder query text ≡ the BM25 terms, so stage 1 and stage 2
    * answer the same information need.
    */
  private val ceQueryText = bm25Terms.mkString(" ")
  private val ceQueryVec = e2eModel.encode(ceQueryText)

  private val crossencQ = QueryDef(
    "knn_crossenc_rerank",
    "Two-stage retrieve-and-rerank — the production serving shape for " +
      "expensive pairwise scoring models: BM25 retrieves a top-20 " +
      "shortlist (shared bm25Scored builder), then ONLY those 20 " +
      "(query, document) PAIRS run through the pair encoder " +
      "(embed(query ⊕ doc) scored against embed(query)) and the " +
      "shortlist is re-ordered by the pair score. The shortlist is " +
      "broadcast onto the corpus scan, so the expensive per-pair model " +
      "touches k rows, not the corpus — swap the md5-portable stub for " +
      "a GPU cross-encoder and the plan is unchanged (same seam as the " +
      "multimodal decoder). DuckDB recomputes the pair embeddings from " +
      "concatenated token lists bit-for-bit.",
    (s, dir) => {
      import graft.functions.Embeddings
      import graft.functions.VectorFunctions.cosineDistance
      val short = bm25Scored(s, dir)
        .orderBy(col("bm25").desc, col("doc_id")).limit(20)
      val cand = Tables.documentsSpread(s, dir)
        .select(col("doc_id"), col("text"))
        .join(broadcast(short), "doc_id")
        .withColumn("pair", concat(lit(ceQueryText + " "), col("text")))
      Embeddings.embedDataFrame(
          cand.select(col("doc_id"), col("bm25"), col("pair")), "pair", "vec", e2eModel)
        .select(col("doc_id"), col("bm25"),
          round(cosineDistance(col("vec"), typedLit(ceQueryVec)), 6).as("ce_dist"))
        .orderBy(col("ce_dist"), col("doc_id"))
    },
    Some {
      val qToksLit = bm25Terms.map(t => s"'$t'").mkString("[", ", ", "]")
      s"""
      |${Duck.docToks}, $duckBm25Cte,
      |short AS (
      |  SELECT doc_id, bm25 FROM bm25sc ORDER BY bm25 DESC, doc_id LIMIT 20
      |), tt2 AS (
      |  SELECT tt.doc_id, list_concat($qToksLit, tt.toks) AS toks
      |  FROM tt JOIN short ON tt.doc_id = short.doc_id
      |), ${Duck.md5EmbedVecs(64, "tt2")}
      |SELECT short.doc_id, short.bm25,
      |       round(${Duck.cosine("vecs.v", Duck.vecLit(ceQueryVec))}, 6) AS ce_dist
      |FROM vecs JOIN short ON vecs.doc_id = short.doc_id
      |ORDER BY ce_dist, short.doc_id
      """.stripMargin.trim
    })

  private val invIndexQ = QueryDef(
    "txt_inverted_index",
    "Inverted-index build (the search-engine materialization the BM25 " +
      "family queries against): token → document frequency + the first " +
      "50 posting doc_ids, CSV-serialized, top 20 terms by df. The " +
      "posting cap is enforced BEFORE aggregation via a row_number " +
      "window on the same token key (the groupBy reuses the window's " +
      "exchange — one shuffle total), so a stopword's aggregation " +
      "buffer holds 50 ids, not |corpus| — the cap that keeps posting " +
      "construction viable at 100 TB. df still counts every document.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val dtok = docToks(s, dir)
        .select(col("doc_id"), explode(array_distinct(col("toks"))).as("token"))
      val w = Window.partitionBy(col("token")).orderBy(col("doc_id"))
      dtok.withColumn("rn", row_number().over(w))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("df"),
          array_join(sort_array(collect_list(when(col("rn") <= 50, col("doc_id")))), ",")
            .as("postings"))
        .orderBy(col("df").desc, col("token"))
        .limit(20)
    },
    Some(s"""
      |${Duck.docToks}, dtok AS (
      |  SELECT doc_id, unnest(list_distinct(toks)) AS token FROM tt
      |)
      |SELECT token, count(*) AS df,
      |       array_to_string(list_slice(list_sort(list(doc_id)), 1, 50), ',') AS postings
      |FROM dtok GROUP BY token
      |ORDER BY df DESC, token LIMIT 20
      """.stripMargin.trim))

  /** DuckDB fragment: one BPE round. Takes the name of the previous
    * dict CTE; emits CTEs `p<r>` (pair counts), `b<r>` (best pair),
    * `d<r>` (merged dict), `v<r>` (vocab size after).
    */
  private def duckBpeRound(r: Int, prev: String): String =
    s"""p$r AS (
       |  SELECT syms[i] AS l, syms[i+1] AS r, SUM(freq)::BIGINT AS c
       |  FROM (SELECT freq, syms, unnest(range(1, len(syms))) AS i FROM $prev)
       |  GROUP BY 1, 2
       |), b$r AS (
       |  SELECT l, r, c FROM p$r ORDER BY c DESC, l, r LIMIT 1
       |), d$r AS (
       |  SELECT word, freq,
       |         list_reduce(list_transform(syms, ch -> [ch]),
       |           (a, e) -> CASE WHEN a[len(a)] = b$r.l AND e[1] = b$r.r
       |                          THEN list_append(a[1:len(a)-1], b$r.l || b$r.r)
       |                          ELSE list_append(a, e[1]) END) AS syms
       |  FROM $prev, b$r
       |), v$r AS (
       |  SELECT count(DISTINCT s)::BIGINT AS v
       |  FROM (SELECT unnest(syms) AS s FROM d$r)
       |)""".stripMargin.trim

  private val bpeTrainQ = QueryDef(
    "txt_bpe_train",
    "BPE tokenizer training (Sennrich-style merge learning) — the " +
      "vocabulary-construction step of an LLM data pipeline, in its " +
      "scalable classical form: merges are learned from the word-" +
      "frequency DICTIONARY (top-500 letter words by count — the " +
      "corpus-size-independent working set), so the 100 TB corpus is " +
      "touched exactly once for word counts and each of the 3 rounds " +
      "is a job over ≤500 rows plus a one-row argmax collect (the " +
      "fitted-centroid pattern). Pair counts are exact freq-weighted " +
      "BIGINTs; best pair ties break (count DESC, left, right) on the " +
      "shared binary collation; the merge is the left-to-right greedy " +
      "fold (Bpe.mergeSyms ≡ the oracle's list_reduce over single-" +
      "element lists). The oracle is fully STATIC — DuckDB re-learns " +
      "the merges itself, so a green hash certifies the whole training " +
      "loop, not just its output formatting.",
    (s, dir) => {
      import graft.operators.Bpe
      val words = docToks(s, dir)
        .select(explode(col("toks")).as("word"))
        .filter(col("word").rlike("^[a-z]+$") && length(col("word")).between(2, 20))
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("word")).limit(500)
      val (dict, merges) = Bpe.train(words, rounds = 3)
      dict.unpersist()
      import s.implicits._
      merges.map(m => (m.round.toLong, m.left, m.right, m.count, m.vocabAfter))
        .toDF("merge_round", "left_sym", "right_sym", "pair_count", "vocab_after")
        .orderBy(col("merge_round"))
    },
    Some(s"""
      |${Duck.docToks}
      |, words AS (
      |  SELECT w AS word, count(*) AS freq
      |  FROM (SELECT unnest(toks) AS w FROM tt)
      |  WHERE regexp_full_match(w, '[a-z]+') AND len(w) BETWEEN 2 AND 20
      |  GROUP BY 1 ORDER BY freq DESC, word LIMIT 500
      |), d0 AS (
      |  SELECT word, freq, string_split_regex(word, '') AS syms FROM words
      |), ${duckBpeRound(1, "d0")},
      |${duckBpeRound(2, "d1")},
      |${duckBpeRound(3, "d2")}
      |SELECT * FROM (
      |  SELECT 1::BIGINT AS merge_round, b1.l AS left_sym, b1.r AS right_sym,
      |         b1.c AS pair_count, v1.v AS vocab_after FROM b1, v1
      |  UNION ALL
      |  SELECT 2::BIGINT, b2.l, b2.r, b2.c, v2.v FROM b2, v2
      |  UNION ALL
      |  SELECT 3::BIGINT, b3.l, b3.r, b3.c, v3.v FROM b3, v3
      |) ORDER BY merge_round
      """.stripMargin.trim))

  private val rakeQ = QueryDef(
    "txt_rake_keywords",
    "RAKE keyword extraction (Rose et al. 2010): candidate phrases are " +
      "maximal stopword-free token runs (the islands pattern — one " +
      "doc-keyed window over the exploded tokens), word score = " +
      "degree/frequency over all candidate occurrences, phrase score " +
      "= Σ of its word scores; candidates are capped at 4 words (the " +
      "standard RAKE cap — stopword-poor text otherwise yields " +
      "document-length runs). Degree/frequency are exact BIGINTs; " +
      "each word's score is a single IEEE division and the phrase sum " +
      "folds those terms in phrase order on both engines (the fixed-" +
      "order double channel). Top 15 selected and presented on the " +
      "ROUNDED score + phrase tiebreak — deterministic under the " +
      "decade gate's tie rule. Word/phrase stats are vocabulary-" +
      "bounded; the only row-sized work is the token explode.",
    (s, dir) => {
      val stops = graft.operators.TextAnalysis.stopwords.values.flatten.toSeq.distinct.sorted
      val tokPos = docToks(s, dir)
        .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
        .withColumn("is_stop", col("tok").isin(stops: _*).cast("long"))
      import org.apache.spark.sql.expressions.Window
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val phrases = tokPos
        .withColumn("pid", sum(col("is_stop")).over(wDoc))
        .filter(col("is_stop") === 0)
        .groupBy(col("doc_id"), col("pid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          e => e.getField("tok")).as("ws"))
        // standard RAKE candidate cap: stopword-poor text otherwise
        // yields document-length runs (observed on this corpus), which
        // are not keywords and blow up the phrase vocabulary
        .filter(size(col("ws")) <= 4)
      val wordStats = phrases
        .select(size(col("ws")).cast("long").as("len"), explode(col("ws")).as("w"))
        .groupBy(col("w"))
        .agg(count(lit(1)).as("freq"), sum(col("len")).as("deg"))
      val phraseCounts = phrases.groupBy(col("ws")).agg(count(lit(1)).as("n_occ"))
      val pw = phraseCounts
        .select(col("ws"), col("n_occ"), posexplode(col("ws")).as(Seq("i", "w")))
        .join(wordStats, Seq("w"))
        .withColumn("term", col("deg").cast("double") / col("freq").cast("double"))
      pw.groupBy(col("ws"), col("n_occ"))
        .agg(aggregate(array_sort(collect_list(struct(col("i"), col("term")))), lit(0.0),
          (acc, e) => acc + e.getField("term")).as("score"))
        .select(array_join(col("ws"), " ").as("phrase"),
          size(col("ws")).cast("long").as("n_words"), col("n_occ"),
          round(col("score"), 6).as("rake_score"))
        .orderBy(col("rake_score").desc, col("phrase")).limit(15)
    },
    Some(s"""
      |${Duck.docToks}
      |, tp AS (
      |  -- struct-unnest, NOT "toks[i] over unnest(range(...))": the range
      |  -- form carries the WHOLE toks list on every exploded row, so the
      |  -- materialized intermediate is sum(len^2) elements — measured as a
      |  -- DuckDB buffer-reservation OOM at sf10 (500k docs) with RSS at 9 GB
      |  SELECT doc_id, u.pos AS pos, u.tok AS tok,
      |         CASE WHEN u.tok IN (${graft.operators.TextAnalysis.stopwords.values.flatten.toSeq.distinct.sorted.map(w => s"'$w'").mkString(", ")})
      |              THEN 1 ELSE 0 END AS is_stop
      |  FROM (SELECT doc_id,
      |          unnest(list_transform(range(len(toks)), i -> {'pos': i, 'tok': toks[i + 1]})) AS u
      |        FROM tt)
      |), ph0 AS (
      |  SELECT doc_id, pos, tok, is_stop,
      |         SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
      |                            ROWS UNBOUNDED PRECEDING) AS pid
      |  FROM tp
      |), phr AS (
      |  SELECT doc_id, pid, ws FROM (
      |    SELECT doc_id, pid, list(tok ORDER BY pos) AS ws
      |    FROM ph0 WHERE is_stop = 0 GROUP BY 1, 2
      |  ) WHERE len(ws) <= 4
      |), wstat AS (
      |  SELECT w, count(*) AS freq, SUM(len)::BIGINT AS deg
      |  FROM (SELECT len(ws)::BIGINT AS len, unnest(ws) AS w FROM phr) GROUP BY 1
      |), pc AS (
      |  SELECT ws, count(*) AS n_occ FROM phr GROUP BY 1
      |), pw AS (
      |  SELECT ws, n_occ, i, ws[i] AS w
      |  FROM (SELECT ws, n_occ, unnest(range(1, len(ws) + 1)) AS i FROM pc)
      |), js AS (
      |  SELECT pw.ws, pw.n_occ, pw.i, wstat.deg::DOUBLE / wstat.freq::DOUBLE AS term
      |  FROM pw JOIN wstat ON pw.w = wstat.w
      |), sc AS (
      |  SELECT ws, n_occ,
      |         list_reduce(list(term ORDER BY i), (a, b) -> a + b) AS score
      |  FROM js GROUP BY 1, 2
      |)
      |SELECT list_aggregate(ws, 'string_agg', ' ') AS phrase,
      |       len(ws)::BIGINT AS n_words, n_occ,
      |       round(score, 6) AS rake_score
      |FROM sc ORDER BY rake_score DESC, phrase LIMIT 15
      """.stripMargin.trim))

  private val readabilityQ = QueryDef(
    "txt_readability",
    "Flesch–Kincaid grade level per language — the readability gate a " +
      "curriculum/quality pipeline scores with: sentences = non-blank " +
      "[.!?]+ segments (normalize keeps punctuation), syllables = " +
      "vowel-group runs per token via the split-count identity " +
      "(len(split(w, '[aeiouy]+')) − 1 — both engines keep trailing " +
      "empties, probed), min 1 per word. All three totals are exact " +
      "integer sums (token-level counts folded per doc, rolled up per " +
      "language); the FK formula runs once per output row in double " +
      "with one fixed shape. Pure projection + one lang rollup.",
    (s, dir) => {
      val d = docToks(s, dir)
        .select(col("lang"), col("toks"),
          greatest(lit(1L),
            size(filter(split(col("norm"), "[.!?]+"), x => trim(x) =!= ""))
              .cast("long")).as("n_sent"),
          size(col("toks")).cast("long").as("n_words"),
          aggregate(col("toks"), lit(0L), (acc, t) =>
            acc + greatest(lit(1), size(split(t, "[aeiouy]+")) - 1).cast("long"))
            .as("n_syl"))
      d.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("n_words"),
          sum(col("n_sent")).as("n_sentences"),
          sum(col("n_syl")).as("n_syllables"))
        .select(col("lang"), col("n_docs"), col("n_words"),
          col("n_sentences"), col("n_syllables"),
          round(col("n_words").cast("double") / col("n_sentences").cast("double"), 6)
            .as("words_per_sentence"),
          round(col("n_syllables").cast("double") / col("n_words").cast("double"), 6)
            .as("syllables_per_word"),
          round(lit(0.39) * (col("n_words").cast("double") / col("n_sentences").cast("double")) +
            lit(11.8) * (col("n_syllables").cast("double") / col("n_words").cast("double")) -
            lit(15.59), 6).as("fk_grade"))
        .orderBy(col("lang"))
    },
    Some(s"""
      |WITH t0 AS (
      |  SELECT doc_id, lang, ${Duck.norm} AS norm FROM documents
      |), tt AS (
      |  SELECT doc_id, lang, norm, ${Duck.toks} AS toks FROM t0
      |), d AS (
      |  SELECT lang,
      |         greatest(1, len(list_filter(string_split_regex(norm, '[.!?]+'),
      |           x -> trim(x) <> '')))::BIGINT AS n_sent,
      |         len(toks)::BIGINT AS n_words,
      |         list_aggregate(list_transform(toks,
      |           t -> greatest(1, len(string_split_regex(t, '[aeiouy]+')) - 1)),
      |           'sum')::BIGINT AS n_syl
      |  FROM tt
      |), g AS (
      |  SELECT lang, count(*) AS n_docs, SUM(n_words)::BIGINT AS n_words,
      |         SUM(n_sent)::BIGINT AS n_sentences,
      |         SUM(COALESCE(n_syl, 0))::BIGINT AS n_syllables
      |  FROM d GROUP BY 1
      |)
      |SELECT lang, n_docs, n_words, n_sentences, n_syllables,
      |       round(n_words::DOUBLE / n_sentences::DOUBLE, 6) AS words_per_sentence,
      |       round(n_syllables::DOUBLE / n_words::DOUBLE, 6) AS syllables_per_word,
      |       round(0.39::DOUBLE * (n_words::DOUBLE / n_sentences::DOUBLE) +
      |             11.8::DOUBLE * (n_syllables::DOUBLE / n_words::DOUBLE) -
      |             15.59::DOUBLE, 6) AS fk_grade
      |FROM g ORDER BY lang
      """.stripMargin.trim))

  /** 1/log2(i+1) position discounts for nDCG@10, computed ONCE here and
    * embedded as shortest-repr double literals in BOTH engines' queries
    * — neither engine evaluates a transcendental, so the discounts are
    * bit-identical cross-engine by construction.
    */
  private val NdcgDiscounts: Seq[Double] =
    (1 to 10).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))

  private val rankingNdcgQ = QueryDef(
    "ml_ranking_ndcg",
    "Retrieval-ranking evaluation: nDCG@10 and MRR of the BM25 system " +
      "ranking (the SAME shared bm25Scored builder txt_bm25_topk and " +
      "the RRF leg run) against graded relevance = least(3, total " +
      "query-term frequency div 4) — frequency-graded, NOT presence-" +
      "graded: presence saturates on this corpus (every BM25 top-10 " +
      "doc contains all three terms → nDCG pinned at 1.0, measured " +
      "and rejected), while the tf grade (163/225/88/24 docs at rel " +
      "0/1/2/3 on the gate fixture) separates the saturating, length-" +
      "normalized BM25 order from the ideal order. This is the metric " +
      "layer recall telemetry (RECALL.md) lacks: recall is set " +
      "overlap; nDCG grades POSITION. Gains (2^rel − 1) are exact " +
      "integers; " +
      "the 1/log2(i+1) discounts are ten constants computed once " +
      "driver-side and embedded as identical double literals in both " +
      "engines (no libm in either plan); DCG terms round at 10 and " +
      "sum in DECIMAL(38,10); IDCG comes from the corpus-wide ideal " +
      "top-10 (rel desc, doc_id — a TakeOrderedAndProject, like the " +
      "system leg); MRR = 1/rank of the first rel ≥ 2 hit in the " +
      "top-10, 0 if none. Output: the ranked table with the four " +
      "scalars broadcast alongside — everything after the two top-10s " +
      "is ≤10-row arithmetic.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val base = docToks(s, dir).select(col("doc_id"), col("toks"))
      val rel = base.select(col("doc_id"),
        least(lit(3L),
          bm25Terms.map(t => size(filter(col("toks"), x => x === t)).cast("long"))
            .reduce(_ + _).divide(lit(4)).cast("long")).as("rel"))
      val sys = bm25Scored(s, dir)
        .orderBy(col("bm25").desc, col("doc_id")).limit(10)
        .withColumn("rnk",
          row_number().over(Window.orderBy(col("bm25").desc, col("doc_id")))
            .cast("long"))
        .join(rel, Seq("doc_id"))
      val discCol = NdcgDiscounts.zipWithIndex.foldLeft(lit(0.0)) {
        case (acc, (d, i)) => when(col("rnk") === (i + 1).toLong, lit(d)).otherwise(acc)
      }
      val gain = (shl(lit(1L), col("rel")) - 1L).cast("double")
      val sysg = sys.withColumn("disc", discCol)
        .withColumn("term", round(gain * col("disc"), 10))
      val dcg = sysg.agg(
        round(sum(col("term")
          .cast(org.apache.spark.sql.types.DecimalType(38, 10))).cast("double"), 6)
          .as("dcg"))
      val ideal = rel.orderBy(col("rel").desc, col("doc_id")).limit(10)
        .withColumn("rnk",
          row_number().over(Window.orderBy(col("rel").desc, col("doc_id")))
            .cast("long"))
        .withColumn("disc", discCol)
        .withColumn("term", round(gain * col("disc"), 10))
      val idcg = ideal.agg(
        round(sum(col("term")
          .cast(org.apache.spark.sql.types.DecimalType(38, 10))).cast("double"), 6)
          .as("idcg"))
      val mrr = sysg.filter(col("rel") >= 2L).agg(
        coalesce(round(lit(1.0) / min(col("rnk")).cast("double"), 6), lit(0.0))
          .as("mrr"))
      sysg.select(col("rnk"), col("doc_id"), col("bm25"), col("rel"))
        .crossJoin(broadcast(dcg)).crossJoin(broadcast(idcg))
        .crossJoin(broadcast(mrr))
        .withColumn("ndcg", round(col("dcg") / col("idcg"), 6))
        .select(col("rnk"), col("doc_id"), col("bm25"), col("rel"),
          col("dcg"), col("idcg"), col("ndcg"), col("mrr"))
        .orderBy(col("rnk"))
    },
    Some {
      val relSql = "least(3, (" + bm25Terms
        .map(t => s"len(list_filter(toks, x -> x = '$t'))")
        .mkString(" + ") + ") // 4)"
      val discSql = NdcgDiscounts.zipWithIndex.map { case (d, i) =>
        s"WHEN ${i + 1} THEN ${java.math.BigDecimal.valueOf(d).toPlainString}"
      }.mkString("CASE rnk ", " ", " END")
      s"""
      |${Duck.docToks}, $duckBm25Cte,
      |rel AS (
      |  SELECT doc_id, CAST($relSql AS BIGINT) AS rel FROM tt
      |), sys AS (
      |  SELECT doc_id, bm25,
      |         CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rnk
      |  FROM bm25sc ORDER BY bm25 DESC, doc_id LIMIT 10
      |), sysg AS (
      |  SELECT s.rnk, s.doc_id, s.bm25, r.rel,
      |         round(CAST((1 << r.rel) - 1 AS DOUBLE) * ($discSql), 10) AS term
      |  FROM sys s JOIN rel r USING (doc_id)
      |), dcg AS (
      |  SELECT round(CAST(SUM(CAST(term AS DECIMAL(38,10))) AS DOUBLE), 6) AS dcg
      |  FROM sysg
      |), ideal AS (
      |  SELECT rel,
      |         CAST(row_number() OVER (ORDER BY rel DESC, doc_id) AS BIGINT) AS rnk
      |  FROM rel ORDER BY rel DESC, doc_id LIMIT 10
      |), idealg AS (
      |  SELECT round(CAST((1 << rel) - 1 AS DOUBLE) * ($discSql), 10) AS term
      |  FROM ideal
      |), idcg AS (
      |  SELECT round(CAST(SUM(CAST(term AS DECIMAL(38,10))) AS DOUBLE), 6) AS idcg
      |  FROM idealg
      |), mrr AS (
      |  SELECT COALESCE(round(1.0 / CAST(min(rnk) AS DOUBLE), 6), 0.0) AS mrr
      |  FROM sysg WHERE rel >= 2
      |)
      |SELECT rnk, doc_id, bm25, rel, dcg.dcg, idcg.idcg,
      |       round(dcg.dcg / idcg.idcg, 6) AS ndcg, mrr.mrr
      |FROM sysg CROSS JOIN dcg CROSS JOIN idcg CROSS JOIN mrr
      |ORDER BY rnk
      """.stripMargin.trim
    })

  private val ZipfTopK = 200

  private val zipfQ = QueryDef(
    "txt_zipf_fit",
    s"Zipf's-law fit of the corpus vocabulary: OLS of log-frequency on " +
      s"log-rank over the top $ZipfTopK tokens — the corpus-health probe " +
      "(natural language sits near slope −1; a slope far off flags " +
      "boilerplate or synthetic text — beside txt_stats' per-doc view " +
      "and stat_hill_tail's value-tail twin). The data-sized work is " +
      "the vocabulary rollup (one map-side-combining shuffle) + " +
      s"TakeOrderedAndProject for the top $ZipfTopK; ranks/regression " +
      s"run on the $ZipfTopK-row relation. Cross-engine float " +
      "discipline: each ln rounds at 6 BEFORE entering any sum (the " +
      "link-prediction channel), per-term products of rounded doubles " +
      "round at 6 and accumulate in DECIMAL(38,6) — order-independent " +
      "— and the closed form evaluates in double with one fixed " +
      "parenthesization.",
    (s, dir) => {
      val freq = docToks(s, dir)
        .select(explode(col("toks")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(ZipfTopK)
      val ranked = freq
        .withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("n").desc, col("token"))))
        .select(round(log(col("rnk").cast("double")), 6).as("x"),
          round(log(col("n").cast("double")), 6).as("y"))
      val dec6 = org.apache.spark.sql.types.DecimalType(38, 6)
      val st = ranked.agg(
        count(lit(1)).as("k"),
        sum(col("x").cast(dec6)).cast("double").as("sx"),
        sum(col("y").cast(dec6)).cast("double").as("sy"),
        sum(round(col("x") * col("y"), 6).cast(dec6)).cast("double").as("sxy"),
        sum(round(col("x") * col("x"), 6).cast(dec6)).cast("double").as("sxx"),
        sum(round(col("y") * col("y"), 6).cast(dec6)).cast("double").as("syy"))
      val slope = (col("k").cast("double") * col("sxy") - col("sx") * col("sy")) /
        (col("k").cast("double") * col("sxx") - col("sx") * col("sx"))
      st.select(col("k").as("n_tokens"),
        round(slope, 6).as("zipf_slope"),
        round((col("sy") - slope * col("sx")) / col("k").cast("double"), 6)
          .as("intercept"),
        round((col("k").cast("double") * col("sxy") - col("sx") * col("sy")) *
          (col("k").cast("double") * col("sxy") - col("sx") * col("sy")) /
          ((col("k").cast("double") * col("sxx") - col("sx") * col("sx")) *
            (col("k").cast("double") * col("syy") - col("sy") * col("sy"))), 6)
          .as("r2"))
    },
    Some(s"""
      |${Duck.docToks}, freq AS (
      |  SELECT t AS token, count(*) AS n
      |  FROM (SELECT unnest(toks) AS t FROM tt)
      |  GROUP BY t ORDER BY n DESC, token LIMIT $ZipfTopK
      |), ranked AS (
      |  SELECT round(ln((row_number() OVER (ORDER BY n DESC, token))::DOUBLE), 6) AS x,
      |         round(ln(n::DOUBLE), 6) AS y
      |  FROM freq
      |), st AS (
      |  SELECT count(*)::BIGINT AS k,
      |         CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
      |         CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
      |         CAST(SUM(CAST(round(x * y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
      |         CAST(SUM(CAST(round(x * x, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
      |         CAST(SUM(CAST(round(y * y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS syy
      |  FROM ranked
      |), f AS (
      |  SELECT k, sx, sy, sxy, sxx, syy,
      |         (k::DOUBLE * sxy - sx * sy) / (k::DOUBLE * sxx - sx * sx) AS slope
      |  FROM st
      |)
      |SELECT k AS n_tokens,
      |       round(slope, 6) AS zipf_slope,
      |       round((sy - slope * sx) / k::DOUBLE, 6) AS intercept,
      |       round((k::DOUBLE * sxy - sx * sy) *
      |             (k::DOUBLE * sxy - sx * sy) /
      |             ((k::DOUBLE * sxx - sx * sx) *
      |              (k::DOUBLE * syy - sy * sy)), 6) AS r2
      |FROM f
      """.stripMargin.trim))

  /** One signed LLR contingency term as SQL text shared VERBATIM between
    * Spark `expr` and DuckDB (the ridge-regression trick): k·ln(k·N/(a·b))
    * rounded at 6, zero when the cell is empty.
    */
  private def llrTerm(k: String, a: String, b: String): String =
    s"(CASE WHEN $k > 0 THEN round(CAST($k AS DOUBLE) * " +
      s"ln((CAST($k AS DOUBLE) * CAST(nn AS DOUBLE)) / " +
      s"(CAST($a AS DOUBLE) * CAST($b AS DOUBLE))), 6) ELSE 0.0 END)"

  private val llrExpr: String =
    "round(2.0 * (" +
      llrTerm("cab", "rw", "cw") + " + " +
      llrTerm("k12", "rw", "nn - cw") + " + " +
      llrTerm("k21", "nn - rw", "cw") + " + " +
      llrTerm("k22", "nn - rw", "nn - cw") + "), 6)"

  private val llrQ = QueryDef(
    "txt_collocation_llr",
    "Dunning log-likelihood-ratio collocations (Dunning 1993): the " +
      "statistically principled companion to txt_bigram_lift — lift " +
      "over-rewards rare pairs, LLR weighs the full 2×2 bigram " +
      "contingency (k, row/column margins from the bigram relation " +
      "itself, all exact BIGINTs), so high scores need both " +
      "association AND evidence. The four k·ln(k·N/(a·b)) terms are " +
      "built from ONE SQL string evaluated verbatim by Spark expr() " +
      "and DuckDB (the shared-expression-tree discipline), each term " +
      "rounded at 6, the 4-term sum a fixed shape. Same scale shape " +
      "as lift: bigram rollup shuffle, margin joins on the vocab key " +
      "(never broadcast), one-row total broadcast, top-25 " +
      "TakeOrderedAndProject on the presented (llr, bigram) key.",
    (s, dir) => {
      val tk = docToks(s, dir)
      val bi = tk.select(explode(zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("pr"))
        .groupBy(col("pr.w1").as("w1"), col("pr.w2").as("w2"))
        .agg(count(lit(1)).as("cab"))
      val r = bi.groupBy(col("w1")).agg(sum(col("cab")).as("rw"))
      val c = bi.groupBy(col("w2")).agg(sum(col("cab")).as("cw"))
      val n = bi.agg(sum(col("cab")).as("nn"))
      bi.filter(col("cab") >= 5)
        .join(r, Seq("w1")).join(c, Seq("w2"))
        .crossJoin(broadcast(n))
        .withColumn("k12", col("rw") - col("cab"))
        .withColumn("k21", col("cw") - col("cab"))
        .withColumn("k22", col("nn") - col("rw") - col("cw") + col("cab"))
        .withColumn("llr", expr(llrExpr))
        .select(concat(col("w1"), lit(" "), col("w2")).as("bigram"),
          col("cab").as("n_ab"), col("rw"), col("cw"), col("llr"))
        .orderBy(col("llr").desc, col("bigram"))
        .limit(25)
    },
    Some(s"""
      |${Duck.docToks}, bi0 AS (
      |  SELECT unnest(list_transform(range(len(toks)-1), i -> {'w1': toks[i+1], 'w2': toks[i+2]})) AS pr FROM tt
      |), bi AS (
      |  SELECT pr.w1 AS w1, pr.w2 AS w2, count(*) AS cab FROM bi0 GROUP BY 1, 2
      |), r AS (SELECT w1, SUM(cab)::BIGINT AS rw FROM bi GROUP BY 1),
      |c AS (SELECT w2, SUM(cab)::BIGINT AS cw FROM bi GROUP BY 1),
      |n AS (SELECT SUM(cab)::BIGINT AS nn FROM bi),
      |cells AS (
      |  SELECT bi.w1, bi.w2, cab, rw, cw, nn,
      |         rw - cab AS k12, cw - cab AS k21,
      |         nn - rw - cw + cab AS k22
      |  FROM bi JOIN r ON r.w1 = bi.w1 JOIN c ON c.w2 = bi.w2, n
      |  WHERE cab >= 5
      |)
      |SELECT w1 || ' ' || w2 AS bigram, cab AS n_ab, rw, cw,
      |       $llrExpr AS llr
      |FROM cells
      |ORDER BY llr DESC, bigram LIMIT 25
      """.stripMargin.trim))

  private val burstinessQ = QueryDef(
    "txt_burstiness",
    "Token burstiness via the index of dispersion (variance-to-mean " +
      "ratio of per-document counts, zeros included — Church & Gale's " +
      "observation that content words are bursty while function words " +
      "are Poisson-ish): VMR ≈ 1 reads as background vocabulary, " +
      "VMR ≫ 1 as topical/boilerplate concentration — the corpus-" +
      "linguistics dispersion probe beside txt_zipf_fit's frequency " +
      "shape and txt_tfidf's per-doc weighting. Zeros never " +
      "materialize: mean = tot/D and Σc² over occurring docs give the " +
      "full-corpus variance algebraically. Counts exact BIGINT; " +
      "mean/VMR in one fixed shape; presented-key ordering (vmr, " +
      "token) with df ≥ 5 evidence floor; top-25 TakeOrderedAndProject.",
    (s, dir) => {
      val perDoc = docToks(s, dir)
        .select(col("doc_id"), explode(col("toks")).as("token"))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("c"))
      val d = docToks(s, dir).agg(count(lit(1)).as("n_docs"))
      val per = perDoc.groupBy(col("token")).agg(
        count(lit(1)).as("df"), sum(col("c")).as("tot"),
        sum(col("c") * col("c")).as("s2"))
      per.filter(col("df") >= 5)
        .crossJoin(broadcast(d))
        .withColumn("vmr", expr(
          "round((CAST(s2 AS DOUBLE) / CAST(n_docs AS DOUBLE) - " +
            "(CAST(tot AS DOUBLE) / CAST(n_docs AS DOUBLE)) * (CAST(tot AS DOUBLE) / CAST(n_docs AS DOUBLE))) / " +
            "(CAST(tot AS DOUBLE) / CAST(n_docs AS DOUBLE)), 6)"))
        .select(col("token"), col("df"), col("tot"), col("vmr"))
        .orderBy(col("vmr").desc, col("token"))
        .limit(25)
    },
    Some(s"""
      |${Duck.docToks}, perdoc AS (
      |  SELECT doc_id, t AS token, count(*) AS c
      |  FROM (SELECT doc_id, unnest(toks) AS t FROM tt)
      |  GROUP BY 1, 2
      |), d AS (SELECT count(*)::BIGINT AS n_docs FROM tt),
      |per AS (
      |  SELECT token, count(*)::BIGINT AS df, SUM(c)::BIGINT AS tot,
      |         SUM(c * c)::BIGINT AS s2
      |  FROM perdoc GROUP BY 1
      |)
      |SELECT token, df, tot,
      |       round((CAST(s2 AS DOUBLE) / CAST(n_docs AS DOUBLE) - (CAST(tot AS DOUBLE) / CAST(n_docs AS DOUBLE)) * (CAST(tot AS DOUBLE) / CAST(n_docs AS DOUBLE))) / (CAST(tot AS DOUBLE) / CAST(n_docs AS DOUBLE)), 6) AS vmr
      |FROM per, d
      |WHERE df >= 5
      |ORDER BY vmr DESC, token LIMIT 25
      """.stripMargin.trim))

  /** One directional JSD half-term as SQL text shared VERBATIM between
    * Spark expr() and DuckDB: p·ln(2p/(p+q)) when the numerator count is
    * positive (the zero-count side contributes exactly 0).
    */
  private def jsdTerm(cNum: String, nNum: String, cOth: String, nOth: String): String =
    s"(CASE WHEN $cNum > 0 THEN round((CAST($cNum AS DOUBLE) / CAST($nNum AS DOUBLE)) * " +
      s"ln(2.0 * (CAST($cNum AS DOUBLE) / CAST($nNum AS DOUBLE)) / " +
      s"(CAST($cNum AS DOUBLE) / CAST($nNum AS DOUBLE) + CAST($cOth AS DOUBLE) / CAST($nOth AS DOUBLE))), 8) " +
      s"ELSE 0.0 END)"

  private val jsdQ = QueryDef(
    "txt_source_jsd",
    "Pairwise Jensen–Shannon divergence between the source unigram " +
      "distributions — the bounded, symmetric corpus-comparison metric " +
      "(0 = identical mixes, ln 2 = disjoint) a data-mixing pipeline " +
      "reads before setting sampling weights (pipeline_temperature_mix " +
      "decides WITH it, dq_drift_tv is its single-column cousin on " +
      "value histograms). Vocab-keyed full-outer join per source pair " +
      "(tokens on one side only DO contribute — their term is " +
      "p·ln 2), counts exact BIGINT, each p·ln(2p/(p+q)) term from " +
      "ONE SQL string evaluated verbatim by both engines, rounded at " +
      "6 into DECIMAL(38,6) sums per pair. |sources|² pairs × vocab " +
      "keys — the join is token-partitioned, never broadcast.",
    (s, dir) => {
      val ct = docToks(s, dir)
        .select(col("source"), explode(col("toks")).as("token"))
        .groupBy(col("source"), col("token")).agg(count(lit(1)).as("c"))
      val ns = ct.groupBy(col("source")).agg(sum(col("c")).as("n"))
      val pairs = ns.select(col("source").as("sa"), col("n").as("na"))
        .crossJoin(ns.select(col("source").as("sb"), col("n").as("nb")))
        .filter(col("sa") < col("sb"))
      val legA = pairs.join(ct, col("source") === col("sa"))
        .select(col("sa"), col("sb"), col("na"), col("nb"),
          col("token"), col("c").as("ca"))
      val legB = pairs.join(ct, col("source") === col("sb"))
        .select(col("sa"), col("sb"), col("na"), col("nb"),
          col("token"), col("c").as("cb"))
      val both = legA.join(legB, Seq("sa", "sb", "na", "nb", "token"), "full_outer")
        .select(col("sa"), col("sb"), col("na"), col("nb"),
          coalesce(col("ca"), lit(0L)).as("ca"),
          coalesce(col("cb"), lit(0L)).as("cb"))
      both
        .withColumn("ta", expr(jsdTerm("ca", "na", "cb", "nb")))
        .withColumn("tb", expr(jsdTerm("cb", "nb", "ca", "na")))
        .groupBy(col("sa"), col("sb"))
        .agg(count(lit(1)).as("n_tokens"),
          (sum(col("ta").cast(org.apache.spark.sql.types.DecimalType(38, 8)))
            .cast("double")).as("suma"),
          (sum(col("tb").cast(org.apache.spark.sql.types.DecimalType(38, 8)))
            .cast("double")).as("sumb"))
        .select(col("sa").as("source_a"), col("sb").as("source_b"),
          col("n_tokens"),
          expr("round(0.5 * (suma + sumb), 6)").as("jsd"))
        .orderBy(col("source_a"), col("source_b"))
    },
    Some(s"""
      |${Duck.docToks}, ct AS (
      |  SELECT source, t AS token, count(*) AS c
      |  FROM (SELECT source, unnest(toks) AS t FROM tt)
      |  GROUP BY 1, 2
      |), ns AS (SELECT source, SUM(c)::BIGINT AS n FROM ct GROUP BY 1),
      |pairs AS (
      |  SELECT a.source AS sa, a.n AS na, b.source AS sb, b.n AS nb
      |  FROM ns a JOIN ns b ON a.source < b.source
      |), lega AS (
      |  SELECT sa, sb, na, nb, token, c AS ca
      |  FROM pairs JOIN ct ON ct.source = pairs.sa
      |), legb AS (
      |  SELECT sa, sb, na, nb, token, c AS cb
      |  FROM pairs JOIN ct ON ct.source = pairs.sb
      |), paired AS (
      |  SELECT sa, sb, na, nb,
      |         COALESCE(ca, 0)::BIGINT AS ca, COALESCE(cb, 0)::BIGINT AS cb
      |  FROM lega FULL JOIN legb USING (sa, sb, na, nb, token)
      |), terms AS (
      |  SELECT sa, sb,
      |         ${jsdTerm("ca", "na", "cb", "nb")} AS ta,
      |         ${jsdTerm("cb", "nb", "ca", "na")} AS tb
      |  FROM paired
      |), agg AS (
      |  SELECT sa, sb, count(*)::BIGINT AS n_tokens,
      |         CAST(SUM(CAST(ta AS DECIMAL(38,8))) AS DOUBLE) AS suma,
      |         CAST(SUM(CAST(tb AS DECIMAL(38,8))) AS DOUBLE) AS sumb
      |  FROM terms GROUP BY 1, 2
      |)
      |SELECT sa AS source_a, sb AS source_b, n_tokens,
      |       round(0.5 * (suma + sumb), 6) AS jsd
      |FROM agg ORDER BY source_a, source_b
      """.stripMargin.trim))

  private val heapsQ = QueryDef(
    "txt_heaps_law",
    "Heaps'-law fit of vocabulary growth: OLS of ln(distinct types) on " +
      "ln(total tokens) across the per-source sub-corpora — V ≈ K·Nᵝ " +
      "with β ≈ 0.4–0.6 for natural language; β near 1 flags " +
      "boilerplate-free synthetic text, β near 0 flags template spam. " +
      "The data-mixing companion to txt_zipf_fit (frequency shape) and " +
      "txt_source_jsd (distribution distance): sources whose (N, V) " +
      "point falls off the corpus line need a second look before " +
      "their mixing weight is set. Data-sized work is ONE " +
      "(source, token) rollup; the regression runs on |sources| rows " +
      "with the zipf float discipline verbatim (round-6 ln's, round-6 " +
      "term products into DECIMAL(38,6), fixed closed form).",
    (s, dir) => {
      val per = docToks(s, dir)
        .select(col("source"), explode(col("toks")).as("token"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_tok"), countDistinct(col("token")).as("n_typ"))
      val pts = per.select(
        round(log(col("n_tok").cast("double")), 6).as("x"),
        round(log(col("n_typ").cast("double")), 6).as("y"))
      val dec6 = org.apache.spark.sql.types.DecimalType(38, 6)
      val st = pts.agg(
        count(lit(1)).as("k"),
        sum(col("x").cast(dec6)).cast("double").as("sx"),
        sum(col("y").cast(dec6)).cast("double").as("sy"),
        sum(round(col("x") * col("y"), 6).cast(dec6)).cast("double").as("sxy"),
        sum(round(col("x") * col("x"), 6).cast(dec6)).cast("double").as("sxx"),
        sum(round(col("y") * col("y"), 6).cast(dec6)).cast("double").as("syy"))
      val slope = (col("k").cast("double") * col("sxy") - col("sx") * col("sy")) /
        (col("k").cast("double") * col("sxx") - col("sx") * col("sx"))
      st.select(col("k").as("n_sources"),
        round(slope, 6).as("heaps_beta"),
        round((col("sy") - slope * col("sx")) / col("k").cast("double"), 6)
          .as("heaps_logk"),
        round((col("k").cast("double") * col("sxy") - col("sx") * col("sy")) *
          (col("k").cast("double") * col("sxy") - col("sx") * col("sy")) /
          ((col("k").cast("double") * col("sxx") - col("sx") * col("sx")) *
            (col("k").cast("double") * col("syy") - col("sy") * col("sy"))), 6)
          .as("r2"))
    },
    Some(s"""
      |${Duck.docToks}, per AS (
      |  SELECT source, count(*) AS n_tok, count(DISTINCT token) AS n_typ
      |  FROM (SELECT source, unnest(toks) AS token FROM tt)
      |  GROUP BY source
      |), pts AS (
      |  SELECT round(ln(n_tok::DOUBLE), 6) AS x,
      |         round(ln(n_typ::DOUBLE), 6) AS y
      |  FROM per
      |), st AS (
      |  SELECT count(*)::BIGINT AS k,
      |         CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
      |         CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
      |         CAST(SUM(CAST(round(x * y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
      |         CAST(SUM(CAST(round(x * x, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
      |         CAST(SUM(CAST(round(y * y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS syy
      |  FROM pts
      |), f AS (
      |  SELECT k, sx, sy, sxy, sxx, syy,
      |         (k::DOUBLE * sxy - sx * sy) / (k::DOUBLE * sxx - sx * sx) AS slope
      |  FROM st
      |)
      |SELECT k AS n_sources,
      |       round(slope, 6) AS heaps_beta,
      |       round((sy - slope * sx) / k::DOUBLE, 6) AS heaps_logk,
      |       round((k::DOUBLE * sxy - sx * sy) *
      |             (k::DOUBLE * sxy - sx * sy) /
      |             ((k::DOUBLE * sxx - sx * sx) *
      |              (k::DOUBLE * syy - sy * sy)), 6) AS r2
      |FROM f
      """.stripMargin.trim))

  /** TextRank vocabulary cap: the salient-vocab subgraph the keyword
    * PageRank runs on — bounds the graph (and the oracle's unrolled
    * iterations) to ≤ this many nodes at every SF. The actual |V| is
    * data-dependent (the sf0.001 synthetic corpus has only 31 distinct
    * tokens), so the oracle derives r0 and the teleport share from
    * count(v) exactly as PageRank.weighted does — never from the cap.
    */
  private val TextRankVocab = 50

  /** The TextRank bigram leg, factored so PlanShapeSpec can assert its
    * plan directly (the registered query now localCheckpoints this
    * relation, so the bigram joins no longer appear in the FINAL plan):
    * adjacent-token pairs restricted to the capped vocab on BOTH ends —
    * the ≤vocab-row build sides must broadcast so the corpus-sized
    * bigram stream never shuffles — then the (w1, w2) count rollup.
    */
  private[graft] def textrankBigrams(tk: org.apache.spark.sql.DataFrame,
                                     vocab: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    tk.select(explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("pr"))
      .select(col("pr.w1").as("w1"), col("pr.w2").as("w2"))
      .filter(col("w1") =!= col("w2"))
      .join(broadcast(vocab.select(col("token").as("w1"))), Seq("w1"))
      .join(broadcast(vocab.select(col("token").as("w2"))), Seq("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cw"))

  /** One weighted-PageRank power iteration over the token graph as a
    * DuckDB CTE — StatQueries.prIter with the teleport share derived
    * from the DATA-DEPENDENT vocab size (integer division, matching
    * PageRank.weighted's `(massMicro·15/100) / nV`).
    */
  private def trIter(next: Int, prev: Int): String = s""",
    |r$next AS (
    |  SELECT v.id,
    |         (150000000000 // (SELECT count(*) FROM v)) +
    |         COALESCE(SUM((((r$prev.r * 85) // 100) * e.w) // deg.totw), 0) AS r
    |  FROM v
    |  LEFT JOIN edges e ON e.dst = v.id
    |  LEFT JOIN r$prev ON r$prev.id = e.src
    |  LEFT JOIN deg ON deg.src = e.src
    |  GROUP BY v.id
    |)""".stripMargin

  private val textrankQ = QueryDef(
    "txt_textrank_keywords",
    s"TextRank keyword extraction (Mihalcea & Tarau 2004): weighted " +
      s"PageRank over the word co-occurrence graph — the global " +
      s"graph-centrality keyword ranking beside txt_rake_keywords' " +
      s"per-document phrase scores, and the second consumer of the " +
      s"PageRank operator (operator reuse is the point: the SAME " +
      s"integer micro-unit iteration that ranks trade partners ranks " +
      s"vocabulary). Graph: top-$TextRankVocab corpus tokens by " +
      s"frequency (deterministic (n desc, token) cut), edges = " +
      s"adjacent-token co-occurrence counts within documents, made " +
      s"symmetric; 3 power iterations at damping 0.85, all " +
      s"arithmetic exact BIGINT micro-units (the graph_pagerank " +
      s"contract — bit-identical under any partitioning, oracle " +
      s"unrolls the same iterations as CTEs). Data-sized work: one " +
      s"bigram rollup shuffle + the vocab rollup; the graph itself " +
      s"is ≤$TextRankVocab² rows.",
    (s, dir) => {
      val tk = docToks(s, dir)
      // localCheckpoint, not cache(): eager and ≤50 rows, it reuses the
      // materialized vocab across the three consumers WITHOUT leaving a
      // persistent cache entry behind — ContextCleaner frees the blocks
      // once the reference is collected, whereas a cache() here
      // accumulated across a multi-query session (round-14 ADVICE)
      val vocab = tk.select(explode(col("toks")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(TextRankVocab)
        .select(col("token")).localCheckpoint()
      val bi = textrankBigrams(tk, vocab)
        // consumed TWICE by the symmetrization union below — without a
        // barrier the corpus-sized bigram explode+rollup ran once per
        // direction (r21; guide §1.2). ≤ vocab² rows by construction.
        .localCheckpoint()
      // symmetric: TextRank's graph is undirected, PageRank.weighted
      // walks directed edges — emit both directions and SUM (a pair
      // seen both ways merges)
      val edges = bi.select(col("w1").as("src"), col("w2").as("dst"), col("cw"))
        .unionAll(bi.select(col("w2").as("src"), col("w1").as("dst"), col("cw")))
        .groupBy(col("src"), col("dst")).agg(sum(col("cw")).as("w"))
      val ranks = graft.operators.PageRank.weighted(
        vocab.select(col("token").as("id")), edges, iterations = 3)
      ranks
        .select(col("id").as("token"), col("rank_micro"))
        .orderBy(col("rank_micro").desc, col("token"))
        .limit(25)
    },
    Some(s"""
      |${Duck.docToks}, vocab AS MATERIALIZED (
      |  SELECT t AS token FROM (
      |    SELECT unnest(toks) AS t FROM tt
      |  ) GROUP BY t ORDER BY count(*) DESC, t LIMIT $TextRankVocab
      |), bi0 AS (
      |  SELECT unnest(list_transform(range(len(toks)-1),
      |           i -> {'w1': toks[i+1], 'w2': toks[i+2]})) AS pr FROM tt
      |), bi AS (
      |  SELECT pr.w1 AS w1, pr.w2 AS w2, count(*) AS cw
      |  FROM bi0
      |  WHERE pr.w1 <> pr.w2
      |    AND pr.w1 IN (SELECT token FROM vocab)
      |    AND pr.w2 IN (SELECT token FROM vocab)
      |  GROUP BY 1, 2
      |), edges AS MATERIALIZED (
      |  SELECT src, dst, SUM(cw)::BIGINT AS w FROM (
      |    SELECT w1 AS src, w2 AS dst, cw FROM bi
      |    UNION ALL SELECT w2, w1, cw FROM bi
      |  ) GROUP BY 1, 2
      |), deg AS (
      |  SELECT src, SUM(w) AS totw FROM edges GROUP BY 1
      |), v AS (SELECT token AS id FROM vocab),
      |r0 AS (SELECT id,
      |       (1000000000000 // (SELECT count(*) FROM v))::BIGINT AS r FROM v)
      """.stripMargin.trim
      + trIter(1, 0) + trIter(2, 1) + trIter(3, 2) + """
      |SELECT r3.id AS token, r3.r::BIGINT AS rank_micro
      |FROM r3
      |ORDER BY rank_micro DESC, token LIMIT 25
      """.stripMargin))

  private val codeDetectQ = QueryDef(
    "txt_code_detect",
    "Code-vs-prose detection per source — the corpus-routing filter an " +
      "LLM-data pipeline runs before language-ID (code needs different " +
      "dedup n-grams, quality thresholds, and tokenizer treatment than " +
      "prose): per document, count code-symbol characters " +
      "({}();=<>[]), digits, and semicolons on the normalized text; a " +
      "document is flagged code when its symbol share exceeds 3% " +
      "(integer comparison sym·10⁶ > 30000·len — no float threshold). " +
      "Fixtures are synthetic prose, so 0 flags is the EXPECTED green " +
      "(the dq_referential_integrity convention: the gate pins the " +
      "mechanism and the exact per-source feature sums, not a " +
      "non-zero hit). All counts exact BIGINT; shares are ·10⁶ div " +
      "exact integer ratios. One scan, one per-source rollup shuffle.",
    (s, dir) => {
      val symPat = "[{}();=<>\\[\\]]"
      val d = docToks(s, dir).select(col("source"),
        length(col("norm")).cast("long").as("len"),
        (length(col("norm")) -
          length(regexp_replace(col("norm"), symPat, ""))).cast("long").as("sym"),
        (length(col("norm")) -
          length(regexp_replace(col("norm"), "[0-9]", ""))).cast("long").as("dig"))
        .withColumn("is_code",
          when(col("sym") * 1000000L > lit(30000L) * col("len"), 1L).otherwise(0L))
      d.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("is_code")).as("n_code"),
          sum(col("sym")).as("n_sym"), sum(col("dig")).as("n_dig"),
          sum(col("len")).as("n_chars"))
        .select(col("source"), col("n_docs"), col("n_code"),
          (expr("CAST((n_code * 1000000) div n_docs AS BIGINT)").cast("double") /
            lit(1000000.0)).as("code_rate"),
          (expr("CAST((n_sym * 1000000) div n_chars AS BIGINT)").cast("double") /
            lit(1000000.0)).as("symbol_share"),
          (expr("CAST((n_dig * 1000000) div n_chars AS BIGINT)").cast("double") /
            lit(1000000.0)).as("digit_share"))
        .orderBy(col("symbol_share").desc, col("source"))
    },
    Some(s"""
      |${Duck.docToks}, d AS (
      |  SELECT source, length(norm)::BIGINT AS len,
      |         (length(norm) - length(regexp_replace(norm, '[{}();=<>\\[\\]]', '', 'g')))::BIGINT AS sym,
      |         (length(norm) - length(regexp_replace(norm, '[0-9]', '', 'g')))::BIGINT AS dig
      |  FROM tt
      |), f AS (
      |  SELECT source, len, sym, dig,
      |         CASE WHEN sym * 1000000 > 30000 * len THEN 1 ELSE 0 END AS is_code
      |  FROM d
      |), g AS (
      |  SELECT source, count(*) AS n_docs, SUM(is_code)::BIGINT AS n_code,
      |         SUM(sym)::BIGINT AS n_sym, SUM(dig)::BIGINT AS n_dig,
      |         SUM(len)::BIGINT AS n_chars
      |  FROM f GROUP BY 1
      |)
      |SELECT source, n_docs, n_code,
      |       ((n_code * 1000000) // n_docs)::DOUBLE / 1000000.0 AS code_rate,
      |       ((n_sym * 1000000) // n_chars)::DOUBLE / 1000000.0 AS symbol_share,
      |       ((n_dig * 1000000) // n_chars)::DOUBLE / 1000000.0 AS digit_share
      |FROM g
      |ORDER BY symbol_share DESC, source
      """.stripMargin.trim))

  private val langidConfusion = QueryDef(
    "txt_langid_confusion",
    "Language-ID confusion matrix — the EVALUATION of txt_lang_id's " +
      "heuristic against the fixture's true labels (a model that ships " +
      "without its confusion matrix ships untested; the routing " +
      "decisions pipeline_rebalance_langs and txt_source_jsd make are " +
      "only as good as this table): per (true lang, detected lang) " +
      "cell counts from ONE rollup over the per-doc predictions, each " +
      "cell's share of its true-language row as the exact truncated " +
      "integer (n·10⁶) div n_true, plus the correct flag. The output " +
      "is |langs|²-bounded at any scale; the only row-sized work is " +
      "the prediction projection the txt_lang_id gate already pins.",
    (s, dir) => {
      val pred = docToks(s, dir)
        .select(col("lang"), langIdFromTokens(col("toks")).as("detected_lang"))
      val cells = pred.groupBy(col("lang"), col("detected_lang"))
        .agg(count(lit(1)).as("n"))
      val totals = cells.groupBy(col("lang")).agg(sum(col("n")).as("n_true"))
      cells.join(totals, Seq("lang"))
        .select(col("lang"), col("detected_lang"), col("n"), col("n_true"),
          expr("n * 1000000 div n_true").as("share_millionths"),
          (col("lang") === col("detected_lang")).as("is_correct"))
        .orderBy(col("lang"), col("detected_lang"))
    },
    Some {
      val langs = stopwords.keys.toSeq.sorted
      val hitSel = langs.map(l => s"${Duck.hits(stopwords(l))} AS hits_$l").mkString(",\n       ")
      val m = langs.map(l => s"hits_$l").mkString("greatest(", ", ", ")")
      val caseChain = langs.map(l => s"WHEN hits_$l = $m THEN '$l'").mkString("\n         ")
      s"""
      |${Duck.docToks}, h AS (
      |  SELECT doc_id, lang, $hitSel
      |  FROM tt
      |), p AS (
      |  SELECT lang,
      |         CASE WHEN $m = 0 THEN 'und'
      |           $caseChain
      |         END AS detected_lang
      |  FROM h
      |), cells AS (
      |  SELECT lang, detected_lang, count(*)::BIGINT AS n FROM p GROUP BY 1, 2
      |), totals AS (
      |  SELECT lang, SUM(n)::BIGINT AS n_true FROM cells GROUP BY 1
      |)
      |SELECT c.lang, c.detected_lang, c.n, t.n_true,
      |       (c.n * 1000000) // t.n_true AS share_millionths,
      |       c.lang = c.detected_lang AS is_correct
      |FROM cells c JOIN totals t USING (lang)
      |ORDER BY lang, detected_lang
      """.stripMargin.trim
    })

  private val sourceOutliersQ = QueryDef(
    "txt_source_outliers",
    "Per-source document outlier detection — the curation pass that " +
      "surfaces documents unlike the rest of their source (mislabeled " +
      "scrapes, boilerplate, wrong-language leakage) for review before " +
      "training: each doc becomes a 256-bucket hashed term-frequency " +
      "vector (md5-bucketed — the fixed-width feature trick that keeps " +
      "the representation vocabulary-independent at 100 TB), its " +
      "source's centroid direction is the source's total bucket-count " +
      "vector (the mean scales out of cosine, so NO per-source " +
      "division ever happens), and outlier score = 1 − cos(doc, " +
      "source). All sufficient statistics (dot, ‖doc‖², ‖source‖²) " +
      "are exact BIGINTs from bucket-keyed joins — per-doc work is " +
      "bounded by 256 buckets, the doc×centroid join is (source, " +
      "bucket)-keyed, and only the final 1 − dot/(√·√) runs in double " +
      "(IEEE sqrt is correctly rounded — bit-equal cross-engine). " +
      "Top-20 by rounded score via TakeOrdered; self-inclusion in the " +
      "centroid is the standard convention (a true outlier still " +
      "scores high — it is 1/n of its own centroid).",
    (s, dir) => {
      import graft.operators.TextAnalysis
      // tf is consumed THREE times below (src, dn, dot) and src twice
      // (sn, dot); without a barrier each consumer re-ran the whole
      // tokenize + explode + md5-bucket pipeline over the corpus
      // (guide §1.2 — the 3× recompute measured 10.0 s in the r21
      // control). One localCheckpoint bounds tf at |docs|·256 rows.
      val tf = docToks(s, dir)
        .select(col("doc_id"), col("source"), explode(col("toks")).as("tok"))
        .withColumn("b", TextAnalysis.md5Long48(col("tok")) % 256)
        .groupBy(col("doc_id"), col("source"), col("b"))
        .agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val src = tf.groupBy(col("source"), col("b")).agg(sum(col("tf")).as("cnt"))
        .localCheckpoint()
      val dn = tf.groupBy(col("doc_id"))
        .agg(sum(col("tf") * col("tf")).as("d2"), sum(col("tf")).as("n_toks"))
      val sn = src.groupBy(col("source")).agg(sum(col("cnt") * col("cnt")).as("s2"))
      val dot = tf.join(src, Seq("source", "b"))
        .groupBy(col("doc_id"), col("source"))
        .agg(sum(col("tf") * col("cnt")).as("dot"))
      dot.join(dn, Seq("doc_id")).join(sn, Seq("source"))
        .select(col("doc_id"), col("source"), col("n_toks"),
          round(lit(1.0) - col("dot").cast("double") /
            (sqrt(col("d2").cast("double")) * sqrt(col("s2").cast("double"))), 6)
            .as("outlier_score"))
        .orderBy(col("outlier_score").desc, col("doc_id")).limit(20)
    },
    Some(s"""
      |${Duck.docToks}
      |, tok AS (
      |  SELECT doc_id, source, unnest(toks) AS tok FROM tt
      |), tf AS (
      |  SELECT doc_id, source,
      |         ('0x' || substring(md5(tok), 1, 12))::BIGINT % 256 AS b,
      |         count(*) AS tf
      |  FROM tok GROUP BY 1, 2, 3
      |), src AS (
      |  SELECT source, b, SUM(tf) AS cnt FROM tf GROUP BY 1, 2
      |), dn AS (
      |  SELECT doc_id, SUM(tf * tf) AS d2, SUM(tf) AS n_toks FROM tf GROUP BY 1
      |), sn AS (
      |  SELECT source, SUM(cnt * cnt) AS s2 FROM src GROUP BY 1
      |), dt AS (
      |  SELECT f.doc_id, f.source, SUM(f.tf * c.cnt) AS dot
      |  FROM tf f JOIN src c ON c.source = f.source AND c.b = f.b
      |  GROUP BY 1, 2
      |)
      |SELECT d.doc_id, d.source, n.n_toks::BIGINT AS n_toks,
      |       round(1.0::DOUBLE - d.dot::DOUBLE /
      |             (sqrt(n.d2::DOUBLE) * sqrt(s.s2::DOUBLE)), 6) AS outlier_score
      |FROM dt d JOIN dn n USING (doc_id) JOIN sn s USING (source)
      |ORDER BY outlier_score DESC, doc_id LIMIT 20
      """.stripMargin.trim))

  private val bpeEncodeQ = QueryDef(
    "txt_bpe_encode",
    "BPE tokenizer APPLICATION — the encode half that turns " +
      "txt_bpe_train's learned merges into corpus tokenization, closing " +
      "the train→apply loop an LLM data pipeline runs at scale: the 3 " +
      "merges are learned from the top-500 dictionary exactly as in " +
      "txt_bpe_train, then applied (the same left-to-right greedy fold, " +
      "Bpe.mergeSyms, chained in merge order) to the ENTIRE corpus " +
      "vocabulary — on DISTINCT words weighted by corpus frequency, " +
      "the production trick that makes encoding vocabulary-bounded " +
      "instead of token-bounded (the 100 TB corpus is scanned once for " +
      "word counts; the merge folds run over |vocab| rows). Output: " +
      "the 15 words whose encoding saves the most corpus-weighted " +
      "symbols (freq · (chars − symbols)) — the telemetry that shows " +
      "which merges pay for themselves. The oracle re-learns the " +
      "merges AND re-applies them in SQL (list_reduce over single-" +
      "element lists), so a green hash certifies train and encode " +
      "end-to-end; exact BIGINT arithmetic throughout, ties break on " +
      "the word.",
    (s, dir) => {
      import graft.operators.Bpe
      val allWords = docToks(s, dir)
        .select(explode(col("toks")).as("word"))
        .filter(col("word").rlike("^[a-z]+$") && length(col("word")).between(2, 20))
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      val dictWords = allWords
        .orderBy(col("freq").desc, col("word")).limit(500)
      val (dict, merges) = Bpe.train(dictWords, rounds = 3)
      dict.unpersist()
      val encoded = merges.foldLeft(
        allWords.withColumn("syms", Bpe.chars(col("word")))) { (df, m) =>
        df.withColumn("syms", Bpe.mergeSyms(col("syms"), m.left, m.right))
      }
      encoded
        .select(col("word"), col("freq"),
          length(col("word")).cast("long").as("n_chars"),
          size(col("syms")).cast("long").as("n_syms"))
        .withColumn("saved_total", col("freq") * (col("n_chars") - col("n_syms")))
        .orderBy(col("saved_total").desc, col("word")).limit(15)
    },
    Some(s"""
      |${Duck.docToks}
      |, words_all AS (
      |  SELECT w AS word, count(*) AS freq
      |  FROM (SELECT unnest(toks) AS w FROM tt)
      |  WHERE regexp_full_match(w, '[a-z]+') AND len(w) BETWEEN 2 AND 20
      |  GROUP BY 1
      |), words AS (
      |  SELECT word, freq FROM words_all ORDER BY freq DESC, word LIMIT 500
      |), d0 AS (
      |  SELECT word, freq, string_split_regex(word, '') AS syms FROM words
      |), ${duckBpeRound(1, "d0")},
      |${duckBpeRound(2, "d1")},
      |${duckBpeRound(3, "d2")},
      |enc0 AS (
      |  SELECT word, freq, string_split_regex(word, '') AS syms FROM words_all
      |), enc1 AS (
      |  SELECT word, freq,
      |         list_reduce(list_transform(syms, ch -> [ch]),
      |           (a, e) -> CASE WHEN a[len(a)] = b1.l AND e[1] = b1.r
      |                          THEN list_append(a[1:len(a)-1], b1.l || b1.r)
      |                          ELSE list_append(a, e[1]) END) AS syms
      |  FROM enc0 LEFT JOIN b1 ON TRUE
      |), enc2 AS (
      |  SELECT word, freq,
      |         list_reduce(list_transform(syms, ch -> [ch]),
      |           (a, e) -> CASE WHEN a[len(a)] = b2.l AND e[1] = b2.r
      |                          THEN list_append(a[1:len(a)-1], b2.l || b2.r)
      |                          ELSE list_append(a, e[1]) END) AS syms
      |  FROM enc1 LEFT JOIN b2 ON TRUE
      |), enc3 AS (
      |  SELECT word, freq,
      |         list_reduce(list_transform(syms, ch -> [ch]),
      |           (a, e) -> CASE WHEN a[len(a)] = b3.l AND e[1] = b3.r
      |                          THEN list_append(a[1:len(a)-1], b3.l || b3.r)
      |                          ELSE list_append(a, e[1]) END) AS syms
      |  FROM enc2 LEFT JOIN b3 ON TRUE
      |)
      |SELECT word, freq::BIGINT AS freq, len(word)::BIGINT AS n_chars,
      |       len(syms)::BIGINT AS n_syms,
      |       (freq * (len(word) - len(syms)))::BIGINT AS saved_total
      |FROM enc3
      |ORDER BY saved_total DESC, word LIMIT 15
      """.stripMargin.trim))

  val defs: Seq[QueryDef] =
    Seq(stats, langQ, quality, fp, topTokens, bigramLift, lmQ, simhashQ,
      embedQ, embedQuantQ, embedQuantSampledQ, embedKnnQ, bm25Q, hybridRrfQ, crossencQ, maxsimQ, tfidfQ, chunksQ, packQ,
      tokenBudgetQ, gopherQ, dupNgramsQ, piiQ, noveltyQ, invIndexQ, bpeTrainQ, bpeEncodeQ, rakeQ,
      readabilityQ, rankingNdcgQ, zipfQ, llrQ, burstinessQ, jsdQ, heapsQ, textrankQ,
      codeDetectQ, langidConfusion, sourceOutliersQ)
}
