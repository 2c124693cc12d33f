package graft.queries

import graft.Tables
import graft.operators.TextAnalysis._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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

  val defs: Seq[QueryDef] = Seq(prep)
}
