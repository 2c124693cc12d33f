package graft.queries

import graft.Tables
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column query surface: the binary media path over the
  * `documents` fixture (UTF-8 bytes stand in for real media — see
  * [[graft.operators.Multimodal]]).
  */
object MultimodalQueries {

  private val meta = QueryDef(
    "mm_media_meta",
    "Binary media column metadata: byte length, content hash, frame " +
      "count under the 64-byte-stride sampler — all computed on the " +
      "BINARY column (parity: DuckDB encode() → BLOB).",
    (s, dir) => {
      val d = Multimodal.withFakeMedia(Tables.documentsSpread(s, dir), "text")
      d.select(
        col("doc_id"),
        length(col("media")).cast("long").as("n_bytes"),
        md5(col("media")).as("media_md5"),
        (floor((length(col("media")) - 1) / 64.0).cast("long") + 1L).as("n_frames"))
        .orderBy(col("doc_id"))
    },
    Some("""
      |SELECT doc_id,
      |       octet_length(encode(text))::BIGINT AS n_bytes,
      |       md5(text) AS media_md5,
      |       (floor((octet_length(encode(text)) - 1) / 64.0)::BIGINT + 1) AS n_frames
      |FROM documents ORDER BY doc_id
      """.stripMargin.trim))

  private val decode = QueryDef(
    "mm_decode_features",
    "Stub-decoded media: metadata struct + feature vector via the " +
      "batched mapPartitions decode seam. The md5-based stub is fully " +
      "SQL-expressible (md5 of the UTF-8 stand-in bytes ≡ md5(text)), " +
      "so metadata bit-slices AND the float32 feature component are " +
      "hash-gated cross-engine.",
    (s, dir) => {
      val d = Multimodal.withFakeMedia(Tables.documentsSpread(s, dir), "text")
      Multimodal.decodeAndExtract(d, "media")
        .select(col("doc_id"),
          col("media_meta.width").as("width"),
          col("media_meta.height").as("height"),
          col("media_meta.n_channels").as("n_channels"),
          col("media_meta.duration_ms").as("duration_ms"),
          round(element_at(col("media_features"), 1).cast("double"), 6).as("f0"))
        .orderBy(col("doc_id"))
    },
    Some("""
      |WITH m AS (
      |  SELECT doc_id, md5(text) AS hx,
      |         ('0x' || substring(md5(text), 1, 12))::BIGINT AS h
      |  FROM documents
      |), tok AS (
      |  SELECT doc_id, unnest(list_transform(range(16), i -> substring(hx, i*2 + 1, 2))) AS t
      |  FROM m
      |), b AS (
      |  SELECT doc_id,
      |         (('0x' || substring(md5(t), 1, 12))::BIGINT % 16) AS bucket,
      |         CASE WHEN ('0x' || substring(md5(t), 13, 1))::BIGINT < 8 THEN 1 ELSE -1 END AS sign
      |  FROM tok
      |), acc AS (
      |  SELECT doc_id, bucket, sum(sign)::DOUBLE AS w FROM b GROUP BY 1, 2
      |), nrm AS (
      |  SELECT doc_id, sqrt(sum(w * w)) AS nn FROM acc GROUP BY doc_id
      |), f0 AS (
      |  SELECT n.doc_id,
      |         CASE WHEN n.nn = 0 THEN 1.0
      |              ELSE CAST(CAST(COALESCE(a.w, 0.0) / n.nn AS FLOAT) AS DOUBLE) END AS f0
      |  FROM nrm n LEFT JOIN acc a ON a.doc_id = n.doc_id AND a.bucket = 0
      |)
      |SELECT m.doc_id,
      |       (64 + m.h % 1024)::INT AS width,
      |       (64 + (m.h >> 10) % 1024)::INT AS height,
      |       (1 + (m.h >> 20) % 4)::INT AS n_channels,
      |       ((m.h >> 22) % 600000)::BIGINT AS duration_ms,
      |       round(f0.f0, 6) AS f0
      |FROM m JOIN f0 ON m.doc_id = f0.doc_id
      |ORDER BY m.doc_id
      """.stripMargin.trim))

  val defs: Seq[QueryDef] = Seq(meta, decode)
}
