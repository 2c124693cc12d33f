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
      "batched mapPartitions decode seam. Not ANSI-SQL-expressible " +
      "(murmur features) — driver records the rows-only check; exact " +
      "values are covered by MultimodalSpec.",
    (s, dir) => {
      val d = Multimodal.withFakeMedia(Tables.documentsSpread(s, dir), "text")
      Multimodal.decodeAndExtract(d, "media")
        .select(col("doc_id"),
          col("media_meta.width").as("width"),
          col("media_meta.height").as("height"),
          col("media_meta.n_channels").as("n_channels"),
          round(element_at(col("media_features"), 1).cast("double"), 6).as("f0"))
        .orderBy(col("doc_id"))
    },
    None)

  val defs: Seq[QueryDef] = Seq(meta, decode)
}
